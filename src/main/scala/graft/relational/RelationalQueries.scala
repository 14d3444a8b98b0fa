package graft.relational

import graft.core.Cols._
import graft.core.{CacheScope, Q, Tables}
import graft.ops.AsOfJoin
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational surface R1-R16 (SURVEY.md §2C): the "query engine"
  * capability parity layer. Everything is stock DataFrame API — Catalyst
  * provides predicate pushdown, column pruning, join selection
  * (broadcast hints on the genuinely small dims), subquery
  * decorrelation and AQE; no custom physical work is needed here
  * (SURVEY.md §4).
  */
object RelationalQueries {

  /** The trailing-30-day distinct-type semantics, stated ONCE as the
    * oracle's correlated distinct-count subquery and gated against TWO
    * engine plans: r26's collect_set RANGE-frame window and x71's
    * bounded-state sorted scan — the same definition, two physical
    * strategies that must hash-agree. */
  private val distinctWindowSql =
    """SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
      |  (SELECT count(DISTINCT e2.event_type) FROM events e2
      |   WHERE e2.user_id = e.user_id
      |     AND e2.ts <= e.ts
      |     AND e2.ts >= e.ts - INTERVAL 30 DAY) AS n_types
      |FROM events e WHERE e.event_type = 'purchase'
      |ORDER BY e.event_id""".stripMargin

  val all: Seq[Q] = Seq(

    // R1 — TPC-H Q1 shape: scan + pushed filter + 8-way hash aggregate.
    // All money sums are exact integer cents (Cols.fixed) so the
    // partial/final aggregation order can never change the result.
    Q(
      "r1_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  SUM(CAST(round(l_quantity*100) AS BIGINT)) / 100.0 AS sum_qty,
        |  SUM(CAST(round(l_extendedprice*100) AS BIGINT)) / 100.0 AS sum_base_price,
        |  SUM(CAST(round(l_extendedprice*(1.0-l_discount)*10000) AS BIGINT)) / 10000.0 AS sum_disc_price,
        |  SUM(CAST(round(l_extendedprice*(1.0-l_discount)*(1.0+l_tax)*1000000) AS BIGINT)) / 1000000.0 AS sum_charge,
        |  SUM(CAST(round(l_quantity*100) AS BIGINT)) / (100.0 * count(*)) AS avg_qty,
        |  SUM(CAST(round(l_extendedprice*100) AS BIGINT)) / (100.0 * count(*)) AS avg_price,
        |  SUM(CAST(round(l_discount*10000) AS BIGINT)) / (10000.0 * count(*)) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          (sum(fixed(col("l_quantity"), 100)) / 100.0).as("sum_qty"),
          (sum(fixed(col("l_extendedprice"), 100)) / 100.0).as("sum_base_price"),
          (sum(fixed(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000)) / 10000.0)
            .as("sum_disc_price"),
          (sum(fixed(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 1000000)) / 1000000.0)
            .as("sum_charge"),
          (sum(fixed(col("l_quantity"), 100)) / (lit(100.0) * count(lit(1)))).as("avg_qty"),
          (sum(fixed(col("l_extendedprice"), 100)) / (lit(100.0) * count(lit(1)))).as("avg_price"),
          (sum(fixed(col("l_discount"), 10000)) / (lit(10000.0) * count(lit(1)))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // R2 — fact ⋈ fact equi join (shuffled), revenue per segment.
    Q(
      "r2_segment_revenue",
      """SELECT c.c_mktsegment, count(*) AS order_cnt,
        |  SUM(CAST(round(o.o_totalprice*100) AS BIGINT)) / 100.0 AS revenue
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir, "orders")
        .join(Tables(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("order_cnt"),
          (sum(fixed(col("o_totalprice"), 100)) / 100.0).as("revenue"))
        .orderBy("c_mktsegment")
    },

    // R3 — broadcast-join chain over the small dims. nation (25) and
    // region (5) stay broadcast at any scale; customer never shuffles.
    Q(
      "r3_region_customers",
      """SELECT r.r_name, count(*) AS cust_cnt
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY 1 ORDER BY r_name""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir, "customer")
        .join(broadcast(Tables(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name").agg(count(lit(1)).as("cust_cnt"))
        .orderBy("r_name")
    },

    // R4 — left outer join keeping 0-order customers, top-25.
    Q(
      "r4_customer_orders_top25",
      """SELECT c.c_custkey, count(o.o_orderkey) AS order_cnt
        |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY 1 ORDER BY order_cnt DESC, c_custkey LIMIT 25""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir, "customer")
        .join(Tables(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("order_cnt"))
        .orderBy(col("order_cnt").desc, col("c_custkey"))
        .limit(25)
    },

    // R5 — semi/anti join pair, union-tagged.
    Q(
      "r5_semi_anti",
      """SELECT 'has_orders' AS tag, c_custkey FROM customer c
        |  WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |UNION ALL
        |SELECT 'no_orders' AS tag, c_custkey FROM customer c
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY tag, c_custkey""".stripMargin
    ) { (spark, dir) =>
      val c = Tables(spark, dir, "customer")
      val o = Tables(spark, dir, "orders")
      val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(lit("has_orders").as("tag"), col("c_custkey"))
      val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(lit("no_orders").as("tag"), col("c_custkey"))
      semi.unionByName(anti).orderBy("tag", "c_custkey")
    },

    // R6 — range/theta self-join on events: pairs within 1 hour.
    Q(
      "r6_event_pairs",
      """SELECT user_id, pair_cnt FROM (
        |  SELECT e1.user_id AS user_id, count(*) AS pair_cnt
        |  FROM events e1 JOIN events e2 ON e1.user_id = e2.user_id
        |    AND e2.ts BETWEEN e1.ts AND e1.ts + INTERVAL 1 HOUR
        |    AND e1.event_id < e2.event_id
        |  GROUP BY 1) g
        |ORDER BY pair_cnt DESC, user_id LIMIT 50""".stripMargin
    ) { (spark, dir) =>
      // Range join via hour binning: a row of e2 can only match e1 rows
      // whose hour bucket is its own or the previous one, so the join
      // key is (user, bucket) and each bucket pair is checked once —
      // per-key work drops from O(n^2) per user to O(pairs actually
      // within range). This is the interval-bin pattern that survives
      // 100x event volume; the exact BETWEEN predicate stays as the
      // post-join filter.
      val e = Tables(spark, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          expr("unix_micros(ts) div 3600000000").as("hb"))
      val e1 = e.toDF("e1_id", "e1_ts", "user_id", "hb")
        .select(col("e1_id"), col("e1_ts"), col("user_id"),
          explode(array(col("hb"), col("hb") + 1)).as("phb"))
      val e2 = e.toDF("e2_id", "e2_ts", "u2", "hb2")
      e1.join(e2,
          col("user_id") === col("u2") && col("phb") === col("hb2") &&
            col("e2_ts") >= col("e1_ts") &&
            col("e2_ts") <= col("e1_ts") + expr("INTERVAL 1 HOUR") &&
            col("e1_id") < col("e2_id"))
        .groupBy("user_id").agg(count(lit(1)).as("pair_cnt"))
        .orderBy(col("pair_cnt").desc, col("user_id"))
        .limit(50)
    },

    // R7 — as-of join: latest event (state) per probe, via the scalable
    // union+window implementation in graft.ops.AsOfJoin (no range self-join).
    Q(
      "r7_asof_latest_event",
      """WITH p AS (
        |  SELECT o_orderkey, o_custkey % 15 AS uid,
        |         TIMESTAMP '2024-01-01 00:00:00' + to_hours(o_orderkey % 720) AS qt
        |  FROM orders)
        |SELECT p.o_orderkey, p.uid,
        |       epoch_us(max(e.ts)) AS asof_ts_us,
        |       arg_max(e.value, e.ts) AS asof_value
        |FROM p LEFT JOIN events e ON e.user_id = p.uid AND e.ts <= p.qt
        |GROUP BY 1, 2 ORDER BY o_orderkey""".stripMargin
    ) { (spark, dir) =>
      val probes = Tables(spark, dir, "orders").select(
        col("o_orderkey"),
        (col("o_custkey") % 15).as("uid"),
        expr("timestampadd(HOUR, CAST(o_orderkey % 720 AS INT), timestamp'2024-01-01 00:00:00')").as("qt"))
      val events = Tables(spark, dir, "events")
        .select(col("user_id").as("uid"), col("ts"), col("value"))
      AsOfJoin.backward(probes, events, key = "uid", probeTs = "qt", eventTs = "ts",
          eventPayload = Seq("value"))
        .select(col("o_orderkey"), col("uid"),
          epochUs(col("asof_ts")).as("asof_ts_us"),
          col("asof_value"))
        .orderBy("o_orderkey")
    },

    // R8 — rollup with grouping flags.
    Q(
      "r8_rollup_orders",
      """SELECT coalesce(o_orderpriority, 'ALL') AS prio, coalesce(o_orderstatus, 'ALL') AS status,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        |  count(*) AS order_cnt,
        |  SUM(CAST(round(o_totalprice*100) AS BIGINT)) / 100.0 AS total_price
        |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        |ORDER BY prio, status, g_prio, g_status""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir, "orders")
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(
          grouping(col("o_orderpriority")).cast("long").as("g_prio"),
          grouping(col("o_orderstatus")).cast("long").as("g_status"),
          count(lit(1)).as("order_cnt"),
          (sum(fixed(col("o_totalprice"), 100)) / 100.0).as("total_price"))
        .select(
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("g_prio"), col("g_status"), col("order_cnt"), col("total_price"))
        .orderBy("prio", "status", "g_prio", "g_status")
    },

    // R9 — cube.
    Q(
      "r9_cube_lineitem",
      """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("cnt"))
        .orderBy("rf", "ls")
    },

    // R10 — exact distinct aggregation (expands to a two-level aggregate).
    Q(
      "r10_distinct_parts",
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS part_cnt
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("part_cnt"))
        .orderBy("l_returnflag")
    },

    // R11 — ranking window functions, deterministic tiebreak on orderkey.
    Q(
      "r11_rank_orders",
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER w AS BIGINT) AS rn,
        |    CAST(rank() OVER w AS BIGINT) AS rk,
        |    CAST(dense_rank() OVER w AS BIGINT) AS drk
        |  FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey))
        |WHERE rk <= 3 ORDER BY o_custkey, o_orderkey""".stripMargin
    ) { (spark, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(spark, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast("long").as("rn"),
          rank().over(w).cast("long").as("rk"),
          dense_rank().over(w).cast("long").as("drk"))
        .filter(col("rk") <= 3)
        .orderBy("o_custkey", "o_orderkey")
    },

    // R12 — analytic window frame: exact running sum in cents, lag/lead.
    Q(
      "r12_running_total",
      """SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS od_us,
        |  SUM(CAST(round(o_totalprice*100) AS BIGINT))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS running,
        |  lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
        |  lead(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin
    ) { (spark, dir) =>
      val ord = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val frame = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(spark, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), epochUs(col("o_orderdate")).as("od_us"),
          (sum(fixed(col("o_totalprice"), 100)).over(frame) / 100.0).as("running"),
          lag(col("o_totalprice"), 1).over(ord).as("prev_price"),
          lead(col("o_totalprice"), 1).over(ord).as("next_price"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // R13 — set operations between two customer sets.
    Q(
      "r13_set_ops",
      """WITH high AS (SELECT c_custkey FROM customer WHERE c_acctbal > 7000),
        |recent AS (SELECT DISTINCT c.c_custkey FROM customer c
        |           JOIN orders o ON c.c_custkey = o.o_custkey
        |           WHERE o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |SELECT 'union' AS op, c_custkey FROM (SELECT c_custkey FROM high UNION SELECT c_custkey FROM recent) u
        |UNION ALL
        |SELECT 'intersect' AS op, c_custkey FROM (SELECT c_custkey FROM high INTERSECT SELECT c_custkey FROM recent) i
        |UNION ALL
        |SELECT 'except' AS op, c_custkey FROM (SELECT c_custkey FROM high EXCEPT SELECT c_custkey FROM recent) x
        |ORDER BY op, c_custkey""".stripMargin
    ) { (spark, dir) =>
      val c = Tables(spark, dir, "customer")
      val high = c.filter(col("c_acctbal") > 7000).select("c_custkey")
      val recent = c.join(
          Tables(spark, dir, "orders")
            .filter(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast("timestamp")),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey")
      val u = high.union(recent).distinct().select(lit("union").as("op"), col("c_custkey"))
      val i = high.intersect(recent).select(lit("intersect").as("op"), col("c_custkey"))
      val x = high.except(recent).select(lit("except").as("op"), col("c_custkey"))
      u.unionByName(i).unionByName(x).orderBy("op", "c_custkey")
    },

    // R14 — scalar-function battery; part is broadcast.
    Q(
      "r14_scalar_battery",
      """SELECT l.l_orderkey, l.l_linenumber,
        |  substr(p.p_name, 1, 5) AS p5,
        |  concat_ws('|', l.l_returnflag, l.l_linestatus) AS cw,
        |  upper(p.p_brand) AS ub,
        |  CAST(CASE WHEN p.p_type LIKE '%BRASS%' THEN 1 ELSE 0 END AS BIGINT) AS brass,
        |  regexp_extract(p.p_name, '^(\w+)', 1) AS rex,
        |  CAST(year(l.l_shipdate) AS BIGINT) AS yr,
        |  CAST(month(l.l_shipdate) AS BIGINT) AS mo,
        |  epoch_us(date_trunc('month', l.l_shipdate)) AS mt_us,
        |  CAST(datediff('day', DATE '1995-01-01', l.l_shipdate) AS BIGINT) AS dd,
        |  round(abs(l.l_quantity - 25.0), 2) AS ab,
        |  (l.l_orderkey * 7 + l.l_linenumber) % 13 AS pm,
        |  round(least(l.l_tax, l.l_discount), 4) AS lst,
        |  round(greatest(l.l_tax, l.l_discount), 4) AS gst,
        |  coalesce(nullif(l.l_returnflag, 'N'), 'X') AS co
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_orderkey < 100 ORDER BY l_orderkey, l_linenumber""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir, "lineitem").filter(col("l_orderkey") < 100)
        .join(broadcast(Tables(spark, dir, "part")), col("l_partkey") === col("p_partkey"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          substring(col("p_name"), 1, 5).as("p5"),
          concat_ws("|", col("l_returnflag"), col("l_linestatus")).as("cw"),
          upper(col("p_brand")).as("ub"),
          when(col("p_type").like("%BRASS%"), 1L).otherwise(0L).as("brass"),
          regexp_extract(col("p_name"), "^(\\w+)", 1).as("rex"),
          year(col("l_shipdate")).cast("long").as("yr"),
          month(col("l_shipdate")).cast("long").as("mo"),
          epochUs(date_trunc("month", col("l_shipdate"))).as("mt_us"),
          expr("datediff(l_shipdate, date'1995-01-01')").cast("long").as("dd"),
          round(abs(col("l_quantity") - 25.0), 2).as("ab"),
          ((col("l_orderkey") * 7 + col("l_linenumber")) % 13).as("pm"),
          round(least(col("l_tax"), col("l_discount")), 4).as("lst"),
          round(greatest(col("l_tax"), col("l_discount")), 4).as("gst"),
          coalesce(nullif(col("l_returnflag"), lit("N")), lit("X")).as("co"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // R15a — array battery over the embedding column. Everything is done
    // on array<double> (exact widening) with in-order folds.
    Q(
      "r15_array_battery",
      // No round() anywhere here: the raw values are already
      // bit-identical across engines (mn/mx/e1 are exact array
      // elements, s and l2n are in-order folds + IEEE sqrt), and the
      // embeddings are QUANTIZED floats — rounding quantized values is
      // not a measure-zero half-boundary risk; at sf0.1 an element sat
      // exactly on a 1e-4 boundary and Spark (shortest-decimal HALF_UP)
      // and DuckDB (binary value) rounded it apart.
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT vec_id, len(v) AS dim,
        |  list_sum(v) AS s,
        |  list_min(v) AS mn,
        |  list_max(v) AS mx,
        |  v[1] AS e1,
        |  sqrt(list_dot_product(v, v)) AS l2n
        |FROM e ORDER BY vec_id""".stripMargin
    ) { (spark, dir) =>
      val v = vecD(col("embedding"))
      Tables(spark, dir, "embeddings")
        .select(col("vec_id"), v.as("v"))
        .select(col("vec_id"),
          size(col("v")).cast("long").as("dim"),
          aggregate(col("v"), lit(0.0), (s, x) => s + x).as("s"),
          array_min(col("v")).as("mn"),
          array_max(col("v")).as("mx"),
          element_at(col("v"), 1).as("e1"),
          l2norm(col("v")).as("l2n"))
        .orderBy("vec_id")
    },

    // R15b — JSON extraction over events.props.
    Q(
      "r15_json_battery",
      """SELECT CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k_val,
        |  count(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY k_val""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir, "events")
        .select(get_json_object(col("props"), "$.k").cast("long").as("k_val"))
        .groupBy("k_val").agg(count(lit(1)).as("cnt"))
        .orderBy("k_val")
    },

    // R16 — correlated-subquery shape (decorrelates to join + agg);
    // the per-customer average is exact (cents / count).
    Q(
      "r16_above_cust_avg",
      """WITH ca AS (SELECT o_custkey,
        |    SUM(CAST(round(o_totalprice*100) AS BIGINT)) / (100.0 * count(*)) AS cust_avg
        |  FROM orders GROUP BY 1)
        |SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, ca.cust_avg AS cust_avg
        |FROM orders o JOIN ca ON o.o_custkey = ca.o_custkey
        |WHERE o.o_totalprice > ca.cust_avg ORDER BY o.o_orderkey""".stripMargin
    ) { (spark, dir) =>
      val o = Tables(spark, dir, "orders")
      val ca = o.groupBy(col("o_custkey").as("ca_custkey"))
        .agg((sum(fixed(col("o_totalprice"), 100)) / (lit(100.0) * count(lit(1)))).as("ca_avg"))
      o.join(ca, col("o_custkey") === col("ca_custkey"))
        .filter(col("o_totalprice") > col("ca_avg"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("ca_avg").as("cust_avg"))
        .orderBy("o_orderkey")
    },

    // R22 — exact distributed quantiles: DISCRETE p50/p90/p99 of order
    // totalprice per priority (value at rank ceil(q*n) of the sorted
    // group — no interpolation, so the value is an actual data element
    // and both engines agree bit-for-bit; interpolated quantiles hide
    // an engine-specific FP formula). Sort-per-group is the standard
    // exact shape at scale — one shuffle on the group key, rank via
    // window; the sketch alternative (approx_percentile/HLL-style) is
    // the x9 path. Ties in price are safe: any row_number assignment
    // among equal values yields the same value at a fixed rank.
    Q(
      "r22_quantiles",
      """WITH r AS (SELECT o_orderpriority AS pri, o_totalprice AS p,
        |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS cnt
        |  FROM orders)
        |SELECT pri, q, value FROM (
        |  SELECT pri, 'p50' AS q, p AS value FROM r WHERE rn = CAST(ceil(0.5*cnt) AS BIGINT)
        |  UNION ALL SELECT pri, 'p90', p FROM r WHERE rn = CAST(ceil(0.9*cnt) AS BIGINT)
        |  UNION ALL SELECT pri, 'p99', p FROM r WHERE rn = CAST(ceil(0.99*cnt) AS BIGINT)) u
        |ORDER BY pri, q""".stripMargin
    ) { (spark, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("pri").orderBy("p")
      val wc = org.apache.spark.sql.expressions.Window.partitionBy("pri")
      val ranked = Tables(spark, dir, "orders")
        .select(col("o_orderpriority").as("pri"), col("o_totalprice").as("p"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("cnt", count(lit(1)).over(wc))
      // one explode, not a 3-way union — a union would re-run the
      // window sort once per quantile
      val specs = explode(array(Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99).map {
        case (name, f) => struct(lit(name).as("q"), lit(f).as("f"))
      }: _*))
      ranked.select(col("pri"), col("p"), col("rn"), col("cnt"), specs.as("e"))
        .filter(col("rn") === ceil(col("e.f") * col("cnt")))
        .select(col("pri"), col("e.q").as("q"), col("p").as("value"))
        .orderBy("pri", "q")
    },

    // R23 — distribution ranks: ntile/percent_rank/cume_dist complete
    // the window-rank family r11 starts (row_number/rank/dense_rank).
    // The window order carries the unique o_orderkey tiebreak, so every
    // rank is total-order deterministic, and percent_rank/cume_dist are
    // then exact quotients of small integers — bit-identical across
    // engines. Same scale shape as r11: one hash exchange on the
    // partition key, per-partition sort, no global window.
    Q(
      "r23_rank_distributions",
      """SELECT o_custkey, o_orderkey,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin
    ) { (spark, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(spark, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // R24 — explicit GROUPING SETS: the general multi-aggregation form
    // that r8's ROLLUP and r9's CUBE are shorthands for — here the two
    // single-column marginals WITHOUT the (prio, status) cross or the
    // grand total, a set no rollup/cube spelling can express. One scan,
    // one expand+aggregate pass — at scale this halves the input reads
    // vs running the marginal aggregations as separate queries.
    Q(
      "r24_grouping_sets",
      """SELECT coalesce(o_orderpriority, 'ALL') AS prio, coalesce(o_orderstatus, 'ALL') AS status,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        |  count(*) AS order_cnt,
        |  SUM(CAST(round(o_totalprice*100) AS BIGINT)) / 100.0 AS total_price
        |FROM orders GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        |ORDER BY prio, status, g_prio, g_status""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus"))),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg(
          grouping(col("o_orderpriority")).cast("long").as("g_prio"),
          grouping(col("o_orderstatus")).cast("long").as("g_status"),
          count(lit(1)).as("order_cnt"),
          (sum(fixed(col("o_totalprice"), 100)) / 100.0).as("total_price"))
        .select(
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("g_prio"), col("g_status"), col("order_cnt"), col("total_price"))
        .orderBy("prio", "status", "g_prio", "g_status")
    },

    // R25 — APPROXIMATE quantiles: r22's scale path. r22's exact
    // per-group quantiles need a full sort of every group (fine when
    // groups fit a partition; a 100 TB group does not).
    // percentile_approx aggregates a bounded-size mergeable quantile
    // sketch — one linear pass, partial-aggregated map-side like any
    // sum, no group-wide sort anywhere — which is THE way percentiles
    // ship at warehouse scale. Sketch contents are engine-specific, so
    // like x9 this is rows-only by design; the query emits the approx
    // value NEXT TO r22's exact rank-definition value so the error is
    // inspectable in the artifact, and QuerySmokeSpec gates the
    // declared 1% tolerance.
    Q("r25_approx_quantiles", None, (spark, dir) => {
      val qNames = array(lit("p50"), lit("p90"), lit("p99"))
      val approx = Tables(spark, dir, "orders")
        .groupBy(col("o_orderpriority").as("pri"))
        .agg(percentile_approx(col("o_totalprice"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("ap"))
        .select(col("pri"), posexplode(col("ap")).as(Seq("i", "approx_value")))
        .select(col("pri"),
          element_at(qNames, col("i").cast("int") + 1).as("q"),
          col("approx_value"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("pri").orderBy("p")
      val wc = org.apache.spark.sql.expressions.Window.partitionBy("pri")
      val ranked = Tables(spark, dir, "orders")
        .select(col("o_orderpriority").as("pri"), col("o_totalprice").as("p"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("cnt", count(lit(1)).over(wc))
      val specs = explode(array(Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99).map {
        case (name, f) => struct(lit(name).as("q"), lit(f).as("f"))
      }: _*))
      val exact = ranked
        .select(col("pri"), col("p"), col("rn"), col("cnt"), specs.as("e"))
        .filter(col("rn") === ceil(col("e.f") * col("cnt")))
        .select(col("pri"), col("e.q").as("q"), col("p").as("exact_value"))
      approx.join(exact, Seq("pri", "q")).orderBy("pri", "q")
    },
      rowsOnlyNote = Some("approximate-quantile sketches are " +
        "engine-specific by nature (Spark: GK-style mergeable sketch; " +
        "DuckDB: t-digest) — no cross-engine hash can exist; " +
        "QuerySmokeSpec ('r25 approx quantiles within 1% of exact per " +
        "group') gates the declared tolerance, and the query emits the " +
        "approx next to r22's exact rank-definition value so the error " +
        "is inspectable in the artifact itself")),

    // R26 — DISTINCT COUNT over a sliding value window: for every
    // purchase, how many distinct event types did that user produce in
    // the trailing 30 days (purchase included)? SQL window frames
    // cannot express COUNT(DISTINCT) — neither Spark nor DuckDB
    // accepts it — so each engine states the semantics its own way and
    // the hash gate proves they agree: Spark evaluates
    // size(collect_set(type)) over a RANGE frame (r21's value-frame
    // machinery; the set is built per-frame in the window operator, so
    // the cost is one user_id exchange + sort — NOT a per-row rescan),
    // while the DuckDB oracle states the definition directly as a
    // correlated distinct-count subquery. The result is the classic
    // "breadth of engagement" feature a behavioral model consumes.
    // State per frame is bounded by the type alphabet (5), not the
    // window row count — but the RANGE-frame MACHINERY still buffers
    // each user's 30-day row slice, which degrades if one user's
    // event rate explodes. x71 below is the hardened form the
    // round-7 scaling note asked for: the same semantics as a
    // bounded-state sorted scan (per-type latest-timestamp map, the
    // mapGroupsWithState discipline run in batch), gated against THIS
    // query's identical oracle.
    Q(
      "r26_distinct_window",
      distinctWindowSql
    ) { (spark, dir) =>
      val horizonUs = 30L * 86400L * 1000000L
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts_us"))
        .rangeBetween(-horizonUs, 0)
      Tables(spark, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          epochUs(col("ts")).as("ts_us"))
        .withColumn("n_types", size(collect_set(col("event_type")).over(w)).cast("long"))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"), col("n_types"))
        .orderBy("event_id")
    },

    // X71 — r26's semantics under the BOUNDED-STATE plan (round-7
    // VERDICT task 8): distinct event types in the trailing 30 days
    // per purchase, computed by a per-user sorted scan that keeps ONE
    // timestamp per event type — presence in the window needs only
    // each type's MOST RECENT occurrence (last_ts(type) >= t − 30d),
    // so state is the type alphabet (5 entries), independent of the
    // user's event rate. This is the mapGroupsWithState discipline
    // run in batch: repartition on user_id + secondary sort
    // (ts, event_id) + one stateful pass — the plan that survives a
    // single user producing millions of events where r26's RANGE
    // frame buffers them all. TIE HANDLING: the oracle's frame is
    // e2.ts <= e.ts regardless of event id, so the scan updates ALL
    // same-timestamp events before emitting that timestamp's
    // purchases. The scan is a LAZY iterator (ADVICE r8): rows stream
    // out as each (user, timestamp) batch completes, so resident
    // state is exactly the 5-entry type→last-ts map plus ONE
    // timestamp's co-batch — never the partition's accumulated
    // output (the round-8 form buffered every emitted row in an
    // ArrayBuffer, which made the documented bound false).
    // mapPartitions is justified here the way m3's is:
    // the operator under test IS the imperative bounded-state scan;
    // the oracle is r26's verbatim, so the two plans must hash-agree.
    Q(
      "x71_distinct_window_scan",
      distinctWindowSql
    ) { (spark, dir) =>
      val sp = spark
      import sp.implicits._
      val horizonUs = 30L * 86400L * 1000000L
      Tables(spark, dir, "events")
        .select(col("user_id"), epochUs(col("ts")).as("ts_us"),
          col("event_id"), col("event_type"))
        .repartition(col("user_id"))
        .sortWithinPartitions("user_id", "ts_us", "event_id")
        .as[(Long, Long, Long, String)]
        .mapPartitions { iter0 =>
          val iter = iter0.buffered
          new Iterator[(Long, Long, Long, Long)] {
            private val last = scala.collection.mutable.HashMap.empty[String, Long]
            private var curUser = Long.MinValue
            private var pending: Iterator[(Long, Long, Long, Long)] = Iterator.empty
            // Pull exactly one (user, ts) co-batch from the sorted input,
            // fold it into `last`, and stage that batch's purchase rows.
            // Nothing from earlier batches stays resident.
            private def refill(): Unit =
              while (!pending.hasNext && iter.hasNext) {
                val u = iter.head._1
                val ts = iter.head._2
                if (u != curUser) { last.clear(); curUser = u }
                val batch = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
                while (iter.hasNext && iter.head._1 == u && iter.head._2 == ts) {
                  val (_, _, eid, et) = iter.next()
                  batch += ((eid, et))
                }
                batch.foreach { case (_, et) => last(et) = ts }
                val n = last.valuesIterator.count(_ >= ts - horizonUs).toLong
                pending = batch.iterator.collect {
                  case (eid, "purchase") => (eid, u, ts, n)
                }
              }
            def hasNext: Boolean = { refill(); pending.hasNext }
            def next(): (Long, Long, Long, Long) = { refill(); pending.next() }
          }
        }
        .toDF("event_id", "user_id", "ts_us", "n_types")
        .orderBy("event_id")
    },

    // R28 — ROBUST STATISTICS per group: median, MAD (median absolute
    // deviation), IQR, and the count of MAD-outliers (|v − med| >
    // 3·MAD) for each event type — the outlier-resistant alternative
    // to mean/stddev that real telemetry monitoring uses (x54's
    // z-score flags assume near-normal data; MAD does not). All
    // quantiles use r22's exact rank definition (value at
    // rn = ceil(f·cnt) under (value, event_id) order) over integer
    // ten-thousandths, so both engines pick the identical element —
    // no interpolation to diverge. SHAPE: two window families (ranks
    // over values, then ranks over deviations from the per-group
    // median), each one exchange on the 5-key group column, plus a
    // tiny broadcast of the 5-row median table back onto the rows.
    // MAD needs the median FIRST, so the two passes are inherent to
    // the statistic, not a plan artifact.
    Q(
      "r28_robust_stats",
      """WITH e AS (SELECT event_type, event_id,
        |    CAST(round(value * 10000) AS BIGINT) AS v FROM events),
        |r AS (SELECT event_type, event_id, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY v, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS cnt FROM e),
        |med AS (SELECT event_type, max(CASE WHEN rn = (cnt + 1) // 2 THEN v END) AS med,
        |    max(CASE WHEN rn = (cnt + 3) // 4 THEN v END) AS p25,
        |    max(CASE WHEN rn = (3 * cnt + 3) // 4 THEN v END) AS p75
        |  FROM r GROUP BY event_type),
        |d AS (SELECT r.event_type, r.event_id, abs(r.v - med.med) AS dev, med.med
        |  FROM r JOIN med USING (event_type)),
        |dr AS (SELECT event_type, event_id, dev,
        |    row_number() OVER (PARTITION BY event_type ORDER BY dev, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS cnt FROM d),
        |mad AS (SELECT event_type, max(CASE WHEN rn = (cnt + 1) // 2 THEN dev END) AS mad
        |  FROM dr GROUP BY event_type)
        |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
        |  med.med, med.p25, med.p75, (med.p75 - med.p25) AS iqr, mad.mad,
        |  CAST(SUM(CASE WHEN abs(e.v - med.med) > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM e JOIN med USING (event_type) JOIN mad USING (event_type)
        |GROUP BY 1, 3, 4, 5, 6, 7 ORDER BY event_type""".stripMargin
    ) { (spark, dir) =>
      val e = CacheScope.cacheEager(Tables(spark, dir, "events")
        .select(col("event_type"), col("event_id"),
          fixed(col("value"), 10000L).as("v")))
      val wv = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("v", "event_id")
      val wc = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
      val ranked = e
        .withColumn("rn", row_number().over(wv).cast("long"))
        .withColumn("cnt", count(lit(1)).over(wc))
      val med = ranked.groupBy("event_type").agg(
        max(when(col("rn") === expr("(cnt + 1) DIV 2"), col("v"))).as("med"),
        max(when(col("rn") === expr("(cnt + 3) DIV 4"), col("v"))).as("p25"),
        max(when(col("rn") === expr("(3 * cnt + 3) DIV 4"), col("v"))).as("p75"))
      val wd = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("dev", "event_id")
      val mad = e.join(broadcast(med), "event_type")
        .select(col("event_type"), col("event_id"),
          abs(col("v") - col("med")).as("dev"))
        .withColumn("rn", row_number().over(wd).cast("long"))
        .withColumn("cnt", count(lit(1)).over(wc))
        .groupBy("event_type")
        .agg(max(when(col("rn") === expr("(cnt + 1) DIV 2"), col("dev"))).as("mad"))
      e.join(broadcast(med), "event_type").join(broadcast(mad), "event_type")
        .groupBy("event_type", "med", "p25", "p75", "mad")
        .agg(count(lit(1)).as("n"),
          sum(when(abs(col("v") - col("med")) > lit(3L) * col("mad"), 1L)
            .otherwise(0L)).as("n_outliers"))
        .select(col("event_type"), col("n"), col("med"), col("p25"), col("p75"),
          (col("p75") - col("p25")).as("iqr"), col("mad"), col("n_outliers"))
        .orderBy("event_type")
    }
  )
}
