package graft.relational

import graft.core.Cols.fixed
import graft.core.{Q, Tables}
import org.apache.spark.sql.functions._

/** SQL-surface queries: the same engine driven through `spark.sql` over
  * registered views — exercising the parser/analyzer path rather than
  * the DataFrame DSL (the reference has no SQL surface; ours is both).
  */
object SqlQueries {

  val all: Seq[Q] = Seq(

    // R17 — TPC-H Q3 shape via spark.sql: 3-way join, pushed filters,
    // exact cents revenue, top-10. Catalyst plans it identically to the
    // DataFrame form (broadcast customer, shuffled orders x lineitem).
    Q(
      "r17_sql_shipping_priority",
      """SELECT o.o_orderkey,
        |  SUM(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue,
        |  epoch_us(o.o_orderdate) AS od_us, o.o_orderpriority
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
        |  AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        |GROUP BY 1, 3, 4 ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin
    ) { (spark, dir) =>
      Seq("customer", "orders", "lineitem")
        .foreach(t => Tables(spark, dir, t).createOrReplaceTempView(s"graft_$t"))
      spark.sql(
        """SELECT o.o_orderkey,
          |  SUM(CAST(round(l.l_extendedprice * (1.0D - l.l_discount) * 10000) AS BIGINT)) / 10000.0D AS revenue,
          |  unix_micros(o.o_orderdate) AS od_us, o.o_orderpriority
          |FROM graft_customer c JOIN graft_orders o ON c.c_custkey = o.o_custkey
          |JOIN graft_lineitem l ON l.l_orderkey = o.o_orderkey
          |WHERE c.c_mktsegment = 'BUILDING'
          |  AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
          |  AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
          |GROUP BY 1, 3, 4 ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)
    },

    // R18 — pivot: order counts by status, pivoted across priorities
    // (RelationalGroupedDataset.pivot with explicit values → no extra
    // distinct-scan pass; a CASE-sum oracle states the same table).
    Q(
      "r18_pivot_status_priority",
      """SELECT o_orderstatus,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS p1,
        |  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS p2,
        |  CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS p3,
        |  CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS p4,
        |  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS p5
        |FROM orders GROUP BY 1 ORDER BY o_orderstatus""".stripMargin
    ) { (spark, dir) =>
      val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      Tables(spark, dir, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", prios)
        .agg(count(lit(1)))
        .select(col("o_orderstatus") +:
          prios.zipWithIndex.map { case (p, i) =>
            coalesce(col(s"`$p`"), lit(0L)).as(s"p${i + 1}")
          }: _*)
        .orderBy("o_orderstatus")
    },

    // R19 — bag-semantics set ops (EXCEPT ALL / INTERSECT ALL) over
    // order-priority multisets; complements r13's distinct set ops.
    Q(
      "r19_setops_all",
      """WITH a AS (SELECT o_orderpriority AS p FROM orders WHERE o_orderstatus = 'F'),
        |b AS (SELECT o_orderpriority AS p FROM orders WHERE o_orderstatus = 'O')
        |SELECT 'except_all' AS op, p, count(*) AS n FROM (SELECT p FROM a EXCEPT ALL SELECT p FROM b) e GROUP BY 2
        |UNION ALL
        |SELECT 'intersect_all' AS op, p, count(*) AS n FROM (SELECT p FROM a INTERSECT ALL SELECT p FROM b) i GROUP BY 2
        |ORDER BY op, p""".stripMargin
    ) { (spark, dir) =>
      val o = Tables(spark, dir, "orders")
      val a = o.filter(col("o_orderstatus") === "F").select(col("o_orderpriority").as("p"))
      val b = o.filter(col("o_orderstatus") === "O").select(col("o_orderpriority").as("p"))
      val ex = a.exceptAll(b).groupBy("p").agg(count(lit(1)).as("n"))
        .select(lit("except_all").as("op"), col("p"), col("n"))
      val in = a.intersectAll(b).groupBy("p").agg(count(lit(1)).as("n"))
        .select(lit("intersect_all").as("op"), col("p"), col("n"))
      ex.unionByName(in).orderBy("op", "p")
    },

    // R20 — the custom TopKPerKey operator (graft.plans) on the gated
    // surface: top-2 orders per priority. The oracle states the same
    // semantics as a window row_number — the custom partial+final heap
    // operator must agree exactly.
    Q(
      "r20_topk_per_priority",
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) r
        |WHERE rn <= 2 ORDER BY o_orderpriority, o_orderkey""".stripMargin
    ) { (spark, dir) =>
      graft.plans.TopKPerKey(
          Tables(spark, dir, "orders"),
          keys = Seq("o_orderpriority"),
          orderBy = Seq(("o_totalprice", false), ("o_orderkey", true)),
          k = 2)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "o_orderkey")
    },

    // R21 — RANGE window frame (value-based, vs r12's ROWS frame): for
    // each order, the customer's order count and exact spend within a
    // +-30-day window of its date. Ordering key is epoch micros so the
    // frame bounds are portable integers on both engines.
    Q(
      "r21_range_frame",
      """SELECT o_custkey, o_orderkey,
        |  count(*) OVER w AS cnt30,
        |  SUM(CAST(round(o_totalprice*100) AS BIGINT)) OVER w / 100.0 AS sum30
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
        |             RANGE BETWEEN 2592000000000 PRECEDING AND 2592000000000 FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin
    ) { (spark, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey")
        .orderBy(unix_micros(col("o_orderdate")))
        .rangeBetween(-2592000000000L, 2592000000000L)
      Tables(spark, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          count(lit(1)).over(w).as("cnt30"),
          (sum(fixed(col("o_totalprice"), 100)).over(w) / 100.0).as("sum30"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // X9 — approx_count_distinct (HLL++): implementation-defined
    // cardinality sketch, so no DuckDB hash oracle (SURVEY.md §2C
    // excludes HLL from the hash gate; driver records a rows-only
    // check). The query emits the approx next to the exact count so the
    // relative error is inspectable.
    Q("x9_approx_distinct", None, (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .orderBy("l_returnflag"),
      rowsOnlyNote = Some("HLL++ sketch estimates are engine-specific by " +
        "nature — no cross-engine hash can exist; QuerySmokeSpec ('x9 " +
        "approx_count_distinct is within 5% of exact per group') gates the " +
        "declared tolerance, and the query emits approx next to exact so " +
        "the error is inspectable in the artifact itself")),

    // R27 — UNPIVOT (melt): r18's pivot inverse — lineitem's four
    // numeric measures rotated from columns into (metric, value) rows
    // via the Dataset.unpivot API (Spark 3.4+'s melt; the wide→long
    // reshape every metrics pipeline needs before a generic per-metric
    // aggregation). Values go through the exact-cents/ten-thousandths
    // integer path BEFORE the rotation so the per-metric sums are
    // order-independent. SHAPE: unpivot is a zero-shuffle per-row
    // expansion (4 rows out per row in, like a bounded explode); the
    // only exchange is the final 4-group aggregate. The oracle states
    // the same reshape as a UNION ALL — the portable SQL spelling.
    Q(
      "r27_unpivot_metrics",
      """WITH m AS (
        |  SELECT 'l_discount' AS metric, CAST(round(l_discount * 10000) AS BIGINT) AS v10k FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', CAST(round(l_extendedprice * 10000) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'l_quantity', CAST(round(l_quantity * 10000) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'l_tax', CAST(round(l_tax * 10000) AS BIGINT) FROM lineitem)
        |SELECT metric, CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(v10k) AS BIGINT) AS sum_10k,
        |  min(v10k) AS min_10k, max(v10k) AS max_10k
        |FROM m GROUP BY metric ORDER BY metric""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .select(fixed(col("l_quantity"), 10000L).as("l_quantity"),
          fixed(col("l_extendedprice"), 10000L).as("l_extendedprice"),
          fixed(col("l_discount"), 10000L).as("l_discount"),
          fixed(col("l_tax"), 10000L).as("l_tax"))
        .unpivot(Array.empty, "metric", "v10k")
        .groupBy("metric")
        .agg(count(lit(1)).as("n"),
          sum("v10k").as("sum_10k"),
          min("v10k").as("min_10k"), max("v10k").as("max_10k"))
        .orderBy("metric")
    },

    // R30 — LATERAL correlated subquery join: "for each customer, its
    // top-3 orders" stated as the ANSI LATERAL form (the parser/
    // analyzer surface r17 exercises, extended to correlation in the
    // FROM clause — what an application generates when the per-row
    // subquery is the natural spelling). Catalyst DECORRELATES the
    // correlated ORDER BY ... LIMIT into a per-key window under the
    // hood, so the plan is the same rank-filter shape as r20's
    // TopKPerKey oracle — stated here from the other direction: the
    // SQL surface in, the decorrelated plan out. Slice: MACHINERY
    // customers with c_custkey % 10 = 0 (bounded output, still
    // hundreds of rows at the gate SF); all-integer cents; full
    // ordering inside the LIMIT so the top-3 is deterministic.
    Q(
      "r30_lateral_topk",
      """SELECT c.c_custkey, t.o_orderkey, t.cents
        |FROM customer c, LATERAL (
        |  SELECT o.o_orderkey, CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders o WHERE o.o_custkey = c.c_custkey
        |  ORDER BY cents DESC, o.o_orderkey LIMIT 3) t
        |WHERE c.c_mktsegment = 'MACHINERY' AND c.c_custkey % 10 = 0
        |ORDER BY c.c_custkey, cents DESC, t.o_orderkey""".stripMargin
    ) { (spark, dir) =>
      Seq("customer", "orders")
        .foreach(t => Tables(spark, dir, t).createOrReplaceTempView(s"graft_$t"))
      spark.sql(
        """SELECT c.c_custkey, t.o_orderkey, t.cents
          |FROM graft_customer c, LATERAL (
          |  SELECT o.o_orderkey, CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
          |  FROM graft_orders o WHERE o.o_custkey = c.c_custkey
          |  ORDER BY cents DESC, o.o_orderkey LIMIT 3) t
          |WHERE c.c_mktsegment = 'MACHINERY' AND c.c_custkey % 10 = 0
          |ORDER BY c.c_custkey, cents DESC, t.o_orderkey""".stripMargin)
    },

    // R29 — the ANSI FILTER-clause aggregate battery plus the boolean
    // and conditional aggregates (count_if, bool_and, bool_or) — the
    // "pivoted metrics in one pass" idiom every reporting query uses
    // instead of N self-joins: each aggregate sees its own predicate
    // slice while the table is scanned ONCE. All money flows through
    // exact integer cents (the Cols.fixed discipline); booleans are
    // CAST to BIGINT on both engines (value-identical, and the gate
    // never has to trust boolean type rendering); the per-group argmax
    // order key packs (cents, orderkey) into one BIGINT with a 10^11
    // multiplier — BOTH bounds documented (ADVICE r11): overflow needs
    // cents × 10^11 + key < 2^63, and TPC-H cents ≤ ~6·10^7 gives
    // 6·10^18 < 9.2·10^18; unpack needs o_orderkey < 10^11, and
    // orderkeys reach SF·6·10^6, so the pack is exact through SF ≈
    // 16,000 (the old 10^8 multiplier silently corrupted the argmax
    // from SF ≈ 17). max() is deterministic without struct comparison
    // semantics. One scan, one partial-agged shuffle on 5 priorities
    // at any scale.
    Q(
      "r29_filtered_aggs",
      """WITH o AS (SELECT o_orderpriority, o_orderstatus, o_orderkey,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS cents FROM orders)
        |SELECT o_orderpriority,
        |  count(*) AS n,
        |  count(*) FILTER (WHERE cents > 10000000) AS n_big,
        |  CAST(COALESCE(SUM(cents) FILTER (WHERE o_orderstatus = 'F'), 0) AS BIGINT) AS cents_f,
        |  CAST(count_if(o_orderstatus = 'O') AS BIGINT) AS n_open,
        |  CAST(bool_and(cents > 0) AS BIGINT) AS all_pos,
        |  CAST(bool_or(o_orderstatus = 'P') AS BIGINT) AS any_p,
        |  CAST(max(cents * 100000000000 + o_orderkey) % 100000000000 AS BIGINT) AS top_orderkey
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (spark, dir) =>
      Tables.fanOut(Tables(spark, dir, "orders"))
        .select(col("o_orderpriority"), col("o_orderstatus"), col("o_orderkey"),
          fixed(col("o_totalprice"), 100L).as("cents"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          expr("count(*) FILTER (WHERE cents > 10000000)").as("n_big"),
          expr("CAST(COALESCE(SUM(cents) FILTER (WHERE o_orderstatus = 'F'), 0) AS BIGINT)")
            .as("cents_f"),
          expr("count_if(o_orderstatus = 'O')").as("n_open"),
          expr("CAST(bool_and(cents > 0) AS BIGINT)").as("all_pos"),
          expr("CAST(bool_or(o_orderstatus = 'P') AS BIGINT)").as("any_p"),
          expr("CAST(max(cents * 100000000000L + o_orderkey) % 100000000000L AS BIGINT)")
            .as("top_orderkey"))
        .orderBy("o_orderpriority")
    }
  )
}
