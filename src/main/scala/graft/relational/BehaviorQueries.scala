package graft.relational

import graft.core.Cols._
import graft.core.{Q, Tables}
import graft.ops.AsOfJoin
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over the events stream (SURVEY.md §2C extended
  * surface): ordered funnels, session transition graphs, time-grid
  * forward fill, and cohort retention — the query family a product or
  * training-telemetry warehouse runs daily over exactly this schema.
  *
  * Scale shape shared by all four: ONE shuffle on user_id services
  * every per-user computation (windows keyed on user_id or refinements
  * of it reuse the exchange — HashPartitioning(user_id) satisfies any
  * ClusteredDistribution it prefixes), per-stage aggregates are
  * |users|-sized, and nothing ever materializes a cross join or a
  * corpus-sized collect. Time arithmetic is integer micros end to end
  * (unix_micros both engines) — no calendar semantics, no doubles.
  */
object BehaviorQueries {

  private val SessionGapUs = 1800000000L // 30 min
  private val HourUs = 3600000000L
  private val WeekUs = 604800000000L

  val all: Seq[Q] = Seq(

    // X41 — ordered conversion funnel view → click → purchase. Each
    // stage is "first qualifying event strictly after the previous
    // stage's instant", not a mere existence check — the ordering
    // constraint is what makes funnels hard to push into one GROUP BY.
    // Implementation: three chained per-user min-aggregates, each over
    // a type-filtered slice (the filter reaches the scan), joined on
    // user_id. Latency totals are exact integer micros sums.
    Q(
      "x41_event_funnel",
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
        |SELECT 'stage1_view' AS stage, count(*) AS users,
        |       CAST(0 AS BIGINT) AS total_latency_us FROM v
        |UNION ALL
        |SELECT 'stage2_click', count(*),
        |       CAST(SUM(epoch_us(c.t2) - epoch_us(v.t1)) AS BIGINT)
        |FROM c JOIN v ON v.user_id = c.user_id
        |UNION ALL
        |SELECT 'stage3_purchase', count(*),
        |       CAST(SUM(epoch_us(p.t3) - epoch_us(c.t2)) AS BIGINT)
        |FROM p JOIN c ON c.user_id = p.user_id
        |ORDER BY stage""".stripMargin
    ) { (spark, dir) =>
      val e = Tables(spark, dir, "events")
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val c = e.filter(col("event_type") === "click").as("e")
        .join(v.as("v"), col("e.user_id") === col("v.user_id"))
        .filter(col("e.ts") > col("t1"))
        .groupBy(col("e.user_id").as("user_id")).agg(min("e.ts").as("t2"))
      val p = e.filter(col("event_type") === "purchase").as("e")
        .join(c.as("c"), col("e.user_id") === col("c.user_id"))
        .filter(col("e.ts") > col("t2"))
        .groupBy(col("e.user_id").as("user_id")).agg(min("e.ts").as("t3"))
      val s1 = v.agg(count(lit(1)).as("users"))
        .select(lit("stage1_view").as("stage"), col("users"),
          lit(0L).as("total_latency_us"))
      val s2 = c.join(v, "user_id")
        .agg(count(lit(1)).as("users"),
          sum(epochUs(col("t2")) - epochUs(col("t1"))).as("total_latency_us"))
        .select(lit("stage2_click").as("stage"), col("users"),
          col("total_latency_us"))
      val s3 = p.join(c, "user_id")
        .agg(count(lit(1)).as("users"),
          sum(epochUs(col("t3")) - epochUs(col("t2"))).as("total_latency_us"))
        .select(lit("stage3_purchase").as("stage"), col("users"),
          col("total_latency_us"))
      s1.unionByName(s2).unionByName(s3).orderBy("stage")
    },

    // X42 — session transition matrix: gap-based sessionization (30-min
    // silence closes a session — the batch twin of s3's streaming
    // sessions), then consecutive-event bigrams within each session,
    // counted into the event-type transition matrix. Three windows, all
    // refinements of the user_id partitioning → one exchange total.
    // Frames are explicit ROWS (not RANGE) so both engines walk the
    // identical prefix; ordering ties are broken by event_id.
    Q(
      "x42_session_transitions",
      """WITH o AS (SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS sess FROM o),
        |t AS (SELECT event_type AS src, lead(event_type) OVER (
        |    PARTITION BY user_id, sess ORDER BY ts, event_id) AS dst FROM s)
        |SELECT src, dst, count(*) AS n FROM t WHERE dst IS NOT NULL
        |GROUP BY 1, 2 ORDER BY n DESC, src, dst""".stripMargin
    ) { (spark, dir) =>
      val wUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wRun = wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val o = Tables(spark, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("brk",
          when(lag(col("ts"), 1).over(wUser).isNull
              .or(epochUs(col("ts")) - lag(epochUs(col("ts")), 1).over(wUser)
                > SessionGapUs), 1)
            .otherwise(0))
        .withColumn("sess", sum("brk").over(wRun))
      val wSess = Window.partitionBy("user_id", "sess").orderBy("ts", "event_id")
      o.withColumn("dst", lead(col("event_type"), 1).over(wSess))
        .filter(col("dst").isNotNull)
        .groupBy(col("event_type").as("src"), col("dst"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("src"), col("dst"))
    },

    // X43 — time-grid forward fill (gap-fill/resample): every user gets
    // an hourly grid spanning their observed range, and each grid
    // instant carries the latest event value as of that instant — the
    // "latest state per key per tick" materialization a feature-store
    // backfill produces. The fill is AsOfJoin.backward (union + running
    // last-ignoreNulls window — ONE shuffle, linear state; never a
    // probe×event range join). The gate audits per user: grid size,
    // filled count, integer ten-thousandths value sum, last fill
    // instant — so a wrong fill anywhere lands in some user's row.
    Q(
      "x43_forward_fill",
      """WITH b AS (SELECT user_id,
        |    epoch_us(min(ts)) // 3600000000 AS h0,
        |    epoch_us(max(ts)) // 3600000000 AS h1
        |  FROM events GROUP BY 1),
        |g AS (SELECT user_id, unnest(generate_series(h0, h1)) AS hb FROM b),
        |f AS (SELECT g.user_id, g.hb,
        |    max(e.ts) AS ats, arg_max(e.value, e.ts) AS av
        |  FROM g LEFT JOIN events e ON e.user_id = g.user_id
        |    AND e.ts <= make_timestamp(g.hb * 3600000000)
        |  GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_points,
        |  count(ats) AS n_filled,
        |  SUM(CAST(round(av * 10000) AS BIGINT)) / 10000.0 AS v_sum,
        |  max(epoch_us(ats)) AS last_fill_us
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (spark, dir) =>
      val e = Tables(spark, dir, "events")
      // `div` (true integer division) — NOT `/`, which is double
      // division on longs and can truncate across an integer boundary
      // where DuckDB's `//` floors exactly (the r6 hour-bin pattern).
      val grid = e.groupBy("user_id")
        .agg(min("ts").as("mn"), max("ts").as("mx"))
        .select(col("user_id"),
          expr(s"unix_micros(mn) div $HourUs").as("h0"),
          expr(s"unix_micros(mx) div $HourUs").as("h1"))
        .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("hb"))
        .withColumn("gts", timestamp_micros(col("hb") * HourUs))
      AsOfJoin.backward(grid,
          e.select(col("user_id"), col("ts"), col("value")),
          key = "user_id", probeTs = "gts", eventTs = "ts",
          eventPayload = Seq("value"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_points"),
          count(col("asof_ts")).as("n_filled"),
          sumFixed(col("asof_value"), 10000).as("v_sum"),
          max(epochUs(col("asof_ts"))).as("last_fill_us"))
        .orderBy("user_id")
    },

    // X44 — cohort retention matrix: users cohorted by signup week,
    // activity bucketed by whole-week offset from that cohort week,
    // distinct-actives and event counts per cell. Week keys are plain
    // integer division of epoch micros — identical arithmetic in both
    // engines, no calendar/locale semantics to diverge on. Two
    // |users|-keyed shuffles; the signup table is a per-user aggregate
    // (broadcast-sized relative to events at any SF).
    Q(
      "x44_retention_cohort",
      """WITH su AS (SELECT user_id,
        |    min(epoch_us(ts)) // 604800000000 AS cw
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |act AS (SELECT e.user_id, su.cw,
        |    epoch_us(e.ts) // 604800000000 - su.cw AS wk
        |  FROM events e JOIN su ON su.user_id = e.user_id
        |  WHERE epoch_us(e.ts) // 604800000000 >= su.cw)
        |SELECT cw AS cohort_week, wk AS week_offset,
        |  count(DISTINCT user_id) AS active_users, count(*) AS n_events
        |FROM act GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) { (spark, dir) =>
      val e = Tables(spark, dir, "events")
      val su = e.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("mn"))
        .select(col("user_id"), expr(s"unix_micros(mn) div $WeekUs").as("cw"))
      e.select(col("user_id"), expr(s"unix_micros(ts) div $WeekUs").as("ew"))
        .join(su, "user_id")
        .filter(col("ew") >= col("cw"))
        .groupBy(col("cw").as("cohort_week"), (col("ew") - col("cw")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("active_users"),
          count(lit(1)).as("n_events"))
        .orderBy("cohort_week", "week_offset")
    },

    // X54 — streaming-telemetry ANOMALY DETECTION: flag any event
    // whose value sits more than 3 sigma from its user's trailing
    // 24-event window (at least 8 priors required). The |z| > 3 test
    // is evaluated WITHOUT division or sqrt — (n·x − S)² > 9·(n·Q − S²)
    // over exact integer ten-thousandths (S = trailing sum, Q =
    // trailing sum of squares) — so both engines compare identical
    // integers; bounds: observed |v| reaches ~4.9e6 ten-thousandths,
    // n ≤ 24 ⇒ dev² reaches ~5.5e16 — beyond a double's 2^52
    // exact-integer range but comfortably inside INT64, which is why
    // both engines MUST stay in integer arithmetic. Shape: the standard
    // one-exchange window family — all three trailing aggregates
    // share one frame over one user_id partition sort, state per
    // partition is the 24-row frame, and at 100 TB this is exactly
    // the per-key bounded-state scan a telemetry pipeline wants
    // (streaming twin: mapGroupsWithState with a 24-deep ring
    // buffer).
    Q(
      "x54_value_anomaly",
      """WITH e AS (SELECT event_id, user_id, ts,
        |    CAST(round(value * 10000) AS BIGINT) AS v FROM events),
        |w AS (SELECT event_id, user_id, ts, v,
        |    CAST(count(v) OVER win AS BIGINT) AS n,
        |    SUM(v) OVER win AS s,
        |    SUM(v * v) OVER win AS q
        |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, epoch_us(ts) AS ts_us, v, n
        |FROM w WHERE n >= 8 AND (n*v - s)*(n*v - s) > 9*(n*q - s*s)
        |ORDER BY event_id""".stripMargin
    ) { (spark, dir) =>
      val win = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id")).rowsBetween(-24, -1)
      val dev = col("n") * col("v") - col("s")
      Tables(spark, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"),
          fixed(col("value"), 10000L).as("v"))
        .withColumn("n", count("v").over(win))
        .withColumn("s", sum("v").over(win))
        .withColumn("q", sum(col("v") * col("v")).over(win))
        .filter(col("n") >= 8 &&
          dev * dev > lit(9L) * (col("n") * col("q") - col("s") * col("s")))
        .select(col("event_id"), col("user_id"), epochUs(col("ts")).as("ts_us"),
          col("v"), col("n"))
        .orderBy("event_id")
    }
  )
}
