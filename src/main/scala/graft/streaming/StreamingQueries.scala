package graft.streaming

import graft.core.Cols._
import graft.core.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming semantics S1-S4 in their oracle-checked batch forms
  * (SURVEY.md §2C: the streaming runs themselves are asserted equal to
  * these in the test suite; the batch forms are what the DuckDB gate
  * hashes). Window starts are epoch-aligned, so they serialize as epoch
  * microseconds on both engines.
  */
object StreamingQueries {

  val all: Seq[Q] = Seq(

    // S1 — tumbling 1-hour window.
    Q(
      "s1_tumbling_window",
      """SELECT epoch_us(date_trunc('hour', ts)) AS ws_us, event_type, count(*) AS cnt,
        |  SUM(CAST(round(value*10000) AS BIGINT)) / 10000.0 AS val
        |FROM events GROUP BY 1, 2 ORDER BY ws_us, event_type""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), (sum(fixed(col("value"), 10000)) / 10000.0).as("val"))
        .select(epochUs(col("w.start")).as("ws_us"), col("event_type"), col("cnt"), col("val"))
        .orderBy("ws_us", "event_type")
    },

    // S2 — sliding 1-hour window every 15 minutes (4 windows per event).
    Q(
      "s2_sliding_window",
      """WITH w AS (
        |  SELECT (epoch_us(ts) // 900000000) * 900000000 - k * 900000000 AS ws_us, event_type, value
        |  FROM events, range(0, 4) t(k))
        |SELECT ws_us, event_type, count(*) AS cnt,
        |  SUM(CAST(round(value*10000) AS BIGINT)) / 10000.0 AS val
        |FROM w GROUP BY 1, 2 ORDER BY ws_us, event_type""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), (sum(fixed(col("value"), 10000)) / 10000.0).as("val"))
        .select(epochUs(col("w.start")).as("ws_us"), col("event_type"), col("cnt"), col("val"))
        .orderBy("ws_us", "event_type")
    },

    // S3 — session windows per user, 30-minute gap. Spark runs the real
    // session_window operator; the oracle is the equivalent
    // lag+cumulative-flag island query (new session iff gap >= 30 min,
    // matching session_window's [first, last+gap) merge rule).
    Q(
      "s3_session_windows",
      """WITH o AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts, value,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o),
        |g AS (SELECT user_id, sid, count(*) AS n_ev,
        |    epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us,
        |    SUM(CAST(round(value*10000) AS BIGINT)) AS vc
        |  FROM s GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions, CAST(SUM(n_ev) AS BIGINT) AS total_events,
        |  CAST(max(dur_us) AS BIGINT) AS max_dur_us, SUM(vc) / 10000.0 AS val
        |FROM g GROUP BY 1 ORDER BY user_id""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
        .agg(count(lit(1)).as("n_ev"),
          (epochUs(max(col("ts"))) - epochUs(min(col("ts")))).as("dur_us"),
          sum(fixed(col("value"), 10000)).as("vc"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), sum("n_ev").as("total_events"),
          max("dur_us").as("max_dur_us"), (sum("vc") / 10000.0).as("val"))
        .orderBy("user_id")
    },

    // S4 — watermark late-data semantics: arrival order = event_id; an
    // event is dropped iff its ts is > 30 min behind the running max ts
    // of all previously-arrived events. Survivors aggregate tumbling.
    // (The global running max mirrors the driver-side watermark state of
    // a streaming run; the streaming variant uses withWatermark.)
    Q(
      "s4_watermark_drop",
      """WITH f AS (
        |  SELECT ts, event_type, value,
        |    max(ts) OVER (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
        |  FROM events)
        |SELECT epoch_us(date_trunc('hour', ts)) AS ws_us, event_type, count(*) AS cnt,
        |  SUM(CAST(round(value*10000) AS BIGINT)) / 10000.0 AS val
        |FROM f WHERE wm IS NULL OR ts >= wm - INTERVAL 30 MINUTE
        |GROUP BY 1, 2 ORDER BY ws_us, event_type""".stripMargin
    ) { (spark, dir) =>
      // Scale note: the unpartitioned running max mirrors the DRIVER-side
      // watermark scalar of a streaming run — it exists only in this
      // batch-oracle form. At 100 TB this semantic runs as the streaming
      // variant (StreamOps.tumblingWithWatermark), where the watermark is
      // O(1) state and no global sort happens; the batch form stays for
      // the deterministic oracle gate.
      val wm = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, -1)
      Tables(spark, dir, "events")
        .withColumn("wm", max(col("ts")).over(wm))
        .filter(col("wm").isNull || col("ts") >= col("wm") - expr("INTERVAL 30 MINUTES"))
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), (sum(fixed(col("value"), 10000)) / 10000.0).as("val"))
        .select(epochUs(col("w.start")).as("ws_us"), col("event_type"), col("cnt"), col("val"))
        .orderBy("ws_us", "event_type")
    }
  )
}
