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

  /** s6's completed-session oracle — sessions finalized either by a
    * successor session (sid < last_sid) or by the terminal watermark
    * passing end + gap. Shared VERBATIM by s20, whose
    * transformWithState processor must emit the identical set. */
  private val completedSessionsSql =
    """WITH o AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (SELECT user_id, ts,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM o),
      |g AS (SELECT user_id, sid, epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us,
      |    count(*) AS n_ev
      |  FROM s GROUP BY 1, 2),
      |g2 AS (SELECT *, max(sid) OVER (PARTITION BY user_id) AS last_sid FROM g),
      |m AS (SELECT (epoch_us(max(ts)) // 1000) - 1800000 AS wm_ms FROM events)
      |SELECT user_id, start_us, end_us, n_ev FROM g2, m
      |WHERE sid < last_sid OR wm_ms > (end_us // 1000) + 1800000
      |ORDER BY user_id, start_us""".stripMargin

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
      // The global running max over arrival order (event_id) is computed
      // in TWO passes so no stage is a single-task global sort: (1) an
      // intra-bucket running max, windowed per event_id div 4096 bucket —
      // fully parallel; (2) a prefix max over the per-bucket maxima — a
      // window over the tiny bucket table (rows = events/4096), broadcast
      // back. wm(e) = max of both; identical to the one-pass definition.
      // (The streaming variant, StreamOps.tumblingWithWatermark, keeps
      // the watermark as O(1) state instead; this is the batch form.)
      val bucket = expr("event_id div 4096")
      val intra = Window.partitionBy("bkt").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val prefix = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
      val ev = Tables(spark, dir, "events").withColumn("bkt", bucket)
      val bucketPrefix = ev.groupBy("bkt").agg(max(col("ts")).as("bmax"))
        .withColumn("pmax", max(col("bmax")).over(prefix))
        .select("bkt", "pmax")
      ev.join(broadcast(bucketPrefix), "bkt")
        .withColumn("wm", greatest(max(col("ts")).over(intra), col("pmax")))
        .filter(col("wm").isNull || col("ts") >= col("wm") - expr("INTERVAL 30 MINUTES"))
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), (sum(fixed(col("value"), 10000)) / 10000.0).as("val"))
        .select(epochUs(col("w.start")).as("ws_us"), col("event_type"), col("cnt"), col("val"))
        .orderBy("ws_us", "event_type")
    },

    // S5 — a REAL streaming run, oracle-gated end to end (not a batch
    // form): events arrive as parquet files in two time-split chunks,
    // StreamOps.tumblingWithWatermark streams them append-mode into a
    // parquet sink, and the query's result is the sink read back.
    // Append mode emits exactly the windows finalized by the last
    // watermark = ms-floored global max event time minus 30 min (the
    // watermark tracker works in milliseconds), so the oracle is the
    // batch hourly aggregate restricted to windows whose end is at or
    // below it. Chunked arrival exercises a mid-stream watermark
    // advance; the emitted SET is chunking-independent — the watermark
    // depends only on the global max ts — which is what makes a
    // streaming run hashable at all.
    //
    // ARRIVAL MECHANICS (round 6): both chunks are written before the
    // stream starts, chunk 1's files stamped 10 min older, and the
    // source capped at maxFilesPerTrigger = chunk 1's file count — the
    // file source processes oldest-first, so batch 0 is exactly chunk
    // 1, batch 1 is chunk 2 (planned AFTER batch 0's watermark advance
    // — the same mid-stream semantics), and one trailing no-data batch
    // flushes the terminal watermark. Same batches, same hashes as the
    // old write-poll-write-poll loop, minus one no-data batch and one
    // processAllAvailable round trip (~0.5 s of the measured ~2.9 s
    // structural floor; the rest is per-batch commit machinery —
    // BASELINE.md round-6 note).
    Q(
      "s5_stream_hourly_finalized",
      """WITH m AS (
        |  SELECT (epoch_us(max(ts)) // 1000) * 1000 - 1800000000 AS wm_us FROM events),
        |agg AS (
        |  SELECT epoch_us(date_trunc('hour', ts)) AS ws_us, event_type, count(*) AS cnt,
        |    SUM(CAST(round(value*10000) AS BIGINT)) / 10000.0 AS val
        |  FROM events GROUP BY 1, 2)
        |SELECT ws_us, event_type, cnt, val FROM agg, m
        |WHERE ws_us + 3600000000 <= wm_us
        |ORDER BY ws_us, event_type""".stripMargin
    ) { (spark, dir) =>
      val events = Tables(spark, dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      val in = TempWork.dir("graft_s5_in")
      val out = TempWork.dir("graft_s5_out")
      val ckpt = TempWork.dir("graft_s5_ck")
      // Chunk the arrival BY TIME, not arbitrarily: after chunk 1 the
      // watermark sits 30 min behind chunk 1's max ts, and any chunk-2
      // row older than that would be dropped as late — silently thinning
      // the counts vs the all-events oracle. Splitting at the midpoint
      // of the time range keeps every chunk-2 row ahead of the chunk-1
      // watermark, so nothing is late and the oracle stays exact. The
      // min/max fetch collects two scalars (bounded, driver-safe).
      val b = events.agg(min("ts").as("mn"), max("ts").as("mx")).head()
      val midMs = b.getTimestamp(0).getTime +
        (b.getTimestamp(1).getTime - b.getTimestamp(0).getTime) / 2
      val mid = lit(new java.sql.Timestamp(midMs))
      // parquet chunks, not json: exact microsecond ts roundtrip and a
      // cheaper write — the arrival format a real feed would use.
      // repartition(4) — not coalesce(4) — so BOTH chunks produce
      // EXACTLY 4 files by construction (coalesce yields ≤4 depending
      // on upstream partitioning; if chunk 2 had ever produced more
      // files than chunk 1, maxFilesPerTrigger = chunk1 would split
      // chunk 2 across triggers and break the in-order per-chunk
      // arrival contract the stateful queries assume — ADVICE r7).
      // A feed chunk stays a handful of files, not one per scan task:
      // fewer file-source listings per micro-batch at zero parallelism
      // loss for a 100k-row arrival chunk.
      events.filter(col("ts") < mid).repartition(4).write.mode("append").parquet(in)
      val chunk1 = TempWork.stampOlder(in)
      events.filter(col("ts") >= mid).repartition(4).write.mode("append").parquet(in)
      // The stream runs on its own CHILD session (shared SparkContext
      // and extensions, isolated SQLConf): the state-store width is
      // frozen from spark.sql.shuffle.partitions at stream start, and
      // 32 stores for a few thousand (window, type) keys is pure
      // per-batch commit overhead (3 batches x 32 commits) — but
      // narrowing it must not touch the caller's session, which may be
      // running other queries concurrently (ADVICE r4). A production
      // feed with real key volume would keep the default width.
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val stream = ss.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", chunk1.toString).parquet(in)
      try {
        val q = StreamOps.tumblingWithWatermark(stream).writeStream
          .format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
        try q.processAllAvailable()
        finally q.stop()
      } finally {
        // The full events copy (arrival) and the checkpoint die with
        // the stream; only the small sink outlives the query (the
        // returned DataFrame reads it lazily — JVM-exit cleanup).
        TempWork.delete(in)
        TempWork.delete(ckpt)
      }
      spark.read.parquet(out)
        .select("ws_us", "event_type", "cnt", "val")
        .orderBy("ws_us", "event_type")
    },

    // S6 — completed-session finalization, oracle-gated end to end: the
    // flatMapGroupsWithState emitter (custom per-user state, the
    // hardest streaming shape) streams two time-split parquet chunks
    // into an append parquet sink. A session row is emitted when (a) a
    // later event of the same user arrives >= 30 min after its last
    // event — the in-stream close — or (b) the event-time timeout
    // fires, which happens exactly when the terminal watermark
    // (ms-floored global max ts - 30 min) passes STRICTLY beyond
    // ms-floored last_ts + 30 min. So the oracle is the batch islands
    // query minus each user's final island unless that island clears
    // the timeout predicate. Time-split arrival preserves the
    // emitter's in-order contract across batches (chunk 1 is stamped
    // older + maxFilesPerTrigger caps batch 0 at chunk 1 — the s5
    // single-start arrival mechanics, same semantics as the old
    // write-poll-write-poll loop).
    Q(
      "s6_completed_sessions", completedSessionsSql
    ) { (spark, dir) =>
      val events = Tables(spark, dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      val in = TempWork.dir("graft_s6_in")
      val out = TempWork.dir("graft_s6_out")
      val ckpt = TempWork.dir("graft_s6_ck")
      val b = events.agg(min("ts").as("mn"), max("ts").as("mx")).head()
      val midMs = b.getTimestamp(0).getTime +
        (b.getTimestamp(1).getTime - b.getTimestamp(0).getTime) / 2
      val mid = lit(new java.sql.Timestamp(midMs))
      events.filter(col("ts") < mid).repartition(4).write.mode("append").parquet(in)
      val chunk1 = TempWork.stampOlder(in)
      events.filter(col("ts") >= mid).repartition(4).write.mode("append").parquet(in)
      // Child session with narrowed state width — see s5.
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val stream = {
        import ss.implicits._
        ss.readStream.schema(events.schema)
          .option("maxFilesPerTrigger", chunk1.toString).parquet(in).as[Event]
      }
      try {
        val q = StreamOps.completedSessions(stream).writeStream
          .format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
        try q.processAllAvailable()
        finally q.stop()
      } finally {
        TempWork.delete(in)
        TempWork.delete(ckpt)
      }
      spark.read.parquet(out)
        .select("user_id", "start_us", "end_us", "n_ev")
        .orderBy("user_id", "start_us")
    },

    // S7 — streaming exact dedup, oracle-gated end to end: the
    // "drop replayed events" ingest stage (StreamOps.dedupe —
    // dropDuplicatesWithinWatermark keyed on event_id, state bounded
    // by the 30-minute watermark) run as a REAL append-mode stream
    // whose arrival REPLAYS a slice: chunk 1 is the first half of the
    // time range, chunk 2 is the second half PLUS a re-send of the
    // last 15 minutes of chunk 1 (s5's single-start two-chunk arrival
    // mechanics: chunk 1 stamped older + maxFilesPerTrigger). The
    // replayed rows arrive in batch 1 with event times ahead of the
    // batch-0 watermark (range-midpoint minus 30 min), so they are
    // NOT dropped as late — they reach the dedup state and are
    // suppressed as duplicates, which is the semantics under test.
    // The emitted set is therefore exactly the distinct events, so
    // the oracle is simply the events table itself — the one
    // streaming query whose oracle needs no window arithmetic at all.
    // State discipline at 100 TB/day: an id is remembered only until
    // the watermark passes its event time plus the delay, so state
    // tracks the late-data horizon, not stream history.
    Q(
      "s7_stream_dedup",
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin
    ) { (spark, dir) =>
      val events = Tables(spark, dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      val in = TempWork.dir("graft_s7_in")
      val out = TempWork.dir("graft_s7_out")
      val ckpt = TempWork.dir("graft_s7_ck")
      val b = events.agg(min("ts").as("mn"), max("ts").as("mx")).head()
      val minMs = b.getTimestamp(0).getTime
      val midMs = minMs + (b.getTimestamp(1).getTime - minMs) / 2
      val mid = lit(new java.sql.Timestamp(midMs))
      // Replay horizon: 15 min (capped at a quarter of the first
      // half's span for tiny fixtures) — inside the 30-min watermark
      // delay, so every replayed row survives the late filter and the
      // dedup state must do the suppressing.
      val overlapMs = math.min(900000L, (midMs - minMs) / 4)
      val repl = lit(new java.sql.Timestamp(midMs - overlapMs))
      events.filter(col("ts") < mid).repartition(4).write.mode("append").parquet(in)
      val chunk1 = TempWork.stampOlder(in)
      events.filter(col("ts") >= repl).repartition(4).write.mode("append").parquet(in)
      // Child session with narrowed state width — see s5.
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val stream = ss.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", chunk1.toString).parquet(in)
      try {
        val q = StreamOps.dedupe(stream)
          .select(col("event_id"), epochUs(col("ts")).as("ts_us"),
            col("user_id"), col("event_type"), col("value"))
          .writeStream
          .format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
        try q.processAllAvailable()
        finally q.stop()
      } finally {
        TempWork.delete(in)
        TempWork.delete(ckpt)
      }
      spark.read.parquet(out)
        .select("event_id", "ts_us", "user_id", "event_type", "value")
        .orderBy("event_id")
    },

    // S8 — stream-stream interval join, oracle-gated end to end: the
    // hardest stateful shape after flatMapGroupsWithState — BOTH sides
    // unbounded, the join buffering each side until the other side's
    // watermark proves no more matches can arrive. StreamOps.eventPairs
    // (watermarked 30 min both sides, event-time bounded both ways)
    // self-joins the events feed: pairs of same-user events with
    // ts2 in [ts1, ts1+1h], id1 < id2. Arrival is the s5 single-start
    // two-chunk mechanics. WHY THE EMITTED SET IS EXACTLY THE BATCH
    // JOIN: inner stream-stream joins emit eagerly on match (nothing
    // waits for the watermark), so the only way to lose a pair is
    // state eviction between batches — a buffered row expires once the
    // watermark passes ts + 1h (the join's event-time bound), i.e.
    // after batch 0 only rows with ts < mid - 90min are gone; every
    // chunk-2 row's partners satisfy ts1 >= ts2 - 1h >= mid - 1h, so
    // no qualifying pair ever meets an evicted partner, and each pair
    // matches exactly once (Spark's inner-join guarantee, asserted
    // against the batch plan in FileStreamSpec). State at 100 TB/day:
    // each side buffers a ~90-minute slice (watermark delay + join
    // range), independent of stream history.
    Q(
      "s8_stream_pairs",
      """SELECT a.user_id AS user_id, a.event_id AS id1, b.event_id AS id2
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND b.ts >= a.ts
        |  AND b.ts <= a.ts + INTERVAL 1 HOUR AND a.event_id < b.event_id
        |ORDER BY a.user_id, id1, id2""".stripMargin
    ) { (spark, dir) =>
      val events = Tables(spark, dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      val in = TempWork.dir("graft_s8_in")
      val out = TempWork.dir("graft_s8_out")
      val ckpt = TempWork.dir("graft_s8_ck")
      val b = events.agg(min("ts").as("mn"), max("ts").as("mx")).head()
      val midMs = b.getTimestamp(0).getTime +
        (b.getTimestamp(1).getTime - b.getTimestamp(0).getTime) / 2
      val mid = lit(new java.sql.Timestamp(midMs))
      events.filter(col("ts") < mid).repartition(4).write.mode("append").parquet(in)
      val chunk1 = TempWork.stampOlder(in)
      events.filter(col("ts") >= mid).repartition(4).write.mode("append").parquet(in)
      // Child session with narrowed state width — see s5.
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val stream = ss.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", chunk1.toString).parquet(in)
      try {
        val q = StreamOps.eventPairs(stream, stream).writeStream
          .format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
        try q.processAllAvailable()
        finally q.stop()
      } finally {
        TempWork.delete(in)
        TempWork.delete(ckpt)
      }
      spark.read.parquet(out)
        .select("user_id", "id1", "id2")
        .orderBy("user_id", "id1", "id2")
    },

    // S10 — LEFT-OUTER stream-stream interval join, oracle-gated end
    // to end: s8's join with the semantics production asks for next —
    // "and which events never found a partner?" (unanswered requests,
    // abandoned carts, orphaned telemetry). The outer side makes the
    // WATERMARK CONTRACT itself part of the gated surface: an
    // unmatched left row can only be emitted once the right-side
    // watermark proves no partner can arrive (wm > ts1 + 1h, the
    // join's event-time upper bound), so the emitted set is
    //   (a) every matched pair — emitted eagerly, exactly the batch
    //       inner join (s8's argument), plus
    //   (b) every unmatched left row whose match horizon the FINAL
    //       watermark passed: ts1 + 1h < max(ts) - 30min. Left rows
    //       whose horizon the final watermark never crosses are still
    //       buffered when the stream stops — not emitted, by design —
    //       and the oracle's WHERE clause states exactly that line.
    // The -1 id2 sentinel stands in for NULL so the cross-engine hash
    // is immune to NULLS FIRST/LAST divergence. State at 100 TB/day:
    // identical to s8 — each side buffers a ~90-minute slice; the
    // outer flavor adds deferred emission, not state.
    Q(
      "s10_stream_left_outer",
      """WITH mx AS (SELECT epoch_us(max(ts)) AS m FROM events),
        |j AS (SELECT a.user_id, a.event_id AS id1, epoch_us(a.ts) AS t1,
        |    b.event_id AS id2
        |  FROM events a LEFT JOIN events b
        |    ON a.user_id = b.user_id AND b.ts >= a.ts
        |    AND b.ts <= a.ts + INTERVAL 1 HOUR AND a.event_id < b.event_id)
        |SELECT user_id, id1, COALESCE(id2, -1) AS id2
        |FROM j CROSS JOIN mx
        |WHERE id2 IS NOT NULL OR t1 + 3600000000 < m - 1800000000
        |ORDER BY user_id, id1, id2""".stripMargin
    ) { (spark, dir) =>
      val events = Tables(spark, dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      val in = TempWork.dir("graft_s10_in")
      val out = TempWork.dir("graft_s10_out")
      val ckpt = TempWork.dir("graft_s10_ck")
      val b = events.agg(min("ts").as("mn"), max("ts").as("mx")).head()
      val midMs = b.getTimestamp(0).getTime +
        (b.getTimestamp(1).getTime - b.getTimestamp(0).getTime) / 2
      val mid = lit(new java.sql.Timestamp(midMs))
      events.filter(col("ts") < mid).repartition(4).write.mode("append").parquet(in)
      val chunk1 = TempWork.stampOlder(in)
      events.filter(col("ts") >= mid).repartition(4).write.mode("append").parquet(in)
      // Child session with narrowed state width — see s5.
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val stream = ss.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", chunk1.toString).parquet(in)
      try {
        val q = StreamOps.eventPairsLeftOuter(stream, stream).writeStream
          .format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
        try q.processAllAvailable()
        finally q.stop()
      } finally {
        TempWork.delete(in)
        TempWork.delete(ckpt)
      }
      spark.read.parquet(out)
        .select("user_id", "id1", "id2")
        .orderBy("user_id", "id1", "id2")
    },

    // S9 — stream-static broadcast enrichment, oracle-gated end to
    // end: the "decorate the feed with reference data" stage every
    // production pipeline runs first. StreamOps.enriched joins each
    // micro-batch against the customer dimension (broadcast — no
    // shuffle of the stream, no state at all; the dim is re-read per
    // batch, so a slowly-changing dimension picks up changes between
    // batches). STATELESS means the append-mode sink receives exactly
    // one row per matched event regardless of chunking — no watermark
    // arithmetic, no finalization semantics — so the oracle is simply
    // the batch join. Arrival is the s5 two-chunk mechanics to prove
    // chunking-independence rather than assume it.
    Q(
      "s9_stream_enriched",
      """SELECT e.event_id, epoch_us(e.ts) AS ts_us, e.user_id,
        |  e.event_type, e.value, c.c_mktsegment
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |ORDER BY e.event_id""".stripMargin
    ) { (spark, dir) =>
      val events = Tables(spark, dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      val in = TempWork.dir("graft_s9_in")
      val out = TempWork.dir("graft_s9_out")
      val ckpt = TempWork.dir("graft_s9_ck")
      val b = events.agg(min("ts").as("mn"), max("ts").as("mx")).head()
      val midMs = b.getTimestamp(0).getTime +
        (b.getTimestamp(1).getTime - b.getTimestamp(0).getTime) / 2
      val mid = lit(new java.sql.Timestamp(midMs))
      events.filter(col("ts") < mid).repartition(4).write.mode("append").parquet(in)
      val chunk1 = TempWork.stampOlder(in)
      events.filter(col("ts") >= mid).repartition(4).write.mode("append").parquet(in)
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val stream = ss.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", chunk1.toString).parquet(in)
      // the static side lives on the SAME child session as the stream
      val customer = Tables(ss, dir, "customer")
      try {
        val q = StreamOps.enriched(stream, customer)
          .select(col("event_id"), epochUs(col("ts")).as("ts_us"),
            col("user_id"), col("event_type"), col("value"), col("c_mktsegment"))
          .writeStream
          .format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
        try q.processAllAvailable()
        finally q.stop()
      } finally {
        TempWork.delete(in)
        TempWork.delete(ckpt)
      }
      spark.read.parquet(out)
        .select("event_id", "ts_us", "user_id", "event_type", "value", "c_mktsegment")
        .orderBy("event_id")
    },

    // S11 — streaming upsert sink via foreachBatch: the production
    // "keep a keyed snapshot current from a stream" pattern (Delta/
    // Iceberg MERGE INTO, here emulated with versioned parquet
    // snapshots since the container has no table format). The
    // aggregation runs in UPDATE mode — each micro-batch emits only
    // the keys it changed, carrying their new CUMULATIVE totals — and
    // foreachBatch applies each delta transactionally: read the
    // previous snapshot, anti-join out the changed keys, union the
    // new rows, write snapshot_v{batchId}, then atomically advance
    // the "latest" pointer (a new directory per version = the swap is
    // the rename, never an in-place overwrite that readers could
    // observe half-written).
    // SCALE SHAPE: per refresh the cost is snapshot + delta — the
    // x51 incremental-maintenance story run continuously; the
    // aggregate state is keyed by (user_id, event_type), the
    // aggregate's own cardinality. The final snapshot is chunking-
    // independent (cumulative totals don't care how arrivals were
    // batched), which is exactly what the oracle checks: the last
    // snapshot must equal a from-scratch batch GROUP BY.
    Q(
      "s11_stream_upsert",
      """SELECT user_id, event_type, count(*) AS n_events,
        |  CAST(SUM(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS val_10k
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) { (spark, dir) =>
      val events = Tables(spark, dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      val in = TempWork.dir("graft_s11_in")
      val out = TempWork.dir("graft_s11_out")
      val ckpt = TempWork.dir("graft_s11_ck")
      val b = events.agg(min("ts").as("mn"), max("ts").as("mx")).head()
      val midMs = b.getTimestamp(0).getTime +
        (b.getTimestamp(1).getTime - b.getTimestamp(0).getTime) / 2
      val mid = lit(new java.sql.Timestamp(midMs))
      events.filter(col("ts") < mid).repartition(4).write.mode("append").parquet(in)
      val chunk1 = TempWork.stampOlder(in)
      events.filter(col("ts") >= mid).repartition(4).write.mode("append").parquet(in)
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val stream = ss.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", chunk1.toString).parquet(in)
      // foreachBatch runs sequentially on the driver; `latest` tracks
      // the current snapshot version across batches.
      @volatile var latest: Option[String] = None
      try {
        val q = StreamOps.keyedTotals(stream).writeStream
          .outputMode("update")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
            // the delta feeds two branches of the merge — pin it so
            // the stateful micro-batch plan isn't executed twice
            batch.persist()
            try {
              val sess = batch.sparkSession
              val vdir = s"$out/v$id"
              val merged = latest match {
                case None => batch
                case Some(prev) =>
                  val old = sess.read.parquet(prev)
                  old.join(batch.select(col("user_id").as("bu"),
                        col("event_type").as("bt")).distinct(),
                      col("user_id") === col("bu") &&
                        col("event_type") === col("bt"), "left_anti")
                    .unionByName(batch)
              }
              merged.coalesce(4).write.mode("overwrite").parquet(vdir)
              latest = Some(vdir)
            } finally batch.unpersist()
          }
          .start()
        try q.processAllAvailable()
        finally q.stop()
      } finally {
        TempWork.delete(in)
        TempWork.delete(ckpt)
      }
      spark.read.parquet(latest.getOrElse(sys.error("s11: no snapshot written")))
        .select("user_id", "event_type", "n_events", "val_10k")
        .orderBy("user_id", "event_type")
    },

    // S12 — streaming anomaly detection, oracle-gated end to end:
    // x54's trailing-window 3-sigma flagger run as a live stream —
    // StreamOps.anomalies keeps a per-user ring of the last ≤ 24
    // values (flatMapGroupsWithState, fixed ≤ 200-byte record per
    // user) and applies the identical division- and sqrt-free integer
    // test, so the streamed flag set hash-matches the BATCH query's
    // oracle verbatim. Arrival is the s5 single-start two-chunk
    // mechanics; the time-split guarantees per-user event-time order
    // across batches (chunk 1 wholly precedes chunk 2) and the
    // operator sorts within each batch, so the trailing window each
    // event sees is exactly the batch ROWS 24 PRECEDING frame. No
    // watermark: the detector never drops late data or expires trails
    // — its state is bounded by the RECORD size, not by key death.
    Q(
      "s12_stream_anomaly",
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
      val events = Tables(spark, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          fixed(col("value"), 10000L).as("v"))
      val in = TempWork.dir("graft_s12_in")
      val out = TempWork.dir("graft_s12_out")
      val ckpt = TempWork.dir("graft_s12_ck")
      val b = events.agg(min("ts").as("mn"), max("ts").as("mx")).head()
      val midMs = b.getTimestamp(0).getTime +
        (b.getTimestamp(1).getTime - b.getTimestamp(0).getTime) / 2
      val mid = lit(new java.sql.Timestamp(midMs))
      events.filter(col("ts") < mid).repartition(4).write.mode("append").parquet(in)
      val chunk1 = TempWork.stampOlder(in)
      events.filter(col("ts") >= mid).repartition(4).write.mode("append").parquet(in)
      // Child session with narrowed state width — see s5.
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      import ss.implicits._
      val stream = ss.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", chunk1.toString).parquet(in)
        .as[VEvent]
      try {
        val q = StreamOps.anomalies(stream).toDF().writeStream
          .format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
        try q.processAllAvailable()
        finally q.stop()
      } finally {
        TempWork.delete(in)
        TempWork.delete(ckpt)
      }
      spark.read.parquet(out)
        .select("event_id", "user_id", "ts_us", "v", "n")
        .orderBy("event_id")
    },

    // S13 — threshold edge alerting, oracle-gated end to end: one
    // alert per UPWARD CROSSING of 80.0 (per user), never one per
    // elevated sample — StreamOps.edgeAlerts keeps exactly ONE value
    // of state per user (the previous sample), the smallest possible
    // stateful-streaming footprint, and the batch oracle states the
    // identical semantics as a lag() window. Same two-chunk arrival
    // and in-order contract as s12. The pair (s12, s13) spans the
    // stateful-alerting spectrum: a bounded ring of history vs a
    // single carried sample.
    Q(
      "s13_stream_edge_alerts",
      """WITH e AS (SELECT event_id, user_id, ts,
        |    CAST(round(value * 10000) AS BIGINT) AS v FROM events),
        |w AS (SELECT event_id, user_id, ts, v,
        |    lag(v) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv
        |  FROM e)
        |SELECT event_id, user_id, epoch_us(ts) AS ts_us, v
        |FROM w WHERE v > 800000 AND (pv IS NULL OR pv <= 800000)
        |ORDER BY event_id""".stripMargin
    ) { (spark, dir) =>
      val events = Tables(spark, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          fixed(col("value"), 10000L).as("v"))
      val in = TempWork.dir("graft_s13_in")
      val out = TempWork.dir("graft_s13_out")
      val ckpt = TempWork.dir("graft_s13_ck")
      val b = events.agg(min("ts").as("mn"), max("ts").as("mx")).head()
      val midMs = b.getTimestamp(0).getTime +
        (b.getTimestamp(1).getTime - b.getTimestamp(0).getTime) / 2
      val mid = lit(new java.sql.Timestamp(midMs))
      events.filter(col("ts") < mid).repartition(4).write.mode("append").parquet(in)
      val chunk1 = TempWork.stampOlder(in)
      events.filter(col("ts") >= mid).repartition(4).write.mode("append").parquet(in)
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      import ss.implicits._
      val stream = ss.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", chunk1.toString).parquet(in)
        .as[VEvent]
      try {
        val q = StreamOps.edgeAlerts(stream, 800000L).toDF().writeStream
          .format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
        try q.processAllAvailable()
        finally q.stop()
      } finally {
        TempWork.delete(in)
        TempWork.delete(ckpt)
      }
      spark.read.parquet(out)
        .select("event_id", "user_id", "ts_us", "v")
        .orderBy("event_id")
    },

    // S18 — CHAINED STATEFUL OPERATORS, oracle-gated end to end: s7's
    // replay-bearing arrival (chunk 2 re-sends a 15-minute slice,
    // inside the watermark so the late filter can't save us) runs
    // through ONE streaming query that stacks dropDuplicatesWithin-
    // Watermark UNDER the finalized hourly aggregate — the
    // multi-stateful pipeline shape (dedup, then count) that
    // previously required two queries and an intermediate sink. The
    // oracle is s5's finalized-window aggregate over the RAW events
    // table: it only hash-matches if the dedup stage suppressed every
    // replayed row BEFORE it reached the aggregate (a leaked replay
    // inflates cnt and val in its hour), while the aggregate still
    // finalizes exactly the windows at or below the terminal
    // watermark. State: both operators bounded by the 30-minute
    // horizon — ids in the dedup, open windows in the agg — however
    // long the feed runs.
    Q(
      "s18_stream_dedup_hourly",
      """WITH m AS (
        |  SELECT (epoch_us(max(ts)) // 1000) * 1000 - 1800000000 AS wm_us FROM events),
        |agg AS (
        |  SELECT epoch_us(date_trunc('hour', ts)) AS ws_us, event_type, count(*) AS cnt,
        |    SUM(CAST(round(value*10000) AS BIGINT)) / 10000.0 AS val
        |  FROM events GROUP BY 1, 2)
        |SELECT ws_us, event_type, cnt, val FROM agg, m
        |WHERE ws_us + 3600000000 <= wm_us
        |ORDER BY ws_us, event_type""".stripMargin
    ) { (spark, dir) =>
      val events = Tables(spark, dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      val in = TempWork.dir("graft_s18_in")
      val out = TempWork.dir("graft_s18_out")
      val ckpt = TempWork.dir("graft_s18_ck")
      val b = events.agg(min("ts").as("mn"), max("ts").as("mx")).head()
      val minMs = b.getTimestamp(0).getTime
      val midMs = minMs + (b.getTimestamp(1).getTime - minMs) / 2
      val mid = lit(new java.sql.Timestamp(midMs))
      // s7's replay horizon: duplicates land inside the watermark
      val overlapMs = math.min(900000L, (midMs - minMs) / 4)
      val repl = lit(new java.sql.Timestamp(midMs - overlapMs))
      events.filter(col("ts") < mid).repartition(4).write.mode("append").parquet(in)
      val chunk1 = TempWork.stampOlder(in)
      events.filter(col("ts") >= repl).repartition(4).write.mode("append").parquet(in)
      // Child session with narrowed state width — see s5.
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val stream = ss.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", chunk1.toString).parquet(in)
      try {
        val q = StreamOps.dedupedHourly(stream).writeStream
          .format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
        try q.processAllAvailable()
        finally q.stop()
      } finally {
        TempWork.delete(in)
        TempWork.delete(ckpt)
      }
      spark.read.parquet(out)
        .select("ws_us", "event_type", "cnt", "val")
        .orderBy("ws_us", "event_type")
    },

    // S19 — stream-stream LEFT SEMI interval join, oracle-gated end to
    // end: s8's pair join with the cardinality a funnel trigger wants —
    // each event emitted ONCE if any same-user successor lands within
    // the hour, never enumerated per match. Emission is match-driven
    // (the left row may wait buffered across micro-batches until its
    // successor arrives), so the emitted set equals the batch
    // EXISTS-semi join with no watermark-finalization term, however
    // the arrival was chunked — which is what makes it hashable.
    // State: the same bounded ~90-minute slice per side as s8.
    Q(
      "s19_stream_semi_pairs",
      """SELECT a.user_id AS user_id, a.event_id AS id1,
        |  epoch_us(a.ts) AS ts_us, a.event_type AS event_type
        |FROM events a WHERE EXISTS (
        |  SELECT 1 FROM events b
        |  WHERE b.user_id = a.user_id AND b.ts >= a.ts
        |    AND b.ts <= a.ts + INTERVAL 1 HOUR AND a.event_id < b.event_id)
        |ORDER BY id1""".stripMargin
    ) { (spark, dir) =>
      val events = Tables(spark, dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      val in = TempWork.dir("graft_s19_in")
      val out = TempWork.dir("graft_s19_out")
      val ckpt = TempWork.dir("graft_s19_ck")
      val b = events.agg(min("ts").as("mn"), max("ts").as("mx")).head()
      val midMs = b.getTimestamp(0).getTime +
        (b.getTimestamp(1).getTime - b.getTimestamp(0).getTime) / 2
      val mid = lit(new java.sql.Timestamp(midMs))
      events.filter(col("ts") < mid).repartition(4).write.mode("append").parquet(in)
      val chunk1 = TempWork.stampOlder(in)
      events.filter(col("ts") >= mid).repartition(4).write.mode("append").parquet(in)
      // Child session with narrowed state width — see s5.
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val stream = ss.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", chunk1.toString).parquet(in)
      try {
        val q = StreamOps.eventsWithPair(stream, stream).writeStream
          .format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
        try q.processAllAvailable()
        finally q.stop()
      } finally {
        TempWork.delete(in)
        TempWork.delete(ckpt)
      }
      spark.read.parquet(out)
        .select("user_id", "id1", "ts_us", "event_type")
        .orderBy("id1")
    },

    // S20 — TRANSFORMWITHSTATE: s6's completed-session emitter
    // re-expressed on the arbitrary-state API that supersedes
    // flatMapGroupsWithState — named typed ValueState through a
    // StatefulProcessorHandle, explicit registered/deleted event-time
    // timers instead of the single timeout slot, a dedicated
    // handleExpiredTimer callback for the watermark-driven close, and
    // the RocksDB state store provider the API requires (set on the
    // child session; production would run it for the spill behavior
    // alone — state lives off-heap/on-disk instead of in executor
    // heap). Gated against s6's VERBATIM oracle: the migration claim
    // ("the new API emits the identical session set") is hash-checked,
    // not asserted — the same one-oracle-two-engine-paths discipline
    // as b7/x33. Arrival is s6's two-chunk time split, so the timer
    // close fires mid-stream for chunk-1 tails and at the terminal
    // no-data batch for the rest.
    Q(
      "s20_completed_sessions_tws", completedSessionsSql
    ) { (spark, dir) =>
      val events = Tables(spark, dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      val in = TempWork.dir("graft_s20_in")
      val out = TempWork.dir("graft_s20_out")
      val ckpt = TempWork.dir("graft_s20_ck")
      val b = events.agg(min("ts").as("mn"), max("ts").as("mx")).head()
      val midMs = b.getTimestamp(0).getTime +
        (b.getTimestamp(1).getTime - b.getTimestamp(0).getTime) / 2
      val mid = lit(new java.sql.Timestamp(midMs))
      events.filter(col("ts") < mid).repartition(4).write.mode("append").parquet(in)
      val chunk1 = TempWork.stampOlder(in)
      events.filter(col("ts") >= mid).repartition(4).write.mode("append").parquet(in)
      // Child session with narrowed state width — see s5 — plus the
      // RocksDB provider transformWithState requires.
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val stream = {
        import ss.implicits._
        ss.readStream.schema(events.schema)
          .option("maxFilesPerTrigger", chunk1.toString).parquet(in).as[Event]
      }
      try {
        val q = StreamOps.completedSessionsTws(stream).writeStream
          .format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
        try q.processAllAvailable()
        finally q.stop()
      } finally {
        TempWork.delete(in)
        TempWork.delete(ckpt)
      }
      spark.read.parquet(out)
        .select("user_id", "start_us", "end_us", "n_ev")
        .orderBy("user_id", "start_us")
    }
  )
}
