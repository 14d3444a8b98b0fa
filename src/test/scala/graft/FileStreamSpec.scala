package graft

import graft.core.Tables
import graft.streaming.StreamOps
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming from a real file source (not MemoryStream): events written
  * as json files arrive in two batches; the tumbling aggregation over
  * the stream equals the batch result over the union of the files. */
class FileStreamSpec extends AnyFunSuite {
  import TestSpark._

  test("file-source stream through StreamOps.tumbling == batch over all files") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_stream_in").toString
    val ckpt = Files.createTempDirectory("graft_stream_ck").toString

    val events = Tables(sp, sf0001, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    // two arrival chunks as json files
    events.filter("event_id % 2 = 0").write.mode("append").json(dir)

    val schema = events.schema
    val stream = sp.readStream.schema(schema).json(dir)
    val q = StreamOps.tumbling(stream).writeStream
      .format("memory").queryName("filestream")
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      events.filter("event_id % 2 = 1").write.mode("append").json(dir)
      q.processAllAvailable()
      val got = sp.table("filestream").collect().map(_.toString).sorted.toSeq
      val want = StreamOps.tumbling(events).collect().map(_.toString).sorted.toSeq
      assert(got == want)
    } finally q.stop()
  }

  test("streaming parquet sink (append + watermark) writes readable files") {
    val sp = spark
    val in = Files.createTempDirectory("graft_psink_in").toString
    val out = Files.createTempDirectory("graft_psink_out").toString
    val ckpt = Files.createTempDirectory("graft_psink_ck").toString

    val events = Tables(sp, sf0001, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    events.orderBy("event_id").limit(600).write.mode("append").json(in)

    val stream = sp.readStream.schema(events.schema).json(in)
    val q = StreamOps.tumblingWithWatermark(stream).writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // push the watermark far forward so earlier windows finalize
      events.orderBy(org.apache.spark.sql.functions.col("event_id").desc)
        .limit(50).write.mode("append").json(in)
      q.processAllAvailable()
    } finally q.stop()

    val back = sp.read.parquet(out)
    assert(back.columns.toSet == Set("ws_us", "event_type", "cnt", "val"))
    assert(back.count() > 0) // finalized windows were emitted and are readable
  }

  test("restart from checkpoint resumes exactly-once: resumed run == uninterrupted run") {
    val sp = spark
    import org.apache.spark.sql.functions.{col, lit, min, max}
    val in = Files.createTempDirectory("graft_rs_in").toString
    val out = Files.createTempDirectory("graft_rs_out").toString
    val ckpt = Files.createTempDirectory("graft_rs_ck").toString

    val events = Tables(sp, sf0001, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val b = events.agg(min("ts").as("mn"), max("ts").as("mx")).head()
    val midMs = b.getTimestamp(0).getTime +
      (b.getTimestamp(1).getTime - b.getTimestamp(0).getTime) / 2
    val mid = lit(new java.sql.Timestamp(midMs))

    def start() = StreamOps.tumblingWithWatermark(
        sp.readStream.schema(events.schema).parquet(in))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    // run 1: first chunk, then STOP — watermark state lives in ckpt
    events.filter(col("ts") < mid).write.mode("append").parquet(in)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // run 2: a NEW query resumes from the same checkpoint + sink
    events.filter(col("ts") >= mid).write.mode("append").parquet(in)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    // the interrupted-and-resumed run must equal the uninterrupted
    // gated s5 run (same terminal watermark, file-sink manifest
    // guarantees no duplicated or lost windows across the restart)
    val got = sp.read.parquet(out).select("ws_us", "event_type", "cnt", "val")
      .collect().map(_.toString).sorted.toSeq
    val want = SparkEntry.queries("s5_stream_hourly_finalized")(sp, sf0001)
      .collect().map(_.toString).sorted.toSeq
    assert(got == want, s"restart produced ${got.size} rows, uninterrupted ${want.size}")
  }

  test("stream-stream interval join == batch range join (watermarked both sides)") {
    val sp = spark
    val in = Files.createTempDirectory("graft_ssj_in").toString
    val ckpt = Files.createTempDirectory("graft_ssj_ck").toString
    val events = Tables(sp, sf0001, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    // time-split arrival (see s5): keeps chunk-2 rows ahead of the
    // chunk-1 watermark so no join state is expired before its match
    import org.apache.spark.sql.functions.{lit, min, max}
    val b = events.agg(min("ts").as("mn"), max("ts").as("mx")).head()
    val midMs = b.getTimestamp(0).getTime +
      (b.getTimestamp(1).getTime - b.getTimestamp(0).getTime) / 2
    val mid = lit(new java.sql.Timestamp(midMs))
    events.filter(col("ts") < mid).write.mode("append").parquet(in)

    val stream = sp.readStream.schema(events.schema).parquet(in)
    val q = StreamOps.eventPairs(stream, stream).writeStream
      .format("memory").queryName("ssj")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      events.filter(col("ts") >= mid).write.mode("append").parquet(in)
      q.processAllAvailable()
      val got = sp.table("ssj").collect().map(_.toString).sorted.toSeq
      val want = StreamOps.eventPairs(events, events) // same plan, batch inputs
        .collect().map(_.toString).sorted.toSeq
      assert(got.nonEmpty && got == want,
        s"stream-stream join emitted ${got.size} pairs, batch says ${want.size}")
    } finally q.stop()
  }

  test("stream-static broadcast enrichment == batch join") {
    val sp = spark
    val in = Files.createTempDirectory("graft_enr_in").toString
    val ckpt = Files.createTempDirectory("graft_enr_ck").toString
    val events = Tables(sp, sf0001, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val customer = Tables(sp, sf0001, "customer")
    events.write.mode("append").parquet(in)
    val stream = sp.readStream.schema(events.schema).parquet(in)
    val q = StreamOps.enriched(stream, customer).writeStream
      .format("memory").queryName("enriched_stream")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = sp.table("enriched_stream").collect().map(_.toString).sorted.toSeq
      val want = StreamOps.enriched(events, customer)
        .collect().map(_.toString).sorted.toSeq
      assert(got.nonEmpty && got == want)
    } finally q.stop()
  }

  test("two gated streams run concurrently in one session (race-safe confs)") {
    // Real pipelines multiplex streams. s5/s6 narrow the state-store
    // width on a CHILD session (spark.newSession), so two streams
    // sharing the parent session must neither race each other's conf
    // nor perturb the parent's. Concurrent results must equal the
    // sequential (driver-hash-gated) runs bit for bit.
    val sp = spark
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    def runQ(name: String): Seq[String] =
      SparkEntry.queries(name)(sp, sf0001).collect().map(_.toString).sorted.toSeq
    val seqS5 = runQ("s5_stream_hourly_finalized")
    val seqS6 = runQ("s6_completed_sessions")
    val shuffleBefore = sp.conf.get("spark.sql.shuffle.partitions")
    val f5 = Future(runQ("s5_stream_hourly_finalized"))
    val f6 = Future(runQ("s6_completed_sessions"))
    val (conc5, conc6) = (Await.result(f5, 180.seconds), Await.result(f6, 180.seconds))
    assert(conc5 == seqS5, "concurrent s5 diverged from its sequential run")
    assert(conc6 == seqS6, "concurrent s6 diverged from its sequential run")
    assert(sp.conf.get("spark.sql.shuffle.partitions") == shuffleBefore,
      "a stream leaked its narrowed shuffle width into the shared session")
  }

  test("streaming dedupe drops replayed events within the watermark") {
    val sp = spark
    val in = Files.createTempDirectory("graft_dedup_in").toString
    val ckpt = Files.createTempDirectory("graft_dedup_ck").toString

    val events = Tables(sp, sf0001, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("event_id").limit(200)
    // first arrival, then a full replay of the same events (duplicates)
    events.write.mode("append").json(in)

    val stream = sp.readStream.schema(events.schema).json(in)
    val q = StreamOps.dedupe(stream).writeStream
      .format("memory").queryName("dedupe_stream")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      events.write.mode("append").json(in) // replay
      q.processAllAvailable()
      val got = sp.table("dedupe_stream").count()
      assert(got == events.count(), "each event_id survives exactly once")
    } finally q.stop()
  }

  test("s7 gated run suppresses a genuinely non-empty replay slice") {
    val sp = spark
    val events = Tables(sp, sf0001, "events")
    // Replicate s7's arrival arithmetic to prove the fixture actually
    // replays rows — without this the dedup assertion is vacuous.
    val b = events.agg(org.apache.spark.sql.functions.min("ts").as("mn"),
      org.apache.spark.sql.functions.max("ts").as("mx")).head()
    val minMs = b.getTimestamp(0).getTime
    val midMs = minMs + (b.getTimestamp(1).getTime - minMs) / 2
    val overlapMs = math.min(900000L, (midMs - minMs) / 4)
    val replayed = events.filter(
      col("ts") >= new java.sql.Timestamp(midMs - overlapMs) &&
        col("ts") < new java.sql.Timestamp(midMs)).count()
    assert(replayed > 0, "fixture replays nothing — the s7 test proves nothing")

    val got = SparkEntry.queries("s7_stream_dedup")(sp, sf0001)
    assert(got.count() == events.count(),
      s"sink must hold exactly the distinct events despite $replayed replayed rows")
    assert(got.select("event_id").distinct().count() == events.count(),
      "duplicate event_id escaped the dedup state")
  }

  test("completedSessions emits exactly the closed sessions (flatMapGroupsWithState)") {
    val sp = spark
    import sp.implicits._
    val in = Files.createTempDirectory("graft_sess_in").toString
    val ckpt = Files.createTempDirectory("graft_sess_ck").toString

    val events = Tables(sp, sf0001, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    events.write.mode("append").json(in)
    // one far-future closer event per user: every original session completes,
    // the closer itself stays open in state and is never emitted
    val closers = events.groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max("event_id").as("m"))
      .select(
        (col("m") + 1000000).as("event_id"),
        org.apache.spark.sql.functions.lit(java.sql.Timestamp.valueOf("2030-01-01 00:00:00")).as("ts"),
        col("user_id"),
        org.apache.spark.sql.functions.lit("close").as("event_type"),
        org.apache.spark.sql.functions.lit(0.0).as("value"))

    val stream = sp.readStream.schema(events.schema).json(in)
      .as[graft.streaming.Event]
    val q = StreamOps.completedSessions(stream).writeStream
      .format("memory").queryName("completed_sessions")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      closers.write.mode("append").json(in)
      q.processAllAvailable()
      val got = sp.table("completed_sessions").count()
      val want = StreamOps.sessions(events).count() // batch session_window islands
      assert(got == want, s"emitted $got completed sessions, batch says $want")
    } finally q.stop()
  }

  test("gated s8 run (two-chunk arrival + parquet sink) == batch interval join") {
    val sp = spark
    val events = Tables(sp, sf0001, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val got = SparkEntry.queries("s8_stream_pairs")(sp, sf0001)
      .collect().map(_.toString).sorted.toSeq
    val want = StreamOps.eventPairs(events, events)
      .collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty && got == want,
      s"gated s8 emitted ${got.size} pairs, batch join says ${want.size}")
  }

  test("gated s9 run (stream-static enrichment, two-chunk arrival) == batch join") {
    val sp = spark
    val events = Tables(sp, sf0001, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val got = SparkEntry.queries("s9_stream_enriched")(sp, sf0001)
      .collect().map(_.toString).sorted.toSeq
    val want = StreamOps.enriched(events, Tables(sp, sf0001, "customer"))
      .select(col("event_id"), graft.core.Cols.epochUs(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"), col("c_mktsegment"))
      .collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty && got == want,
      s"gated s9 emitted ${got.size} rows, batch join says ${want.size}")
  }

  test("s18: chained dedup+agg suppresses a non-empty replay before the aggregate") {
    val sp = spark
    val events = Tables(sp, sf0001, "events")
    // s7's arrival arithmetic: prove the fixture actually replays rows
    val b = events.agg(org.apache.spark.sql.functions.min("ts").as("mn"),
      org.apache.spark.sql.functions.max("ts").as("mx")).head()
    val minMs = b.getTimestamp(0).getTime
    val maxMs = b.getTimestamp(1).getTime
    val midMs = minMs + (maxMs - minMs) / 2
    val overlapMs = math.min(900000L, (midMs - minMs) / 4)
    val replayed = events.filter(
      col("ts") >= new java.sql.Timestamp(midMs - overlapMs) &&
        col("ts") < new java.sql.Timestamp(midMs)).count()
    assert(replayed > 0, "fixture replays nothing — the s18 test proves nothing")

    val got = SparkEntry.queries("s18_stream_dedup_hourly")(sp, sf0001)
      .collect().map(_.toString).sorted.toSeq
    // batch model: hourly aggregate over the DISTINCT events, windows
    // finalized by the terminal watermark (ms-floored max ts - 30 min)
    val wmUs = (maxMs * 1000L) - 1800000000L
    val want = StreamOps.tumblingWithWatermark(
        events.select("event_id", "ts", "user_id", "event_type", "value"))
      .filter(col("ws_us") + 3600000000L <= wmUs)
      .collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty && got == want,
      s"gated s18 emitted ${got.size} finalized rows, batch says ${want.size}")
  }

  test("s19: streamed semi join == batch semi join over the full arrival") {
    val sp = spark
    val events = Tables(sp, sf0001, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val got = SparkEntry.queries("s19_stream_semi_pairs")(sp, sf0001)
      .collect().map(_.toString).sorted.toSeq
    val l = events.select(col("user_id").as("u1"), col("ts").as("ts1"),
      col("event_id").as("id1"), col("event_type"))
    val r = events.select(col("user_id").as("u2"), col("ts").as("ts2"),
      col("event_id").as("id2"))
    val semi = l.join(r,
      col("u1") === col("u2") && col("ts2") >= col("ts1") &&
        col("ts2") <= col("ts1") + org.apache.spark.sql.functions.expr("INTERVAL 1 HOUR") &&
        col("id1") < col("id2"), "left_semi")
    val want = semi
      .select(col("u1").as("user_id"), col("id1"),
        graft.core.Cols.epochUs(col("ts1")).as("ts_us"), col("event_type"))
      .collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty && got == want,
      s"gated s19 emitted ${got.size} rows, batch semi says ${want.size}")
  }

  test("s19 buffering path: a left row whose ONLY successor arrives a micro-batch later still emits") {
    // The corpus is too dense to exercise the wait (every chunk-1
    // event with a cross-boundary successor also has a same-chunk
    // one — measured zero eligible rows at sf0.001 AND sf0.01), so
    // the buffered-emission contract is pinned on a hand-built
    // arrival: e1's only qualifying successor e2 lands in batch 1.
    val sp = spark
    import sp.implicits._
    val in = Files.createTempDirectory("graft_s19buf_in").toString
    val ckpt = Files.createTempDirectory("graft_s19buf_ck").toString
    val out = Files.createTempDirectory("graft_s19buf_out").toString
    def ev(id: Long, user: Long, tMin: Long) =
      (id, new java.sql.Timestamp(1700000000000L + tMin * 60000L), user, "view", 1.0)
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    // chunk 1: e1 (user 7) alone; e10/e11 (user 8) pair in-chunk
    Seq(ev(1L, 7L, 0L), ev(10L, 8L, 1L), ev(11L, 8L, 5L))
      .toDF(cols: _*).coalesce(1).write.mode("append").parquet(in)
    graft.streaming.TempWork.stampOlder(in)
    // chunk 2: e2, user 7's only successor, 10 min after e1
    Seq(ev(2L, 7L, 10L), ev(20L, 9L, 200L))
      .toDF(cols: _*).coalesce(1).write.mode("append").parquet(in)
    val ss = sp.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    val schema = sp.read.parquet(in).schema
    val stream = ss.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val q = StreamOps.eventsWithPair(stream, stream).writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    val got = sp.read.parquet(out).select("id1").collect()
      .map(_.getLong(0)).sorted.toSeq
    // e1 emitted despite its match arriving a batch later; e10 emitted
    // in-batch; e11/e2/e20 have no successor and never emit
    assert(got == Seq(1L, 10L), s"emitted $got")
  }
}
