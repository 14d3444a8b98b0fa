package graft

import graft.core.Tables
import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Top-level so Spark's Dataset encoder codegen can instantiate it. */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Streaming equivalence (SURVEY.md §5 item 4): the Structured
  * Streaming forms over a MemoryStream of the sf0.001 events table
  * produce exactly the batch results the DuckDB oracle verified. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  private def eventRows(): Seq[Ev] =
    Tables(spark, sf0001, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .collect()
      .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .sortBy(_.event_id) // arrival order = event_id order (FIXTURES.md)

  private def runComplete(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      name: String, batches: Seq[Seq[Ev]]): Array[org.apache.spark.sql.Row] = {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val stream = MemoryStream[Ev]
    val q = f(stream.toDF()).writeStream
      .format("memory").queryName(name).outputMode("complete").start()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      sp.table(name).collect()
    } finally q.stop()
  }

  test("S1 streaming tumbling == batch tumbling") {
    val evs = eventRows()
    val got = runComplete(StreamOps.tumbling, "s1mem", evs.grouped(250).toSeq)
      .map(_.toString).sorted.toSeq
    val want = SparkEntry.queries("s1_tumbling_window")(spark, sf0001)
      .collect().map(_.toString).sorted.toSeq
    assert(got == want)
  }

  test("S2 streaming sliding == batch sliding") {
    val evs = eventRows()
    val got = runComplete(StreamOps.sliding, "s2mem", evs.grouped(300).toSeq)
      .map(_.toString).sorted.toSeq
    val want = SparkEntry.queries("s2_sliding_window")(spark, sf0001)
      .collect().map(_.toString).sorted.toSeq
    assert(got == want)
  }

  test("S3 streaming session windows == batch island oracle (per user)") {
    val evs = eventRows()
    val sessRows = runComplete(StreamOps.sessions, "s3mem", evs.grouped(200).toSeq)
    // roll sessions up per user exactly like the declared s3 query
    val sp = spark
    import sp.implicits._
    val got = sessRows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.toDF("user_id", "n_ev", "dur_us", "val")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_ev").as("total_events"),
        max("dur_us").as("max_dur_us"),
        (sum(round(col("val") * 10000).cast("long")) / 10000.0).as("val"))
      .collect().map(_.toString).sorted.toSeq
    val want = SparkEntry.queries("s3_session_windows")(spark, sf0001)
      .collect().map(_.toString).sorted.toSeq
    assert(got == want)
  }

  test("S4 watermark: late events are dropped in append mode (coherence)") {
    // Construct a stream with one clearly-late event; with watermark 30
    // min the late row must not appear in any emitted window, while the
    // no-watermark complete run still counts it.
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    val onTime = (0 until 8).map(i => Ev(i, t(f"2024-01-01 1$i%d:00:00"), 1, "click", 1.0))
    val late = Ev(100, t("2024-01-01 10:30:00"), 1, "click", 1.0) // 7h late
    val stream = MemoryStream[Ev]
    val q = StreamOps.tumblingWithWatermark(stream.toDF()).writeStream
      .format("memory").queryName("s4mem").outputMode("append").start()
    try {
      stream.addData(onTime)
      q.processAllAvailable()
      stream.addData(Seq(late))
      q.processAllAvailable()
      stream.addData(Seq(Ev(101, t("2024-01-01 19:00:00"), 1, "click", 1.0)))
      q.processAllAvailable()
      val emitted = sp.table("s4mem").collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      val hour10 = java.time.Instant.parse("2024-01-01T10:00:00Z").toEpochMilli * 1000
      // the 10:00 window either was never emitted or does not count the late row
      assert(emitted.getOrElse(hour10, 0L) <= 1L)
      // emitted counts for closed windows are exactly 1 (the on-time rows)
      emitted.foreach { case (_, c) => assert(c == 1L) }
    } finally q.stop()
  }

  test("S4 batch form: bucketed two-pass running max equals the one-pass definition") {
    import graft.core.Tables
    val onePass = org.apache.spark.sql.expressions.Window
      .orderBy("event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val direct = Tables(spark, sf0001, "events")
      .withColumn("wm", max(col("ts")).over(onePass))
      .filter(col("wm").isNull || col("ts") >= col("wm") - expr("INTERVAL 30 MINUTES"))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("w.start")).as("ws_us"), col("event_type"), col("cnt"))
      .collect().map(_.toString).sorted.toSeq
    val got = SparkEntry.queries("s4_watermark_drop")(spark, sf0001)
      .select("ws_us", "event_type", "cnt")
      .collect().map(_.toString).sorted.toSeq
    assert(got == direct)
  }
}
