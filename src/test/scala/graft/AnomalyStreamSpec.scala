package graft

import graft.core.Cols._
import graft.core.Tables
import graft.streaming.{StreamOps, TempWork, VEvent}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** s12's contract beyond the gate: the streamed anomaly flags are
  * CHUNKING-INDEPENDENT — a three-chunk arrival (two state carries,
  * vs the gated run's one) produces exactly the batch x54 flag set,
  * because the per-user trail is carried across micro-batches and the
  * within-batch sort restores event order.
  */
class AnomalyStreamSpec extends AnyFunSuite {
  import TestSpark._

  test("s12: three-chunk streamed run equals batch x54 (two state carries)") {
    val events = Tables(spark, sf0001, "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        fixed(col("value"), 10000L).as("v"))
    val in = TempWork.dir("graft_s12spec_in")
    val out = TempWork.dir("graft_s12spec_out")
    val ckpt = TempWork.dir("graft_s12spec_ck")
    val b = events.agg(min("ts").as("mn"), max("ts").as("mx")).head()
    val lo = b.getTimestamp(0).getTime
    val span = b.getTimestamp(1).getTime - lo
    val t1 = lit(new java.sql.Timestamp(lo + span / 3))
    val t2 = lit(new java.sql.Timestamp(lo + 2 * span / 3))
    // oldest-first arrival: each earlier chunk stamped older via
    // repeated stampOlder calls (earlier chunks age more)
    events.filter(col("ts") < t1).coalesce(1).write.mode("append").parquet(in)
    TempWork.stampOlder(in)
    events.filter(col("ts") >= t1 && col("ts") < t2)
      .coalesce(1).write.mode("append").parquet(in)
    TempWork.stampOlder(in)
    events.filter(col("ts") >= t2).coalesce(1).write.mode("append").parquet(in)
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    import ss.implicits._
    val stream = ss.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(in).as[VEvent]
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
    val streamed = spark.read.parquet(out)
      .select("event_id", "user_id", "ts_us", "v", "n")
      .collect().map(_.toSeq).toSet
    val batch = SparkEntry.queries("x54_value_anomaly")(spark, sf0001)
      .select("event_id", "user_id", "ts_us", "v", "n")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty, "fixture produced no anomalies — test is vacuous")
  }

  test("s13: edge alerts suppress within-episode repeats; == batch lag form") {
    import spark.implicits._
    // hand fixture: one user crossing up, staying high, dropping,
    // crossing again — exactly 2 alerts; a second user never crossing
    def ev(id: Long, uid: Long, tMin: Long, v: Long) =
      graft.streaming.VEvent(id, new java.sql.Timestamp(tMin * 60000L), uid, v)
    val t = 800000L
    val in = Seq(
      ev(1, 1, 0, 700000), ev(2, 1, 1, 850000), ev(3, 1, 2, 900000),
      ev(4, 1, 3, 100000), ev(5, 1, 4, 810000),
      ev(6, 2, 0, 790000), ev(7, 2, 1, 800000))
    val got = graft.streaming.StreamOps.edgeAlerts(in.toDS(), t)
      .collect().map(_.event_id).sorted
    assert(got.toSeq == Seq(2L, 5L))
  }
}
