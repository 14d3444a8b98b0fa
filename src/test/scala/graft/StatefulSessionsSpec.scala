package graft

import graft.core.Tables
import graft.streaming.{Event, StreamOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** mapGroupsWithState session counting: streamed per-user final state
  * equals the batch island oracle (s3's n_sessions / total_events). */
class StatefulSessionsSpec extends AnyFunSuite {
  import TestSpark._

  test("stateful session counts converge to the batch s3 result") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext

    val events = Tables(spark, sf0001, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id)) // in-order arrival

    val stream = MemoryStream[Event]
    val q = StreamOps.statefulSessionCounts(stream.toDS()).writeStream
      .format("memory").queryName("mgws").outputMode("update").start()
    try {
      events.grouped(200).foreach { b => stream.addData(b.toSeq); q.processAllAvailable() }
      // update mode appends one row per (user, batch); last wins
      val finalRows = sp.table("mgws").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        .zipWithIndex
        .groupBy(_._1._1).map { case (u, rs) => u -> rs.maxBy(_._2)._1._2 }

      val want = SparkEntry.queries("s3_session_windows")(spark, sf0001)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(finalRows.size == want.size)
      want.foreach { case (u, (sess, ev)) =>
        assert(finalRows(u) == ((sess, ev)), s"user $u: got ${finalRows(u)}, want ($sess,$ev)")
      }
    } finally q.stop()
  }

  test("completedSessions merges a late in-watermark event without moving lastTs backward") {
    // Arrival: [10:00, 10:10], then 10:05 (late, but above the 9:40
    // watermark so it's admitted), then 10:36. Event-time order gives
    // gaps of 5/5/26 min — ONE session of 4 events. A merge that set
    // lastTs to the late 10:05 would see 10:36 as a 31-min gap and
    // spuriously split; the min/max merge must not.
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    def ev(id: Long, hhmm: String) = Event(id,
      java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00"), 1L, "click", 1.0)

    val stream = MemoryStream[Event]
    val q = StreamOps.completedSessions(stream.toDS()).writeStream
      .format("memory").queryName("late_merge")
      .outputMode("append").start()
    try {
      stream.addData(ev(1, "10:00"), ev(2, "10:10")); q.processAllAvailable()
      stream.addData(ev(3, "10:05")); q.processAllAvailable() // late, admitted
      stream.addData(ev(4, "10:36")); q.processAllAvailable() // 26 min after true lastTs
      stream.addData(ev(5, "23:59")); q.processAllAvailable() // closes the session
      val got = sp.table("late_merge").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val us = (hhmm: String) =>
        java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00").getTime * 1000L
      assert(got.toSeq == Seq((1L, us("10:00"), us("10:36"), 4L)),
        s"expected one merged 4-event session, got ${got.mkString(", ")}")
    } finally q.stop()
  }

  test("s20 (transformWithState) emits the identical session set to s6 (flatMapGroupsWithState)") {
    val a = SparkEntry.queries("s6_completed_sessions")(spark, sf0001)
      .collect().map(_.toString).sorted.toSeq
    val b = SparkEntry.queries("s20_completed_sessions_tws")(spark, sf0001)
      .collect().map(_.toString).sorted.toSeq
    assert(a.nonEmpty && a == b,
      s"API migration changed the emitted set: s6=${a.size} rows, s20=${b.size} rows")
  }

  test("SessionCloseProcessor handles the same late in-watermark merge as completedSessions") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    def ev(id: Long, hhmm: String) = Event(id,
      java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00"), 1L, "click", 1.0)
    val ss = sp.newSession()
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = MemoryStream[Event](1)(implicitly, ss.sqlContext)
    val q = StreamOps.completedSessionsTws(stream.toDS()).writeStream
      .format("memory").queryName("late_merge_tws")
      .outputMode("append").start()
    try {
      stream.addData(ev(1, "10:00"), ev(2, "10:10")); q.processAllAvailable()
      stream.addData(ev(3, "10:05")); q.processAllAvailable()
      stream.addData(ev(4, "10:36")); q.processAllAvailable()
      stream.addData(ev(5, "23:59")); q.processAllAvailable()
      val got = ss.table("late_merge_tws").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val us = (hhmm: String) =>
        java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00").getTime * 1000L
      assert(got.toSeq == Seq((1L, us("10:00"), us("10:36"), 4L)),
        s"expected one merged 4-event session, got ${got.mkString(", ")}")
    } finally q.stop()
  }
}
