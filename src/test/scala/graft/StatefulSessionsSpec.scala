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
}
