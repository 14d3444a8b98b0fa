package graft

import graft.ops.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Unit semantics of the backward as-of join: inclusive match at equal
  * timestamps, latest-wins, null when no event precedes the probe, and
  * key isolation. */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of: latest event at or before probe time, per key") {
    val sp = spark
    import sp.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-01 12:00:00"), 12.0),
      (2L, ts("2024-01-01 11:00:00"), 21.0)
    ).toDF("uid", "ts", "value")
    val probes = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100L), // before any event -> null
      (1L, ts("2024-01-01 10:00:00"), 101L), // equal ts -> inclusive
      (1L, ts("2024-01-01 11:59:59"), 102L), // between -> 10:00 event
      (1L, ts("2024-01-01 23:00:00"), 103L), // after all -> 12:00 event
      (2L, ts("2024-01-01 23:00:00"), 104L), // other key sees only its own
      (3L, ts("2024-01-01 23:00:00"), 105L)  // unseen key -> null
    ).toDF("uid", "qt", "probe_id")

    val out = AsOfJoin.backward(probes, events, "uid", "qt", "ts", Seq("value"))
      .select(col("probe_id"), col("asof_ts"), col("asof_value"))
      .collect().map(r => r.getLong(0) -> (Option(r.getTimestamp(1)), Option(r.get(2)))).toMap

    assert(out(100L) == (None, None))
    assert(out(101L) == (Some(ts("2024-01-01 10:00:00")), Some(10.0)))
    assert(out(102L) == (Some(ts("2024-01-01 10:00:00")), Some(10.0)))
    assert(out(103L) == (Some(ts("2024-01-01 12:00:00")), Some(12.0)))
    assert(out(104L) == (Some(ts("2024-01-01 11:00:00")), Some(21.0)))
    assert(out(105L) == (None, None))
  }
}
