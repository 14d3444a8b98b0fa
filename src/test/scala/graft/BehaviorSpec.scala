package graft

import graft.core.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants behind the x41-x44 behavioral-analytics rows —
  * the properties the cross-engine hash certifies numerically but does
  * not explain: funnel monotonicity, transition-count conservation,
  * grid completeness, and cohort self-membership.
  */
class BehaviorSpec extends AnyFunSuite {
  import TestSpark._

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf0001)

  private val EventTypes = Set("view", "click", "signup", "purchase", "error")

  test("x41 funnel stages are monotone non-increasing with non-negative latency") {
    val rows = run("x41_event_funnel").collect()
    assert(rows.map(_.getAs[String]("stage")).toSeq ==
      Seq("stage1_view", "stage2_click", "stage3_purchase"))
    val users = rows.map(_.getAs[Long]("users"))
    assert(users(0) >= users(1) && users(1) >= users(2), users.mkString(","))
    assert(users(0) > 0)
    rows.foreach(r => assert(r.getAs[Long]("total_latency_us") >= 0L))
  }

  test("x42 transitions conserve counts and stay inside the event-type alphabet") {
    val rows = run("x42_session_transitions").collect()
    rows.foreach { r =>
      assert(EventTypes(r.getAs[String]("src")), r.toString)
      assert(EventTypes(r.getAs[String]("dst")), r.toString)
    }
    // each session of length L contributes exactly L-1 transitions, so
    // sum(n) == N_events - N_sessions; sessions are bounded below by
    // users and above by events
    val total = rows.map(_.getAs[Long]("n")).sum
    val e = Tables(spark, sf0001, "events")
    val nEvents = e.count()
    val nUsers = e.select("user_id").distinct().count()
    assert(total <= nEvents - nUsers, s"$total vs $nEvents - $nUsers")
    assert(total > 0)
  }

  test("x43 grid covers exactly the per-user observed hour range") {
    val out = run("x43_forward_fill").collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_points"), r.getAs[Long]("n_filled"), r.getAs[Long]("last_fill_us")))
      .toMap
    val direct = Tables(spark, sf0001, "events").groupBy("user_id")
      .agg(expr("unix_micros(min(ts)) div 3600000000").as("h0"),
        expr("unix_micros(max(ts)) div 3600000000").as("h1"),
        expr("unix_micros(max(ts))").as("mx"))
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("h0"), r.getAs[Long]("h1"), r.getAs[Long]("mx")))
      .toMap
    assert(out.keySet == direct.keySet)
    out.foreach { case (u, (nPoints, nFilled, lastFill)) =>
      val (h0, h1, mx) = direct(u)
      assert(nPoints == h1 - h0 + 1, s"user $u")
      assert(nFilled <= nPoints && nFilled > 0, s"user $u")
      // the fill never cites an event after the last grid instant, and
      // the last grid instant (hour floor of max ts) is <= max ts
      assert(lastFill <= h1 * 3600000000L && lastFill <= mx, s"user $u")
    }
  }

  test("x44 cohort week 0 holds the whole cohort and offsets are non-negative") {
    val rows = run("x44_retention_cohort").collect()
    rows.foreach(r => assert(r.getAs[Long]("week_offset") >= 0L))
    val atZero = rows.filter(_.getAs[Long]("week_offset") == 0L)
      .map(r => r.getAs[Long]("cohort_week") -> r.getAs[Long]("active_users"))
      .toMap
    val cohorts = Tables(spark, sf0001, "events")
      .filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("mn"))
      .select(expr("unix_micros(mn) div 604800000000").as("cw"))
      .groupBy("cw").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("cw") -> r.getAs[Long]("n")).toMap
    // a user's signup event itself is activity in the cohort week, so
    // offset-0 actives == cohort size, for every cohort
    assert(atZero == cohorts, s"$atZero vs $cohorts")
  }

  test("x54 anomaly flags == brute-force trailing-window replay") {
    // Independent reimplementation: collect the events, sort each
    // user's stream by (ts, event_id), slide a 24-deep trailing
    // window by hand, and apply the integer z^2 test.
    val ev = Tables(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts)").as("ts_us"),
        expr("cast(round(value * 10000) as long)").as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val exp = ev.groupBy(_._2).flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._1))
      sorted.indices.flatMap { i =>
        val win = sorted.slice(math.max(0, i - 24), i).map(_._4)
        val n = win.size.toLong
        val s = win.sum
        val q = win.map(x => x * x).sum
        val x = sorted(i)._4
        val dev = n * x - s
        if (n >= 8 && dev * dev > 9 * (n * q - s * s))
          Some((sorted(i)._1, sorted(i)._2, sorted(i)._3, x, n))
        else None
      }
    }.toSet
    val got = SparkEntry.queries("x54_value_anomaly")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(exp.nonEmpty, "replay found no anomalies at sf0.001 — test data changed?")
    assert(got == exp,
      s"missing=${(exp -- got).take(3)} extra=${(got -- exp).take(3)}")
  }
}
