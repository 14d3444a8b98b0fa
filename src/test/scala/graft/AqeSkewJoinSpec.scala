package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling (§2B capability row): when a join key is
  * skewed, adaptive execution splits oversized shuffle partitions into
  * sub-partitions at runtime — the automatic complement to x45's
  * explicit salting. The events table's event_type column has only 5
  * values with a hot head, so a type-keyed shuffle join is inherently
  * skewed; the spec lowers AQE's size thresholds so the optimization
  * fires on test data (the defaults are sized for multi-GB partitions)
  * and asserts both the plan marker and result parity.
  */
class AqeSkewJoinSpec extends AnyFunSuite {
  import TestSpark._

  // per-type stats joined back to every event through a shuffle join
  // on the 5-value key — the classic skewed enrich. The join is
  // TERMINAL (no downstream keyed operator): AQE declines to split a
  // skewed partition whose output partitioning a later aggregate
  // still needs, unless forced.
  private def joined(ss: org.apache.spark.sql.SparkSession) = {
    val base = graft.core.Tables(ss, sf001, "events")
      .select(col("event_id"), col("event_type"))
    // events is type-uniform, so amplify one key in-plan (x45's
    // synthetic-skew approach): clicks replicated 10x -> the click
    // shuffle partition is ~10x the median, a genuine hot key
    val hot = base.filter(col("event_type") === "click")
    val e = (1 to 9).foldLeft(base)((acc, _) => acc.unionByName(hot))
    // dimension side as a local table so BOTH join children are plain
    // Sort(ShuffleQueryStage) — the shape OptimizeSkewedJoin matches
    // (an aggregate between sort and shuffle blocks the rewrite)
    import ss.implicits._
    val stats = Seq("view" -> 1L, "click" -> 2L, "purchase" -> 3L,
      "signup" -> 4L, "error" -> 5L).toDF("t", "n")
    e.join(stats, col("event_type") === col("t"))
      .select(col("event_id"), col("event_type"), col("n"))
  }

  test("AQE splits skewed partitions of a hot-key shuffle join") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ss.conf.set("spark.sql.adaptive.enabled", "true")
    ss.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // fire on kilobyte-scale test partitions
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
    ss.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    ss.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    ss.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    val df = joined(ss)
    df.collect() // materialize so AQE finalizes the physical plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true") || plan.contains("skewed"),
      s"no skew-split marker in AQE final plan:\n${plan.take(4000)}")
  }

  test("skew-split result == plain result") {
    val on = spark.newSession()
    on.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    on.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
    on.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    on.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    val off = spark.newSession()
    off.conf.set("spark.sql.adaptive.enabled", "false")
    on.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    val a = joined(on).collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val b = joined(off).collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(a == b)
  }
}
