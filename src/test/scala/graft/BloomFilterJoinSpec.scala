package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning (§2B capability row): Catalyst
  * can inject a bloom filter built from a selective join side into the
  * other side's scan, so a 100 TB fact scan drops non-joining rows
  * BEFORE the shuffle. The thresholds that gate the rewrite
  * (application-side scan size ≥ 10 GB by default) are sized for real
  * clusters, so the spec lowers them to prove the mechanism on test
  * data; at the target scale the defaults fire on their own.
  */
class BloomFilterJoinSpec extends AnyFunSuite {
  import TestSpark._

  private def joined(ss: org.apache.spark.sql.SparkSession) = {
    val l = graft.core.Tables(ss, sf001, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = graft.core.Tables(ss, sf001, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))
  }

  test("bloom runtime filter is injected on the fact side of a selective shuffle join") {
    val ss = spark.newSession()
    // force a shuffle join (no broadcast) and let the rewrite fire on
    // small data: the creation side must stay under its threshold,
    // the application side's default 10 GB floor must come down
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ss.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    val plan = joined(ss).queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"),
      s"no bloom runtime filter in optimized plan:\n$plan")
  }

  test("pruned plan result == plain join result") {
    val on = spark.newSession()
    on.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    on.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    val off = spark.newSession()
    off.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    val a = joined(on).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = joined(off).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
  }
}
