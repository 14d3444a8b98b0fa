package graft

import graft.core.Tables
import graft.plans.TopKPerKey
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom TopKPerKey operator (LogicalPlan + Strategy + SparkPlan)
  * equals the window row_number formulation, and its physical plan shows
  * the partial/final exec pair around one exchange. */
class TopKPerKeySpec extends AnyFunSuite {
  import TestSpark._

  test("top-3 orders per customer == window row_number formulation") {
    val orders = Tables(spark, sf0001, "orders")
    val topk = TopKPerKey(orders,
      keys = Seq("o_custkey"),
      orderBy = Seq(("o_totalprice", false), ("o_orderkey", true)),
      k = 3)
      .select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val want = orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(topk == want)
  }

  test("physical plan has partial and final TopKPerKeyExec around an exchange") {
    val orders = Tables(spark, sf0001, "orders")
    val df = TopKPerKey(orders, Seq("o_custkey"),
      Seq(("o_totalprice", false), ("o_orderkey", true)), 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerKey \\[".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("Exchange hashpartitioning(o_custkey"), plan)
  }

  test("k larger than group size returns whole groups") {
    val orders = Tables(spark, sf0001, "orders").filter(col("o_custkey") < 3)
    val all = orders.count()
    val topk = TopKPerKey(orders, Seq("o_custkey"),
      Seq(("o_orderkey", true)), 100000).count()
    assert(topk == all)
  }
}
