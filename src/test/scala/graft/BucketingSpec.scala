package graft

import graft.core.Tables
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join (the 100 TB shuffle-elimination path,
  * SURVEY.md §7): both fact tables bucketed on the join key produce a
  * SortMergeJoin with NO shuffle exchange between scan and join. */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  test("join of two tables bucketed on the key plans without a shuffle") {
    val sp = spark
    sp.sql("DROP TABLE IF EXISTS graft_orders_b")
    sp.sql("DROP TABLE IF EXISTS graft_lineitem_b")
    Tables(sp, sf0001, "orders")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_orders_b")
    Tables(sp, sf0001, "lineitem")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_lineitem_b")

    val joined = sp.table("graft_orders_b")
      .join(sp.table("graft_lineitem_b"), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))

    // force the final adaptive plan, then check no shuffle feeds the join
    joined.collect()
    val plan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val planStr = plan.toString
    assert(planStr.contains("SortMergeJoin") || planStr.contains("ShuffledHashJoin") ||
      planStr.contains("BroadcastHashJoin"))
    // the join keys are co-located by bucketing: no exchange below the join
    val joinIdx = planStr.indexOf("Join")
    val shuffleBelowJoin = planStr.substring(joinIdx).contains("Exchange hashpartitioning")
    assert(!shuffleBelowJoin, s"bucketed join still shuffles:\n$planStr")

    // and the result matches the unbucketed join
    val want = Tables(sp, sf0001, "orders")
      .join(Tables(sp, sf0001, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(_.toString).sorted.toSeq
    assert(joined.collect().map(_.toString).sorted.toSeq == want)
  }
}
