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

  test("b1's join subtree is exchange-free with broadcast disabled (the fact-fact plan)") {
    import graft.sources.BucketedQueries
    val sp = spark
    val loc = java.nio.file.Files.createTempDirectory("graft_b1spec").toString
    sp.sql("DROP TABLE IF EXISTS graft_b1spec_li")
    sp.sql("DROP TABLE IF EXISTS graft_b1spec_ord")
    BucketedQueries.writeBucketed(
      Tables(sp, sf0001, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount"),
      "l_orderkey", "graft_b1spec_li", s"$loc/li")
    BucketedQueries.writeBucketed(
      Tables(sp, sf0001, "orders").select("o_orderkey", "o_orderpriority"),
      "o_orderkey", "graft_b1spec_ord", s"$loc/ord")
    // one file per bucket: the repartition in writeBucketed aligns
    // write tasks with buckets, the single-file layout sorted scans need
    val liFiles = new java.io.File(s"$loc/li").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(liFiles == BucketedQueries.NumBuckets,
      s"expected one file per bucket, found $liFiles")
    val ss = sp.newSession()
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ss.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val df = BucketedQueries.pairsJoin(ss, "graft_b1spec_li", "graft_b1spec_ord")
    df.collect()
    // QueryStageExec is a leaf in the AQE plan tree — flatten through
    // stage boundaries so collect sees the whole physical plan
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => p +: flatten(q.plan)
      case _ => p +: p.children.flatMap(flatten)
    }
    val nodes = flatten(df.queryExecution.executedPlan)
    val smj = nodes.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(smj.nonEmpty, s"expected a SortMergeJoin:\n${nodes.head}")
    val exchangesBelowJoin = flatten(smj.head).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchangesBelowJoin.isEmpty,
      s"bucketed fact-fact join still shuffles:\n${smj.head}")
    // and both scans really read bucketed layout
    val scans = nodes.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.count(_.bucketedScan) == 2,
      s"expected 2 bucketed scans:\n${scans.mkString("\n")}")
    sp.sql("DROP TABLE IF EXISTS graft_b1spec_li")
    sp.sql("DROP TABLE IF EXISTS graft_b1spec_ord")
  }

  test("a bucket-key equality filter prunes the scan to 1 of NumBuckets buckets") {
    import graft.sources.BucketedQueries
    val sp = spark
    val loc = java.nio.file.Files.createTempDirectory("graft_b1prune").toString
    sp.sql("DROP TABLE IF EXISTS graft_b1prune_ord")
    BucketedQueries.writeBucketed(
      Tables(sp, sf0001, "orders").select("o_orderkey", "o_orderpriority"),
      "o_orderkey", "graft_b1prune_ord", s"$loc/ord")
    // autoBucketedScan turns bucketed reads OFF when a query has no
    // join/agg on the bucket key (one file per bucket caps scan
    // parallelism); pin it on in an isolated session so the filter
    // probe exercises bucket PRUNING, the thing under test
    val ss = sp.newSession()
    ss.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    val key = ss.table("graft_b1prune_ord").select(min("o_orderkey")).head().getLong(0)
    val probe = ss.table("graft_b1prune_ord").filter(col("o_orderkey") === key)
    val scanStr = probe.queryExecution.executedPlan.toString
    assert(scanStr.contains(s"SelectedBucketsCount: 1 out of ${BucketedQueries.NumBuckets}"),
      s"bucket pruning missing from scan:\n$scanStr")
    assert(probe.count() >= 1)
    sp.sql("DROP TABLE IF EXISTS graft_b1prune_ord")
  }
}
