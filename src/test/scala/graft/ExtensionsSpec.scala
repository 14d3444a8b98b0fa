package graft

import graft.core.GraftSession
import graft.ops.SkewSalt
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions SQL registration + salted aggregation semantics.
  * TestSpark's shared session is built through GraftSession, so the
  * extensions are installed at creation (getOrCreate would silently
  * skip extensions on an already-existing session). */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val gspark = TestSpark.spark

  test("graft_dot is callable from SQL via SparkSessionExtensions") {
    val r = gspark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect().head.getDouble(0)
    assert(r == 32.0)
  }

  test("optimizer rule rewrites the declarative fold spelling to graft_dot") {
    // parquet-backed input (a LocalRelation would be evaluated eagerly
    // by ConvertToLocalRelation before the rewrite is observable)
    graft.core.Tables(gspark, TestSpark.sf0001, "embeddings")
      .createOrReplaceTempView("graft_vecs")
    val df = gspark.sql(
      """SELECT vec_id, aggregate(
        |  zip_with(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>),
        |           (x, y) -> x * y),
        |  0.0D, (s, v) -> s + v) AS d FROM graft_vecs""".stripMargin)
    assert(df.queryExecution.optimizedPlan.toString.contains("graft_dot"),
      df.queryExecution.optimizedPlan.toString)
    // result equals the native expression's output
    val viaFold = df.orderBy("vec_id").limit(5).collect().map(_.getDouble(1)).toSeq
    val viaNative = gspark.sql(
      """SELECT vec_id, graft_dot(CAST(embedding AS ARRAY<DOUBLE>),
        |                         CAST(embedding AS ARRAY<DOUBLE>)) AS d
        |FROM graft_vecs""".stripMargin)
      .orderBy("vec_id").limit(5).collect().map(_.getDouble(1)).toSeq
    assert(viaFold == viaNative)
  }

  test("optimizer rule leaves non-dot folds untouched") {
    graft.core.Tables(gspark, TestSpark.sf0001, "embeddings")
      .createOrReplaceTempView("graft_vecs2")
    val df = gspark.sql(
      """SELECT aggregate(
        |  zip_with(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>),
        |           (x, y) -> x + y),
        |  0.0D, (s, v) -> s + v) AS d FROM graft_vecs2""".stripMargin)
    assert(!df.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    assert(df.count() == 500)
  }

  test("salted count equals plain count per key") {
    val sp = gspark
    import sp.implicits._
    // heavy skew: 10k rows on one key, a handful elsewhere
    val df = (Seq.fill(10000)("hot") ++ Seq("a", "a", "b")).toDF("k")
    val salted = SkewSalt.saltedCount(df, Seq("k"), 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == Map("hot" -> 10000L, "a" -> 2L, "b" -> 1L))
  }

  test("salted sum equals plain sum per key") {
    val sp = gspark
    import sp.implicits._
    val df = (1 to 1000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val salted = SkewSalt.saltedSum(df, Seq("k"), col("v"), 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == Map("hot" -> 500500L))
  }

  test("x73: bloom passes are a superset of exact matches, FP accounting is exact") {
    val sp = gspark
    val rows = SparkEntry.queries("x73_bloom_prune")(sp, TestSpark.sf001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, bloom, exact, fp) =>
      // a true member always passes its own bit positions
      assert(bloom >= exact)
      assert(fp == bloom - exact)
      assert(bloom <= n)
    }
    // probe coverage: every order is counted exactly once
    val total = graft.core.Tables(sp, TestSpark.sf001, "orders").count()
    assert(rows.map(_._2).sum == total)
    // the exact side equals a direct semi-join, independently spelled
    val semi = graft.core.Tables(sp, TestSpark.sf001, "orders")
      .join(graft.core.Tables(sp, TestSpark.sf001, "customer")
          .filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .count()
    assert(rows.map(_._4).sum == semi)
  }
}
