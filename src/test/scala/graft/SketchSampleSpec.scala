package graft

import graft.core.{Cols, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 sketch + sampling operators: x76 count-min frequency
  * estimation and x77 priority sampling. Each test pins the property
  * the gated query's oracle replay can't state on its own: the CMS
  * one-sided error guarantee (estimates NEVER undercount), and the
  * sample's equivalence to the full-sort weighted draw it replaces.
  */
class SketchSampleSpec extends AnyFunSuite {
  import TestSpark._

  test("x76: CMS estimates never undercount, and true counts are exact") {
    val rows = SparkEntry.queries("x76_cms_frequency")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // one-sided error: every occurrence of t increments all 4 of t's
    // cells, so min-of-cells >= t's own count — an UNDERcount is
    // impossible regardless of hash choice or data
    rows.foreach { case (t, est, truth) =>
      assert(est >= truth, s"CMS undercounted '$t': est $est < true $truth")
    }
    // the true_freq column is the plain exact count
    val exact = Tables(spark, sf0001, "documents")
      .select(explode(Cols.wsTokens(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("f"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    rows.foreach { case (t, _, truth) =>
      assert(exact(t) == truth, s"true_freq mismatch for '$t'")
    }
    // the probe set is the distinct tokens of the doc_id % 97 = 17 slice
    val probeN = Tables(spark, sf0001, "documents")
      .filter(col("doc_id") % 97 === 17)
      .select(explode(Cols.wsTokens(col("text"))).as("t"))
      .select("t").distinct().count()
    assert(rows.length == probeN)
  }

  test("s17: CMS linearity — slice sketches sum to the whole-corpus sketch") {
    import graft.llm.TextQueries.{cmsSketch, tokenHashes}
    val docs = Tables(spark, sf0001, "documents")
    val whole = cmsSketch(tokenHashes(docs))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val parts = Seq(docs.filter(col("doc_id") % 4 < 2),
      docs.filter(col("doc_id") % 4 === 2),
      docs.filter(col("doc_id") % 4 === 3))
    val summed = parts.flatMap(p => cmsSketch(tokenHashes(p))
        .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(summed == whole)
  }

  test("x77: priority sample equals the full-sort weighted draw") {
    val got = SparkEntry.queries("x77_priority_sample")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // independent recompute: full sort per stratum (the window form the
    // TopKPerKey operator replaces), same integer key
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("pkey", "doc_id")
    val want = Tables(spark, sf0001, "documents")
      .select(col("lang"), col("doc_id"),
        greatest(col("n_chars").cast("long"), lit(1L)).as("wt"),
        (col("doc_id") % 1000003L * 2971215073L % 1000003L).as("u"))
      .withColumn("pkey", expr("(u * 1000000000000L) DIV wt"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 10)
      .select(col("lang"), col("rn"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet == want.toSet)
    // every stratum contributes min(10, stratum size) rows
    val sizes = Tables(spark, sf0001, "documents").groupBy("lang").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val perLang = got.groupBy(_._1).view.mapValues(_.length)
    sizes.foreach { case (lang, n) =>
      assert(perLang.getOrElse(lang, 0) == math.min(10L, n).toInt, s"lang $lang")
    }
    // ranks are 1..k with no gaps (the sample is a total-order prefix)
    got.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.sameElements(1L to rs.length))
    }
  }

  test("x78: DSIR resample equals the full-sort draw over x57's scores") {
    val got = SparkEntry.queries("x78_dsir_sample")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("pkey", "doc_id")
    val want = graft.llm.CurationQueries.dsirScores(spark, sf0001)
      .select(col("lang"), col("doc_id"),
        greatest(col("score"), lit(1L)).as("wt"),
        (col("doc_id") % 1000003L * 1640531527L % 1000003L).as("u"))
      .withColumn("pkey", expr("(u * 1000000000000L) DIV wt"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 10)
      .select(col("lang"), col("rn"), col("doc_id"), col("wt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSet == want.toSet)
    // the draw is importance-BIASED: the selected docs' mean score
    // exceeds the corpus mean (weights came from x57, not uniform)
    val scores = graft.llm.CurationQueries.dsirScores(spark, sf0001)
      .select("lang", "doc_id", "score")
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    val selMean = got.map(t => scores((t._1, t._3))).sum.toDouble / got.length
    val allMean = scores.values.sum.toDouble / scores.size
    assert(selMean > allMean, s"selected mean $selMean <= corpus mean $allMean")
    releaseAllRdds() // dsirScores cacheEager'd outside a CacheScope here
  }
}
