package graft

import graft.functions.MinHashAggregator
import graft.llm.MinHash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The typed Aggregator signature path equals the 16-min-column path. */
class AggregatorSpec extends AnyFunSuite {
  import TestSpark._

  test("MinHashAggregator == MinHash.signatures on sf0.001 documents") {
    val sp = spark
    import sp.implicits._
    val sh = MinHash.shingles(MinHash.docs(spark, sf0001), 5)

    val viaAgg = sh.select(col("doc_id"), col("h")).as[(Long, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(MinHashAggregator.toColumn.name("sig"))
      .map { case (id, arr) => (id, arr.toSeq) }
      .collect().toMap

    val viaCols = MinHash.signatures(sh).collect()
      .map(r => r.getLong(0) -> (1 to 16).map(r.getLong(_)).toSeq).toMap

    assert(viaAgg.size == viaCols.size)
    viaCols.foreach { case (id, sig) => assert(viaAgg(id) == sig, s"doc $id") }
  }

  test("OverwriteMergeAggregator reproduces the reference scoreboard quirk") {
    val sp = spark
    import sp.implicits._
    // word counted in rounds 0..2 with different per-round counts; the
    // reference's extend-merge keeps only the LAST round's count.
    val rows = Seq(
      ("rage", 0L, 3L), ("rage", 1L, 5L), ("rage", 2L, 2L),
      ("night", 0L, 7L),
      ("light", 1L, 4L), ("light", 0L, 9L))
    val got = rows.toDF("word", "round", "cnt").as[(String, Long, Long)]
      .groupByKey(_._1).mapValues(r => (r._2, r._3))
      .agg(graft.functions.OverwriteMergeAggregator.toColumn.name("last"))
      .collect().toMap
    assert(got == Map("rage" -> 2L, "night" -> 7L, "light" -> 4L))
  }
}
