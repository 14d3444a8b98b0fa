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
}
