package graft

import graft.llm.MinHash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dedup-operator semantics on constructed corpora. */
class DedupSpec extends AnyFunSuite {
  import TestSpark._

  private def docsDF(rows: Seq[(Long, String)]) = {
    val sp = spark
    import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  test("minhash signatures: identical texts get identical signatures") {
    val txt = "the quick brown fox jumps over the lazy dog again and again"
    val sig = MinHash.signatures(MinHash.shingles(docsDF(Seq(1L -> txt, 2L -> txt, 3L -> "completely different content here with other words")), 5))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
  }

  test("minhash candidates find identical pair and skip unrelated pair") {
    val txt = "the quick brown fox jumps over the lazy dog again and again"
    val sig = MinHash.signatures(MinHash.shingles(docsDF(Seq(
      1L -> txt, 2L -> txt,
      3L -> "zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo nnn")), 5))
    val cand = MinHash.candidates(sig).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 2L)))
    assert(!cand.contains((1L, 3L)))
  }

  test("band-pair candidates: lossless for >= 14/16 pairs, subset of single-band") {
    val txt = "the quick brown fox jumps over the lazy dog again and again"
    val sig = MinHash.signatures(MinHash.shingles(docsDF(Seq(
      1L -> txt, 2L -> txt,
      3L -> "zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo nnn")), 5))
    val paired = MinHash.candidatesPaired(sig).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = MinHash.candidates(sig).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical docs agree on all 16 minhashes -> must survive the
    // stricter 2-of-4 banding; a band-pair match implies a band match
    assert(paired.contains((1L, 2L)))
    assert(!paired.contains((1L, 3L)))
    assert(paired.subsetOf(single))
  }

  test("x3 plan is a keyed equi-join: no nested-loop over the pair space") {
    val df = graft.SparkEntry.queries("x3_embedding_neardup")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    spark.catalog.clearCache()
  }

  test("exact dedup counts duplicate groups") {
    val sp = spark
    import sp.implicits._
    val df = Seq("a", "a", "b", "c", "c", "c").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val g = df.groupBy(sha2(col("text"), 256).as("h")).agg(count(lit(1)).as("c"))
      .agg(sum("c").as("total"), count(lit(1)).as("distinct"),
        sum(when(col("c") > 1, 1L).otherwise(0L)).as("groups"))
      .collect().head
    assert(g.getLong(0) == 6 && g.getLong(1) == 3 && g.getLong(2) == 2)
  }

  test("shingling is deterministic and lowercased") {
    val a = MinHash.shingles(docsDF(Seq(1L -> "Hello World")), 5)
      .collect().map(_.getLong(1)).sorted.toSeq
    val b = MinHash.shingles(docsDF(Seq(1L -> "hello world")), 5)
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(a == b)
    assert(a.size == "hello world".length - 4)
  }
}
