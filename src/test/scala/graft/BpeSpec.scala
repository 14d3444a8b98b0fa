package graft

import graft.llm.BpeQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the x30 BPE merge trainer: hand-checked merges on a
  * tiny corpus, the greedy left-to-right overlap rule, and
  * determinism. (Cross-engine parity of the full 8-round run is the
  * x30 oracle gate.)
  */
class BpeSpec extends AnyFunSuite {
  import TestSpark._

  private def wordTable(rows: Seq[(String, Long)]) = {
    val sp = spark
    import sp.implicits._
    rows.toDF("word", "f")
      .select(concat_ws(" ", split(col("word"), "")).as("s"), col("f"))
  }

  test("hand-computed merges on a toy corpus, including the tie-break") {
    // {aaab x2, ab x3}: round 1 counts (a a)->4, (a b)->5 => merge "a b".
    // Round 2: "a a ab"x2 gives (a a)->2 and (a ab)->2 — a TIE, broken
    // lexicographically to "a a". Round 3: (aa ab)->2.
    val got = BpeQueries.train(wordTable(Seq(("aaab", 2L), ("ab", 3L))), 3)
    assert(got == Seq(
      (1L, "a b", "ab", 5L),
      (2L, "a a", "aa", 2L),
      (3L, "aa ab", "aaab", 2L)))
  }

  test("greedy left-to-right merge: overlapping pairs are consumed") {
    // "aaa": (a a) appears twice but merging is greedy non-overlapping,
    // so round 1 yields "aa a" — round 2's top pair must be (aa a),
    // NOT (a aa), which is what a right-to-left or re-scanning merge
    // would produce.
    val got = BpeQueries.train(wordTable(Seq(("aaa", 1L))), 2)
    assert(got(0) == (1L, "a a", "aa", 2L))
    assert(got(1) == (2L, "aa a", "aaa", 1L))
  }

  test("single-character words contribute no pairs and break nothing") {
    val got = BpeQueries.train(wordTable(Seq(("a", 100L), ("bc", 1L))), 1)
    assert(got == Seq((1L, "b c", "bc", 1L)))
  }

  test("x30 is deterministic across runs on the corpus") {
    val a = SparkEntry.queries("x30_bpe_merges")(spark, sf0001).collect()
    val b = SparkEntry.queries("x30_bpe_merges")(spark, sf0001).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.length == BpeQueries.Rounds)
  }
}
