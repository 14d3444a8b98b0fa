package graft

import graft.llm.MlLsh
import org.scalatest.funsuite.AnyFunSuite

/** MLlib MinHashLSH interop: its approx self-join must recall every
  * exact J >= 0.5 pair the gated x2 query reports. */
class MlLshSpec extends AnyFunSuite {
  import TestSpark._

  test("approxSimilarityJoin recalls all exact x2 near-dup pairs") {
    val exact = SparkEntry.queries("x2_jaccard_neardup")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)

    val approx = MlLsh.neardupCandidates(spark, sf0001, gram = 9, maxDistance = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val missed = exact -- approx
    assert(missed.isEmpty, s"MLlib LSH missed ${missed.size} of ${exact.size} exact pairs: $missed")
  }
}
