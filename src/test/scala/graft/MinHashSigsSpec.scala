package graft

import graft.llm.MinHash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit parity of the native MinHashSigs expression against the retired
  * declarative 16-fold spelling (array_min over transform per seed),
  * including the empty-set null contract. The native form exists
  * because HOFs never codegen and their shared interpreted-eval paths
  * degrade in long-lived JVMs (BASELINE.md round-5 notes).
  */
class MinHashSigsSpec extends AnyFunSuite {
  import TestSpark._

  test("native signatures equal the declarative fold on the corpus") {
    for (gram <- Seq(5, 9)) {
      val sets = MinHash.shingleSets(MinHash.docs(spark, sf001), gram)
        .filter(col("c") > 0)
      val native = MinHash.signaturesFromSets(sets).orderBy("doc_id").collect()
      val hof = MinHash.signaturesFromSetsHof(sets).orderBy("doc_id").collect()
      assert(native.length == hof.length && native.length > 0)
      assert(native.map(_.toString).toSeq == hof.map(_.toString).toSeq,
        s"native/declarative signature mismatch at gram=$gram")
    }
  }

  test("empty shingle set yields null lanes in both spellings") {
    val sp = spark
    import sp.implicits._
    val sets = Seq((1L, Seq.empty[Long], 0L), (2L, Seq(7L, 9L), 2L))
      .toDF("doc_id", "hs", "c")
    val native = MinHash.signaturesFromSets(sets).orderBy("doc_id").collect()
    val hof = MinHash.signaturesFromSetsHof(sets).orderBy("doc_id").collect()
    assert(native.map(_.toString).toSeq == hof.map(_.toString).toSeq)
    assert(native.head.isNullAt(1), "empty set must produce null mh0")
    assert(!native.last.isNullAt(1))
  }

  test("native lanes equal a scala reference fold on random hash arrays (seeded property)") {
    // Covers the full value domain the expression can see, not just the
    // corpus: shingle hashes are nonneg int64 folds up to ~2^45, plus
    // boundary values. Reference = the same arithmetic evaluated
    // independently in plain Scala.
    val P = 2147483647L
    val seeds = graft.functions.MinHashSigs.SEEDS
    val rnd = new scala.util.Random(431)
    for (_ <- 1 to 200) {
      val n = 1 + rnd.nextInt(60)
      val hs = Array.fill(n)(rnd.nextLong(1L << 45)) ++
        Seq(0L, P - 1, P, 1L << 45).take(rnd.nextInt(4))
      val expect = seeds.map { case (a, b) =>
        hs.map(h => ((h % P) * a + b) % P).min
      }
      val got = graft.functions.MinHashSigs
        .compute(new org.apache.spark.sql.catalyst.util.GenericArrayData(hs))
        .toLongArray().toSeq
      assert(got == expect, s"lane mismatch for n=$n")
    }
  }

  test("plan evaluates the native expression once, not 16 times") {
    val sets = MinHash.shingleSets(MinHash.docs(spark, sf0001), 5)
      .filter(col("c") > 0)
    val plan = MinHash.signaturesFromSets(sets)
      .queryExecution.optimizedPlan.toString
    val evals = "graft_minhash_sigs".r.findAllIn(plan).length
    assert(evals == 1, s"expected 1 graft_minhash_sigs in plan, found $evals")
  }
}
