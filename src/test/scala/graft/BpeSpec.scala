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

  test("delimiter-sharing adjacents merge fully: abab -> [ab, ab]") {
    // The ADVICE-r6 divergence case: round-6's non-overlapping string
    // replace on ' a b a b ' matched once (the match consumed the
    // middle space) and yielded 'ab a b'; the PairMerge array pass
    // merges both occurrences, so round 2's top pair is (ab ab) —
    // the faithful Sennrich re-tokenization.
    val got = BpeQueries.train(wordTable(Seq(("abab", 1L))), 2)
    assert(got(0) == (1L, "a b", "ab", 2L))
    assert(got(1) == (2L, "ab ab", "abab", 1L))
  }

  test("oracle's candidate-chain parity formula == sequential greedy scan") {
    // The x30 oracle can't express an imperative scan, so it selects
    // candidate i iff the consecutive-candidate run before i has even
    // length. Property-check that closed form against the reference
    // sequential scan (and against PairMerge.compute itself) over
    // exhaustive small alphabets — chains only arise in equal-symbol
    // runs, which {a, b} x length<=10 covers densely.
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def seqScan(l: Vector[String], a: String, b: String, m: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < l.length) {
        if (i + 1 < l.length && l(i) == a && l(i + 1) == b) { out += m; i += 2 }
        else { out += l(i); i += 1 }
      }
      out.result()
    }
    def parityForm(l: Vector[String], a: String, b: String, m: String): Vector[String] = {
      val n = l.length
      val cnd = (0 until n - 1).map(i => l(i) == a && l(i + 1) == b)
      val sel = (0 until n - 1).map { i =>
        val lastNon = (0 until i).reverse.find(j => !cnd(j)).map(_ + 1).getOrElse(0)
        cnd(i) && (i - lastNon) % 2 == 0
      }
      (0 until n).flatMap { i =>
        if (i < n - 1 && sel(i)) Some(m)
        else if (i >= 1 && sel(i - 1)) None
        else Some(l(i))
      }.toVector
    }
    val alphabet = Vector("a", "b")
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val l = Vector.fill(rnd.nextInt(10) + 1)(alphabet(rnd.nextInt(2)))
      val (a, b) = (alphabet(rnd.nextInt(2)), alphabet(rnd.nextInt(2)))
      val m = a + b
      val expect = seqScan(l, a, b, m)
      assert(parityForm(l, a, b, m) == expect, s"parity form diverged on $l pair ($a,$b)")
      val arr = new GenericArrayData(l.map(UTF8String.fromString).toArray[Any])
      val got = graft.functions.PairMerge.compute(arr,
        UTF8String.fromString(a), UTF8String.fromString(b), UTF8String.fromString(m))
      assert((0 until got.numElements()).map(got.getUTF8String(_).toString) == expect,
        s"PairMerge.compute diverged on $l pair ($a,$b)")
    }
  }

  test("x30 is deterministic across runs on the corpus") {
    val a = SparkEntry.queries("x30_bpe_merges")(spark, sf0001).collect()
    val b = SparkEntry.queries("x30_bpe_merges")(spark, sf0001).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.length == BpeQueries.Rounds)
  }

  test("x53 encode == independent Scala replay of train + apply") {
    // Full pipeline replay with no shared code: tokenize, count word
    // types, train 8 merge rounds (argmax with the (count desc, pair
    // asc) tie-break, greedy left-to-right apply), encode the
    // vocabulary, roll up per language.
    val docs = graft.core.Tables(spark, sf0001, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.split("\\s+").filter(_.nonEmpty).toVector))
    val freqs: Map[String, Long] =
      docs.flatMap(_._3).groupBy(identity).view.mapValues(_.size.toLong).toMap
    var segs: Map[String, Vector[String]] =
      freqs.keys.map(w => w -> w.map(_.toString).toVector).toMap
    for (_ <- 1 to BpeQueries.Rounds) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      for ((w, syms) <- segs; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        pc(k) = pc.getOrElse(k, 0L) + freqs(w)
      }
      val ((pa, pb), _) = pc.toSeq.minBy { case ((a, b), c) => (-c, a + " " + b) }
      segs = segs.map { case (w, l) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < l.length) {
          if (i + 1 < l.length && l(i) == pa && l(i + 1) == pb) { out += pa + pb; i += 2 }
          else { out += l(i); i += 1 }
        }
        w -> out.result()
      }
    }
    val nSym = segs.view.mapValues(_.size.toLong).toMap
    val exp = docs.filter(_._3.nonEmpty).groupBy(_._2).map { case (lang, ds) =>
      (lang, ds.map(_._1).distinct.size.toLong,
        ds.map(_._3.size.toLong).sum, ds.flatMap(_._3).map(nSym).sum)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("x53_bpe_encode")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == exp, s"got=$got exp=$exp")
  }
}
