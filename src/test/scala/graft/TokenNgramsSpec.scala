package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit parity of the native TokenNgrams expression against the retired
  * `transform(sequence(1, size-n+1), i -> concat_ws(' ', slice(toks,
  * i, n)))` spelling, plus the sub-n empty contract the declarative
  * form lacks (sequence(1, 0) descends).
  */
class TokenNgramsSpec extends AnyFunSuite {
  import TestSpark._

  private def hof(n: Int) = expr(
    s"transform(sequence(1, size(toks) - ${n - 1}), " +
      s"i -> concat_ws(' ', slice(toks, i, $n)))")

  test("native n-grams equal the declarative transform on the corpus, n in {2,3,8}") {
    val t = graft.core.Tables(spark, sf001, "documents")
      .select(graft.core.Cols.wsTokens(col("text")).as("toks"))
    for (n <- Seq(2, 3, 8)) {
      val guarded = t.filter(size(col("toks")) >= n)
      val native = guarded
        .select(graft.functions.ShingleExpressions.tokenNgrams(col("toks"), n).as("g"))
        .orderBy(col("g")).collect()
      val declar = guarded.select(hof(n).as("g")).orderBy(col("g")).collect()
      assert(native.nonEmpty && native.length == declar.length)
      assert(native.map(_.toString).toSeq == declar.map(_.toString).toSeq,
        s"n-gram mismatch at n=$n")
    }
  }

  test("inputs shorter than n yield the empty array, not a descending-sequence artifact") {
    val sp = spark
    import sp.implicits._
    val df = Seq(Seq("only"), Seq.empty[String]).toDF("toks")
    val rows = df.select(
      graft.functions.ShingleExpressions.tokenNgrams(col("toks"), 3).as("g")).collect()
    rows.foreach(r => assert(r.getSeq[String](0).isEmpty))
  }
}
