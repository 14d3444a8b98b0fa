package graft

import graft.core.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 layout + sketch operators: x59 z-order Morton layout, x60
  * Misra-Gries heavy n-grams, x58 PII scrubbing. Each test pins the
  * property the gated query's oracle can't see: the bit-interleave
  * formula itself, the clustering advantage over a linear sort, the
  * sketch's exactness guarantee, and the scrubber's per-type counts.
  */
class LayoutSketchSpec extends AnyFunSuite {
  import TestSpark._

  /** The same 4-round shift-mask spread x59 uses. */
  private def spread(c: Column): Column = {
    val a = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(16711935L))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(252645135L))
    val d = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(858993459L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(1431655765L))
  }

  test("x59: Morton interleave matches hand-computed codes") {
    import spark.implicits._
    // morton(x, y) = sum x_i 4^i + 2 sum y_i 4^i
    val rows = Seq((0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L), (3L, 5L, 39L),
      (65535L, 0L, 1431655765L), (0L, 65535L, 2863311530L),
      (65535L, 65535L, 4294967295L))
    val got = rows.map { case (x, y, _) => (x, y) }.toDF("cx", "dy")
      .select(col("cx"), col("dy"),
        spread(col("cx")).bitwiseOR(shiftleft(spread(col("dy")), 1)).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == rows.map { case (x, y, m) => (x, y, m) })
  }

  test("x59: every z-bucket is an 8x8 tile of the 64x64 grid (both dims bounded)") {
    val z = SparkEntry.queries("x59_zorder_layout")(spark, sf0001).collect()
    assert(z.length > 8, s"expected many occupied tiles, got ${z.length}")
    z.foreach { r =>
      val (zb, ckLo, ckHi, dyLo, dyHi) =
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      // the top 6 bits of the 12-bit code fix bits 5..3 of BOTH dims:
      // each bucket's box sits inside one 8x8 tile — the two-predicate
      // pruning property a linear sort (1x64 slabs) cannot give
      assert(ckHi - ckLo <= 7 && dyHi - dyLo <= 7, r.toString)
      assert(ckLo / 8 == ckHi / 8 && dyLo / 8 == dyHi / 8, r.toString)
      // and the tile is the one the bucket id names
      assert((ckLo / 8) + 8 * (dyLo / 8) ==
        Seq(0, 1, 2).map(i => ((zb >> (2 * i)) & 1L) << i).sum +
        8 * Seq(0, 1, 2).map(i => ((zb >> (2 * i + 1)) & 1L) << i).sum,
        r.toString)
    }
    // counts conserve the table
    val n = Tables(spark, sf0001, "orders").count()
    assert(z.map(_.getLong(1)).sum == n)
  }

  test("x60: sketch-then-verify output equals the plain GROUP BY ... HAVING") {
    val got = SparkEntry.queries("x60_heavy_ngrams")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // independent declarative recompute (no sketch)
    val annotated = concat(col("text"),
      when(col("doc_id") % 3 =!= 0, lit(" terms of service apply here"))
        .otherwise(lit("")),
      when(col("doc_id") % 5 === 0, lit(" all rights reserved worldwide"))
        .otherwise(lit("")))
    val tg = Tables(spark, sf0001, "documents")
      .select(explode(graft.functions.ShingleExpressions
        .tokenNgrams(graft.core.Cols.wsTokens(annotated), 3)).as("ngram"))
    val n = tg.count()
    val want = tg.groupBy("ngram").agg(count(lit(1)).as("freq"))
      .filter(col("freq") * 500 > n)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == want)
    // the planted boilerplate is what it finds
    assert(got.exists(_._1 == "terms of service"), got.map(_._1))
    assert(got.nonEmpty && got.size < 30)
  }

  test("x58: per-type redaction counts equal the planted-fixture counts") {
    val rows = SparkEntry.queries("x58_pii_scrub")(spark, sf0001).collect()
    val docs = Tables(spark, sf0001, "documents").select("doc_id")
    val emails = docs.filter(col("doc_id") % 7 === 3).count()
    val ips = docs.filter(col("doc_id") % 11 === 5).count()
    val phones = docs.filter(col("doc_id") % 13 === 2).count()
    assert(rows.map(_.getLong(3)).sum == emails)
    assert(rows.map(_.getLong(4)).sum == ips)
    assert(rows.map(_.getLong(5)).sum == phones)
    // each doc carries at most one planted item per type, so
    // docs_with_pii is bounded by the union and hits every planted doc
    val withPii = docs.filter(col("doc_id") % 7 === 3 ||
      col("doc_id") % 11 === 5 || col("doc_id") % 13 === 2).count()
    assert(rows.map(_.getLong(2)).sum == withPii)
    // redaction strictly shrinks text (placeholders are shorter than
    // any planted item: emails ≥ 20 chars vs [EMAIL] = 7)
    assert(rows.map(_.getLong(6)).sum > 0)
  }
}
