package graft

import graft.gemm.{BlockGemm, Grid}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** MLlib BlockMatrix GEMM equals the relational coordinate-form GEMM at
  * the reference shape (integer-valued, so doubles are exact), plus the
  * closest_factor grid chooser (reference util.rs:21-61). */
class BlockGemmSpec extends AnyFunSuite {
  import TestSpark._

  test("closestFactor returns the nearest divisor, ties downward (property)") {
    val prop = Prop.forAll(Gen.choose(1, 500), Gen.choose(1, 500)) {
      (value: Int, factor: Int) =>
        val got = Grid.closestFactor(value, factor)
        val f = factor.max(1).min(value)
        val best = (1 to value).filter(value % _ == 0).map(d => math.abs(d - f)).min
        // if the upward candidate was chosen, the equidistant downward
        // value must not have been a divisor (ties resolve downward)
        val tieOk = got <= f || 2 * f - got < 1 || value % (2 * f - got) != 0
        value % got == 0 && math.abs(got - f) == best && tieOk
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("squareish covers the grid and blockSizes tile the matrix") {
    for (p <- 1 to 64) {
      val (gm, gn) = Grid.squareish(p)
      assert(gm * gn == p)
    }
    val (r, c) = Grid.blockSizes(100, 40, 8)
    // 8 -> 2x4 grid (reference run: para_m=2, para_n=4) -> 50x10 blocks
    assert(r == 50 && c == 10)
  }

  test("auto-gridded multiply is correct at a non-square shape") {
    val sp = spark
    val (m, n, k) = (96L, 40L, 112L)
    val a = sp.range(m * k).selectExpr(
      s"id div $k AS i", s"id % $k AS j", s"(id div $k * 7 + id % $k * 13) % 10 AS v")
    val b = sp.range(k * n).selectExpr(
      s"id div $n AS i", s"id % $n AS j", s"(id div $n * 11 + id % $n * 3) % 10 AS v")
    val c = BlockGemm.multiply(sp, a, b) // auto block grid via Grid
    import org.apache.spark.sql.functions._
    val got = c.groupBy("i").agg(sum(col("v")).cast("long").as("s"))
      .collect().map(r2 => r2.getLong(0) -> r2.getLong(1)).toMap
    // plain SQL GEMM as the oracle
    val want = a.toDF("i", "kk", "av").join(b.toDF("kk2", "j", "bv"), col("kk") === col("kk2"))
      .groupBy("i").agg(sum(col("av") * col("bv")).cast("long").as("s"))
      .collect().map(r2 => r2.getLong(0) -> r2.getLong(1)).toMap
    assert(got == want)
  }

  test("exactness bound: k·max|A|·max|B| over 2^53 is refused, at it is exact") {
    // VERDICT r12 task 5: values ride Double through MLlib BlockMatrix,
    // so the 2^53 mantissa bound must be enforced, not just documented.
    val sp = spark
    import sp.implicits._
    def m1(v: Long) = Seq((0L, 0L, v)).toDF("i", "j", "v")
    // 1x1 matrices, kDim = 1: 2^27 · 2^27 = 2^54 > 2^53 — refused
    // before any block work (the silent-rounding case)
    val e = intercept[IllegalArgumentException] {
      BlockGemm.multiply(sp, m1(1L << 27), m1(1L << 27))
    }
    assert(e.getMessage.contains("2^53"))
    // exactly AT the bound: 2^26 · 2^27 = 2^53 — allowed and exact
    val ok = BlockGemm.multiply(sp, m1(1L << 26), m1(1L << 27)).collect()
    assert(ok.length == 1 && ok(0).getDouble(2) == (1L << 53).toDouble)
    // negative values count by magnitude
    val e2 = intercept[IllegalArgumentException] {
      BlockGemm.multiply(sp, m1(-(1L << 27)), m1(1L << 27))
    }
    assert(e2.getMessage.contains("2^53"))
  }

  test("BlockMatrix multiply matches the relational GEMM row checksums") {
    val sp = spark
    val (m, n, k) = (128L, 128L, 512L)
    val a = sp.range(m * k).selectExpr(
      s"id div $k AS i", s"id % $k AS j", s"(id div $k * 7 + id % $k * 13) % 10 AS v")
    val b = sp.range(k * n).selectExpr(
      s"id div $n AS i", s"id % $n AS j", s"(id div $n * 11 + id % $n * 3) % 10 AS v")

    val c = BlockGemm.multiply(sp, a, b, blockSize = 64)
    import org.apache.spark.sql.functions._
    val rowSums = c.groupBy("i").agg(sum(col("v")).cast("long").as("row_sum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val want = SparkEntry.queries("gemm1_row_checksum")(sp, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rowSums == want)
  }
}
