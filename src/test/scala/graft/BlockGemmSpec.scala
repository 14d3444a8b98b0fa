package graft

import graft.gemm.BlockGemm
import org.scalatest.funsuite.AnyFunSuite

/** MLlib BlockMatrix GEMM equals the relational coordinate-form GEMM at
  * the reference shape (integer-valued, so doubles are exact). */
class BlockGemmSpec extends AnyFunSuite {
  import TestSpark._

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
