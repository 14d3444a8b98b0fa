package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GEMM correctness: the declared gemm1 row checksums against a plain
  * Scala triple loop at the reference shape, plus a property-style check
  * (seeded random cases) that the relational GEMM (join + groupBy + sum)
  * equals naive multiply on random small integer matrices.
  */
class GemmSpec extends AnyFunSuite {
  import TestSpark._

  test("gemm1 row sums match a triple-loop oracle at m=128 n=128 k=512") {
    val (m, n, k) = (128, 128, 512)
    val a = Array.tabulate(m, k)((i, kk) => ((i.toLong * 7 + kk.toLong * 13) % 10))
    val b = Array.tabulate(k, n)((kk, j) => ((kk.toLong * 11 + j.toLong * 3) % 10))
    val rowSums = Array.tabulate(m) { i =>
      var s = 0L
      var j = 0
      while (j < n) { var kk = 0; while (kk < k) { s += a(i)(kk) * b(kk)(j); kk += 1 }; j += 1 }
      s
    }
    val got = SparkEntry.queries("gemm1_row_checksum")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == m)
    (0 until m).foreach(i => assert(got(i.toLong) == rowSums(i), s"row $i"))
  }

  test("relational GEMM equals naive multiply on random integer matrices") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val (m, n, k) = (1 + rnd.nextInt(6), 1 + rnd.nextInt(6), 1 + rnd.nextInt(6))
      val av = Vector.fill(m * k)(rnd.nextLong(11) - 5)
      val bv = Vector.fill(k * n)(rnd.nextLong(11) - 5)
      val sp = spark
      import sp.implicits._
      val a = av.zipWithIndex.map { case (v, x) => (x / k, x % k, v) }.toDF("i", "k", "a")
      val b = bv.zipWithIndex.map { case (v, x) => (x / n, x % n, v) }.toDF("k", "j", "b")
      val c = a.join(b, "k").groupBy("i", "j").agg(sum(col("a") * col("b")).as("v"))
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      for (i <- 0 until m; j <- 0 until n) {
        val expect = (0 until k).map(kk => av(i * k + kk) * bv(kk * n + j)).sum
        assert(c.getOrElse((i, j), 0L) == expect)
      }
    }
  }
}
