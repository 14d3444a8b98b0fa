package graft.gemm

import graft.core.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Blocked outer-product GEMM re-expressed relationally.
  *
  * The reference (/root/reference/src/outer_product.rs:146-368) simulates
  * C[m,n] = Σ_k A[:,k] ⊗ B[k,:] as mapper cross-products over k-slices
  * plus reducer elementwise adds over an m×n grid. In Spark that dataflow
  * IS the canonical SQL GEMM: coordinate-form A ⋈ B on k (the
  * cross-product per k-slice, outer_product.rs:193-208) followed by
  * groupBy(i,j).sum (the elementwise reduce, outer_product.rs:286-352).
  * Catalyst picks the physical join; the partial/final HashAggregate is
  * the reference's local-then-memory VecOp pair. The reducer m×n grid
  * (set_gemm's closest_factor tiling, util.rs:21-61) corresponds to the
  * hash partitioning of the (i,j) aggregation; gemm2 exposes the
  * reference's 2×4 grid (para_m=2, para_n=4) as an explicit block
  * aggregation.
  *
  * Matrices use the reference shape m=128, n=128, k=512 (main.rs:13-14)
  * with integer-valued deterministic generators so sums are exact.
  */
object GemmQueries {

  private val (m, n, k) = (128L, 128L, 512L)

  /** A(i,k) = (i*7 + k*13) % 10 in coordinate form, generated without a
    * cartesian product: one range scan, i = id div k. */
  private def matA(spark: SparkSession): DataFrame =
    spark.range(m * k).selectExpr(
      s"id div $k AS i", s"id % $k AS k", s"(id div $k * 7 + id % $k * 13) % 10 AS a")

  private def matB(spark: SparkSession): DataFrame =
    spark.range(k * n).selectExpr(
      s"id div $n AS k", s"id % $n AS j", s"(id div $n * 11 + id % $n * 3) % 10 AS b")

  /** C = A ⋈ B on k, groupBy(i,j), sum(a*b) — exact integer GEMM.
    * Public: trace.TraceMain runs this reference-shape multiply to
    * produce the EP3 artifact (reference main.rs:12-26). */
  def matC(spark: SparkSession): DataFrame =
    matA(spark).join(matB(spark), "k")
      .groupBy("i", "j").agg(sum(col("a") * col("b")).as("v"))

  private val cteC: String =
    s"""WITH a AS (SELECT i, kk, (i*7 + kk*13) % 10 AS a FROM range(0, $m) t1(i), range(0, $k) t2(kk)),
       |b AS (SELECT kk, j, (kk*11 + j*3) % 10 AS b FROM range(0, $k) t3(kk), range(0, $n) t4(j)),
       |c AS (SELECT i, j, SUM(a*b) AS v FROM a JOIN b USING (kk) GROUP BY i, j)""".stripMargin

  val all: Seq[Q] = Seq(
    Q(
      "gemm1_row_checksum",
      s"""$cteC
         |SELECT i, CAST(SUM(v) AS BIGINT) AS row_sum FROM c GROUP BY i ORDER BY i""".stripMargin
    ) { (spark, _) =>
      matC(spark).groupBy("i").agg(sum("v").cast("long").as("row_sum")).orderBy("i")
    },

    Q(
      "gemm2_block_checksum",
      s"""$cteC
         |SELECT i % 2 AS i_blk, j % 4 AS j_blk, CAST(SUM(v) AS BIGINT) AS blk_sum
         |FROM c GROUP BY 1, 2 ORDER BY i_blk, j_blk""".stripMargin
    ) { (spark, _) =>
      matC(spark)
        .groupBy((col("i") % 2).as("i_blk"), (col("j") % 4).as("j_blk"))
        .agg(sum("v").cast("long").as("blk_sum"))
        .orderBy("i_blk", "j_blk")
    },

    // GEMM3 — blocked GEMM at a shape that PUNISHES a naive physical
    // choice (VERDICT r11 task 5): 1024x1024x1024 integer, 2^30
    // multiply-adds. gemm1/2 pin the reference's own m=128,n=128,k=512
    // (main.rs:13-14), small enough that the flat coordinate join
    // (A ⋈ B on k, 67M joined rows) is harmless; at 1024³ that join
    // materializes 1.07G rows through 1024 join keys — the shape where
    // the execution has to go BLOCKED, as the reference's set_gemm
    // tiling does (outer_product.rs:146-169). The run is
    // BlockGemm.multiply: Grid.blockSizes/closestFactor (the
    // closest_factor port, util.rs:21-61) picks the near-square result
    // grid from the session's parallelism, each block-pair product is
    // a LOCAL dense multiply (the CrossPOp, outer_product.rs:193-208,
    // as in-memory arithmetic instead of a shuffled row join), and the
    // block add-reduce (the VecOp tier, outer_product.rs:286-352) is
    // one k-keyed shuffle of BLOCKS, not of 10^9 elements. GATE: the
    // 8x8 grid of 128-edge block checksums — and the ORACLE restates
    // it through the rank-factored identity Σ_{i∈I,j∈J} C(i,j) =
    // Σ_k (Σ_{i∈I} A(i,k))·(Σ_{j∈J} B(k,j)), which DuckDB evaluates in
    // O((m+n)·k) without ever forming the 2^30 product terms — the
    // oracle stays cheap at any shape while the Spark side does the
    // real multiply. Exactness: block sums ≤ 128²·81·1024 ≈ 1.4·10^9
    // < 2^53, so the double-valued BlockMatrix path is integer-exact.
    // SCALE SHAPE: FLOPs scale as n³ while shuffled bytes scale as
    // n²·(n/kEdge) block replicas — the blocked plan's decade curve is
    // arithmetic-bound (SCALING.md gemm3 legs), where the flat join's
    // is shuffle-bound and ~8x steeper per doubling.
    Q(
      "gemm3_blocked_checksum",
      """WITH a AS (SELECT i, kk, (i*5 + kk*17) % 10 AS a
        |    FROM range(0, 1024) t1(i), range(0, 1024) t2(kk)),
        |b AS (SELECT kk, j, (kk*3 + j*7) % 10 AS b
        |    FROM range(0, 1024) t3(kk), range(0, 1024) t4(j)),
        |ar AS (SELECT i // 128 AS ib, kk, SUM(a) AS sa FROM a GROUP BY 1, 2),
        |br AS (SELECT kk, j // 128 AS jb, SUM(b) AS sb FROM b GROUP BY 1, 2)
        |SELECT ib, jb, CAST(SUM(sa * sb) AS BIGINT) AS blk_sum
        |FROM ar JOIN br USING (kk) GROUP BY 1, 2 ORDER BY ib, jb""".stripMargin
    ) { (spark, _) =>
      val n = 1024L
      val a = spark.range(n * n).selectExpr(
        s"id div $n AS i", s"id % $n AS j", s"(id div $n * 5 + id % $n * 17) % 10 AS v")
      val b = spark.range(n * n).selectExpr(
        s"id div $n AS i", s"id % $n AS j", s"(id div $n * 3 + id % $n * 7) % 10 AS v")
      BlockGemm.multiply(spark, a, b)
        .groupBy(expr("i div 128").as("ib"), expr("j div 128").as("jb"))
        .agg(sum("v").cast("long").as("blk_sum"))
        .orderBy("ib", "jb")
    }
  )
}
