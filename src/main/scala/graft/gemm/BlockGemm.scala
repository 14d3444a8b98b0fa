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
    * outer_product.rs:162-167). */
  def multiply(spark: SparkSession, a: DataFrame, b: DataFrame,
      blockSize: Int = 0): DataFrame = {
    // BlockMatrix caches live at the RDD layer, invisible to the
    // DataFrame cache manager — register every persist this call
    // creates with the enclosing CacheScope (no-op outside one), so a
    // registry query using the block path releases its blocks after
    // materialization like every DataFrame intermediate (the
    // GraftFacadeSpec leak contract).
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    def toBlock(df: DataFrame, rows: Int, cols: Int): BlockMatrix = {
      val entries = df.rdd.map(r =>
        MatrixEntry(r.getLong(0), r.getLong(1), r.getLong(2).toDouble))
      new CoordinateMatrix(entries).toBlockMatrix(rows, cols).cache()
    }
    val (aRows, aCols, bRows, bCols) =
      if (blockSize > 0) (blockSize, blockSize, blockSize, blockSize)
      else {
        // One tiny agg per input: the block planner needs (m, k, n),
        // exactly as the reference's set_gemm takes them as arguments.
        import org.apache.spark.sql.functions.{max => fmax}
        val Array(am, ak) = a.agg(fmax(a(a.columns(0))), fmax(a(a.columns(1))))
          .collect().head.toSeq.map(_.asInstanceOf[Long] + 1L).toArray
        val Array(bk, bn) = b.agg(fmax(b(b.columns(0))), fmax(b(b.columns(1))))
          .collect().head.toSeq.map(_.asInstanceOf[Long] + 1L).toArray
        val par = spark.sparkContext.defaultParallelism
        // Result blocks tile C[m, n] over a near-square grid; the inner
        // (k) edge is ceil(k / parallelism) — the reference's intended
        // mapper split (the `(k + mappers - 1) / mappers` line set_gemm
        // comments out in favor of a hardcoded 4) — and is shared by A's
        // column blocks and B's row blocks, as BlockMatrix.multiply
        // requires.
        val (rows, cols) = Grid.blockSizes(am, bn, par)
        val kEdge = ((ak.max(bk) + par - 1) / par).max(1L).min(Int.MaxValue.toLong).toInt
        (rows, kEdge, kEdge, cols)
      }
    val c = toBlock(a, aRows, aCols).multiply(toBlock(b, bRows, bCols))
      .toCoordinateMatrix()
    spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => persistedBefore(id) }
      .values
      .foreach(r => graft.core.CacheScope.release(() => { r.unpersist(false); () }))
    val sp = spark
    import sp.implicits._
    c.entries.map(e => (e.i, e.j, e.value)).toDF("i", "j", "v")
  }
}
