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
    * with the given block edge, returning coordinate-form (i, j, v). */
  def multiply(spark: SparkSession, a: DataFrame, b: DataFrame,
      blockSize: Int = 64): DataFrame = {
    def toBlock(df: DataFrame): BlockMatrix = {
      val entries = df.rdd.map(r =>
        MatrixEntry(r.getLong(0), r.getLong(1), r.getLong(2).toDouble))
      new CoordinateMatrix(entries).toBlockMatrix(blockSize, blockSize).cache()
    }
    val c = toBlock(a).multiply(toBlock(b)).toCoordinateMatrix()
    val sp = spark
    import sp.implicits._
    c.entries.map(e => (e.i, e.j, e.value)).toDF("i", "j", "v")
  }
}
