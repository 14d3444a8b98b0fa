package graft.llm

import org.apache.spark.ml.feature.{MinHashLSH, MinHashLSHModel}
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MLlib interop: near-dup candidate generation through
  * org.apache.spark.ml.feature.MinHashLSH (the stock physical path
  * SURVEY.md §4 names for L2/L3 at scale), over the same shingle sets
  * as the hand-rolled MinHash pipeline.
  *
  * The hand-rolled path stays the gated semantics (its hashes are
  * portable to the DuckDB oracle; MLlib's are not), but a library user
  * who wants MLlib's approxSimilarityJoin / approxNearestNeighbors
  * machinery gets it from here with one call. Seeded → deterministic.
  */
object MlLsh {

  private val dim = 1 << 20

  /** documents.text → (doc_id, features) sparse binary shingle vectors. */
  def shingleFeatures(spark: SparkSession, dir: String, gram: Int): DataFrame = {
    val sp = spark
    import sp.implicits._
    MinHash.shingles(MinHash.docs(spark, dir), gram)
      .select(col("doc_id"), pmod(col("h"), lit(dim.toLong)).cast("int").as("f"))
      .as[(Long, Int)]
      .groupByKey(_._1)
      .mapGroups { (id, it) =>
        val idx = it.map(_._2).toArray.distinct.sorted
        (id, Vectors.sparse(dim, idx, Array.fill(idx.length)(1.0)))
      }
      .toDF("doc_id", "features")
  }

  def fit(features: DataFrame, numTables: Int = 8): MinHashLSHModel =
    new MinHashLSH()
      .setNumHashTables(numTables)
      .setSeed(42L)
      .setInputCol("features")
      .setOutputCol("hashes")
      .fit(features)

  /** Self-join candidates with Jaccard distance below `maxDistance`
    * (distance = 1 - Jaccard). Returns (d1, d2, jaccard_distance). */
  def neardupCandidates(spark: SparkSession, dir: String, gram: Int,
      maxDistance: Double): DataFrame = graft.core.CacheScope.scoped {
    // feats fans out to fit() AND both sides of the similarity join —
    // the multi-branch case the repo's cacheEager rule exists for.
    val feats = graft.core.CacheScope.cacheEager(shingleFeatures(spark, dir, gram))
    val model = fit(feats)
    model.approxSimilarityJoin(feats, feats, maxDistance, "dist")
      .select(col("datasetA.doc_id").as("d1"), col("datasetB.doc_id").as("d2"), col("dist"))
      .filter(col("d1") < col("d2"))
  }
}
