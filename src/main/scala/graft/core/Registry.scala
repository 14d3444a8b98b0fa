package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query of the engine's declared surface (SURVEY.md §2C).
  *
  * @param name    stable id, also the driver's correctness-gate key
  * @param oracle  equivalent ANSI SQL for DuckDB over the same tables;
  *                None → driver records a weaker rows-only check
  * @param run     the Spark-native implementation
  */
final case class Q(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

object Q {
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, Some(oracle), run)
}
