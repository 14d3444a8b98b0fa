package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query of the engine's declared surface (SURVEY.md §2C).
  *
  * @param name          stable id, also the driver's correctness-gate key
  * @param oracle        equivalent ANSI SQL for DuckDB over the same tables;
  *                      None → driver records a weaker rows-only check
  * @param run           the Spark-native implementation
  * @param rowsOnlyNote  for oracle-less queries: WHY rows-only is the
  *                      design (not a gap) + the spec that gates it —
  *                      surfaced in Verify's rows_only.json so the
  *                      correctness artifact is self-explanatory
  */
final case class Q(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame,
    rowsOnlyNote: Option[String] = None)

object Q {
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, Some(oracle), run)
}
