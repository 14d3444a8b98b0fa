package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted two-phase aggregation for skewed keys (SURVEY.md §7 scale
  * rule). A hot key that would pin one reducer is spread over
  * `saltBuckets` sub-keys for the partial aggregate, then the partials
  * collapse in a second (tiny) aggregate. AQE's skew handling covers
  * joins; this covers aggregations whose skew AQE cannot split because
  * a key's rows must meet in one task.
  *
  * Correct for any commutative re-aggregable pair (count→sum, sum→sum,
  * min→min, max→max) — the caller names the two phases explicitly.
  */
object SkewSalt {

  /** Count rows per key with salting. Output: (key..., cnt). */
  def saltedCount(df: DataFrame, keys: Seq[String], saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_partial"))
    phase1.groupBy(keys.map(col): _*)
      .agg(sum("_partial").as("cnt"))
  }

  /** Sum a column per key with salting. Output: (key..., total). */
  def saltedSum(df: DataFrame, keys: Seq[String], value: Column, saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
      .withColumn("_v", value)
    salted.groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum("_v").as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum("_partial").as("total"))
  }
}
