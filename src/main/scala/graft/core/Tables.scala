package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries take the scale-factor directory as a parameter so the same
  * code runs at sf0.001 (smoke), sf0.01 (oracle gate) and sf0.1 (bench) —
  * and, unchanged, against a 100 TB lake: `spark.read.parquet` plans
  * splits via `spark.sql.files.maxPartitionBytes`, pushes filters and
  * prunes columns at the scan (FileSourceScanExec), so scale-out is a
  * cluster-size question, not a code question.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    // parquet reader rejects; read nanos as long and floor-truncate to
    // micros (identical to DuckDB's nanos→micros truncation). Other
    // tables carry NTZ millis; normalize everything to TimestampType
    // (session TZ is pinned to UTC, so the instant is unchanged).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    val withTs =
      if (name == "events" && raw.schema("ts").dataType == LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    withTs.schema.fields.filter(_.dataType == TimestampNTZType).foldLeft(withTs) {
      (df, f) => df.withColumn(f.name, col(f.name).cast(TimestampType))
    }
  }
}
