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
    // GraftSession.builder sets the reader confs once; the guarded sets
    // below only fire on a vanilla session (e.g. a bare spark-shell) —
    // no steady-state per-call conf mutation. Both matter there:
    // nanosAsLong so the events scan doesn't reject TIMESTAMP(NANOS),
    // and inferTimestampNTZ=false so NTZ-millis columns load as
    // TimestampType UTC instants rather than NTZ values that a non-UTC
    // session would shift when cast.
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if (spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "true") != "false")
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

  /** Ensure at least the session's default parallelism ahead of a
    * row-EXPANDING stage (tokenize/shingle/plane-projection). Split
    * planning sizes scan tasks by input bytes, but an explode amplifies
    * work 100-1000x past the bytes read — a small single-row-group
    * parquet file would otherwise pin the whole map stage to ONE task.
    * No-op when the scan already plans enough splits (the 100 TB case,
    * where adding a shuffle here would be pure waste). */
  def fanOut(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
