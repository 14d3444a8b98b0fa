package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-faithful WordCount API — the programmatic surface a user
  * of the reference's `WordCount` struct (word_count.rs:24-128) maps
  * onto directly:
  *
  *  - `WordCount::new(file, mappers, reducers, bufs)` → `WordCount(spark, path, partitions)`
  *    (buffer sizing is Spark's input-split planning; partitions stands
  *    in for the mapper count)
  *  - `fill_mapper()` (word_count.rs:50-71) → the scan's split planning; no user code
  *  - `map()` tokenize/normalize/bin (:90-117)  → `tokens` (Generator + projections;
  *    the hash partitioner is the shuffle under `counts`)
  *  - `reduce()` + scoreboard merge (:119-128) → `counts` (partial+final
  *    HashAggregate; ADDITIVE merge — the reference's overwrite quirk at
  *    :126 is a bug, SURVEY.md §7)
  *  - scoreboard read-out → `scoreboard()` (driver-side collect; only
  *    for small vocabularies, which a word count's output is)
  */
final class WordCount(spark: SparkSession, path: String, partitions: Int = 0) {

  /** Input lines (the reference's buffered line reader, :73-88). */
  def lines: DataFrame = {
    val raw = spark.read.textFile(path).toDF("line")
    if (partitions > 0) raw.repartition(partitions) else raw
  }

  /** Normalized non-empty tokens: whitespace split, lowercase, strip
    * ONLY ',' and '.' (word_count.rs:99-103); empty tokens dropped
    * (the reference panics on them, :104 — we define them away). */
  def tokens: DataFrame =
    lines.select(explode(split(col("line"), "\\s+")).as("t"))
      .select(translate(lower(col("t")), ",.", "").as("word"))
      .filter(col("word") =!= "")

  /** The reference's reducer bin for a token (word_count.rs:104-106). */
  def bin(reducers: Int): DataFrame =
    tokens.withColumn("bin", pmod(ascii(substring(col("word"), -1, 1)), lit(reducers)))

  /** word → count with additive partial+final merge. */
  def counts: DataFrame =
    tokens.groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Driver-side scoreboard (reference word_count.rs:16, final state). */
  def scoreboard(): Map[String, Long] =
    counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
}
