package graft

import graft.core.Q
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The full declared query surface lives in the domain modules; this
  * object just assembles the registry.
  */
object SparkEntry {

  val registry: Seq[Q] =
    graft.ops.WordCountQueries.all ++
      graft.ops.SkewQueries.all ++
      graft.gemm.GemmQueries.all ++
      graft.relational.RelationalQueries.all ++
      graft.relational.SqlQueries.all ++
      graft.relational.BehaviorQueries.all ++
      graft.relational.MergeQueries.all ++
      graft.relational.GraphQueries.all ++
      graft.llm.DedupQueries.all ++
      graft.llm.SimilarityQueries.all ++
      graft.llm.TextQueries.all ++
      graft.llm.ChunkingQueries.all ++
      graft.llm.CurationQueries.all ++
      graft.llm.BpeQueries.all ++
      graft.llm.PipelineQueries.all ++
      graft.llm.MultimodalQueries.all ++
      graft.sources.BucketedQueries.all ++
      graft.sources.ExportQueries.all ++
      graft.sources.RoundTripQueries.all ++
      graft.streaming.StreamingQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("r1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Each run is
    * wrapped in a CacheScope so query-internal persisted intermediates
    * are released after the result's first materialization — library
    * callers don't accumulate orphaned cached blocks across calls. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { q =>
      q.name -> ((s: SparkSession, d: String) =>
        graft.core.CacheScope.scoped(q.run(s, d)))
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap

  /** The oracle-less queries and WHY each is rows-only by design
    * (with its gating spec) — dumped by Verify as rows_only.json so
    * the correctness artifact needs no tribal knowledge to read. */
  def rowsOnly: Map[String, String] =
    registry.flatMap(q => q.rowsOnlyNote.map(n => q.name -> n)).toMap
}
