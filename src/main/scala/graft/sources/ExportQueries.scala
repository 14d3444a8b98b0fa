package graft.sources

import graft.core.{Q, Tables}
import graft.streaming.TempWork
import org.apache.spark.sql.functions._

/** Training-shard export: the sink that turns a curated corpus into the
  * fixed-fan-out sharded layout a training loader consumes (SURVEY.md
  * §2B "Sinks"). Shard routing is a pure per-row hash — reproducible on
  * any cluster with no coordination — and the write is Hive-style
  * `partitionBy(shard)`, so the 16 shard directories land in one pass
  * with no global sort. At 100 TB this is the endgame operator of a
  * corpus build: 1000 executors each route their rows locally, every
  * shard directory receives from all tasks, and downstream loaders get
  * a balanced, deterministic, prunable layout.
  *
  * The gated query is the full round trip — route, write, read back,
  * audit — so the oracle (computed straight from the source table)
  * proves the exported layout lost nothing and routed every row where
  * the hash says it belongs. ShardSinkSpec covers the file-level
  * contract (per-file record cap, partition pruning on read).
  */
object ExportQueries {

  val NumShards = 16

  val all: Seq[Q] = Seq(

    // X40 — shard-and-export round trip. The shard id is a multiplicative
    // hash (fresh multiplier — decorrelated from x11's sampler and
    // x18's splitter, so shard membership is independent of sample and
    // split membership). repartition(16, shard) gives each write task
    // one shard's rows; sortWithinPartitions fixes intra-file order so
    // the export is byte-deterministic; partitionBy(shard) makes the
    // layout prunable. The audit aggregate is all-integer (counts,
    // char sums, id extremes) — the strongest cross-engine gate form.
    Q(
      "x40_shard_export",
      """WITH s AS (SELECT doc_id, n_chars,
        |    CAST((doc_id * 3432918353) % 1000003 % 16 AS INTEGER) AS shard
        |  FROM documents)
        |SELECT shard, count(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (spark, dir) =>
      val out = TempWork.dir("graft_x40_shards")
      Tables(spark, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          (col("doc_id") * 3432918353L % 1000003L % 16).cast("int").as("shard"))
        .repartition(NumShards, col("shard"))
        .sortWithinPartitions("shard", "doc_id")
        .write.mode("overwrite").partitionBy("shard").parquet(out)
      spark.read.parquet(out)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          min("doc_id").as("first_doc"),
          max("doc_id").as("last_doc"))
        .orderBy("shard")
    }
  )
}
