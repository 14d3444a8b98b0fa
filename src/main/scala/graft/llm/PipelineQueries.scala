package graft.llm

import graft.core.Cols._
import graft.core.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end training-data pipeline as ONE query: exact dedup →
  * quality gate → language ID → chunk accounting, composed from the
  * same column builders the individually-gated stages use (x5's
  * quality, x4's prediction, x10's chunk geometry) so the composition
  * is verified against an oracle that composes the same formulas.
  *
  * This is the "switch to this library" story: a corpus owner runs one
  * declarative pipeline and Catalyst fuses it — one scan of documents,
  * one shuffle for the dedup window, one for the final rollup. Every
  * stage is a per-row map except the dedup (hash-partitioned by
  * content hash — at 100 TB the natural two-phase alternative is
  * groupBy(hash).agg(min(doc_id)) + semi-join, same shuffle count).
  */
object PipelineQueries {

  val all: Seq[Q] = Seq(

    // X17 — deduped, quality-gated, language-routed corpus rollup:
    // per predicted language, the surviving doc count, total tokens,
    // and total 50/40 chunks.
    Q(
      "x17_corpus_pipeline",
      s"""WITH d AS (SELECT doc_id, text, n_chars FROM (
         |    SELECT doc_id, text, n_chars,
         |      row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rk
         |    FROM documents) t WHERE rk = 1),
         |q AS (SELECT doc_id, text,
         |    ${TextQueries.qualitySql} AS quality
         |  FROM d),
         |f AS (SELECT doc_id, text FROM q WHERE quality >= 0.5),
         |s AS (SELECT doc_id,
         |    ${TextQueries.stopScoresSql},
         |    CAST(len(${TextQueries.toksSql}) AS BIGINT) AS n_tok
         |  FROM f),
         |p AS (SELECT ${TextQueries.predictedSql} AS predicted,
         |    n_tok,
         |    ${ChunkingQueries.nChunksSql("n_tok")} AS n_chunks
         |  FROM s)
         |SELECT predicted, count(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
         |  CAST(SUM(n_chunks) AS BIGINT) AS total_chunks
         |FROM p GROUP BY 1 ORDER BY predicted""".stripMargin
    ) { (spark, dir) =>
      // No fanOut here: the only pre-exchange work is the cheap sha2
      // projection, and the dedup window's own hash Exchange already
      // spreads rows across all cores before the heavy token stages
      // (which run after rk=1) — a fanOut would just add a second
      // full-corpus shuffle.
      val deduped = Tables(spark, dir, "documents")
        .withColumn("rk", row_number().over(
          Window.partitionBy(sha2(col("text"), 256)).orderBy("doc_id")))
        .filter(col("rk") === 1)
      deduped
        .filter(TextQueries.qualityCol >= 0.5)
        .select(TextQueries.predictedCol.as("predicted"),
          size(wsTokens(col("text"))).cast("long").as("n_tok"))
        .withColumn("n_chunks", ChunkingQueries.nChunks(col("n_tok")))
        .groupBy("predicted")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("total_tokens"),
          sum("n_chunks").as("total_chunks"))
        .orderBy("predicted")
    }
  )
}
