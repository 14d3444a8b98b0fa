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
         |    0.4 * (least(n_chars, 500) / 500.0)
         |      + 0.3 * (1.0 - (length(text) - length(translate(text, ',.', ''))) / (1.0 * length(text)))
         |      + 0.3 * least((len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t IN (${TextQueries.sqlList(TextQueries.stopEn)})))
         |          / (1.0 * len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')))) * 5.0, 1.0) AS quality
         |  FROM d),
         |f AS (SELECT doc_id, text FROM q WHERE quality >= 0.5),
         |s AS (SELECT doc_id,
         |    len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t IN (${TextQueries.sqlList(TextQueries.stopEn)}))) AS s_en,
         |    len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t IN (${TextQueries.sqlList(TextQueries.stopEs)}))) AS s_es,
         |    len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t IN (${TextQueries.sqlList(TextQueries.stopDe)}))) AS s_de,
         |    len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t IN (${TextQueries.sqlList(TextQueries.stopFr)}))) AS s_fr,
         |    CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS BIGINT) AS n_tok
         |  FROM f),
         |p AS (SELECT CASE
         |    WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en > 0 THEN 'en'
         |    WHEN s_es >= s_de AND s_es >= s_fr AND s_es > 0 THEN 'es'
         |    WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
         |    WHEN s_fr > 0 THEN 'fr' ELSE 'und' END AS predicted,
         |    n_tok,
         |    CASE WHEN n_tok <= 50 THEN 1
         |         ELSE CAST(ceil((n_tok - 50) / 40.0) AS BIGINT) + 1 END AS n_chunks
         |  FROM s)
         |SELECT predicted, count(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
         |  CAST(SUM(n_chunks) AS BIGINT) AS total_chunks
         |FROM p GROUP BY 1 ORDER BY predicted""".stripMargin
    ) { (spark, dir) =>
      val deduped = Tables.fanOut(Tables(spark, dir, "documents"))
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
