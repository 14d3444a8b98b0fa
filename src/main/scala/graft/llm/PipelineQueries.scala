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
    },

    // X38 — the curation ENDGAME as one gated pipeline (VERDICT r6
    // stretch): near-dup survivor selection (x36) → sequential quality
    // funnel (x26's survivor predicate) → temperature rebalancing
    // (x35, rates computed over what SURVIVED the first two stages) —
    // the full keep/drop/rebalance decision a corpus build actually
    // ships, per-language: how many docs the dedup kept, how many
    // passed quality, the derived keep rate, and the final mixed
    // corpus size. Each stage reuses the exact column builders of its
    // gated standalone query, and the oracle composes the three
    // stages' CTEs verbatim, so the COMPOSITION is what this row
    // gates. SCALE SHAPE: x36's O(log diameter) pointer-jumping CC
    // loop (the one iterative piece — same loop x12/x36 already gate),
    // then a single fused plan: semi-join against survivors, per-row
    // quality predicate (all-integer arithmetic), one tiny per-lang
    // aggregate, broadcast rate table, per-row hash filter — no
    // corpus shuffle after the dedup window, no driver round-trips,
    // no RNG. Rates fold single-rounded IEEE ops only (x35's
    // determinism argument).
    Q(
      "x38_curation_pipeline",
      s"""${MinHash.oracleSig(5).replaceFirst("WITH ", "WITH RECURSIVE ")},
         |${DedupQueries.agreeSql},
         |prs AS (SELECT d1, d2 FROM agree WHERE matches >= 14),
         |edges AS (SELECT d1 AS a, d2 AS b FROM prs UNION ALL SELECT d2, d1 FROM prs),
         |reach(doc_id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT reach.doc_id, e.b FROM reach JOIN edges e ON e.a = reach.r),
         |cl AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id),
         |rk AS (SELECT cl.cluster_id, cl.doc_id, d.n_chars,
         |    row_number() OVER (PARTITION BY cl.cluster_id
         |      ORDER BY d.n_chars DESC, cl.doc_id) AS rn
         |  FROM cl JOIN documents d ON d.doc_id = cl.doc_id),
         |surv AS (SELECT doc_id FROM rk WHERE rn = 1),
         |dd AS (SELECT d.doc_id, d.lang, d.n_chars, d.text
         |  FROM documents d JOIN surv USING (doc_id)),
         |st AS (SELECT doc_id, lang, n_chars,
         |    CAST(len(toks) AS BIGINT) AS n_tok,
         |    CAST(len(list_distinct(toks)) AS BIGINT) AS d_tok,
         |    CAST(len(list_filter(toks, x -> x IN ('a','the'))) AS BIGINT) AS stop_cnt
         |  FROM (SELECT doc_id, lang, n_chars, ${CurationQueries.toksSql} AS toks FROM dd)),
         |q AS (SELECT doc_id, lang, n_chars FROM st
         |  WHERE n_tok >= 20 AND n_chars <= 400
         |    AND d_tok * 100 >= 40 * n_tok AND stop_cnt * 1000 >= 20 * n_tok),
         |c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_quality FROM q GROUP BY 1),
         |t AS (SELECT count(*) AS nn FROM q),
         |r AS (SELECT lang, n_quality,
         |    CAST(floor(least(1.0, 0.5 * sqrt(CAST(nn AS DOUBLE) / n_quality)) * 1000000) AS BIGINT) AS keep_ppm
         |  FROM c, t),
         |k AS (SELECT q.lang, q.n_chars FROM q JOIN r USING (lang)
         |  WHERE ((q.doc_id % 1000003) * 1540483477) % 1000003 % 1000000 < r.keep_ppm),
         |nd AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_dedup FROM dd GROUP BY 1),
         |f AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_final,
         |    CAST(SUM(n_chars) AS BIGINT) AS sum_chars FROM k GROUP BY 1)
         |SELECT r.lang, nd.n_dedup, r.n_quality, r.keep_ppm,
         |  COALESCE(f.n_final, 0) AS n_final,
         |  CAST(COALESCE(f.sum_chars, 0) AS BIGINT) AS sum_chars
         |FROM r JOIN nd USING (lang) LEFT JOIN f USING (lang)
         |ORDER BY r.lang""".stripMargin
    ) { (spark, dir) =>
      val docs = Tables(spark, dir, "documents")
      // Stage 1 — x36's survivor selection: near-dup clusters from the
      // banded minhash candidates, longest member survives.
      val pairs = DedupQueries.minhashPairs(spark, dir).select("d1", "d2")
      val cl = graft.ops.ConnectedComponents
        .stars(docs.select("doc_id"), pairs)
        .select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
      val wS = Window.partitionBy("cluster_id")
        .orderBy(col("n_chars").desc, col("doc_id"))
      val surv = cl.join(docs.select("doc_id", "n_chars"), "doc_id")
        .withColumn("rn", row_number().over(wS)).filter(col("rn") === 1)
        .select("doc_id")
      // Stage 2 — x26's survivor predicate over the deduped corpus
      // (fanned out ahead of the token work, survivors semi-joined).
      val dd = Tables.fanOut(docs).join(surv, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("lang"), col("n_chars").cast("long").as("nc"),
          wsTokens(col("text")).as("toks"))
      val st = dd.select(col("doc_id"), col("lang"), col("nc"),
        size(col("toks")).cast("long").as("n_tok"),
        size(array_distinct(col("toks"))).cast("long").as("d_tok"),
        size(filter(col("toks"),
          (t: org.apache.spark.sql.Column) => t === "a" || t === "the"))
          .cast("long").as("stop_cnt"))
      val q = st.filter(col("n_tok") >= 20 && col("nc") <= 400 &&
        col("d_tok") * 100 >= col("n_tok") * 40 &&
        col("stop_cnt") * 1000 >= col("n_tok") * 20)
        .select("doc_id", "lang", "nc")
      // q feeds the rate aggregate, the total, and the hash filter —
      // three branches of one plan: eager-cache ahead of the fan-out.
      val qc = graft.core.CacheScope.cacheEager(q)
      // Stage 3 — x35's temperature rates over the POST-funnel corpus.
      val total = qc.agg(count(lit(1)).as("nn"))
      val rates = qc.groupBy("lang").agg(count(lit(1)).as("n_quality"))
        .crossJoin(broadcast(total))
        .select(col("lang"), col("n_quality"),
          floor(least(lit(1.0),
            lit(0.5) * sqrt(col("nn").cast("double") / col("n_quality")))
            * 1000000).as("keep_ppm"))
      val hash = col("doc_id") % 1000003L * 1540483477L % 1000003L % 1000000L
      val kept = qc.join(broadcast(rates), "lang")
        .filter(hash < col("keep_ppm"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_final"), sum("nc").as("sum_chars"))
      val nd = Tables(spark, dir, "documents").select("doc_id", "lang")
        .join(surv, Seq("doc_id"), "left_semi")
        .groupBy("lang").agg(count(lit(1)).as("n_dedup"))
      rates.join(nd, "lang").join(kept, Seq("lang"), "left")
        .select(col("lang"), col("n_dedup"), col("n_quality"), col("keep_ppm"),
          coalesce(col("n_final"), lit(0L)).as("n_final"),
          coalesce(col("sum_chars"), lit(0L)).as("sum_chars"))
        .orderBy("lang")
    }
  )
}
