package graft.llm

import graft.core.Cols._
import graft.core.{CacheScope, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis surface: corpus stats, language-ID heuristic, quality
  * scoring, token counting, and document fingerprinting — the per-doc
  * scalar paths are single-pass array folds (no explode, no shuffle),
  * which is what keeps them linear at 100 TB.
  */
object TextQueries {

  private[llm] val stopEn = Seq("the", "and", "of", "to", "in", "is", "a", "that")
  private[llm] val stopEs = Seq("el", "la", "de", "que", "y", "en", "los", "se")
  private[llm] val stopDe = Seq("der", "die", "und", "den", "von", "zu", "das", "ist")
  private[llm] val stopFr = Seq("le", "la", "et", "les", "des", "en", "un", "du")

  private[llm] def sqlList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(", ")

  /** Oracle-SQL (DuckDB) fragments mirroring the column builders below.
    * The x4/x5 oracles AND the x17 end-to-end pipeline oracle all
    * interpolate these, so a formula change updates every gate at once
    * — the SQL can't silently drift from the Scala it verifies. */
  private[llm] val toksSql =
    """list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')"""
  private[llm] def hitsSql(ws: Seq[String]): String =
    s"""len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t IN (${sqlList(ws)})))"""
  /** The x5 quality formula over (text, n_chars). */
  private[llm] def qualitySql: String =
    s"""0.4 * (least(n_chars, 500) / 500.0)
       |      + 0.3 * (1.0 - (length(text) - length(translate(text, ',.', ''))) / (1.0 * length(text)))
       |      + 0.3 * least((${hitsSql(stopEn)}
       |          / (1.0 * len($toksSql))) * 5.0, 1.0)""".stripMargin
  /** The four per-language stopword scores, `AS s_en .. s_fr`. */
  private[llm] def stopScoresSql: String =
    s"""${hitsSql(stopEn)} AS s_en,
       |    ${hitsSql(stopEs)} AS s_es,
       |    ${hitsSql(stopDe)} AS s_de,
       |    ${hitsSql(stopFr)} AS s_fr""".stripMargin
  /** The x4 argmax CASE over s_en..s_fr. */
  private[llm] val predictedSql: String =
    """CASE
      |    WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en > 0 THEN 'en'
      |    WHEN s_es >= s_de AND s_es >= s_fr AND s_es > 0 THEN 'es'
      |    WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
      |    WHEN s_fr > 0 THEN 'fr'
      |    ELSE 'und' END""".stripMargin

  /** Count of tokens of `arr` that are in `ws`. */
  private def hits(arr: Column, ws: Seq[String]): Column =
    size(filter(arr, t => t.isin(stopAny(ws): _*)))
  private def stopAny(ws: Seq[String]): Seq[Any] = ws

  /** The x5 quality score as a reusable column over (text, n_chars) —
    * shared with the x17 end-to-end pipeline so both state the SAME
    * formula the oracle does. */
  private[llm] def qualityCol: Column = {
    val arr = wsTokens(col("text"))
    val lenScore = least(col("n_chars"), lit(500)) / lit(500.0)
    val punctRatio = (length(col("text")) - length(translate(col("text"), ",.", ""))) /
      (lit(1.0) * length(col("text")))
    val stopRatio = hits(arr, stopEn) / (lit(1.0) * size(arr))
    lit(0.4) * lenScore + lit(0.3) * (lit(1.0) - punctRatio) +
      lit(0.3) * least(stopRatio * 5.0, lit(1.0))
  }

  /** The x4 language prediction as a reusable column over text. */
  private[llm] def predictedCol: Column = {
    val arr = wsTokens(col("text"))
    val (sEn, sEs, sDe, sFr) =
      (hits(arr, stopEn), hits(arr, stopEs), hits(arr, stopDe), hits(arr, stopFr))
    when(sEn >= sEs && sEn >= sDe && sEn >= sFr && sEn > 0, "en")
      .when(sEs >= sDe && sEs >= sFr && sEs > 0, "es")
      .when(sDe >= sFr && sDe > 0, "de")
      .when(sFr > 0, "fr")
      .otherwise("und")
  }

  val all: Seq[Q] = Seq(

    // L4 — per-language corpus stats: doc count, avg chars, avg tokens,
    // type-token ratio. All ratios are exact-integer quotients.
    Q(
      "l4_text_stats",
      """WITH tok AS (SELECT lang, t FROM (
        |    SELECT lang, unnest(string_split_regex(lower(text), '\s+')) AS t FROM documents) u
        |  WHERE t <> ''),
        |tl AS (SELECT lang, count(*) AS total_tok, count(DISTINCT t) AS distinct_tok FROM tok GROUP BY 1),
        |dl AS (SELECT lang, count(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars FROM documents GROUP BY 1)
        |SELECT dl.lang AS lang, dl.n_docs,
        |  dl.sum_chars / (1.0 * dl.n_docs) AS avg_chars,
        |  tl.total_tok / (1.0 * dl.n_docs) AS avg_tokens,
        |  tl.distinct_tok / (1.0 * tl.total_tok) AS ttr
        |FROM dl JOIN tl ON dl.lang = tl.lang ORDER BY dl.lang""".stripMargin
    ) { (spark, dir) =>
      val docs = Tables(spark, dir, "documents")
      // Two-level aggregation instead of count + countDistinct in one
      // groupBy: Spark plans the mixed form through an Expand that
      // doubles every exploded token row before the shuffle. Grouping
      // by (lang, token) first lets the map-side partial agg collapse
      // the token explosion to vocabulary size, then the second agg
      // reads rows-per-lang (= distinct tokens) and sum-of-counts
      // (= total tokens) off that tiny table. Identical result.
      val tl = Tables.fanOut(docs)
        .select(col("lang"), explode(wsTokens(col("text"))).as("t"))
        .groupBy("lang", "t").agg(count(lit(1)).as("c"))
        .groupBy("lang")
        .agg(sum("c").as("total_tok"), count(lit(1)).as("distinct_tok"))
      val dl = docs.groupBy(col("lang").as("dlang"))
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      dl.join(tl, col("dlang") === col("lang"))
        .select(col("lang"), col("n_docs"),
          (col("sum_chars") / (lit(1.0) * col("n_docs"))).as("avg_chars"),
          (col("total_tok") / (lit(1.0) * col("n_docs"))).as("avg_tokens"),
          (col("distinct_tok") / (lit(1.0) * col("total_tok"))).as("ttr"))
        .orderBy("lang")
    },

    // X4 — language-ID by stopword-list voting (first-match argmax with
    // preference order en, es, de, fr; no hits → 'und'), compared
    // against the labeled lang column.
    Q(
      "x4_langid",
      s"""WITH s AS (SELECT lang,
         |    $stopScoresSql
         |  FROM documents),
         |p AS (SELECT lang, $predictedSql AS predicted FROM s)
         |SELECT lang, predicted, count(*) AS n_docs FROM p GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin
    ) { (spark, dir) =>
      Tables.fanOut(Tables(spark, dir, "documents"))
        .select(col("lang"), predictedCol.as("predicted"))
        .groupBy("lang", "predicted").agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "predicted")
    },

    // X5 — quality score: length score, punctuation ratio, stopword
    // ratio, combined deterministically from exact integer counts.
    Q(
      "x5_quality_score",
      s"""SELECT doc_id,
         |  CAST(len($toksSql) AS BIGINT) AS n_tok,
         |  $qualitySql AS quality
         |FROM documents ORDER BY doc_id""".stripMargin
    ) { (spark, dir) =>
      Tables.fanOut(Tables(spark, dir, "documents"))
        .select(col("doc_id"), size(wsTokens(col("text"))).cast("long").as("n_tok"),
          qualityCol.as("quality"))
        .orderBy("doc_id")
    },

    // X6 — token counting: whitespace tokens vs BPE-ish regex tokens.
    Q(
      "x6_token_counts",
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS BIGINT) AS ws_tokens,
        |  CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS BIGINT) AS re_tokens,
        |  CAST(length(text) AS BIGINT) AS chars
        |FROM documents ORDER BY doc_id""".stripMargin
    ) { (spark, dir) =>
      Tables.fanOut(Tables(spark, dir, "documents"))
        .select(col("doc_id"),
          size(wsTokens(col("text"))).cast("long").as("ws_tokens"),
          size(filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= "")).cast("long").as("re_tokens"),
          length(col("text")).cast("long").as("chars"))
        .orderBy("doc_id")
    },

    // X14 — TF-IDF term weighting: top-3 terms per document (docs
    // 0-49) scored tf * N / df. The score is a single IEEE division of
    // two exact integers, so both engines rank identical bits — no
    // ln() (libm implementations disagree in the last ulp). One token
    // explode feeds two aggregations (tf by (doc, term), df by term),
    // joined on the term, finished by a per-doc top-k window. At scale
    // tf and df are both map-side partial aggs, the df join keys on
    // the term (vocabulary-sized), and the corpus size N arrives via a
    // broadcast one-row cross join — no driver-side count.
    Q(
      "x14_tfidf",
      """WITH tok AS (SELECT doc_id, t FROM (
        |    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS t FROM documents) u
        |  WHERE t <> ''),
        |tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |s AS (SELECT tf.doc_id, tf.t AS term, tf.tf, df.df, (tf.tf * n.n) / df.df AS score
        |  FROM tf JOIN df ON tf.t = df.t CROSS JOIN n WHERE tf.doc_id < 50),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk FROM s)
        |SELECT doc_id, term, tf, df, score, rk FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin
    ) { (spark, dir) =>
      val docs = Tables(spark, dir, "documents")
      val tok = Tables.fanOut(docs)
        .select(col("doc_id"), explode(wsTokens(col("text"))).as("t"))
      val tf = tok.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
      val dfc = tf.groupBy("t").agg(count(lit(1)).as("df")).toDF("t2", "df")
      val n = docs.agg(count(lit(1)).as("n"))
      val s = tf.filter(col("doc_id") < 50)
        .join(dfc, col("t") === col("t2"))
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("t").as("term"), col("tf"), col("df"),
          ((col("tf") * col("n")) / col("df")).as("score"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
      s.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .orderBy("doc_id", "rk")
    },

    // X20 — bigram collocation extraction (tokenizer/vocab prep): top
    // 50 adjacent-token pairs by count with a PMI-style association
    // score. The score is EXACT integer arithmetic — cnt_ab * N * 1e6
    // integer-divided by cnt_a * cnt_b — because ln() differs between
    // libm implementations in the last ulp (same reasoning as x14's
    // score); monotone in true PMI at fixed counts, which is what a
    // ranking consumer needs. INT64 HEADROOM: the numerator
    // cnt_ab * N * 1e6 must stay under 2^63 ≈ 9.2e18, i.e.
    // cnt_ab * N < 9.2e12 — safe while the corpus is under ~3e6 tokens
    // even for a bigram appearing every time (cnt_ab <= N), and far
    // beyond that for real Zipfian counts; past it Spark's DIV would
    // wrap silently while DuckDB raises, so a corpus-scale deployment
    // should lift the score into DECIMAL(38,0) on both engines (same
    // discipline as ShingleHashSet's documented bound).
    // One bigram explode and one token explode,
    // both map-side-partial aggregated; the unigram join keys on the
    // vocabulary (broadcast-sized at any corpus scale); N arrives by
    // broadcast one-row cross join, no driver count.
    Q(
      "x20_bigram_pmi",
      """WITH t AS (SELECT list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |bgs AS (SELECT toks[i] || ' ' || toks[i+1] AS bg
        |  FROM t, unnest(generate_series(1, len(toks) - 1)) u(i)),
        |cb AS (SELECT bg, count(*) AS cnt_ab FROM bgs GROUP BY 1),
        |tok AS (SELECT unnest(toks) AS t FROM t),
        |cu AS (SELECT t, count(*) AS cnt FROM tok GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM tok),
        |s AS (SELECT cb.bg AS bigram, cb.cnt_ab, ca.cnt AS cnt_a, c2.cnt AS cnt_b,
        |    (cb.cnt_ab * n.n * 1000000) // (ca.cnt * c2.cnt) AS pmi_scaled
        |  FROM cb
        |  JOIN cu ca ON ca.t = string_split(cb.bg, ' ')[1]
        |  JOIN cu c2 ON c2.t = string_split(cb.bg, ' ')[2]
        |  CROSS JOIN n)
        |SELECT bigram, cnt_ab, cnt_a, cnt_b, pmi_scaled
        |FROM s ORDER BY cnt_ab DESC, bigram LIMIT 50""".stripMargin
    ) { (spark, dir) =>
      val t = Tables.fanOut(Tables(spark, dir, "documents"))
        .select(wsTokens(col("text")).as("toks"))
      // guard size >= 2, mirroring the oracle's generate_series bound
      // (the native TokenNgrams yields [] below n regardless)
      val bg = t.filter(size(col("toks")) >= 2)
        .select(explode(
          graft.functions.ShingleExpressions.tokenNgrams(col("toks"), 2)).as("bg"))
      val cb = bg.groupBy("bg").agg(count(lit(1)).as("cnt_ab"))
      val tok = t.select(explode(col("toks")).as("t"))
      val cu = tok.groupBy("t").agg(count(lit(1)).as("cnt"))
      val n = tok.agg(count(lit(1)).as("n"))
      cb.withColumn("a", split(col("bg"), " ").getItem(0))
        .withColumn("b", split(col("bg"), " ").getItem(1))
        .join(cu.toDF("ta", "cnt_a"), col("a") === col("ta"))
        .join(cu.toDF("tb", "cnt_b"), col("b") === col("tb"))
        .crossJoin(broadcast(n))
        .select(col("bg").as("bigram"), col("cnt_ab"), col("cnt_a"), col("cnt_b"),
          expr("(cnt_ab * n * 1000000) DIV (cnt_a * cnt_b)").as("pmi_scaled"))
        .orderBy(col("cnt_ab").desc, col("bigram")).limit(50)
    },

    // X7 — document fingerprint: position-weighted rolling checksum mod
    // 2^31-1, computed as a single in-order array fold (no shuffle).
    Q(
      "x7_fingerprint",
      """SELECT doc_id,
        |  CAST(SUM(ascii(substr(text, pos, 1)) * ((pos * 2654435761) % 1000003)) % 2147483647 AS BIGINT) AS fp
        |FROM documents, unnest(generate_series(1, length(text))) t(pos)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    ) { (spark, dir) =>
      // split('') + indexed transform is O(n) per doc; the
      // substring(text, i, 1) form is O(n^2) because UTF8String
      // substring walks from the start each call.
      Tables.fanOut(Tables(spark, dir, "documents"))
        .select(col("doc_id"),
          expr("""aggregate(
                 |  transform(split(text, ''),
                 |    (c, i) -> ascii(c) * ((CAST(i + 1 AS BIGINT) * 2654435761) % 1000003)),
                 |  0L, (s, x) -> s + x) % 2147483647""".stripMargin).cast("long").as("fp"))
        .orderBy("doc_id")
    },

    // X39 — inverted index: per term, document frequency, total term
    // frequency, and the first-8 posting list — the retrieval-side
    // artifact a decontamination or search pipeline builds over the
    // corpus. The scale-critical piece is the posting list: a stopword's
    // full postings are corpus-sized, so they must never materialize.
    // The custom TopKPerKey operator (plans/TopKPerKey.scala) keeps a
    // partial 8-element heap per term per partition — shuffle traffic
    // per term is bounded by k * partitions regardless of df, where a
    // window row_number would shuffle and sort the full corpus-sized
    // partition for every common term. df/tf_total are ordinary partial
    // aggregates over the vocabulary-keyed tf table. Postings are
    // emitted comma-joined so the cross-engine hash compares strings,
    // not engine-specific list encodings.
    Q(
      "x39_inverted_index",
      """WITH tok AS (SELECT doc_id, t FROM (
        |    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS t FROM documents) u
        |  WHERE t <> ''),
        |tf AS (SELECT t, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
        |agg AS (SELECT t AS term, count(*) AS df, CAST(SUM(tf) AS BIGINT) AS tf_total
        |  FROM tf GROUP BY 1),
        |post AS (SELECT t AS term,
        |    array_to_string((list(doc_id ORDER BY doc_id))[1:8], ',') AS postings
        |  FROM tf GROUP BY 1)
        |SELECT a.term, a.df, a.tf_total, p.postings
        |FROM agg a JOIN post p ON a.term = p.term ORDER BY a.term""".stripMargin
    ) { (spark, dir) =>
      val tok = Tables.fanOut(Tables(spark, dir, "documents"))
        .select(col("doc_id"), explode(wsTokens(col("text"))).as("t"))
      val tf = tok.groupBy("t", "doc_id").agg(count(lit(1)).as("tf"))
      val agg = tf.groupBy("t")
        .agg(count(lit(1)).as("df"), sum("tf").as("tf_total"))
      val post = graft.plans.TopKPerKey(
          tf.select("t", "doc_id"),
          keys = Seq("t"), orderBy = Seq(("doc_id", true)), k = 8)
        .groupBy(col("t").as("t2"))
        .agg(array_join(sort_array(collect_list(col("doc_id"))), ",").as("postings"))
      agg.join(post, col("t") === col("t2"))
        .select(col("t").as("term"), col("df"), col("tf_total"), col("postings"))
        .orderBy("term")
    },

    // X46 — bigram LM fluency score: the CCNet/Gopher "perplexity
    // filter" shape — score every document under a language model
    // trained on the corpus itself, so boilerplate and gibberish (whose
    // token transitions are rare corpus-wide) rank below fluent prose.
    // The model is an add-V-smoothed bigram LM; to keep the score
    // hash-comparable across engines it is computed in INTEGER
    // arithmetic (the x20 PMI discipline — no log, no doubles): each
    // adjacent pair (a,b) scores p = (count(a,b) * 10^6) div
    // (count(a) + V), and a document's fluency is the integer mean of
    // its pair scores — a monotone stand-in for the LM probability
    // ranking a real perplexity filter applies (documented divergence:
    // mean-of-p ranks differently from geometric-mean perplexity when
    // per-pair distributions are wildly skewed; the filter DECISIONS
    // at the tails, which is what the stage exists for, agree).
    // SCALE SHAPE: tokenize is per-row; cu/cb are vocabulary- and
    // bigram-vocabulary-keyed partial aggregates (corpus-size-
    // independent width); the scoring joins key bigram occurrences on
    // the bigram and its head token; the final mean is a doc_id-keyed
    // aggregate. Every shuffle is keyed; nothing is ever all-pairs,
    // and the model tables grow with the VOCABULARY, not the corpus.
    Q(
      "x46_lm_fluency",
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |tok AS (SELECT unnest(toks) AS w FROM t),
        |cu AS (SELECT w, count(*) AS cnt FROM tok GROUP BY 1),
        |vv AS (SELECT count(*) AS v FROM cu),
        |bg AS (SELECT doc_id, toks[i] AS a, toks[i] || ' ' || toks[i+1] AS bgr
        |  FROM t, unnest(generate_series(1, len(toks) - 1)) u(i)),
        |cb AS (SELECT bgr, count(*) AS cnt_ab FROM bg GROUP BY 1),
        |sc AS (SELECT bg.doc_id, (cb.cnt_ab * 1000000) // (cu.cnt + vv.v) AS p
        |  FROM bg JOIN cb ON cb.bgr = bg.bgr JOIN cu ON cu.w = bg.a CROSS JOIN vv)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(SUM(p) // count(*) AS BIGINT) AS fluency
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (spark, dir) =>
      val t = Tables.fanOut(Tables(spark, dir, "documents"))
        .select(col("doc_id"), wsTokens(col("text")).as("toks"))
      val tok = t.select(explode(col("toks")).as("w"))
      val cu = tok.groupBy("w").agg(count(lit(1)).as("cnt"))
      val vv = cu.agg(count(lit(1)).as("v"))
      val bg = t.filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(
          graft.functions.ShingleExpressions.tokenNgrams(col("toks"), 2)).as("bgr"))
        .withColumn("a", split(col("bgr"), " ").getItem(0))
      val cb = bg.groupBy(col("bgr").as("cbr")).agg(count(lit(1)).as("cnt_ab"))
      bg.join(cb, col("bgr") === col("cbr"))
        .join(cu.toDF("cw", "cnt"), col("a") === col("cw"))
        .crossJoin(broadcast(vv))
        .select(col("doc_id"),
          expr("(cnt_ab * 1000000) DIV (cnt + v)").as("p"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          expr("SUM(p) DIV count(1)").cast("long").as("fluency"))
        .orderBy("doc_id")
    },

    // X60 — HEAVY n-GRAMS via a bounded-memory sketch with an EXACT
    // guarantee: find every trigram above 0.2% corpus frequency with a
    // per-partition Misra-Gries summary (capacity 512) feeding an
    // exact recount — the sketch-then-verify shape that replaces x28's
    // vocabulary-sized shuffle when the n-gram space is too large to
    // aggregate. WHY THE GATE IS EXACT even though MG is approximate:
    // MG(512) keeps every item whose partition-local frequency exceeds
    // n_p/513, and any trigram with global frequency > N/500 must beat
    // n_p/500 in at least one partition (pigeonhole over Σn_p = N), so
    // the candidate union is a guaranteed SUPERSET of the true heavy
    // hitters — partitioning changes WHICH extra candidates appear,
    // never whether a true one does. The exact recount (map-side
    // pre-filtered by the broadcast candidate set — ≤ 512 × partitions
    // strings) then makes the output independent of partitioning:
    // identical to a plain GROUP BY ... HAVING, which is the oracle.
    // At 100 TB: one linear pass with 512 counters per task, a
    // broadcast of a few thousand candidates, and a shuffle of ONLY
    // candidate rows — the corpus-sized n-gram shuffle never happens.
    // The uniform synthetic corpus has no heavy trigrams, so the
    // fixture PLANTS boilerplate phrases on hash-selected docs (the
    // x55/x58 pattern) for the sketch to find.
    Q(
      "x60_heavy_ngrams",
      """WITH a AS (SELECT doc_id,
        |    text ||
        |    CASE WHEN doc_id % 3 <> 0 THEN ' terms of service apply here' ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN ' all rights reserved worldwide' ELSE '' END AS t
        |  FROM documents),
        |tk AS (SELECT list_filter(string_split_regex(lower(t), '\s+'), x -> x <> '') AS toks FROM a),
        |g AS (SELECT toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS ngram
        |      FROM (SELECT toks, unnest(generate_series(1, len(toks) - 2)) AS i
        |            FROM tk WHERE len(toks) >= 3) u),
        |f AS (SELECT ngram, CAST(count(*) AS BIGINT) AS freq FROM g GROUP BY ngram)
        |SELECT ngram, freq FROM f
        |WHERE freq * 500 > (SELECT count(*) FROM g)
        |ORDER BY ngram""".stripMargin
    ) { (spark, dir) =>
      import spark.implicits._
      val annotated = concat(col("text"),
        when(col("doc_id") % 3 =!= 0, lit(" terms of service apply here"))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit(" all rights reserved worldwide"))
          .otherwise(lit("")))
      // cacheEager: the trigram table fans out to the MG pass, the
      // in-plan total, and the recount join (three consumers).
      val tg = CacheScope.cacheEager(
        Tables.fanOut(Tables(spark, dir, "documents"))
          .select(explode(graft.functions.ShingleExpressions
            .tokenNgrams(wsTokens(annotated), 3)).as("ngram")))
      val cand = tg.as[String].mapPartitions { it =>
        val cap = 512
        val m = new java.util.HashMap[String, java.lang.Long](cap * 2)
        it.foreach { t =>
          val c = m.get(t)
          if (c != null) m.put(t, c + 1L)
          else if (m.size < cap) m.put(t, 1L)
          else {
            val e = m.entrySet().iterator()
            while (e.hasNext) {
              val en = e.next()
              if (en.getValue == 1L) e.remove()
              else en.setValue(en.getValue - 1L)
            }
          }
        }
        import scala.jdk.CollectionConverters._
        m.keySet().iterator().asScala
      }.toDF("cnd").distinct()
      val total = tg.agg(count(lit(1)).as("n_total"))
      tg.join(broadcast(cand), col("ngram") === col("cnd"))
        .groupBy("ngram").agg(count(lit(1)).as("freq"))
        .crossJoin(broadcast(total))
        .filter(col("freq") * 500 > col("n_total"))
        .select(col("ngram"), col("freq"))
        .orderBy("ngram")
    },

    // X65 — SPARSE RETRIEVAL: idf-weighted trigram search — for each
    // query document, the top-5 corpus documents ranked by the summed
    // rarity weight of SHARED trigrams. The lexical-retrieval
    // complement to the dense-vector family (l3/x8/x29/x47): BM25-
    // shaped scoring where rarity is the signal, restated in exact
    // integers (weight per shared trigram = (N·100) DIV df — monotone
    // in idf at fixed df, division-free determinism like x14's
    // score). SCALE DISCIPLINE (the x52 rare-probe bound): queries
    // probe ONLY their trigrams with df ≤ 20 — bounded posting lists,
    // so per-query candidate work is ≤ 48 trigrams × 20 postings
    // regardless of corpus size, and the common-trigram flood a naive
    // inverted-index join would suffer never happens. Stopword-heavy
    // trigrams contribute little idf weight anyway — dropping them is
    // the declared semantics, exactly what Lucene's rare-term
    // optimizations approximate.
    Q(
      "x65_sparse_retrieval",
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks FROM documents),
        |g AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS tg
        |      FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
        |            FROM t WHERE len(toks) >= 3) u),
        |df AS (SELECT tg, CAST(count(*) AS BIGINT) AS df FROM g GROUP BY tg),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |rare AS (SELECT g.doc_id, g.tg, df.df FROM g JOIN df USING (tg) WHERE df.df <= 20),
        |hits AS (SELECT q.doc_id AS qid, c.doc_id AS did, SUM((nn.n * 100) // q.df) AS score
        |  FROM rare q JOIN g c ON c.tg = q.tg AND c.doc_id <> q.doc_id
        |  CROSS JOIN nn
        |  WHERE q.doc_id % 100 = 17
        |  GROUP BY 1, 2),
        |rk AS (SELECT qid, did, CAST(score AS BIGINT) AS score,
        |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, did) AS rn FROM hits)
        |SELECT qid, did, score, CAST(rn AS BIGINT) AS rn
        |FROM rk WHERE rn <= 5 ORDER BY qid, rn""".stripMargin
    ) { (spark, dir) =>
      val g = CacheScope.cacheEager(
        Tables.fanOut(Tables(spark, dir, "documents"))
          .filter(size(wsTokens(col("text"))) >= 3)
          .select(col("doc_id"), explode(graft.functions.ShingleExpressions
            .tokenNgrams(wsTokens(col("text")), 3)).as("tg"))
          .distinct())
      val dfc = g.groupBy("tg").agg(count(lit(1)).as("df"))
      val nn = Tables(spark, dir, "documents").agg(count(lit(1)).as("n"))
      val rare = g.join(dfc, "tg").filter(col("df") <= 20)
        .filter(col("doc_id") % 100 === 17)
        .select(col("tg").as("qtg"), col("doc_id").as("qid"), col("df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("score").desc, col("did"))
      g.join(rare, col("tg") === col("qtg") && col("doc_id") =!= col("qid"))
        .crossJoin(broadcast(nn))
        .select(col("qid"), col("doc_id").as("did"),
          expr("(n * 100) DIV df").as("wt"))
        .groupBy("qid", "did")
        .agg(sum("wt").as("score"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .select(col("qid"), col("did"), col("score"), col("rn"))
        .orderBy("qid", "rn")
    },

    // X76 — COUNT-MIN SKETCH frequency estimation (Cormode &
    // Muthukrishnan 2005): estimate token frequencies from a FIXED
    // 4 x 1024 counter array instead of the vocabulary-sized exact
    // table. This is the other half of the sketch family: x60's
    // Misra-Gries answers "which items are heavy" (identities, with
    // an exact recount); CMS answers "how often does THIS item occur"
    // for any queried item, from memory that never grows with the
    // vocabulary. SHAPE AT 100 TB: the build is one token scan where
    // each occurrence increments d=4 counters — as a groupBy(i,bucket)
    // its partial agg state is capped at 4,096 counters PER TASK and
    // the exchange carries <= 4,096 rows per input partition, so the
    // corpus-sized vocabulary shuffle (x60's recount, l4's type-token
    // pass) never happens; estimates are then a broadcast-sized join
    // of the probe set against the 4,096-row sketch. The audit emits
    // est vs true side by side (the exact leg is map-side pre-filtered
    // by the broadcast probe set, so it is probe-bounded, not
    // vocabulary-bounded) — est >= true ALWAYS (counters only ever
    // overcount: every occurrence of t lands in all 4 of t's cells),
    // with E[est - true] <= (e/1024) * N per the CMS bound; the gate
    // pins both columns exactly because every hash is the portable
    // integer family (char fold mod 1000003 — x7's spelling — then 4
    // decorrelated affine rows) that DuckDB replays verbatim. Width
    // is the accuracy knob a deployment sizes to epsilon = e/w of
    // total mass; 1024 keeps the fixture's collisions visible while
    // the probe slice (docs with doc_id % 97 = 17) stays bounded at
    // any sf (the one-sided bound itself is pinned in
    // SketchSampleSpec: est >= true on every probe, hash-independent).
    Q(
      "x76_cms_frequency", cmsSql("documents")
    ) { (spark, dir) =>
      cmsEstimates(Tables.fanOut(Tables(spark, dir, "documents")))
    },

    // S17 — STREAMING sketch maintenance: the count-min sketch is a
    // LINEAR sketch (CMS(A ∪ B) = CMS(A) + CMS(B) cell-wise), and this
    // row makes that property a gated fact rather than a comment. The
    // base corpus slice's sketch lands as a parquet counters artifact;
    // a file-source stream delivers the growth slice in real
    // micro-batches (maxFilesPerTrigger=1) whose foreachBatch lands
    // each batch's partial counters — no read-modify-write, no
    // coordination: merging is addition, so ingest is write-only and
    // the serve-time load just SUMs per (i, bucket). IDEMPOTENT per
    // epoch (ADVICE r10: a checkpoint replay after a post-write crash
    // would double-add that epoch's counters, silently inflating every
    // estimate — the exact re-delivery s15/s16 gate for the index
    // artifacts): each epoch's counters land at a DETERMINISTIC
    // `{path}/batch-{epochId}` directory in overwrite mode, so a
    // replayed epoch REPLACES its own partials instead of adding a
    // second copy (per-cell addition makes the serve-time SUM
    // insensitive to which attempt's identical counters survive). The
    // run PROVES it the s15 way — foreachBatch throws an injected
    // crash AFTER epoch 1's counters landed, the restarted query (same
    // checkpoint → same WAL epoch id) re-delivers that micro-batch,
    // and the gate holds only because the replay overwrote rather than
    // appended. The estimates served from the streamed artifact must
    // equal the oracle's one-pass sketch over the whole indexed slice
    // — that equality IS sketch linearity, the property that lets 1000
    // executors (or a week of micro-batches) each sketch their shard
    // independently and a reader combine them without ever seeing raw
    // tokens. SCALE SHAPE: per batch one token scan + a <= 4,096-row
    // counters write; the artifact grows by one tiny directory per
    // batch (b6-style compaction = the same groupBy-sum, written back)
    // and the serve read is bounded by batches x 4,096 regardless of
    // corpus size.
    Q(
      "s17_stream_cms_merge", cmsSql("(SELECT * FROM documents WHERE doc_id % 4 <> 3)")
    ) { (spark, dir) =>
      val docs = Tables.fanOut(Tables(spark, dir, "documents"))
      val path = graft.streaming.TempWork.dir("graft_s17_cms")
      cmsSketch(tokenHashes(docs.filter(col("doc_id") % 4 < 2)))
        .write.mode("overwrite").parquet(s"$path/base")
      val in = graft.streaming.TempWork.dir("graft_s17_in")
      val ckpt = graft.streaming.TempWork.dir("graft_s17_ck")
      docs.filter(col("doc_id") % 4 === 2)
        .select("doc_id", "lang", "text")
        .repartition(2).write.mode("append").parquet(in)
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val schema = ss.read.parquet(in).schema
      def stream = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(in)
      val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
      def run(injectCrash: Boolean): Unit = {
        val q = stream.writeStream
          .foreachBatch { (batch: DataFrame, epochId: Long) =>
            // additive partial counters at a deterministic per-epoch
            // path: overwrite makes the replayed epoch idempotent
            // (linearity makes the cross-epoch merge commutative +
            // associative, so file order and batch boundaries cannot
            // matter)
            cmsSketch(tokenHashes(batch))
              .write.mode("overwrite").parquet(s"$path/batch-$epochId")
            if (injectCrash && epochId == 1 && crashed.compareAndSet(false, true))
              throw new RuntimeException(
                "injected post-write crash (s17 replay proof)")
          }
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
        try q.processAllAvailable()
        catch {
          case _: org.apache.spark.sql.streaming.StreamingQueryException => ()
        } finally if (q.isActive) q.stop()
      }
      try {
        run(injectCrash = true)   // crashes after epoch 1's counters landed
        run(injectCrash = false)  // engine replays epoch 1; overwrite absorbs it
      } finally {
        graft.streaming.TempWork.delete(in)
        graft.streaming.TempWork.delete(ckpt)
      }
      val sketch = spark.read.option("recursiveFileLookup", "true").parquet(path)
        .groupBy("i", "bucket").agg(sum("c").as("c"))
      cmsServe(sketch, CacheScope.cacheEager(
        tokenHashes(docs.filter(col("doc_id") % 4 =!= 3))))
    }
  )

  /** The portable token hash: x7's char fold mod 1000003, folded once
    * per token occurrence (corpus-linear in characters). */
  private[graft] def tokenHashes(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(wsTokens(col("text"))).as("t"))
      .withColumn("h", expr(
        """aggregate(transform(split(t, ''),
          |    (c, i) -> ascii(c) * ((CAST(i + 1 AS BIGINT) * 2654435761) % 1000003)),
          |  0L, (s, x) -> s + x) % 1000003""".stripMargin))

  /** The d=4 decorrelated affine bucket rows over column `h`. */
  private[graft] def cmsBuckets: Column = {
    def bkt(a: Long, b: Long) = (col("h") * a + b) % 1000003L % 1024L
    array(
      bkt(2654435761L, 17L), bkt(2246822519L, 97L),
      bkt(3266489917L, 401L), bkt(1540483477L, 733L))
  }

  /** Counter array of a token+hash table: (i, bucket, c) — at most
    * d x w = 4,096 rows; the groupBy's partial-agg state is capped at
    * that many counters per task. */
  private[graft] def cmsSketch(tokh: DataFrame): DataFrame =
    tokh.select(posexplode(cmsBuckets).as(Seq("i", "bucket")))
      .groupBy("i", "bucket").agg(count(lit(1)).as("c"))

  /** Estimate-vs-true audit over the doc_id % 97 = 17 probe slice of
    * `tokh`, served from `sketch`. `tokh` feeds the probe-set
    * derivation and the exact leg — callers pass it cacheEager'd. */
  private[graft] def cmsServe(
      sketch: DataFrame,
      tokh: DataFrame): DataFrame = {
    val probes = tokh.filter(col("doc_id") % 97 === 17)
      .select(col("t"), col("h")).distinct()
    val est = probes.select(col("t"), posexplode(cmsBuckets).as(Seq("i", "bucket")))
      .join(sketch, Seq("i", "bucket"))
      .groupBy("t").agg(min("c").as("est_freq"))
    val exact = tokh.join(broadcast(probes.select("t")), "t")
      .groupBy("t").agg(count(lit(1)).as("true_freq"))
    est.join(exact, "t")
      .select(col("t").as("token"), col("est_freq"), col("true_freq"))
      .orderBy("token")
  }

  /** In-plan build + serve over one table expression (x76's form). */
  private[graft] def cmsEstimates(docs: DataFrame): DataFrame = {
    val tokh = CacheScope.cacheEager(tokenHashes(docs))
    cmsServe(cmsSketch(tokh), tokh)
  }

  /** The CMS oracle over `rel` (a table name or parenthesized
    * subquery): the identical char-fold + affine-row hash family,
    * restated as CTEs DuckDB replays verbatim. */
  private[graft] def cmsSql(rel: String): String =
    s"""WITH tok AS (SELECT doc_id,
       |    unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS t
       |  FROM $rel),
       |v AS (SELECT DISTINCT t FROM tok),
       |hv AS (SELECT t,
       |    SUM(ascii(substr(t, pos, 1)) * ((pos * 2654435761) % 1000003)) % 1000003 AS h
       |  FROM v, unnest(generate_series(1, length(t))) s(pos) GROUP BY t),
       |hb AS (SELECT t, i,
       |    ((h * CASE i WHEN 0 THEN 2654435761 WHEN 1 THEN 2246822519
       |                 WHEN 2 THEN 3266489917 ELSE 1540483477 END
       |      + CASE i WHEN 0 THEN 17 WHEN 1 THEN 97 WHEN 2 THEN 401 ELSE 733 END)
       |     % 1000003) % 1024 AS bucket
       |  FROM hv, unnest([0, 1, 2, 3]) s(i)),
       |tf AS (SELECT t, count(*) AS f FROM tok GROUP BY t),
       |sk AS (SELECT i, bucket, SUM(f) AS c FROM tf JOIN hb USING (t) GROUP BY i, bucket),
       |probe AS (SELECT DISTINCT t FROM tok WHERE doc_id % 97 = 17),
       |est AS (SELECT t, MIN(c) AS est_freq
       |  FROM probe JOIN hb USING (t) JOIN sk USING (i, bucket) GROUP BY t)
       |SELECT t AS token, CAST(est_freq AS BIGINT) AS est_freq,
       |  CAST(f AS BIGINT) AS true_freq
       |FROM est JOIN tf USING (t) ORDER BY token""".stripMargin
}
