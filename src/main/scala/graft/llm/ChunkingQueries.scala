package graft.llm

import graft.core.Cols._
import graft.core.{Q, Tables}
import org.apache.spark.sql.functions._

/** Training-data shaping ops: overlapping token-window chunking and
  * deterministic hash sampling — the two staples between "raw corpus"
  * and "training shards". Both are single-pass, shuffle-free per-row
  * transforms (explode multiplies rows but never crosses partitions).
  */
object ChunkingQueries {

  /** Chunk geometry: 50-token windows, stride 40 (10-token overlap). */
  private val (win, stride) = (50, 40)

  /** x10's chunk count for a given token count — shared with the x17
    * end-to-end pipeline so both state the same geometry. */
  private[llm] def nChunks(nTok: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(nTok <= win, lit(1L))
      .otherwise(ceil((nTok - win) / lit(stride.toDouble)).cast("long") + 1)

  /** Oracle-SQL form of [[nChunks]] over a token-count expression —
    * interpolated by both the x10 and x17 oracles so the geometry has
    * one source of truth on the SQL side too. */
  private[llm] def nChunksSql(nTok: String): String =
    s"CASE WHEN $nTok <= $win THEN 1 ELSE CAST(ceil(($nTok - $win) / ${stride}.0) AS BIGINT) + 1 END"

  val all: Seq[Q] = Seq(

    // X10 — overlapping token-window chunking: one row per chunk with
    // its token span and reassembled text length.
    Q(
      "x10_chunking",
      s"""WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
         |  FROM documents),
         |c AS (SELECT doc_id, toks, len(toks) AS n_tok,
         |        ${nChunksSql("len(toks)")} AS n_chunks
         |      FROM t),
         |e AS (SELECT doc_id, n_tok, n_chunks, unnest(generate_series(0, n_chunks - 1)) AS chunk_id, toks FROM c)
         |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         |  CAST(len(toks[(chunk_id * $stride + 1):(chunk_id * $stride + $win)]) AS BIGINT) AS chunk_tok,
         |  CAST(length(array_to_string(toks[(chunk_id * $stride + 1):(chunk_id * $stride + $win)], ' ')) AS BIGINT) AS chunk_chars
         |FROM e ORDER BY doc_id, chunk_id""".stripMargin
    ) { (spark, dir) =>
      val toks = wsTokens(col("text"))
      Tables(spark, dir, "documents")
        .select(col("doc_id"), toks.as("toks"), size(toks).as("n_tok"))
        .withColumn("n_chunks", nChunks(col("n_tok")))
        .select(col("doc_id"), col("toks"),
          explode(expr("sequence(0, n_chunks - 1)")).as("chunk_id"))
        .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
          expr(s"slice(toks, chunk_id * $stride + 1, $win)").as("chunk"))
        .select(col("doc_id"), col("chunk_id"),
          size(col("chunk")).cast("long").as("chunk_tok"),
          length(concat_ws(" ", col("chunk"))).cast("long").as("chunk_chars"))
        .orderBy("doc_id", "chunk_id")
    },

    // X11 — deterministic stratified sample: a portable hash of doc_id
    // keeps ~10% per language stratum; no RNG, reproducible anywhere.
    Q(
      "x11_hash_sample",
      """WITH s AS (SELECT lang, n_chars FROM documents
        |  WHERE (doc_id * 2654435761) % 1000003 % 100 < 10)
        |SELECT lang, count(*) AS n_sampled,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM s GROUP BY 1 ORDER BY lang""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir, "documents")
        .filter((col("doc_id") * 2654435761L % 1000003L % 100) < 10)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"), sum("n_chars").as("sum_chars"))
        .orderBy("lang")
    },

    // X18 — deterministic train/val/test split: every doc lands in
    // exactly one split by hash range (90/5/5), reproducible anywhere
    // with no RNG and no coordination — the property that lets a
    // 1000-executor job and a laptop agree on membership. A different
    // odd multiplier than x11's sampler decorrelates the two hashes
    // (a doc being sampled says nothing about its split). Emitted as
    // per-(lang, split) stats so the assignment itself is what the
    // oracle hashes.
    Q(
      "x18_dataset_split",
      """WITH b AS (SELECT lang, n_chars,
        |    (doc_id * 2246822519) % 1000003 % 100 AS bkt
        |  FROM documents),
        |s AS (SELECT lang, n_chars,
        |    CASE WHEN bkt < 90 THEN 'train' WHEN bkt < 95 THEN 'val' ELSE 'test' END AS split
        |  FROM b)
        |SELECT lang, split, count(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM s GROUP BY 1, 2 ORDER BY lang, split""".stripMargin
    ) { (spark, dir) =>
      val bkt = col("doc_id") * 2246822519L % 1000003L % 100
      Tables(spark, dir, "documents")
        .select(col("lang"), col("n_chars"),
          when(bkt < 90, "train").when(bkt < 95, "val").otherwise("test").as("split"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
        .orderBy("lang", "split")
    },

    // X19 — stratified sampling at per-language rates (corpus
    // rebalancing: downsample the dominant language, keep the tail) —
    // x11's uniform sampler with a per-stratum threshold. The rate
    // table is a tiny CASE (a broadcast map at scale); membership stays
    // a pure per-row hash decision: no shuffle, no RNG, reproducible.
    // Third salt, decorrelated from both x11 and x18.
    Q(
      "x19_stratified_sample",
      """WITH r AS (SELECT lang, n_chars,
        |    (doc_id * 2654435769) % 1000003 % 100 AS bkt,
        |    CASE lang WHEN 'en' THEN 10 WHEN 'de' THEN 25 WHEN 'fr' THEN 25
        |              WHEN 'es' THEN 25 ELSE 50 END AS rate
        |  FROM documents)
        |SELECT lang, count(*) AS n_sampled,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM r WHERE bkt < rate GROUP BY 1 ORDER BY lang""".stripMargin
    ) { (spark, dir) =>
      val bkt = col("doc_id") * 2654435769L % 1000003L % 100
      val rate = when(col("lang") === "en", 10).when(col("lang") === "de", 25)
        .when(col("lang") === "fr", 25).when(col("lang") === "es", 25).otherwise(50)
      Tables(spark, dir, "documents")
        .filter(bkt < rate)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"), sum("n_chars").as("sum_chars"))
        .orderBy("lang")
    },

    // X35 — temperature-based language rebalancing: the data-mixing
    // step multilingual LLM pipelines actually run (sample language l
    // with probability ∝ (n_l/N)^(τ-1), here τ = 1/2 — downweight the
    // head, keep the tail), with the rates COMPUTED FROM THE CORPUS
    // in-plan — x19 rebalances against a hand-set rate table; x35
    // derives the table from the language histogram itself. CROSS-
    // ENGINE DETERMINISM of the float rate: keep_ppm folds exactly one
    // IEEE division (N/n_l), one sqrt, a multiply by 0.5 (a power of
    // two — exact), a min with 1.0, a multiply by 10^6 and a floor —
    // every step is a single correctly-rounded IEEE-754 op, so Spark
    // and DuckDB compute bit-identical rates with no fixed-point dance
    // needed. Membership is then the usual portable-hash threshold
    // (fifth salt, mod-first per the ADVICE overflow rule). SCALE
    // SHAPE: one tiny per-lang aggregate (map-side combinable) +
    // broadcast of the rate table + a pure per-row hash filter — no
    // shuffle of the corpus, no RNG, byte-reproducible on any cluster.
    Q(
      "x35_temperature_mix",
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |t AS (SELECT count(*) AS nn FROM documents),
        |r AS (SELECT lang, n,
        |    CAST(floor(least(1.0, 0.5 * sqrt(CAST(nn AS DOUBLE) / n)) * 1000000) AS BIGINT) AS keep_ppm
        |  FROM c, t),
        |k AS (SELECT d.lang, d.n_chars FROM documents d JOIN r ON d.lang = r.lang
        |  WHERE ((d.doc_id % 1000003) * 1540483477) % 1000003 % 1000000 < r.keep_ppm)
        |SELECT r.lang, r.n AS n_docs, r.keep_ppm, count(*) AS n_kept,
        |  CAST(SUM(k.n_chars) AS BIGINT) AS sum_chars
        |FROM k JOIN r ON k.lang = r.lang
        |GROUP BY 1, 2, 3 ORDER BY r.lang""".stripMargin
    ) { (spark, dir) =>
      val docs = Tables(spark, dir, "documents")
      val total = docs.agg(count(lit(1)).as("nn"))
      val rates = docs.groupBy("lang").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(total))
        .select(col("lang"), col("n"),
          floor(least(lit(1.0), lit(0.5) * sqrt(col("nn").cast("double") / col("n")))
            * 1000000).as("keep_ppm"))
      val hash = col("doc_id") % 1000003L * 1540483477L % 1000003L % 1000000L
      docs.select(col("doc_id"), col("lang"), col("n_chars"))
        .join(broadcast(rates), "lang")
        .filter(hash < col("keep_ppm"))
        .groupBy("lang", "n", "keep_ppm")
        .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("sum_chars"))
        .select(col("lang"), col("n").as("n_docs"), col("keep_ppm"),
          col("n_kept"), col("sum_chars"))
        .orderBy("lang")
    },

    // X27 — exact-quota balanced mix: downsample EVERY language to the
    // minority language's document count, selecting each stratum's
    // members by portable-hash rank (order by hashed id, tie by id) —
    // the exact-count counterpart to x19's rate-based rebalancing.
    // Rate sampling only hits a quota in expectation; a training-mix
    // spec ("exactly equal parts per language") needs rank selection.
    // The quota m is computed in-plan (min over per-lang counts, one
    // tiny broadcast row — no driver round-trip). SCALE NOTE: the
    // per-lang window serializes each stratum through one task, fine
    // while #strata is small and strata fit a partition; at 100 TB the
    // same selection is done by finding the m-th order statistic of
    // the hash per stratum (distributed select) and filtering below
    // it — identical output, no global sort. Fourth salt, decorrelated
    // from x11/x18/x19.
    Q(
      "x27_balanced_mix",
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |m AS (SELECT min(n) AS m FROM c),
        |r AS (SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY ((doc_id % 1000003) * 3266489917) % 1000003, doc_id) AS rk
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum
        |FROM r, m WHERE rk <= m GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (spark, dir) =>
      val docs = Tables(spark, dir, "documents")
      val m = docs.groupBy("lang").agg(count(lit(1)).as("n"))
        .agg(min("n").as("m"))
      // doc_id is reduced mod the prime BEFORE the multiply (ADVICE
      // r5): the raw product wraps int64 for doc_id >~ 2.8e9 — Spark
      // would wrap silently while DuckDB raises, a latent cross-engine
      // divergence at real corpus scale. Reduced first, the product
      // stays < 1000003 * 3266489917 < 2^52.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang")
        .orderBy((col("doc_id") % 1000003L * 3266489917L % 1000003L).asc, col("doc_id").asc)
      docs.select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .crossJoin(broadcast(m))
        .filter(col("rk") <= col("m"))
        .groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          sum("doc_id").as("id_checksum"))
        .orderBy("lang")
    },

    // X15 — training-sequence packing: documents pack, in doc_id order
    // within each language, into fixed 2048-token sequences by running
    // token count — the "sample packing" step between a tokenized
    // corpus and training shards. pack_id is a pure function of the
    // running sum (exact integers end to end), so the assignment is
    // deterministic, and the window partitions by lang — the same
    // shape that keeps it parallel at 100 TB: partition by
    // shard/language, never a global serial window.
    Q(
      "x15_seq_pack",
      """WITH d AS (SELECT doc_id, lang,
        |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (SELECT doc_id, lang, n_tok,
        |    SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS tok_before
        |  FROM d)
        |SELECT doc_id, lang, n_tok, CAST(tok_before // 2048 AS BIGINT) AS pack_id
        |FROM c ORDER BY doc_id""".stripMargin
    ) { (spark, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      Tables.fanOut(Tables(spark, dir, "documents"))
        .select(col("doc_id"), col("lang"), size(wsTokens(col("text"))).cast("long").as("n_tok"))
        .withColumn("tok_before", sum("n_tok").over(w) - col("n_tok"))
        .select(col("doc_id"), col("lang"), col("n_tok"),
          expr("tok_before DIV 2048").as("pack_id"))
        .orderBy("doc_id")
    },

    // X56 — deterministic EPOCH SHUFFLE: the training-order
    // permutation a multi-epoch run needs. Each epoch gets its own
    // hash multiplier, so the 4 epochs are 4 decorrelated
    // pseudo-random global orders of the same corpus — reproducible
    // on any cluster size with zero coordination and no RNG state
    // (the property that makes a resumable 100 TB data loader
    // possible: worker w of W can reconstruct ITS slice of epoch e
    // from (w, W, e) alone). Position hash is injective below the
    // prime modulus, shard = pos % 8, and the output is a per-
    // (epoch, shard) audit — count, lead doc, and an order
    // FINGERPRINT (sum of rank·doc_id mod 2^31−1 over the shard's
    // hash order) that pins the permutation itself, not just
    // membership: a different order with the same members hash-fails.
    // Production writes the ordered shards (x40's sink); the fused
    // 4-epoch explode here keeps the audit one plan.
    Q(
      "x56_epoch_shuffle",
      """WITH e AS (SELECT doc_id, ep FROM documents, unnest(generate_series(0, 3)) t(ep)),
        |p AS (SELECT doc_id, ep,
        |    (doc_id * CASE ep WHEN 0 THEN 2654435761 WHEN 1 THEN 2246822519
        |                      WHEN 2 THEN 3432918353 ELSE 1540483477 END) % 1000003 AS pos
        |  FROM e),
        |r AS (SELECT ep, pos % 8 AS shard, doc_id,
        |    row_number() OVER (PARTITION BY ep, pos % 8 ORDER BY pos, doc_id) AS rk FROM p)
        |SELECT CAST(ep AS BIGINT) AS epoch, CAST(shard AS BIGINT) AS shard,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(max(CASE WHEN rk = 1 THEN doc_id END) AS BIGINT) AS lead_doc,
        |  CAST(SUM((rk * doc_id) % 2147483647) % 2147483647 AS BIGINT) AS ord_fp
        |FROM r GROUP BY 1, 2 ORDER BY epoch, shard""".stripMargin
    ) { (spark, dir) =>
      val mult = element_at(
        array(lit(2654435761L), lit(2246822519L), lit(3432918353L), lit(1540483477L)),
        col("ep").cast("int") + 1)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("ep", "shard").orderBy("pos", "doc_id")
      Tables.fanOut(Tables(spark, dir, "documents"))
        .select(col("doc_id"), explode(sequence(lit(0L), lit(3L))).as("ep"))
        .withColumn("pos", (col("doc_id") * mult) % 1000003L)
        .withColumn("shard", col("pos") % 8L)
        .withColumn("rk", row_number().over(w).cast("long"))
        .groupBy(col("ep").as("epoch"), col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          max(when(col("rk") === 1L, col("doc_id"))).as("lead_doc"),
          (sum((col("rk") * col("doc_id")) % 2147483647L) % 2147483647L).as("ord_fp"))
        .orderBy("epoch", "shard")
    },

    // X63 — deterministic NEGATIVE SAMPLING for contrastive training:
    // pair every document (anchor) with k=4 pseudo-random other
    // documents via a hash ring over the dense id space — negative
    // j of anchor d is (d·2654435761 + (j+1)·40503) mod N. (An earlier
    // form reduced mod 1000003 first, which silently capped the ring
    // at ~1M distinct negatives — beyond a million documents every
    // negative would come from doc_id < 1000003, breaking the
    // any-cluster/100 TB reproducibility story; ADVICE r7. The direct
    // mod-N ring spans the full id space; the int64 product bounds the
    // design at doc_id ≤ ~3.4e9 — billions of documents — before
    // modmul widening would be needed, and that bound is explicit.) No
    // RNG state, no cartesian product, reproducible on any cluster:
    // the sampling is a pure per-row expression (the x56 multiplier
    // discipline — a FRESH constant, decorrelated from every other
    // hash decision in the engine), and materializing the negatives'
    // attributes is one keyed join of 4N rows against the corpus —
    // at 100 TB the only cost is that join's shuffle, which AQE
    // handles like any fact-fact equi-join. Output is the
    // anchor-language x negative-language flow matrix plus an exact
    // integer length-difference sum — the monitoring surface that
    // catches a skewed ring (all negatives from one shard) or a
    // degenerate sampler (self-pairs) immediately. Self-pairs are
    // kept, counted, and reported rather than silently resampled —
    // the honest contract, since resampling would make the ring
    // data-dependent.
    Q(
      "x63_negative_sampling",
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |pairs AS (SELECT d.doc_id, d.lang, d.n_chars,
        |    (d.doc_id * 2654435761 + (j.j + 1) * 40503) % nn.n AS neg_id
        |  FROM documents d CROSS JOIN nn,
        |       (SELECT unnest(generate_series(0, 3)) AS j) j),
        |joined AS (SELECT p.lang AS lang_a, d2.lang AS lang_n,
        |    CASE WHEN p.doc_id = p.neg_id THEN 1 ELSE 0 END AS self_pair,
        |    abs(p.n_chars - d2.n_chars) AS chardiff
        |  FROM pairs p JOIN documents d2 ON d2.doc_id = p.neg_id)
        |SELECT lang_a, lang_n, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(SUM(self_pair) AS BIGINT) AS self_pairs,
        |  CAST(SUM(chardiff) AS BIGINT) AS sum_chardiff
        |FROM joined GROUP BY 1, 2 ORDER BY lang_a, lang_n""".stripMargin
    ) { (spark, dir) =>
      val d = Tables.fanOut(Tables(spark, dir, "documents"))
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val nn = d.agg(count(lit(1)).as("n"))
      val pairs = d.crossJoin(broadcast(nn))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          explode(sequence(lit(0L), lit(3L))).as("j"), col("n"))
        .withColumn("neg_id",
          (col("doc_id") * 2654435761L + (col("j") + 1L) * 40503L) % col("n"))
      val d2 = d.select(col("doc_id").as("nid"),
        col("lang").as("lang_n"), col("n_chars").as("nc2"))
      pairs.join(d2, col("neg_id") === col("nid"))
        .groupBy(col("lang").as("lang_a"), col("lang_n"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("doc_id") === col("neg_id"), 1L).otherwise(0L)).as("self_pairs"),
          sum(abs(col("n_chars") - col("nc2"))).cast("long").as("sum_chardiff"))
        .orderBy("lang_a", "lang_n")
    },

    // X64 — LENGTH-BUCKET BATCHING: group documents into padded-length
    // buckets (token count rounded up to a multiple of 16 — the pad
    // granularity), order each bucket by a fresh-multiplier hash (so
    // batches mix sources, not storage order), and cut batches of 8.
    // The dynamic-batching step every sequence trainer runs: batching
    // similar lengths bounds padding waste, which the audit REPORTS
    // (pad_tokens = Σ bucket − n_tok) next to per-bucket batch counts
    // and an order fingerprint pinning the batch assignment itself.
    // SHAPE: one scan + one per-bucket window (exchange keyed on the
    // bucket — bounded partitions since bucket count is small); the
    // batch id is (rank−1) DIV 8 inside the bucket's hash order. At
    // extreme scale the global per-bucket rank becomes x56's
    // shard-local position (batch = shard-local rank, reconstructible
    // per worker) — the window form here keeps the whole assignment
    // hash-gateable.
    Q(
      "x64_length_batching",
      """WITH t AS (SELECT doc_id, lang,
        |    len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS n_tok
        |  FROM documents),
        |b AS (SELECT doc_id, lang, n_tok, ((n_tok + 15) // 16) * 16 AS bucket,
        |    (doc_id * 2654435699) % 1000003 AS pos FROM t WHERE n_tok > 0),
        |r AS (SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY pos, doc_id) AS rk FROM b),
        |a AS (SELECT bucket, doc_id, n_tok, (rk - 1) // 8 AS batch_id, rk FROM r)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(max(batch_id) + 1 AS BIGINT) AS n_batches,
        |  CAST(SUM(bucket - n_tok) AS BIGINT) AS pad_tokens,
        |  CAST(SUM((rk * doc_id) % 2147483647) % 2147483647 AS BIGINT) AS ord_fp
        |FROM a GROUP BY bucket ORDER BY bucket""".stripMargin
    ) { (spark, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("bucket").orderBy("pos", "doc_id")
      Tables.fanOut(Tables(spark, dir, "documents"))
        .select(col("doc_id"), col("lang"),
          size(wsTokens(col("text"))).cast("long").as("n_tok"))
        .filter(col("n_tok") > 0)
        .withColumn("bucket", expr("((n_tok + 15) DIV 16) * 16"))
        .withColumn("pos", (col("doc_id") * 2654435699L) % 1000003L)
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("batch_id", expr("(rk - 1) DIV 8"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          (max("batch_id") + 1L).as("n_batches"),
          sum(col("bucket") - col("n_tok")).cast("long").as("pad_tokens"),
          (sum((col("rk") * col("doc_id")) % 2147483647L) % 2147483647L).as("ord_fp"))
        .orderBy("bucket")
    },

    // X77 — WEIGHTED SAMPLING WITHOUT REPLACEMENT via priority
    // sampling (Duffield, Lund & Thorup, JACM 2007): per language
    // stratum, keep the k=10 documents with the SMALLEST priority key
    // u/w — a weighted-without-replacement draw where a doc's
    // selection probability scales with its weight (here n_chars;
    // a deployment plugs in x57's DSIR importance weights — any
    // positive per-row score works). WHY THIS FORM AT 100 TB: naive
    // weighted sampling without replacement is k SEQUENTIAL passes
    // (each draw renormalizes), and the usual exp(ln(u)/w) key is
    // float-ordered (cross-engine tie chaos). Priority sampling makes
    // it ONE pass — every row gets an independent key, the sample is
    // a pure per-stratum top-k — and the key is restated integer-
    // exact: u is the portable doc_id hash (fresh multiplier,
    // mod-first), the key is (u * 10^12) DIV w, monotone in u/w, with
    // doc_id as the total-order tiebreak. The top-k itself runs on
    // the custom TopKPerKey operator (plans/TopKPerKey.scala), NOT a
    // window: a window row_number would shuffle and fully sort every
    // stratum's corpus-sized partition, where TopKPerKey's map-side
    // partial heaps bound shuffle traffic at k rows per stratum per
    // input partition — the same "rank <= k of 10^9 rows" argument
    // x39's posting lists ride. No RNG anywhere: the same corpus
    // yields the same sample on a laptop or a 1000-executor cluster,
    // which is what makes a training-data draw auditable.
    Q(
      "x77_priority_sample",
      """WITH b AS (SELECT lang, doc_id, greatest(n_chars, 1) AS wt,
        |    ((doc_id % 1000003) * 2971215073) % 1000003 AS u FROM documents),
        |p AS (SELECT lang, doc_id, wt, (u * 1000000000000) // wt AS pkey FROM b),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY pkey, doc_id) AS rn FROM p)
        |SELECT lang, CAST(rn AS BIGINT) AS rn, doc_id, CAST(wt AS BIGINT) AS wt,
        |  CAST(pkey AS BIGINT) AS pkey
        |FROM r WHERE rn <= 10 ORDER BY lang, rn""".stripMargin
    ) { (spark, dir) =>
      val base = Tables(spark, dir, "documents")
        .select(col("lang"), col("doc_id"),
          greatest(col("n_chars").cast("long"), lit(1L)).as("wt"),
          (col("doc_id") % 1000003L * 2971215073L % 1000003L).as("u"))
        .withColumn("pkey", expr("(u * 1000000000000L) DIV wt"))
        .select("lang", "doc_id", "wt", "pkey")
      val top = graft.plans.TopKPerKey(base,
        Seq("lang"), Seq(("pkey", true), ("doc_id", true)), 10)
      // rank the <= 10 survivors per stratum (bounded input — this
      // window sorts at most k rows per lang, not the corpus).
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("pkey", "doc_id")
      top.withColumn("rn", row_number().over(w).cast("long"))
        .select(col("lang"), col("rn"), col("doc_id"), col("wt"), col("pkey"))
        .orderBy("lang", "rn")
    }
  )
}
