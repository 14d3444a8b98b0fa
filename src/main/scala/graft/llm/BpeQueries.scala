package graft.llm

import graft.core.Cols._
import graft.core.{CacheScope, Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** X30 — byte-pair-encoding merge mining: the classic LLM tokenizer
  * training step (Sennrich et al. 2016), as a fixed-round
  * deterministic job. Each round counts adjacent symbol pairs over the
  * corpus, merges the most frequent one (ties to the lexicographically
  * smaller pair), and re-tokenizes; the output is the merge table —
  * (round, pair, merged, count) — which IS a BPE tokenizer's trained
  * artifact.
  *
  * Layout is the textbook type-frequency form: BPE never rescans raw
  * text after the first pass — it operates on the (word type,
  * frequency) table, which is vocabulary-sized (tiny next to the
  * corpus at any scale; that one aggregation is the only corpus-wide
  * work). Per round: pair counts come from the native TokenNgrams
  * 2-gram expression over the cached type table, partial-aggregated
  * map-side to the pair vocabulary; the driver receives exactly ONE
  * row (the argmax); the merge applies as the native PairMerge
  * expression — a single greedy left-to-right pass over the symbol
  * array in which a consumed token cannot start another match, the
  * reference trainer's exact re-tokenization ("a b a b" -> "ab ab",
  * "a a a" -> "aa a"). Round 6 spelled the merge as non-overlapping
  * string replace over the space-joined symbols, which under-merged
  * adjacent occurrences sharing only the delimiter space (ADVICE r6);
  * the array pass fixes that divergence on BOTH engines. A production
  * trainer running 50k merges would checkpoint the symbol column every
  * few hundred rounds to cap lineage growth; at Rounds=8 the chain is
  * trivially shallow.
  *
  * The oracle replays the identical Rounds iterations as unrolled
  * CTEs, so every pair count, tie-break, and re-tokenization — not
  * just the final table — is hash-gated. Its merge states the same
  * greedy scan as a closed-form parity rule: candidate position i
  * (l[i]=a, l[i+1]=b) is merged iff the run of consecutive candidates
  * immediately before it has EVEN length — candidates chain only
  * inside equal-symbol runs ("a a a a"), where greedy takes every
  * other one; elsewhere a candidate's predecessor is never a
  * candidate, so the parity term is 0 and every candidate merges.
  * BpeSpec proves formula == sequential scan by property test.
  */
object BpeQueries {

  val Rounds = 8

  /** The unrolled per-round training CTEs (pair count → argmax →
    * greedy merge), shared by the x30 trainer oracle and the x53
    * encoder oracle. `carry` is a column-list prefix (e.g. "word, ")
    * threaded through the re-tokenization chain so the encoder can
    * keep the word→symbols mapping; the pair-count argmax (b$r) is
    * identical either way — carried columns never enter it. */
  private def roundCtes(carry: String): String =
    (1 to Rounds).map { r =>
      s"""x$r AS (SELECT ${carry}string_split(s, ' ') AS l, f FROM w${r - 1}),
         |p$r AS (SELECT unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS pair, f FROM x$r),
         |b$r AS (SELECT pair, CAST(SUM(f) AS BIGINT) AS c FROM p$r GROUP BY pair ORDER BY c DESC, pair LIMIT 1),
         |ab$r AS (SELECT string_split(pair, ' ')[1] AS pa, string_split(pair, ' ')[2] AS pb, replace(pair, ' ', '') AS pm FROM b$r),
         |y$r AS (SELECT ${carry}l, f, pm,
         |    list_transform(range(1, len(l)), i -> CASE WHEN l[i] = pa AND l[i+1] = pb THEN 1 ELSE 0 END) AS cnd
         |  FROM x$r CROSS JOIN ab$r),
         |z$r AS (SELECT ${carry}l, f, pm,
         |    list_transform(range(1, len(l)), i -> cnd[i] = 1
         |      AND (i - 1 - coalesce(list_max(list_filter(range(1, i), j -> cnd[j] = 0)), 0)) % 2 = 0) AS sel
         |  FROM y$r),
         |w$r AS (SELECT ${carry}array_to_string(list_filter(
         |    list_transform(range(1, len(l) + 1), i ->
         |      CASE WHEN i <= len(sel) AND sel[i] THEN pm
         |           WHEN i >= 2 AND sel[i - 1] THEN NULL
         |           ELSE l[i] END),
         |    t -> t IS NOT NULL), ' ') AS s, f FROM z$r)""".stripMargin
    }.mkString(",\n")

  private def oracleSql: String = {
    val rounds = roundCtes("")
    val sel = (1 to Rounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, pair, replace(pair, ' ', '') AS merged, c AS cnt FROM b$r")
      .mkString("\n  UNION ALL ")
    s"""WITH t AS (SELECT list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks FROM documents),
       |words AS (SELECT word, CAST(count(*) AS BIGINT) AS f FROM (SELECT unnest(toks) AS word FROM t) GROUP BY word),
       |w0 AS (SELECT array_to_string(string_split(word, ''), ' ') AS s, f FROM words),
       |$rounds
       |SELECT * FROM (
       |  $sel) ORDER BY round""".stripMargin
  }

  /** The merge loop over a (s: space-joined symbols, f: frequency)
    * word-type table; returns (round, pair, merged, pairCount). */
  private[graft] def train(words: org.apache.spark.sql.DataFrame,
      rounds: Int): Seq[(Long, String, String, Long)] = {
    var s: Column = split(col("s"), " ")
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    for (r <- 1 to rounds) {
      // 2-grams of the symbol array: single-symbol words contribute
      // nothing (native TokenNgrams yields [] below n; the oracle's
      // range(1, 1) is equally empty — no guard needed).
      val top = words
        .select(col("f"),
          explode(graft.functions.ShingleExpressions
            .tokenNgrams(s, 2)).as("pair"))
        .groupBy("pair").agg(sum("f").as("c"))
        .orderBy(col("c").desc, col("pair")).limit(1).collect()
      require(top.nonEmpty, s"pair vocabulary exhausted at merge round $r")
      val pair = top.head.getString(0)
      val c = top.head.getLong(1)
      val merged = pair.replace(" ", "")
      merges += ((r.toLong, pair, merged, c))
      val Array(pa, pb) = pair.split(" ", 2)
      s = graft.functions.ShingleExpressions.pairMerge(s, pa, pb, merged)
    }
    merges.toSeq
  }

  /** X53's oracle: replay the identical training rounds with `word`
    * carried through the merge chain, then score every document
    * against the final word→symbols table. */
  private def encodeOracleSql: String =
    s"""WITH t AS (SELECT doc_id, lang, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks FROM documents),
       |tok AS (SELECT doc_id, lang, unnest(toks) AS word FROM t),
       |words AS (SELECT word, CAST(count(*) AS BIGINT) AS f FROM tok GROUP BY word),
       |w0 AS (SELECT word, array_to_string(string_split(word, ''), ' ') AS s, f FROM words),
       |${roundCtes("word, ")},
       |enc AS (SELECT word, CAST(len(string_split(s, ' ')) AS BIGINT) AS n_sym FROM w$Rounds)
       |SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  CAST(count(*) AS BIGINT) AS ws_tokens,
       |  CAST(SUM(n_sym) AS BIGINT) AS bpe_tokens
       |FROM tok JOIN enc USING (word)
       |GROUP BY lang ORDER BY lang""".stripMargin

  val all: Seq[Q] = Seq(
    Q("x30_bpe_merges", oracleSql) { (spark, dir) =>
      // The ONLY corpus-wide pass: tokenize + word-type frequencies,
      // then symbols = the word's space-joined characters.
      val words = CacheScope.cacheEager(
        Tables.fanOut(Tables(spark, dir, "documents"))
          .select(explode(wsTokens(col("text"))).as("word"))
          .groupBy("word").agg(count(lit(1)).as("f"))
          .select(concat_ws(" ", split(col("word"), "")).as("s"), col("f")))
      import spark.implicits._
      train(words, Rounds).toDF("round", "pair", "merged", "cnt").orderBy("round")
    },

    // X53 — BPE ENCODE: apply the trained merge table (x30's artifact)
    // to the corpus and report per-language tokenizer fertility
    // (whitespace tokens vs BPE symbols). The encode is
    // vocabulary-granular — the textbook trick that makes BPE
    // application affordable at 100 TB: each distinct word type is
    // segmented ONCE (8 chained native PairMerge passes over the
    // vocabulary-sized type table, one codegen'd projection), and
    // documents pick up their words' symbol counts through a keyed
    // join on the word — corpus-side work is one explode + one join,
    // never a per-document merge loop. The oracle replays the full
    // training chain with `word` carried through every round, so the
    // learned merges, the per-word segmentations, AND the per-language
    // rollup are all hash-gated end to end. All-integer output.
    Q("x53_bpe_encode", encodeOracleSql) { (spark, dir) =>
      val tok = CacheScope.cacheEager(
        Tables.fanOut(Tables(spark, dir, "documents"))
          .select(col("doc_id"), col("lang"),
            explode(wsTokens(col("text"))).as("word")))
      val words = CacheScope.cacheEager(
        tok.groupBy("word").agg(count(lit(1)).as("f"))
          .select(col("word"),
            concat_ws(" ", split(col("word"), "")).as("s"), col("f")))
      // Train exactly as x30 (same argmax, same tie-break), then fold
      // the learned merges over the type table's symbol arrays.
      var sym: Column = split(col("s"), " ")
      for ((_, pair, merged, _) <- train(words, Rounds)) {
        val Array(pa, pb) = pair.split(" ", 2)
        sym = graft.functions.ShingleExpressions.pairMerge(sym, pa, pb, merged)
      }
      val enc = words.select(col("word"), size(sym).cast("long").as("n_sym"))
      tok.join(enc, "word")
        .groupBy("lang")
        .agg(countDistinct("doc_id").as("n_docs"),
          count(lit(1)).as("ws_tokens"),
          sum("n_sym").as("bpe_tokens"))
        .orderBy("lang")
    })
}
