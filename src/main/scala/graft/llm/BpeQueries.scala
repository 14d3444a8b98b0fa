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
  * row (the argmax); the merge applies as a literal string replace in
  * the next round's expression chain. Merging uses left-to-right
  * non-overlapping `replace` on the space-joined symbol string with
  * sentinel padding — both engines' replace has exactly BPE's greedy
  * semantics ("a a a" merges to "aa a", the second overlapping pair
  * is consumed). A production trainer running 50k merges would
  * checkpoint the symbol column every few hundred rounds to cap
  * lineage growth; at Rounds=8 the chain is trivially shallow.
  *
  * The oracle replays the identical Rounds iterations as unrolled
  * CTEs, so every pair count, tie-break, and re-tokenization — not
  * just the final table — is hash-gated.
  */
object BpeQueries {

  val Rounds = 8

  private def oracleSql: String = {
    val rounds = (1 to Rounds).map { r =>
      s"""p$r AS (SELECT unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS pair, f
         |  FROM (SELECT string_split(s, ' ') AS l, f FROM w${r - 1})),
         |b$r AS (SELECT pair, CAST(SUM(f) AS BIGINT) AS c FROM p$r GROUP BY pair ORDER BY c DESC, pair LIMIT 1),
         |w$r AS (SELECT trim(replace(' ' || w.s || ' ', ' ' || b.pair || ' ', ' ' || replace(b.pair, ' ', '') || ' ')) AS s, w.f
         |  FROM w${r - 1} w CROSS JOIN b$r b)""".stripMargin
    }.mkString(",\n")
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
    var s: Column = col("s")
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    for (r <- 1 to rounds) {
      // 2-grams of the symbol array: single-symbol words contribute
      // nothing (native TokenNgrams yields [] below n; the oracle's
      // range(1, 1) is equally empty — no guard needed).
      val top = words
        .select(col("f"),
          explode(graft.functions.ShingleExpressions
            .tokenNgrams(split(s, " "), 2)).as("pair"))
        .groupBy("pair").agg(sum("f").as("c"))
        .orderBy(col("c").desc, col("pair")).limit(1).collect()
      require(top.nonEmpty, s"pair vocabulary exhausted at merge round $r")
      val pair = top.head.getString(0)
      val c = top.head.getLong(1)
      val merged = pair.replace(" ", "")
      merges += ((r.toLong, pair, merged, c))
      s = trim(replace(concat(lit(" "), s, lit(" ")),
        lit(s" $pair "), lit(s" $merged ")))
    }
    merges.toSeq
  }

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
    })
}
