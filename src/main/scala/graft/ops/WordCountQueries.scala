package graft.ops

import graft.core.{Q, Tables}
import org.apache.spark.sql.functions._

/** WordCount surface — reference-faithful semantics of
  * /root/reference/src/word_count.rs:99-124 (whitespace tokenize,
  * lowercase, strip only `,` and `.`, count per word, ADDITIVE merge —
  * the reference's overwrite-merge at word_count.rs:126 is a documented
  * quirk, SURVEY.md §7).
  *
  * Spark-first shape: `explode(split())` is a Catalyst Generator, the
  * count is a two-phase HashAggregate (partial map-side combine then
  * final after one shuffle on the word) — exactly the reference's
  * board→scoreboard two-phase model (word_count.rs:119-128), but
  * distributed and codegen'd.
  */
object WordCountQueries {

  /** Normalized non-empty tokens of documents.text, with multiplicity.
    * fanOut first: the explode amplifies ~50x past the bytes scanned,
    * so split planning alone would under-parallelize small files. */
  private def tokens(docs: org.apache.spark.sql.DataFrame) =
    Tables.fanOut(docs)
      .select(explode(split(col("text"), "\\s+")).as("t"))
      .select(translate(lower(col("t")), ",.", "").as("word"))
      .filter(col("word") =!= "")

  val all: Seq[Q] = Seq(
    Q(
      "wc1_wordcount",
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT translate(lower(t), ',.', '') AS word FROM (
        |    SELECT unnest(string_split_regex(text, '\s+')) AS t FROM documents) u) w
        |WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin
    ) { (spark, dir) =>
      tokens(Tables(spark, dir, "documents"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy("word")
    },

    Q(
      "wc2_bin_histogram",
      // Reference partitioner word_count.rs:104-106: bin by last char's
      // code point mod reducer count (8).
      """SELECT CAST(ascii(substr(word, -1)) % 8 AS BIGINT) AS bin, count(*) AS cnt FROM (
        |  SELECT translate(lower(t), ',.', '') AS word FROM (
        |    SELECT unnest(string_split_regex(text, '\s+')) AS t FROM documents) u) w
        |WHERE word <> '' GROUP BY 1 ORDER BY bin""".stripMargin
    ) { (spark, dir) =>
      tokens(Tables(spark, dir, "documents"))
        .select(pmod(ascii(substring(col("word"), -1, 1)), lit(8)).cast("long").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("cnt"))
        .orderBy("bin")
    },

    Q(
      "wc3_top20",
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT translate(lower(t), ',.', '') AS word FROM (
        |    SELECT unnest(string_split_regex(text, '\s+')) AS t FROM documents) u) w
        |WHERE word <> '' GROUP BY word ORDER BY cnt DESC, word LIMIT 20""".stripMargin
    ) { (spark, dir) =>
      // orderBy().limit() → TakeOrderedAndProject: per-partition top-20
      // then a single tiny driver-side merge; no full sort at any scale.
      tokens(Tables(spark, dir, "documents"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word"))
        .limit(20)
    }
  )
}
