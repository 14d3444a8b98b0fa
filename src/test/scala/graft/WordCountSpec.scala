package graft

import graft.core.Cols
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.io.Source

/** WC1 semantics vs a hand-computed oracle on the reference's own golden
  * fixture /root/reference/article/1.txt (word_count.rs:99-124:
  * whitespace split, lowercase, strip ONLY ',' and '.', additive count).
  */
class WordCountSpec extends AnyFunSuite {
  import TestSpark._

  private val fixture = "/root/reference/article/1.txt"

  /** Plain-Scala reimplementation of the intended reference semantics. */
  private def oracle(lines: Seq[String]): Map[String, Long] =
    lines.flatMap(_.trim.split("\\s+"))
      .map(_.toLowerCase.filterNot(c => c == ',' || c == '.'))
      .filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }

  test("WC1 pipeline matches the hand oracle on article/1.txt") {
    val src = Source.fromFile(fixture)
    val expected = try oracle(src.getLines().toSeq) finally src.close()

    val got = spark.read.textFile(fixture).toDF("text")
      .select(explode(split(col("text"), "\\s+")).as("t"))
      .select(translate(lower(col("t")), ",.", "").as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(got == expected)
    // Reference-visible behaviors: case folding and punctuation strip.
    assert(got("rage") == 8L)     // "Rage, rage" twice per refrain
    assert(!got.contains("rage,"))
  }

  test("WordCount API (reference-shaped surface) matches the hand oracle") {
    val src = Source.fromFile(fixture)
    val expected = try oracle(src.getLines().toSeq) finally src.close()
    val wc = new graft.ops.WordCount(spark, fixture, partitions = 4)
    assert(wc.scoreboard() == expected)
    // the reducer-bin column matches the reference partitioner semantics
    val bins = wc.bin(8).select("bin").distinct().collect().map(_.getInt(0)).toSet
    assert(bins.subsetOf((0 until 8).toSet))
  }

  test("wsTokens drops empty tokens") {
    val df = spark.createDataFrame(Seq(Tuple1("  a  b "))).toDF("text")
    val toks = df.select(Cols.wsTokens(col("text")).as("t"))
      .selectExpr("size(t)").collect().head.getInt(0)
    assert(toks == 2)
  }
}
