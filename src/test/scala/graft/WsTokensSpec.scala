package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit parity of the native WsTokens tokenizer against the retired
  * `filter(split(s, "\\s+"), t -> t <> '')` spelling, which ten gated
  * queries depend on (see Cols.wsTokens). Covers the corpus plus the
  * edge strings where split semantics are subtle.
  */
class WsTokensSpec extends AnyFunSuite {
  import TestSpark._

  test("native tokens equal the declarative split+filter on the corpus") {
    val docs = graft.core.Tables(spark, sf001, "documents")
    val native = docs.select(graft.core.Cols.wsTokens(col("text")).as("t"))
      .orderBy(col("t")).collect()
    val hof = docs.select(graft.core.Cols.wsTokensHof(col("text")).as("t"))
      .orderBy(col("t")).collect()
    assert(native.length == hof.length && native.nonEmpty)
    assert(native.map(_.toString).toSeq == hof.map(_.toString).toSeq)
  }

  test("edge strings: empties, runs, ASCII-only \\s, unicode kept whole") {
    val sp = spark
    import sp.implicits._
    val cases = Seq(
      "",                       // no tokens
      "   ",                    // only whitespace
      "a",                      // single token, no ws
      "  a  b  ",               // leading/trailing/multi ws
      "a\tb\nc\rd\fef",   // every \s char as a separator
      "café naïve",   // non-ASCII letters stay inside tokens
      "a b",               // NBSP is NOT \s: one token in both forms
      "Mixed CASE Text")        // lower() applied in both forms
    val df = cases.toDF("text")
    val native = df.select(graft.core.Cols.wsTokens(col("text")).as("t")).collect()
    val hof = df.select(graft.core.Cols.wsTokensHof(col("text")).as("t")).collect()
    assert(native.map(_.toString).toSeq == hof.map(_.toString).toSeq)
    // and the NBSP case really is a single token
    assert(native(6).getSeq[String](0) == Seq("a b"))
  }

  test("null text yields null tokens in both spellings") {
    val sp = spark
    import sp.implicits._
    val df = Seq(Some("a b"), None).toDF("text")
    val native = df.select(graft.core.Cols.wsTokens(col("text")).as("t")).collect()
    val hof = df.select(graft.core.Cols.wsTokensHof(col("text")).as("t")).collect()
    assert(native.map(_.toString).toSeq == hof.map(_.toString).toSeq)
    assert(native(1).isNullAt(0))
  }
}
