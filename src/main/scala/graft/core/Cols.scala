package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column helpers shared across the query surface.
  *
  * Determinism discipline (FIXTURES.md): a double aggregate is only
  * hash-comparable against the DuckDB oracle when every floating-point
  * operation is bit-identical on both engines. Sums of doubles are NOT
  * (order of partial aggregation differs), so money columns — which are
  * exactly 2-decimal in the test data — are summed as exact integer
  * cents (`round(x*100)` is deterministic: identical input double →
  * identical rounded value on both engines) and only divided back to
  * double at the end. This is also the right 100 TB design: long sums
  * never lose precision across a million partial aggregates.
  */
object Cols {

  /** Exact integer representation of a fixed-decimal double: x * 10^scaleDigits
    * rounded to long. `scale` must be a power of ten matching the data's
    * true decimal precision (100 for money, 10000 for events.value).
    */
  def fixed(c: Column, scale: Long): Column = round(c * scale.toDouble).cast("long")

  /** Sum a fixed-decimal double column exactly; returns double of the sum. */
  def sumFixed(c: Column, scale: Long): Column = sum(fixed(c, scale)) / scale.toDouble

  /** Epoch microseconds of a timestamp — the canonical cross-engine
    * timestamp encoding (DuckDB: epoch_us). */
  def epochUs(c: Column): Column = unix_micros(c)

  /** round(x, 4) on a deterministically-computed double. */
  def r4(c: Column): Column = round(c, 4)

  /** Whitespace tokens of lowercased text, empty tokens dropped.
    * Matches reference tokenization word_count.rs:99-103 modulo the
    * `,`/`.` strip which WC1 applies separately. Native codegen
    * tokenizer (graft.functions.WsTokens) — bit-identical to the
    * retired `filter(split(lower(text), "\\s+"), t => t =!= "")`
    * spelling (WsTokensSpec), which as a higher-order function ran on
    * the interpreted eval path that round 5 measured degrading 5x in
    * long-lived JVMs. */
  def wsTokens(text: Column): Column =
    graft.functions.ShingleExpressions.wsTokens(lower(text))

  /** The retired HOF spelling, kept as the parity oracle. */
  private[graft] def wsTokensHof(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** Cast array<float> to array<double> — widening is exact on both
    * engines, and all downstream arithmetic stays in double. */
  def vecD(c: Column): Column = c.cast("array<double>")

  /** In-order dot product of two double arrays — a native codegen'd
    * Catalyst expression (graft.functions.DotProduct) summing in index
    * order, bit-identical to a sequential C loop (which is what DuckDB's
    * list_dot_product is) and to the zip_with+aggregate fold it
    * replaces, but without the per-row array allocation. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotNative(a, b)

  /** L2 norm via in-order fold. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity with the exact formula shape the oracle uses:
    * dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))
}
