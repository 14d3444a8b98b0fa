package graft.functions

import graft.llm.MinHash
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (Aggregator[IN, BUF, OUT]): the full 16-slot
  * MinHash signature in ONE aggregation buffer — the
  * TypedImperativeAggregate-style alternative SURVEY.md §4 sketches for
  * 100 TB minhash (one buffer update per shingle instead of 16 separate
  * min() columns; merge is elementwise min, so it is a proper
  * commutative monoid and partial aggregation is exact).
  *
  * Input: a shingle hash (Long). Output: Array of the 16 minhash values,
  * identical to MinHash.signatures' mh0..mh15 columns.
  */
object MinHashAggregator extends Aggregator[Long, Array[Long], Array[Long]] {

  private val seeds = MinHash.seeds.toArray
  private val P = MinHash.P

  override def zero: Array[Long] = Array.fill(seeds.length)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val hm = h % P
    var i = 0
    while (i < seeds.length) {
      val v = (hm * seeds(i)._1 + seeds(i)._2) % P
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
