package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Faithful reproduction of the reference's scoreboard merge quirk
  * (word_count.rs:126: `scoreboard.extend(board)` — a LATER reduce
  * round's count for a word REPLACES the earlier one instead of adding).
  *
  * The engine's real word count is additive (the intended semantics,
  * SURVEY.md §7); this Aggregator exists so the quirk is expressible on
  * demand: feed (round, count) pairs, the count of the highest round
  * wins. Unlike the reference's implicit iteration order, the round id
  * makes the "last" well-defined, so the aggregation stays
  * deterministic under Spark's arbitrary merge order.
  */
object OverwriteMergeAggregator
    extends Aggregator[(Long, Long), (Long, Long), Long] {

  /** (round, count); round -1 = empty. */
  override def zero: (Long, Long) = (-1L, 0L)

  override def reduce(b: (Long, Long), a: (Long, Long)): (Long, Long) =
    if (a._1 >= b._1) a else b

  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    if (b._1 >= a._1) b else a

  override def finish(r: (Long, Long)): Long = r._2

  override def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
