package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each probe row, attach the latest event row
  * (by event time) with the same key and event time <= probe time.
  *
  * Implemented the scale-out way — NOT as a range self-join (which is
  * quadratic per key) but as union + a running `last(ignoreNulls)` window:
  * one shuffle on the key, linear state, identical to how a streaming
  * engine would keep "latest value per key". Events sort before probes at
  * equal timestamps (kind 0 < 1), making the join inclusive (ts <= probeTs).
  */
object AsOfJoin {

  /** @param probes  (key, probeTs, probe payload...)
    * @param events  (key, eventTs, event payload...)
    * @param eventPayload columns of `events` to carry to the matched probe
    *                     (emitted as `asof_<name>`, plus `asof_ts` itself)
    */
  def backward(
      probes: DataFrame,
      events: DataFrame,
      key: String,
      probeTs: String,
      eventTs: String,
      eventPayload: Seq[String]): DataFrame = {

    val probeCols = probes.columns.filterNot(_ == key).toSeq
    val eSide = events.select(
      Seq(col(key), col(eventTs).as("_ts"), lit(0).as("_kind")) ++
        eventPayload.map(c => col(c).as(s"_ev_$c")) ++
        probeCols.map(c => lit(null).cast(probes.schema(c).dataType).as(c)): _*)
    val pSide = probes.select(
      Seq(col(key), col(probeTs).as("_ts"), lit(1).as("_kind")) ++
        eventPayload.map(c => lit(null).cast(events.schema(c).dataType).as(s"_ev_$c")) ++
        probeCols.map(col): _*)

    val w = Window.partitionBy(key).orderBy(col("_ts"), col("_kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = eSide.unionByName(pSide)
      .withColumn("asof_ts", last(when(col("_kind") === 0, col("_ts")), ignoreNulls = true).over(w))
    val withPayload = eventPayload.foldLeft(joined) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"_ev_$c"), ignoreNulls = true).over(w))
    }
    withPayload.filter(col("_kind") === 1)
      .drop("_ts", "_kind").drop(eventPayload.map(c => s"_ev_$c"): _*)
  }
}
