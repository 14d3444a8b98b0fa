package graft.ops

import graft.core.Cols._
import graft.core.{Q, Tables}
import org.apache.spark.sql.functions._

/** Gated exercise of the SkewSalt two-phase aggregation (SURVEY.md §7
  * scale rule: a hot key whose rows must meet in one reducer is the one
  * skew AQE cannot split — salting is the fix). The events table is the
  * natural hot-key shape: five event types over the whole corpus, so a
  * plain groupBy(event_type) pins each type's entire partition on one
  * task at any scale. The salted plan spreads each type over 16
  * sub-keys for the partial aggregate and collapses 5×16 partials in a
  * second, trivial shuffle.
  *
  * The summed payload is the exact integer ten-thousandths encoding
  * (Cols.fixed) — long addition is associative, so the salted partial
  * order cannot perturb the result and the cross-engine hash gate
  * certifies the two-phase plan EXACTLY equals DuckDB's plain GROUP BY.
  * ExtensionsSpec covers the operator on synthetic skew; this row makes
  * it part of the declared, driver-gated surface.
  */
object SkewQueries {

  val all: Seq[Q] = Seq(

    // X45 — salted hot-key aggregation == plain GROUP BY, cross-engine.
    Q(
      "x45_salted_hot_key",
      """SELECT event_type, count(*) AS cnt,
        |  SUM(CAST(round(value * 10000) AS BIGINT)) / 10000.0 AS v_sum
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (spark, dir) =>
      val e = Tables(spark, dir, "events")
      val cnt = SkewSalt.saltedCount(e, Seq("event_type"), 16)
      val sums = SkewSalt.saltedSum(e, Seq("event_type"),
          fixed(col("value"), 10000), 16)
        .select(col("event_type").as("et"),
          (col("total") / 10000.0).as("v_sum"))
      cnt.join(sums, col("event_type") === col("et"))
        .select(col("event_type"), col("cnt"), col("v_sum"))
        .orderBy("event_type")
    }
  )
}
