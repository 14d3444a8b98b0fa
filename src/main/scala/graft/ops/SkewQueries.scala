package graft.ops

import graft.core.Cols._
import graft.core.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Gated scale techniques: salted two-phase aggregation (x45) and
  * bloom-filter join pruning (x73).
  *
  * x45 (SURVEY.md §7 scale rule): a hot key whose rows must meet in
  * one reducer is the one skew AQE cannot split — salting is the fix.
  * The events table is the natural hot-key shape: five event types
  * over the whole corpus, so a plain groupBy(event_type) pins each
  * type's entire partition on one task at any scale. The salted plan
  * spreads each type over 16 sub-keys for the partial aggregate and
  * collapses 5×16 partials in a second, trivial shuffle.
  *
  * The summed payload is the exact integer ten-thousandths encoding
  * (Cols.fixed) — long addition is associative, so the salted partial
  * order cannot perturb the result and the cross-engine hash gate
  * certifies the two-phase plan EXACTLY equals DuckDB's plain GROUP BY.
  * ExtensionsSpec covers the operator on synthetic skew; this row makes
  * it part of the declared, driver-gated surface.
  */
object SkewQueries {

  /** One deterministic bloom hash: fold key*A through the Mersenne
    * prime 2^31-1, then into the m=4093 bit space. The intermediate
    * prime keeps the map non-affine over the key range (an affine map
    * mod m is injective on [0, m) — no collisions, no bloom), and the
    * int64 product bounds the design at key ≤ ~4.3e9 before modmul
    * widening would be needed. Multipliers are FRESH constants (the
    * x56 discipline — decorrelated from every other hash decision in
    * the engine). */
  private def bloomPos(k: Column, a: Long): Column =
    k * a % 2147483647L % 4093L

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
    },

    // X73 — BLOOM-FILTER JOIN PRUNING, the runtime-filter technique
    // Spark's own InjectRuntimeFilter/DPP applies under the hood: a
    // tiny k=3/m=4093 bloom built from the dim-side key set (BUILDING
    // customers) prunes the fact side (orders) BEFORE any shuffle or
    // exact join — at 100 TB this is the difference between shuffling
    // the full fact table into a semi-join and shuffling only the
    // ~fraction that passes the broadcast filter.
    // BloomFilterJoinSpec proves Catalyst's NATIVE rewrite (the
    // might_contain runtime filter) injects and preserves results;
    // this row is its gated cross-engine counterpart: Spark's builtin
    // BloomFilter aggregate is hash-implementation-specific, so the
    // row states the bloom DETERMINISTICALLY (three multiplicative
    // hashes both engines compute bit-identically) and the gate
    // certifies the whole mechanism: per priority bucket, probe count,
    // bloom-pass count, exact semi-join count, and the bloom's actual
    // false positives (bloom-pass minus exact — members always pass by
    // construction, so FP accounting is sound row-by-row). The plan is
    // one fact scan + four broadcast joins + a 5-group aggregate: the
    // fact side never shuffles.
    Q(
      "x73_bloom_prune",
      """WITH mem AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |pos AS (SELECT DISTINCT p FROM (
        |  SELECT (c_custkey * 2971215073) % 2147483647 % 4093 AS p FROM mem
        |  UNION ALL SELECT (c_custkey * 1640531527) % 2147483647 % 4093 FROM mem
        |  UNION ALL SELECT (c_custkey * 2166136261) % 2147483647 % 4093 FROM mem) u),
        |pr AS (SELECT o_custkey, o_orderpriority,
        |    (o_custkey * 2971215073) % 2147483647 % 4093 AS p1,
        |    (o_custkey * 1640531527) % 2147483647 % 4093 AS p2,
        |    (o_custkey * 2166136261) % 2147483647 % 4093 AS p3
        |  FROM orders),
        |fl AS (SELECT o_orderpriority,
        |    CASE WHEN p1 IN (SELECT p FROM pos) AND p2 IN (SELECT p FROM pos)
        |         AND p3 IN (SELECT p FROM pos) THEN 1 ELSE 0 END AS bloom_pass,
        |    CASE WHEN o_custkey IN (SELECT c_custkey FROM mem) THEN 1 ELSE 0 END AS exact_pass
        |  FROM pr)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(bloom_pass) AS BIGINT) AS n_bloom_pass,
        |  CAST(SUM(exact_pass) AS BIGINT) AS n_exact,
        |  CAST(SUM(CASE WHEN bloom_pass = 1 AND exact_pass = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
        |FROM fl GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (spark, dir) =>
      val as = Seq(2971215073L, 1640531527L, 2166136261L)
      val mem = Tables(spark, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      // The bloom "bitmap" as a relation: the distinct set positions.
      // ≤ 3·|mem| rows capped at m — broadcast-tiny by construction.
      val pos = as.map(a => mem.select(bloomPos(col("c_custkey"), a).as("p")))
        .reduce(_ union _).distinct()
      val probe = Tables(spark, dir, "orders")
        .select(col("o_custkey"), col("o_orderpriority"),
          bloomPos(col("o_custkey"), as(0)).as("p1"),
          bloomPos(col("o_custkey"), as(1)).as("p2"),
          bloomPos(col("o_custkey"), as(2)).as("p3"))
      // Three membership probes + the exact semi side, all as broadcast
      // left joins so every row carries both verdicts (FP accounting
      // needs bloom AND exact per row, not two disjoint semi-joins).
      val flagged = probe
        .join(broadcast(pos.toDF("bp1")), col("p1") === col("bp1"), "left")
        .join(broadcast(pos.toDF("bp2")), col("p2") === col("bp2"), "left")
        .join(broadcast(pos.toDF("bp3")), col("p3") === col("bp3"), "left")
        .join(broadcast(mem.toDF("mk")), col("o_custkey") === col("mk"), "left")
        .select(col("o_orderpriority"),
          when(col("bp1").isNotNull && col("bp2").isNotNull
            && col("bp3").isNotNull, 1L).otherwise(0L).as("bloom_pass"),
          when(col("mk").isNotNull, 1L).otherwise(0L).as("exact_pass"))
      flagged.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum("bloom_pass").as("n_bloom_pass"),
          sum("exact_pass").as("n_exact"),
          sum(when(col("bloom_pass") === 1 && col("exact_pass") === 0, 1L)
            .otherwise(0L)).as("n_false_pos"))
        .orderBy("o_orderpriority")
    }
  )
}
