package graft.relational

import graft.core.{Q, Tables}
import org.apache.spark.sql.functions._

/** CDC / snapshot-merge operators: the "apply today's change batch to
  * the dimension" step every warehouse runs nightly, here as an SCD
  * type-2 merge (versioned history: updates close the old version and
  * open a new one; inserts open version 1; untouched keys pass
  * through). The reference has no mutation surface at all, so this is
  * extended-surface: the operator a user of ANY batch engine needs the
  * moment their input is a stream of snapshots rather than a static
  * table (same motivation as x24's incremental snapshot dedup).
  */
object MergeQueries {

  val all: Seq[Q] = Seq(

    // X48 — SCD2 merge of a change batch into the orders dimension.
    // The batch is derived DETERMINISTICALLY from the base so both
    // engines construct the identical input: keys ≡ 0 (mod 7) arrive
    // re-priced (+10%, computed in exact integer cents — the Cols
    // money discipline), and keys ≡ 0 (mod 13) arrive as brand-new
    // orders under a shifted key space (k + 10^9, disjoint from any
    // real key at every SF). The merge itself is the honest operator:
    // a full outer join of base×batch on the key — the engine does NOT
    // get to exploit how the batch was made — classifying each key as
    // update (both sides, price changed), insert (batch only), or
    // unchanged (base only; mod-7 keys that are also mod-13 don't
    // exist — inserts are key-shifted), then emitting versioned rows:
    // retired v1 + current v2 for updates, current v1 otherwise.
    // SCALE SHAPE: one keyed shuffle for the outer join (batch and
    // base co-partition on the key), per-row classification, then the
    // versioned rows come from ONE pass — each joined row explodes to
    // its 1-or-2 output versions (a union of two selects over the join
    // would execute the join twice in Spark; the oracle's UNION ALL
    // over the `m` CTE is the same single-evaluation shape because
    // DuckDB materializes CTEs). No window, no driver materialization.
    // At 100 TB the join is the unavoidable cost and everything else
    // is map-side; bucketing both sides on the key (b1's layout) would
    // remove even that exchange for a nightly pipeline.
    Q(
      "x48_scd2_merge",
      """WITH base AS (SELECT o_orderkey AS k,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        |upd AS (SELECT k, cents + cents // 10 AS cents FROM base WHERE k % 7 = 0),
        |ins AS (SELECT k + 1000000000 AS k, cents FROM base WHERE k % 13 = 0),
        |batch AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
        |m AS (SELECT COALESCE(b.k, t.k) AS k, b.cents AS old_cents,
        |    t.cents AS new_cents,
        |    CASE WHEN b.k IS NULL THEN 'insert'
        |         WHEN t.k IS NULL THEN 'unchanged'
        |         ELSE 'update' END AS change_type
        |  FROM base b FULL OUTER JOIN batch t ON t.k = b.k),
        |out AS (
        |  SELECT k, 1 AS version, change_type <> 'update' AS is_current,
        |    change_type, COALESCE(old_cents, new_cents) AS cents FROM m
        |  UNION ALL
        |  SELECT k, 2, TRUE, change_type, new_cents FROM m
        |  WHERE change_type = 'update')
        |SELECT k AS o_orderkey, CAST(version AS BIGINT) AS version,
        |  is_current, change_type, cents / 100.0 AS price
        |FROM out ORDER BY o_orderkey, version""".stripMargin
    ) { (spark, dir) =>
      val base = Tables(spark, dir, "orders")
        .select(col("o_orderkey").as("k"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      val upd = base.filter(col("k") % 7 === 0)
        .select(col("k"), (col("cents") + expr("cents DIV 10")).as("cents"))
      val ins = base.filter(col("k") % 13 === 0)
        .select((col("k") + 1000000000L).as("k"), col("cents"))
      val batch = upd.unionByName(ins)
      val m = base.toDF("bk", "old_cents")
        .join(batch.toDF("tk", "new_cents"), col("tk") === col("bk"), "full_outer")
        .select(coalesce(col("bk"), col("tk")).as("k"),
          col("old_cents"), col("new_cents"),
          when(col("bk").isNull, "insert")
            .when(col("tk").isNull, "unchanged")
            .otherwise("update").as("change_type"))
      val v1 = struct(lit(1L).as("version"),
        (col("change_type") =!= "update").as("is_current"),
        coalesce(col("old_cents"), col("new_cents")).as("cents"))
      val v2 = struct(lit(2L).as("version"), lit(true).as("is_current"),
        col("new_cents").as("cents"))
      m.select(col("k").as("o_orderkey"), col("change_type"),
          explode(when(col("change_type") === "update", array(v1, v2))
            .otherwise(array(v1))).as("r"))
        .select(col("o_orderkey"), col("r.version"), col("r.is_current"),
          col("change_type"), (col("r.cents") / 100.0).as("price"))
        .orderBy("o_orderkey", "version")
    },

    // X50 — fuzzy string join (record linkage): which part names are
    // near-duplicates of each other? Candidates come from a BLOCKING
    // key (the trailing noun token), pairs verified by exact
    // Levenshtein distance ≤ 3 — the classic block-then-verify shape
    // of every entity-resolution pipeline (never all-pairs).
    // SCALE SHAPE: the first step collapses the part table to its
    // NAME VOCABULARY (distinct p_name + count) — a partial-agg
    // groupBy whose output is bounded by the name vocabulary, not the
    // row count; the self-join then pairs vocabulary entries within a
    // block. For a synthetic adjective×noun vocabulary this is exact
    // and tiny; for open-vocabulary strings at 100 TB the same plan
    // holds with the block key swapped for q-gram bands (x2's banding)
    // — the verify stage and the vocabulary-first aggregation are
    // unchanged. Levenshtein is evaluated only inside blocks, on the
    // deduplicated vocabulary.
    Q(
      "x50_fuzzy_names",
      """WITH v AS (SELECT p_name AS name, count(*) AS cnt,
        |    regexp_extract(p_name, '(\S+)$', 1) AS blk
        |  FROM part GROUP BY 1)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS ed,
        |  a.cnt AS cnt_a, b.cnt AS cnt_b
        |FROM v a JOIN v b ON a.blk = b.blk AND a.name < b.name
        |WHERE levenshtein(a.name, b.name) <= 3
        |ORDER BY name_a, name_b""".stripMargin
    ) { (spark, dir) =>
      val v = Tables(spark, dir, "part")
        .groupBy(col("p_name").as("name")).agg(count(lit(1)).as("cnt"))
        .withColumn("blk", regexp_extract(col("name"), "(\\S+)$", 1))
      val a = v.toDF("name_a", "cnt_a", "blk_a")
      val b = v.toDF("name_b", "cnt_b", "blk_b")
      a.join(b, col("blk_a") === col("blk_b") && col("name_a") < col("name_b"))
        .withColumn("ed", levenshtein(col("name_a"), col("name_b")).cast("long"))
        .filter(col("ed") <= 3)
        .select("name_a", "name_b", "ed", "cnt_a", "cnt_b")
        .orderBy("name_a", "name_b")
    },

    // X51 — incremental aggregate maintenance (materialized-view
    // delta apply): the per-customer order count / revenue aggregate
    // is kept current by merging a DELTA AGGREGATE computed from the
    // change batch alone — the base fact table is never rescanned.
    // The batch is x48's (mod-7 repriced +10%, mod-13 key-shifted
    // inserts, same customer), so its per-customer delta is
    // (+0 orders, +cents div 10) per update and (+1, +cents) per
    // insert. THE GATE IS THE MV CONTRACT ITSELF: the oracle computes
    // the aggregate by FULL RECOMPUTE over the post-merge snapshot —
    // incremental apply must hash-match a from-scratch rebuild.
    // SCALE SHAPE: base_agg is maintained state (aggregate-sized, not
    // fact-sized); each refresh costs one batch-sized scan + partial
    // agg + an aggregate-keyed outer join. At 100 TB with a daily
    // batch this is the difference between touching ~0.1% of the data
    // and touching all of it. Exact integer cents throughout, so
    // incremental and recomputed sums are bit-identical in any
    // accumulation order.
    Q(
      "x51_incremental_agg",
      """WITH base AS (SELECT o_orderkey AS k, o_custkey AS ck,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        |snap AS (
        |  SELECT k, ck,
        |    CASE WHEN k % 7 = 0 THEN cents + cents // 10 ELSE cents END AS cents
        |  FROM base
        |  UNION ALL
        |  SELECT k + 1000000000, ck, cents FROM base WHERE k % 13 = 0)
        |SELECT ck AS custkey, count(*) AS n_orders,
        |  CAST(SUM(cents) AS BIGINT) AS cents
        |FROM snap GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (spark, dir) =>
      val base = Tables(spark, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_custkey").as("ck"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      val baseAgg = base.groupBy("ck")
        .agg(count(lit(1)).as("n0"), sum("cents").as("c0"))
      // delta aggregate: batch-sized input, aggregate-keyed output
      val delta = base
        .filter(col("k") % 7 === 0 || col("k") % 13 === 0)
        .select(col("ck"),
          when(col("k") % 13 === 0, 1L).otherwise(0L).as("dn"),
          (when(col("k") % 7 === 0, expr("cents DIV 10")).otherwise(0L) +
            when(col("k") % 13 === 0, col("cents")).otherwise(0L)).as("dc"))
        .groupBy("ck").agg(sum("dn").as("dn"), sum("dc").as("dc"))
        .toDF("dck", "dn", "dc")
      baseAgg.join(delta, col("ck") === col("dck"), "full_outer")
        .select(coalesce(col("ck"), col("dck")).as("custkey"),
          (coalesce(col("n0"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_orders"),
          (coalesce(col("c0"), lit(0L)) + coalesce(col("dc"), lit(0L))).as("cents"))
        .orderBy("custkey")
    }
  )
}
