package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the round-7b rows: x46's LM-fluency score, x47's
  * shortlist-then-rerank retrieval, x48's SCD2 merge, and s10's
  * left-outer stream-stream join. (Cross-engine value parity is the
  * oracle gate; these pin the invariants the gate would not explain.)
  */
class MergeRerankSpec extends AnyFunSuite {
  import TestSpark._

  test("x75: greedy MMR picks recomputed independently from raw vectors") {
    val out = SparkEntry.queries("x75_mmr_diversify")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out.nonEmpty)
    val vecs = graft.core.Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), graft.core.Cols.vecD(col("embedding")).as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos4(a: Array[Double], b: Array[Double]): Long = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      // same rounding class as the query: BigDecimal HALF_UP on the
      // shortest decimal form, the JVM round() Spark applies
      java.math.BigDecimal.valueOf(dp / (math.sqrt(na) * math.sqrt(nb)) * 10000)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    }
    val expected = vecs.keys.filter(_ < 20).toSeq.sorted.flatMap { qid =>
      val rel = vecs.keys.filter(_ != qid).toSeq
        .map(nid => nid -> cos4(vecs(qid), vecs(nid)))
      val cand = rel.sortBy { case (nid, r) => (-r, nid) }.take(20)
      val first = cand.head
      val picks = (2 to 5).foldLeft(Vector(first)) { (sel, _) =>
        val selSet = sel.map(_._1).toSet
        val next = cand.filterNot { case (nid, _) => selSet(nid) }
          .map { case (nid, r) =>
            val ms = sel.map(s => cos4(vecs(nid), vecs(s._1))).max
            (nid, r, 7L * r - 3L * ms)
          }
          .sortBy { case (nid, _, sc) => (-sc, nid) }.head
        sel :+ ((next._1, next._2))
      }
      picks.zipWithIndex.map { case ((nid, r), i) => (qid, (i + 1).toLong, nid, r) }
    }
    assert(out == expected)
  }

  test("x46: every multi-token doc is scored, fluency is a bounded integer mean") {
    val rows = SparkEntry.queries("x46_lm_fluency")(spark, sf0001).collect()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val multiTok = docs
      .select(graft.core.Cols.wsTokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2).count()
    assert(rows.length == multiTok, "one row per doc with >= 2 tokens")
    rows.foreach { r =>
      assert(r.getLong(1) >= 1, "n_bigrams >= 1")
      // p = (cnt_ab * 10^6) div (cnt_a + V) with cnt_ab <= cnt_a, so
      // every pair score — and hence the integer mean — is < 10^6.
      assert(r.getLong(2) >= 0 && r.getLong(2) < 1000000L,
        s"doc ${r.getLong(0)}: fluency ${r.getLong(2)} outside [0, 1e6)")
    }
  }

  test("x47: per-query top-5 by EXACT similarity, ranks dense, sims non-increasing") {
    val rows = SparkEntry.queries("x47_pq_rerank")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet.subsetOf((0L until 20L).toSet))
    byQ.foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getLong(3))
      assert(sorted.length <= 5, s"qid $qid: more than 5 rows")
      assert(sorted.map(_.getLong(3)).toSeq == (1L to sorted.length),
        s"qid $qid: ranks not dense from 1")
      val sims = sorted.map(_.getDouble(2))
      assert(sims.zip(sims.drop(1)).forall { case (a, b) => a >= b },
        s"qid $qid: sims not non-increasing")
      assert(rs.map(_.getLong(1)).distinct.length == rs.length,
        s"qid $qid: duplicate neighbor")
    }
  }

  test("x48: version structure follows the change classification exactly") {
    val rows = SparkEntry.queries("x48_scd2_merge")(spark, sf0001).collect()
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey").as("k"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nUpd = orders.keys.count(_ % 7 == 0)
    val nIns = orders.keys.count(_ % 13 == 0)
    assert(rows.length == orders.size + nUpd + nIns,
      "base rows + one extra version per update + one row per insert")
    val byKey = rows.groupBy(_.getLong(0))
    byKey.foreach { case (k, vs) =>
      val ct = vs.head.getString(3)
      assert(vs.forall(_.getString(3) == ct))
      ct match {
        case "update" =>
          assert(k % 7 == 0 && vs.length == 2)
          val v1 = vs.find(_.getLong(1) == 1L).get
          val v2 = vs.find(_.getLong(1) == 2L).get
          assert(!v1.getBoolean(2) && v2.getBoolean(2),
            s"k=$k: v1 must be retired, v2 current")
          val oldC = math.round(v1.getDouble(4) * 100)
          val newC = math.round(v2.getDouble(4) * 100)
          assert(newC == oldC + oldC / 10, s"k=$k: update is +10% in cents")
        case "insert" =>
          // keys start at 0, so the smallest shifted key IS the stride
          assert(k >= 1000000000L && vs.length == 1 && vs.head.getBoolean(2))
          val src = k - 1000000000L
          assert(src % 13 == 0 && orders.contains(src))
          assert(math.round(vs.head.getDouble(4) * 100) == orders(src))
        case "unchanged" =>
          assert(k % 7 != 0 && vs.length == 1)
          assert(vs.head.getBoolean(2) && vs.head.getLong(1) == 1L)
          assert(math.round(vs.head.getDouble(4) * 100) == orders(k))
      }
    }
  }

  test("s10: streamed left-outer join == batch join + watermark finalization rule") {
    // The oracle's WHERE clause models Spark's eviction contract:
    // an unmatched left row is emitted iff the final watermark
    // (max ts - 30 min) passed its match horizon (ts1 + 1h). This
    // test replays that model in Spark BATCH and compares the real
    // streamed run against it row for row — if Spark's internal
    // eviction strictness ever differs from the model, this fails
    // before the cross-engine gate does.
    val got = SparkEntry.queries("s10_stream_left_outer")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val e = graft.core.Tables(spark, sf0001, "events")
    val maxUs = e.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val a = e.select(col("user_id").as("u"), col("event_id").as("id1"),
      unix_micros(col("ts")).as("t1"))
    val b = e.select(col("user_id").as("u2"), col("event_id").as("id2"),
      unix_micros(col("ts")).as("t2"))
    val exp = a.join(b,
        col("u") === col("u2") && col("t2") >= col("t1") &&
          col("t2") <= col("t1") + 3600000000L && col("id1") < col("id2"),
        "left_outer")
      .filter(col("id2").isNotNull ||
        col("t1") + 3600000000L < maxUs - 1800000000L)
      .select(col("u"), col("id1"), coalesce(col("id2"), lit(-1L)).as("id2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == exp,
      s"streamed vs batch-model mismatch: missing=${(exp -- got).take(5)} " +
        s"extra=${(got -- exp).take(5)}")
  }

  test("x81: 20 query rows, hits bounded by 5, wider prefix recalls more in aggregate") {
    val rows = SparkEntry.queries("x81_matryoshka_recall")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 20)
    assert(rows.map(_._1).toSeq == (0L until 20L).toSeq)
    rows.foreach { case (_, gtSum, h32, h16) =>
      assert(gtSum > 0)
      assert(h32 >= 0 && h32 <= 5 && h16 >= 0 && h16 <= 5)
    }
    // per-query inversions happen (truncation is lossy in both
    // directions), but across the query set the 32-dim prefix must
    // recover at least as much of the exact top-5 as the 16-dim one
    assert(rows.map(_._3).sum >= rows.map(_._4).sum)
  }
}
