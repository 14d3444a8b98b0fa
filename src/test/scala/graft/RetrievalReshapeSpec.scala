package graft

import graft.core.Cols._
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of x64 (length batching), x65 (sparse retrieval), x66
  * (link prediction) and r27 (unpivot) beyond their oracle gates.
  */
class RetrievalReshapeSpec extends AnyFunSuite {
  import TestSpark._

  test("x64: buckets pad < 16/doc, batch counts are ceil(n/8), docs conserve") {
    val rows = SparkEntry.queries("x64_length_batching")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (bucket, n, nb, pad) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(bucket % 16 == 0 && bucket > 0, r.toString)
      assert(nb == (n + 7) / 8, r.toString)
      assert(pad < 16 * n, r.toString)
    }
    val total = Tables(spark, sf001, "documents")
      .filter(size(wsTokens(col("text"))) > 0).count()
    assert(rows.map(_.getLong(1)).sum == total)
  }

  test("x65: no self-hits, dense ascending ranks, positive scores") {
    val rows = SparkEntry.queries("x65_sparse_retrieval")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (q, d, sc, _) => q != d && sc > 0 })
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._4).sorted.toSeq == (1L to rs.length).toSeq)
      // scores non-increasing in rank order
      val byRank = rs.sortBy(_._4).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("x72: fused ranks dense per query, scores non-increasing, every hit flagged by a leg") {
    val rows = SparkEntry.queries("x72_hybrid_fusion")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // no self-hits; every surfaced doc came from at least one leg; the
    // fused score is bounded by two maximal RRF votes (rank 1 twice)
    assert(rows.forall { case (q, d, f, id, is, _) =>
      q != d && (id == 1L || is == 1L) && f > 0 && f <= 2 * (1000000 / 61)
    })
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.length <= 5)
      assert(rs.map(_._6).sorted.toSeq == (1L to rs.length).toSeq)
      val byRank = rs.sortBy(_._6).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    // a doc surfaced by BOTH legs carries both votes: its fused score
    // is at least two minimal (rank-20) votes, i.e. above any possible
    // single-leg-only score floor
    assert(rows.filter(r => r._4 == 1L && r._5 == 1L)
      .forall(_._3 >= 2 * (1000000 / 80)))
  }

  test("x66: predicted pairs are NOT significant edges, jaccard in (0, 1e6]") {
    val rows = SparkEntry.queries("x66_link_prediction")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.forall { case (_, _, cn, j) => cn >= 1 && j > 0 && j <= 1000000 })
    // recompute the significant-edge set independently (by name)
    val ue = {
      val li = Tables(spark, sf001, "lineitem").select("l_orderkey", "l_suppkey")
      val o = Tables(spark, sf001, "orders").select("o_orderkey", "o_custkey")
      val c = Tables(spark, sf001, "customer").select("c_custkey", "c_nationkey")
      val s = Tables(spark, sf001, "supplier").select("s_suppkey", "s_nationkey")
      val e0 = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(s, col("l_suppkey") === col("s_suppkey"))
        .filter(col("s_nationkey") =!= col("c_nationkey"))
        .groupBy(col("s_nationkey").cast("long").as("src"),
          col("c_nationkey").cast("long").as("dst"))
        .agg(count(lit(1)).as("w"))
      val tot = e0.agg(sum("w")).head().getLong(0)
      e0.groupBy(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .agg(sum("w").as("w"))
        .filter(col("w") * 400 >= tot)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val names = Tables(spark, sf001, "nation")
      .select(col("n_name"), col("n_nationkey").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    rows.foreach { case (na, nb, _, _) =>
      val (ka, kb) = (names(na), names(nb))
      assert(!ue((math.min(ka, kb), math.max(ka, kb))), s"$na-$nb is an edge")
    }
  }

  test("r27: per-metric rows equal lineitem count; sums match direct fixed sums") {
    val got = SparkEntry.queries("r27_unpivot_metrics")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val li = Tables(spark, sf0001, "lineitem")
    val n = li.count()
    assert(got.keySet == Set("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    got.values.foreach { case (cnt, _) => assert(cnt == n) }
    val direct = li.agg(
      sum(fixed(col("l_quantity"), 10000L)),
      sum(fixed(col("l_tax"), 10000L))).head()
    assert(got("l_quantity")._2 == direct.getLong(0))
    assert(got("l_tax")._2 == direct.getLong(1))
  }
}
