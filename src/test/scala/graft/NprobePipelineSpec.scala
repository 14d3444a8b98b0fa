package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the round-7 rows: x37's nprobe recall/cost dial and
  * x38's chained curation pipeline. (Cross-engine value parity is the
  * oracle gate; these pin the structural invariants the gate alone
  * would not explain to a reader.)
  */
class NprobePipelineSpec extends AnyFunSuite {
  import TestSpark._

  test("x37: probing more cells only grows the candidate set, hits stay bounded") {
    val rows = SparkEntry.queries("x37_ivf_nprobe")(spark, sf0001).collect()
    assert(rows.length == 20, "one row per query vector")
    assert(rows.map(_.getLong(0)).toSeq == (0L until 20L))
    rows.foreach { r =>
      val (c1, c4) = (r.getLong(1), r.getLong(2))
      val (h1, h4, gain) = (r.getLong(3), r.getLong(4), r.getLong(5))
      // nprobe=4's candidate set is a SUPERSET of nprobe=1's (same
      // index, more probed cells) — the cost axis of the dial.
      assert(c4 >= c1, s"qid ${r.getLong(0)}: cands_p4 $c4 < cands_p1 $c1")
      // hits are intersections of two <=5-element lists.
      assert(h1 >= 0 && h1 <= math.min(5L, c1))
      assert(h4 >= 0 && h4 <= math.min(5L, c4))
      assert(gain == h4 - h1)
      // NOTE deliberately absent: gain >= 0. Ranking is by ADC
      // (reconstructed) similarity, so extra candidates from probed
      // cells can displace a true neighbor from the fixed top-5 —
      // measured at sf0.01: gains {-1, 0, +1} across the 20 queries.
      // That approximation noise is exactly why deployments pair
      // nprobe increases with exact re-ranking of the ADC shortlist.
    }
  }

  test("x38: per-stage flow conservation and the temperature head/tail property") {
    val rows = SparkEntry.queries("x38_curation_pipeline")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nd, nq) = (r.getLong(1), r.getLong(2))
      val (ppm, nf) = (r.getLong(3), r.getLong(4))
      // dedup keeps at least the quality survivors' pool; each later
      // stage can only shrink a language's doc count.
      assert(nq <= nd, s"${r.getString(0)}: quality $nq > dedup $nd")
      assert(nf <= nq, s"${r.getString(0)}: final $nf > quality $nq")
      assert(ppm >= 1L && ppm <= 1000000L)
    }
    // Temperature mixing downweights the head and keeps the tail:
    // at tau=1/2 a language is kept in full iff its share of the
    // post-quality corpus is <= 25%.
    val ppms = rows.map(_.getLong(3))
    assert(ppms.max == 1000000L, "tail languages kept in full")
    assert(ppms.min < 1000000L, "dominant language downweighted")
    // Cross-query consistency: stage-1 keeps exactly one doc per
    // near-dup cluster, so the per-lang dedup counts sum to x36's
    // cluster count.
    val nClusters = SparkEntry.queries("x36_canonical_docs")(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum == nClusters,
      "sum of per-lang dedup survivors == number of near-dup clusters")
  }
}
