package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the curation surface (CurationQueries) beyond the
  * DuckDB hash gate: funnel conservation, split disjointness, and the
  * repetition score's bounds. Runs at sf0.01 where every stage has
  * nonzero flow.
  */
class CurationSpec extends AnyFunSuite {
  import TestSpark._

  test("x26 funnel conserves flow: n_in(k+1) = n_in(k) - dropped(k), survivors drop 0") {
    val rows = SparkEntry.queries("x26_quality_funnel")(spark, sf001)
      .orderBy("stage_no").collect()
    assert(rows.length == 5)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_in") == a.getAs[Long]("n_in") - a.getAs[Long]("n_dropped"),
        s"flow broken between ${a.getAs[String]("stage")} and ${b.getAs[String]("stage")}")
    }
    val last = rows.last
    assert(last.getAs[String]("stage") == "survivors")
    assert(last.getAs[Long]("n_dropped") == 0L)
    assert(last.getAs[Long]("n_in") > 0L, "funnel dropped every document")
  }

  test("x25 repetition score is bounded and sorted") {
    val rows = SparkEntry.queries("x25_repetition_filter")(spark, sf001).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val (n3, d3, rep) =
        (r.getAs[Long]("n3"), r.getAs[Long]("d3"), r.getAs[Long]("rep_scaled"))
      assert(d3 >= 1 && d3 <= n3)
      assert(rep == (n3 - d3) * 10000 / n3)
      assert(rep >= 0 && rep < 10000)
    }
    val reps = rows.map(_.getAs[Long]("rep_scaled")).toSeq
    assert(reps == reps.sorted.reverse, "not sorted by rep_scaled desc")
  }

  test("x31 rarity score is exact, bounded below, and sorted ascending") {
    val rows = SparkEntry.queries("x31_rarity_filter")(spark, sf001).collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      val (n, sf, mcf) = (r.getAs[Long]("n_tok"), r.getAs[Long]("sum_freq"),
        r.getAs[Long]("mcf_scaled"))
      assert(n >= 1)
      // every token occurs at least once corpus-wide, so sum_freq >= n_tok
      assert(sf >= n, s"sum_freq $sf below n_tok $n")
      assert(mcf == sf * 1000000L / n)
      assert(mcf >= 1000000L, "mean corpus frequency cannot be below 1")
    }
    val mcfs = rows.map(_.getAs[Long]("mcf_scaled")).toSeq
    assert(mcfs == mcfs.sorted, "not sorted by mcf_scaled ascending")
  }

  test("x22 excludes the eval slice from training counts and finds the planted overlap") {
    val rows = SparkEntry.queries("x22_decontaminate")(spark, sf001).collect()
    val total = graft.core.Tables(spark, sf001, "documents").count()
    val evalN = graft.core.Tables(spark, sf001, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") % 100 === 7).count()
    val nTrain = rows.map(_.getAs[Long]("n_train")).sum
    assert(nTrain == total - evalN, "train side must be corpus minus eval slice")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_contaminated") <= r.getAs[Long]("n_train"))
      assert(r.getAs[Long]("n_eval_links") >= r.getAs[Long]("n_contaminated"))
    }
    // The sf0.01 corpus has at least one near-dup cluster straddling the
    // eval slice (verified against DuckDB); the check must not be blind.
    assert(rows.map(_.getAs[Long]("n_contaminated")).sum >= 1L,
      "decontamination found nothing — shingle join is broken")
  }

  test("x24 snapshot counts are consistent: dup counts bounded by batch size") {
    val rows = SparkEntry.queries("x24_snapshot_dedup")(spark, sf001).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_exact_dup") <= r.getAs[Long]("n_new"))
      assert(r.getAs[Long]("n_neardup") <= r.getAs[Long]("n_new"))
    }
    assert(rows.map(_.getAs[Long]("n_neardup")).sum >= 1L,
      "no cross-snapshot near-dups found — boundary filter is broken")
  }

  test("x27 balanced mix hits the exact quota in every language") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("x27_balanced_mix")(spark, sf001).collect()
    val m = graft.core.Tables(spark, sf001, "documents")
      .groupBy("lang").count().agg(min("count")).head().getLong(0)
    assert(rows.length == 5)
    rows.foreach(r => assert(r.getAs[Long]("n_docs") == m,
      s"${r.getAs[String]("lang")} quota ${r.getAs[Long]("n_docs")} != $m"))
  }

  test("x35 temperature mix: rates follow share^(tau-1), head downweighted, tail kept") {
    val rows = SparkEntry.queries("x35_temperature_mix")(spark, sf001).collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getAs[Long]("n_docs")).sum.toDouble
    for (r <- rows) {
      val ppm = r.getAs[Long]("keep_ppm")
      val nl = r.getAs[Long]("n_docs")
      // keep_ppm = floor(1e6 * min(1, 0.5*sqrt(N/n_l))) recomputed here
      val want = math.floor(1000000.0 *
        math.min(1.0, 0.5 * math.sqrt(n / nl))).toLong
      assert(ppm == want, s"${r.getAs[String]("lang")}: ppm $ppm != $want")
      assert(ppm >= 1L && ppm <= 1000000L)
      val kept = r.getAs[Long]("n_kept")
      assert(kept >= 1L && kept <= nl)
      // the hash threshold tracks the rate to within sampling noise
      assert(math.abs(kept.toDouble / nl - ppm / 1e6) < 0.1,
        s"${r.getAs[String]("lang")}: kept fraction ${kept.toDouble / nl} vs rate ${ppm / 1e6}")
    }
    // rarer languages never get a LOWER keep rate than more common ones
    val byN = rows.sortBy(_.getAs[Long]("n_docs"))
    byN.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("keep_ppm") >= b.getAs[Long]("keep_ppm"),
        "temperature mixing must downweight the head, not the tail")
    }
  }

  test("x28 boilerplate grams are cross-document: df bounded by corpus, sorted, multi-doc only") {
    val rows = SparkEntry.queries("x28_boilerplate_ngrams")(spark, sf001).collect()
    val nDocs = graft.core.Tables(spark, sf001, "documents").count()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("df") >= 2 && r.getAs[Long]("df") <= nDocs)
      assert(r.getAs[String]("ng").split(" ").length == 10)
    }
    val dfs = rows.map(_.getAs[Long]("df")).toSeq
    assert(dfs == dfs.sorted.reverse, "not sorted by document frequency desc")
  }

  test("x23 scrubbing counts reconcile with the length delta") {
    // Each redaction replaces 'customer' (8) or 'merge' (5) with
    // '<BLOCKED>' (9): the per-lang char delta is bounded by the
    // redaction count ((9-8)=+1 to (9-5)=+4 per redaction).
    val rows = SparkEntry.queries("x23_blocklist_scrub")(spark, sf001).collect()
    val docs = graft.core.Tables(spark, sf001, "documents")
    import org.apache.spark.sql.functions._
    val orig = docs.groupBy("lang").agg(sum(length(col("text"))).as("oc"))
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("oc")).toMap
    rows.foreach { r =>
      val delta = r.getAs[Long]("scrubbed_chars") - orig(r.getAs[String]("lang"))
      val nRed = r.getAs[Long]("total_redactions")
      assert(delta >= nRed && delta <= 4 * nRed,
        s"char delta $delta inconsistent with $nRed redactions")
    }
  }

  test("x57 dsir weights == brute-force replay of hash, buckets, and scores") {
    val base = graft.core.Tables(spark, sf0001, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.split("\\s+").filter(_.nonEmpty).toVector))
    def th32(t: String): Long =
      t.take(8).padTo(8, ' ').foldLeft(0L)((a, c) => a * 31 + c) % 4294967296L
    val perDoc = base.collect { case (id, lang, toks) if toks.size >= 2 =>
      val bkts = toks.sliding(2).map { case Vector(a, b) =>
        (th32(a) * 31 + th32(b)) % 1009 % 256
      }.toVector
      val isTgt = id * 2654435789L % 1000003L % 100 < 5
      (id, lang, isTgt, bkts)
    }
    val raw = perDoc.flatMap(_._4).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tgt = perDoc.filter(_._3).flatMap(_._4)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val wt: Map[Long, Long] = raw.map { case (b, r) =>
      b -> (tgt.getOrElse(b, 0L) + 1) * 1000000L / (r + 1)
    }
    val exp = perDoc.map { case (id, lang, _, bkts) =>
      (id, lang, bkts.size.toLong, bkts.map(wt).sum)
    }.sortBy { case (id, _, _, score) => (-score, id) }.take(50).toSeq
    val got = SparkEntry.queries("x57_dsir_weights")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == exp, s"first diff=${got.zip(exp).find(p => p._1 != p._2)}")
  }

  test("x82: confusion conserves the corpus, recall climbs to ~1, spam weight learned positive") {
    val rows = SparkEntry.queries("x82_quality_classifier")(spark, sf0001)
      .orderBy("epoch").collect()
    assert(rows.length == 6)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 6L).toSeq)
    val n = spark.read.parquet(s"$sf0001/documents.parquet").count()
    val nPos = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") % 5 === 0).count()
    rows.foreach { r =>
      val (tp, fp, fn, tn) =
        (r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))
      assert(tp + fp + fn + tn == n, r.toString)
      assert(tp + fn == nPos, r.toString)
    }
    // the learning curve: recall never falls between epochs and ends
    // near-perfect; false positives stay rare (< 1% of negatives)
    val tps = rows.map(_.getLong(5))
    assert(tps.zip(tps.tail).forall { case (a, b) => b >= a }, tps.toSeq)
    assert(tps.last >= (nPos * 95) / 100, s"final recall ${tps.last}/$nPos")
    assert(rows.last.getLong(6) * 100 <= (n - nPos), "fp rate")
    // the duplicate-bigram feature (the plant's signature) is the
    // dominant positive weight by the final epoch
    val wFinal = (1 to 4).map(rows.last.getLong)
    assert(wFinal(1) > 0 && wFinal(1) == wFinal.tail.max, wFinal.toString)
  }
}
