package graft

import org.scalatest.funsuite.AnyFunSuite

/** t1 smoke (SURVEY.md §5): every declared query runs at sf0.001,
  * returns rows, and is stable across two executions (determinism). */
class QuerySmokeSpec extends AnyFunSuite {
  import TestSpark._

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} runs, non-empty, stable") {
      val df1 = q.run(spark, sf0001)
      val r1 = df1.collect()
      assert(r1.nonEmpty, s"${q.name} returned no rows")
      val r2 = q.run(spark, sf0001).collect()
      assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq,
        s"${q.name} is not deterministic across runs")
    }
  }

  test("every query has an oracle (or is explicitly rows-only)") {
    // HLL sketches are implementation-defined → rows-only by design.
    // x21's corpus is generated in-plan (never on disk), so DuckDB has
    // no table to run an oracle against; DedupSpec pins its exact
    // cluster histogram instead.
    val rowsOnly = Set("x9_approx_distinct", "x21_skew_neardup", "r25_approx_quantiles")
    val noOracle = SparkEntry.registry.filter(_.oracle.isEmpty).map(_.name).toSet
    assert(noOracle == rowsOnly, s"queries without oracle: ${noOracle -- rowsOnly}")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("x18 splits partition the corpus: every doc in exactly one split, ratios near 90/5/5") {
    val sp = spark
    val byCorpus = graft.core.Tables(sp, sf001, "documents").count()
    val rows = SparkEntry.queries("x18_dataset_split")(sp, sf001).collect()
    val bySplit = rows.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(bySplit.values.sum == byCorpus, "splits must partition the corpus exactly")
    val train = bySplit("train").toDouble / byCorpus
    assert(train > 0.85 && train < 0.95, s"train fraction $train far from 0.90")
    assert(bySplit.contains("val") && bySplit.contains("test"))
  }

  test("x9 approx_count_distinct is within 5% of exact per group (declared tolerance gate)") {
    // SURVEY.md §2C: HLL is excluded from the hash oracle but promises
    // approx within 5% of exact — x9 emits both side by side, so the
    // bound is directly assertable. sf0.01 exercises real cardinalities
    // (thousands of distinct parts per returnflag), not toy counts.
    val rows = SparkEntry.queries("x9_approx_distinct")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(exact > 0, s"group ${r.get(0)} has zero exact cardinality")
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 0.05,
        f"group ${r.get(0)}: approx=$approx%.0f exact=$exact%.0f relErr=$relErr%.4f > 5%%")
    }
  }

  test("r25 approx quantiles within 1% of exact per group (declared tolerance gate)") {
    // r25 emits the sketch value next to r22's exact rank-definition
    // value; the declared contract is 1% relative error. With
    // accuracy=10000 and sf0.001-sized groups the sketch is near-exact,
    // so this also pins that the plumbing (posexplode labeling, join
    // back to the exact side) lines the right quantiles up.
    val rows = SparkEntry.queries("r25_approx_quantiles")(spark, sf001).collect()
    assert(rows.length >= 9, s"expected >=9 (pri x quantile) rows, got ${rows.length}")
    rows.foreach { r =>
      val approx = r.getAs[Double]("approx_value")
      val exact = r.getAs[Double]("exact_value")
      assert(exact > 0)
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 0.01,
        f"${r.get(0)}/${r.get(1)}: approx=$approx%.2f exact=$exact%.2f relErr=$relErr%.4f > 1%%")
    }
  }

  test("x56 epoch shuffle: per-shard fingerprints replay and epochs decorrelate") {
    val ids = graft.core.Tables(spark, sf0001, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val mults = Seq(2654435761L, 2246822519L, 3432918353L, 1540483477L)
    val exp = (for ((m, ep) <- mults.zipWithIndex) yield {
      val pos = ids.map(id => (id, id * m % 1000003L))
      pos.groupBy(_._2 % 8).map { case (shard, rows) =>
        val sorted = rows.sortBy(r => (r._2, r._1))
        val fp = sorted.zipWithIndex
          .map { case ((id, _), i) => (i + 1).toLong * id % 2147483647L }
          .sum % 2147483647L
        (ep.toLong, shard) -> ((rows.length.toLong, sorted.head._1, fp))
      }
    }).flatten.toMap
    val got = SparkEntry.queries("x56_epoch_shuffle")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == exp)
    // every epoch partitions the corpus exactly
    (0L to 3L).foreach { ep =>
      assert(got.collect { case ((e, _), (n, _, _)) if e == ep => n }.sum == ids.length)
    }
    // the four epochs are genuinely different orders: the full
    // fingerprint vector differs between every pair of epochs
    val fpVec = (0L to 3L).map(ep =>
      got.toSeq.filter(_._1._1 == ep).sortBy(_._1._2).map(_._2._3))
    assert(fpVec.distinct.size == 4, "two epochs produced the same order")
  }
}
