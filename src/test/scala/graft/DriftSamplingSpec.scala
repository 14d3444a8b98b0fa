package graft

import graft.core.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of x61 (triangle counting), x62 (embedding drift), x63
  * (negative sampling) and r26 (distinct-count window). The oracle gate
  * gives cross-engine value parity; these pin each operator against an
  * independent Spark recompute that does NOT share its mechanism —
  * brute force instead of degree-ordered wedges, a join instead of a
  * range-frame window — so a bug in the clever path can't hide in a
  * matching oracle restatement of the same mistake.
  */
class DriftSamplingSpec extends AnyFunSuite {
  import TestSpark._

  test("x61: degree-ordered wedge count == brute-force triple join") {
    val got = SparkEntry.queries("x61_triangle_count")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // independent brute force: undirected edge set, id-ordered triples
    val l = Tables(spark, sf0001, "lineitem").select("l_orderkey", "l_suppkey")
    val o = Tables(spark, sf0001, "orders").select("o_orderkey", "o_custkey")
    val c = Tables(spark, sf0001, "customer").select("c_custkey", "c_nationkey")
    val s = Tables(spark, sf0001, "supplier").select("s_suppkey", "s_nationkey")
    val ue = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .filter(col("s_nationkey") =!= col("c_nationkey"))
      .select(least(col("s_nationkey"), col("c_nationkey")).cast("long").as("a"),
        greatest(col("s_nationkey"), col("c_nationkey")).cast("long").as("b"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = ue.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val tris = for {
      i <- nodes; j <- nodes if j > i; k <- nodes if k > j
      if ue((i, j)) && ue((i, k)) && ue((j, k))
    } yield (i, j, k)
    val perNode = tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (nk, xs) => nk -> xs.size.toLong }
    val names = Tables(spark, sf0001, "nation")
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val want = perNode.map { case (nk, n) => names(nk) -> n }
    assert(got == want)
    assert(tris.nonEmpty, "no triangles in fixture — test is vacuous")
  }

  test("x62: slice counts conserve, per-dim variance non-negative, bounds hold") {
    val rows = SparkEntry.queries("x62_embedding_drift")(spark, sf001).collect()
    assert(rows.length == 64)
    val nVecs = Tables(spark, sf001, "embeddings").count()
    rows.foreach { r =>
      val (nA, nB) = (r.getLong(1), r.getLong(2))
      val (sA, sB) = (r.getLong(3), r.getLong(4))
      val (qA, qB) = (r.getLong(5), r.getLong(6))
      val (lo, hi) = (r.getLong(7), r.getLong(8))
      assert(nA + nB == nVecs, r.toString)
      // Cauchy-Schwarz: n*q >= s^2 per slice (exact integers)
      assert(nA * qA >= sA * sA && nB * qB >= sB * sB, r.toString)
      // every slice mean sits inside the global [lo, hi]
      assert(lo * nA <= sA && sA <= hi * nA, r.toString)
      assert(lo * nB <= sB && sB <= hi * nB, r.toString)
    }
  }

  test("x63: exactly 4 negatives per anchor, ring covers the id space") {
    val rows = SparkEntry.queries("x63_negative_sampling")(spark, sf001).collect()
    val nDocs = Tables(spark, sf001, "documents").count()
    assert(rows.map(_.getLong(2)).sum == 4 * nDocs)
    // self-pairs are the hash-ring's honest residue: rare, reported
    val selfPairs = rows.map(_.getLong(3)).sum
    assert(selfPairs <= nDocs / 100, s"ring degenerated: $selfPairs self-pairs")
    // negatives reach every language (the ring spans the corpus)
    val langs = Tables(spark, sf001, "documents")
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(rows.map(_.getString(1)).toSet == langs)
  }

  test("x68: top-5 outlier scores match a literal per-vector recompute") {
    val got = SparkEntry.queries("x68_centroid_outliers")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // literal recompute: centroid sums per (label, dim), score per vec
    val raw = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        // Spark round() semantics exactly: BigDecimal HALF_UP on the double
        r.getSeq[Float](2).map(f => java.math.BigDecimal.valueOf(f.toDouble * 10000)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue)))
    val byLabel = raw.groupBy(_._2)
    val want = byLabel.toSeq.flatMap { case (lbl, vs) =>
      val n = vs.length.toLong
      val dims = vs.head._3.length
      val s = (0 until dims).map(d => vs.map(_._3(d)).sum)
      vs.map { case (id, _, v) =>
        val score = (0 until dims).map { d =>
          val dev = n * v(d) - s(d); dev * dev
        }.sum
        (lbl, id, score)
      }.sortBy(t => (-t._3, t._2)).take(5).zipWithIndex
        .map { case ((l, id, sc), i) => (l, id, sc, i + 1L) }
    }.toSet
    assert(got.toSet == want)
    assert(got.length == byLabel.size * 5)
  }

  test("b5: merged-schema read fills NULL exactly on the v1 generation") {
    val rows = SparkEntry.queries("b5_schema_evolution")(spark, sf0001).collect()
    val ev = Tables(spark, sf0001, "events")
    assert(rows.map(_.getLong(1)).sum == ev.count())
    // every v2 row kept its props (source never has nulls), no v1 row did
    val v2 = ev.filter(col("event_id") % 2 =!= 0).count()
    assert(rows.map(_.getLong(3)).sum == v2)
    val v1 = ev.filter(col("event_id") % 2 === 0).count()
    assert(rows.map(_.getLong(2)).sum == v1)
  }

  test("r26: range-frame collect_set == join-based distinct recount") {
    val got = SparkEntry.queries("r26_distinct_window")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    // independent recompute: self-join on the window condition
    val e = Tables(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("pu"), col("us").as("pus"))
    val horizon = 30L * 86400L * 1000000L
    val want = p.join(e.select(col("user_id"), col("event_type"), col("us")),
        col("pu") === col("user_id") &&
          col("us") <= col("pus") && col("us") >= col("pus") - horizon)
      .groupBy("event_id")
      .agg(countDistinct("event_type").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
    assert(got.nonEmpty && got.values.exists(_ > 1))
  }
}
