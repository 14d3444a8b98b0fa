package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of x49 (nation PageRank), x50 (fuzzy name linkage) and
  * x51 (incremental aggregate maintenance). Cross-engine value parity
  * is the oracle gate; these pin the algorithmic invariants.
  */
class GraphLinkageSpec extends AnyFunSuite {
  import TestSpark._

  test("PageRank core: symmetric 2-cycle reaches equal ranks, star centers mass") {
    // a <-> b with equal weights: symmetry forces equal ranks.
    val two = graft.ops.PageRank.ranks(Seq((1L, 2L, 5L), (2L, 1L, 5L)), 10)
    assert(two(1L) == two(2L))
    // teleport floor: 150000000 // 2 = 75000000; total mass ~1e9
    assert(two.values.sum <= 1000000000L && two.values.sum > 900000000L)
    // star: spokes 2,3,4 all point at 1; 1 points back at 2,3,4
    // equally. The hub must outrank every spoke, spokes tie.
    val star = graft.ops.PageRank.ranks(
      Seq((2L, 1L, 1L), (3L, 1L, 1L), (4L, 1L, 1L),
        (1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L)), 10)
    assert(star(1L) > star(2L))
    assert(star(2L) == star(3L) && star(3L) == star(4L))
  }

  test("PageRank core: dangling sink keeps teleport only, mass leak is bounded") {
    // 1 -> 2, 2 has no out-edges: 2's inflow leaks each step (the
    // documented simplification); node 1 ends at exactly teleport.
    val r = graft.ops.PageRank.ranks(Seq((1L, 2L, 3L)), 10)
    val teleport = 150000000L / 2
    assert(r(1L) == teleport)
    assert(r(2L) == teleport + r(1L) * 850L * 1000000L / 1000000000L)
  }

  test("x49: one row per active nation, positive ranks, plausible mass") {
    val rows = SparkEntry.queries("x49_nation_pagerank")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
    assert(rows.forall(_.getLong(1) > 0))
    val total = rows.map(_.getLong(1)).sum
    assert(total <= 1000000000L, s"rank mass $total exceeds 1e9")
    // lower bound: every node keeps at least its teleport share. (At
    // sf0.001 only 10 suppliers exist, so 15 of 25 nations are
    // dangling and most of the 0.85 mass leaks — by the documented
    // simplification; at sf0.01+ all 25 nations have out-edges and
    // mass stays within floor-loss of 1e9.)
    val teleport = 150000000L / rows.length
    assert(total >= teleport * rows.length, s"rank mass $total below teleport floor")
  }

  test("x50: blocked pairs complete and exact vs brute force over the vocabulary") {
    val got = SparkEntry.queries("x50_fuzzy_names")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // independent DP Levenshtein (no reuse of the engine's)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val vocab = spark.read.parquet(s"$sf0001/part.parquet")
      .select("p_name").distinct().collect().map(_.getString(0))
    val exp = (for {
      a <- vocab; b <- vocab
      if a < b && a.split("\\s+").last == b.split("\\s+").last
      ed = lev(a, b) if ed <= 3
    } yield (a, b, ed.toLong)).toSet
    assert(got == exp,
      s"missing=${(exp -- got).take(3)} extra=${(got -- exp).take(3)}")
  }

  test("x51: incremental apply == independent full recompute") {
    val got = SparkEntry.queries("x51_incremental_agg")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val base = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_custkey").as("ck"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val snap = base.select(col("k"), col("ck"),
        when(col("k") % 7 === 0, col("cents") + expr("cents DIV 10"))
          .otherwise(col("cents")).as("cents"))
      .unionByName(base.filter(col("k") % 13 === 0)
        .select((col("k") + 1000000000L).as("k"), col("ck"), col("cents")))
    val exp = snap.groupBy("ck")
      .agg(count(lit(1)).as("n"), sum("cents").as("c")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == exp)
    // every customer with at least one order appears exactly once
    assert(got.size == base.select("ck").distinct().count())
  }

  test("x83: one row per nation, ASIA seeds at 0, frontier contiguous") {
    val rows = SparkEntry.queries("x83_trade_hops")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length == 25)
    // exactly the 5 ASIA nations sit at hop 0
    val asia = spark.read.parquet(s"$sf0001/nation.parquet")
      .join(spark.read.parquet(s"$sf0001/region.parquet")
        .filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name").collect().map(_.getString(0)).toSet
    assert(rows.filter(_._2 == 0L).map(_._1).toSet == asia)
    // hops are -1 (unreachable) or a BFS level; reached levels are
    // contiguous (a node at level d implies some node at level d-1)
    val hops = rows.map(_._2)
    assert(hops.forall(h => h >= -1L && h <= 25L))
    val reached = hops.filter(_ > 0L).toSet
    reached.foreach(d => assert(d == 1L || reached.contains(d - 1)))
    // the top-2-partners graph always has edges, so something is 1 hop out
    assert(hops.count(_ == 1L) >= 1)
  }
}
