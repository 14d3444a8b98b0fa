package graft

import graft.ops.ConnectedComponents
import org.scalatest.funsuite.AnyFunSuite

/** Min-label connected components on constructed graphs. */
class ConnectedComponentsSpec extends AnyFunSuite {
  import TestSpark._

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val sp = spark
    import sp.implicits._
    val got = ConnectedComponents.minLabel(nodes.toDF("id"), edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    releaseLabelSnapshots()
    got
  }

  /** minLabel self-scopes, so its snapshot is released after the first
    * consuming action — but the release rides the async listener bus;
    * force-drop anything still pending so suites never interleave. */
  private def releaseLabelSnapshots(): Unit =
    TestSpark.releaseAllRdds()

  test("chain + triangle + singletons resolve to component minima") {
    // chain 1-2-3-4 (diameter 3, needs multiple rounds), triangle 10-11-12,
    // singletons 20, 21
    val got = run(Seq[Long](1, 2, 3, 4, 10, 11, 12, 20, 21),
      Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 10L -> 11L, 11L -> 12L, 12L -> 10L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 21L))
  }

  test("1000-node path converges in O(log diameter) rounds via pointer jumping") {
    val sp = spark
    import sp.implicits._
    val n = 1000
    val nodes = (0L until n.toLong).toDF("id")
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a", "b")
    val (df, rounds) = ConnectedComponents.minLabelCounted(nodes, edges)
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n)
    assert(got.values.forall(_ == 0L), "every node labels to the path minimum")
    // pointer jumping reaches 2^(r-1) per round: 11 rounds to cover 999
    // hops + 1 fixpoint-confirming round. Plain neighbor-min needs ~1000.
    assert(rounds <= 13, s"expected O(log n) rounds, got $rounds")
    releaseLabelSnapshots()
  }

  test("100k-node path (adversarial diameter): log2(d) rounds, bounded state") {
    // The one 100 TB claim the small graphs above don't cover: a
    // WORST-CASE diameter graph — a single path of 10^5 nodes
    // (diameter 99,999; a real near-dup chain this long would mean a
    // template corpus gone pathological). Plain neighbor-min would need
    // ~10^5 rounds; pointer jumping must do it in ~log2(d).
    val sp = spark
    val n = 100000L
    val nodes = sp.range(n).toDF("id")
    val edges = sp.range(n - 1).selectExpr("id AS a", "id + 1 AS b")
    val (df, rounds) = ConnectedComponents.minLabelCounted(nodes, edges)
    val got = df.groupBy("lbl").count().collect()
    assert(got.length == 1 && got.head.getLong(0) == 0L && got.head.getLong(1) == n,
      "all 100k nodes label to the path minimum")
    // reach is 2^(r-1) hops after r rounds: 18 rounds cover 99,999 hops,
    // +1 fixpoint-confirming round; a couple of slack rounds for the
    // min-label (not max-reach) propagation pattern.
    assert(rounds <= 21, s"expected ~log2(99999)+1 = 18-19 rounds, got $rounds")
    assert(rounds >= 10, s"suspiciously few rounds ($rounds) — is the graph wired?")
    // Bounded state: the loop unpersists each superseded snapshot
    // blocking-ly; after the consuming action only the final snapshot
    // (released via the async bus) may linger.
    releaseLabelSnapshots()
    val deadline = System.nanoTime() + 10_000_000_000L
    while (sp.sparkContext.getPersistentRDDs.nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(sp.sparkContext.getPersistentRDDs.isEmpty,
      s"persisted RDDs left after 100k-path CC: ${sp.sparkContext.getPersistentRDDs.size}")
  }

  test("minLabel leaves no persisted RDDs after its result materializes (library caller, no scope)") {
    val sp = spark
    import sp.implicits._
    sp.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val df = ConnectedComponents.minLabel(
      Seq[Long](1, 2, 3, 4).toDF("id"), Seq(1L -> 2L, 3L -> 4L).toDF("a", "b"))
    assert(df.count() == 4)
    // the scope's release fires on the async listener bus — poll, don't assume
    val deadline = System.nanoTime() + 10_000_000_000L
    while (sp.sparkContext.getPersistentRDDs.nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(sp.sparkContext.getPersistentRDDs.isEmpty,
      s"leaked: ${sp.sparkContext.getPersistentRDDs.values.map(_.name).mkString(", ")}")
  }

  test("edge direction does not matter") {
    val a = run(Seq[Long](1, 2, 3), Seq(3L -> 2L, 2L -> 1L))
    assert(a == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  private def runStars(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val sp = spark
    import sp.implicits._
    val got = ConnectedComponents.stars(nodes.toDF("id"), edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    releaseLabelSnapshots()
    got
  }

  test("stars: chain + triangle + singletons + direction-blind, == minLabel") {
    val nodes = Seq[Long](1, 2, 3, 4, 10, 11, 12, 20, 21)
    val edges = Seq(2L -> 1L, 2L -> 3L, 4L -> 3L, 10L -> 11L, 11L -> 12L, 12L -> 10L)
    val got = runStars(nodes, edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 21L))
    assert(got == run(nodes, edges))
  }

  test("stars: duplicate and self-loop edges are absorbed") {
    val got = runStars(Seq[Long](1, 2, 3),
      Seq(1L -> 2L, 2L -> 1L, 2L -> 2L, 2L -> 3L, 2L -> 3L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("stars: a dense clique collapses in a handful of rounds") {
    val sp = spark
    import sp.implicits._
    // 200-node clique (19,900 edges) + 50 singletons: the dense-cluster
    // shape the star loop exists for — the edge list must COLLAPSE, not
    // be re-joined at full size every round
    val n = 200L
    val nodes = (0L until 250L).toDF("id")
    val edges = (for (a <- 0L until n; b <- (a + 1) until n) yield (a, b))
      .toDF("a", "b")
    val (df, rounds) = ConnectedComponents.starsCounted(nodes, edges)
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until n).forall(got(_) == 0L))
    assert((n until 250L).forall(i => got(i) == i))
    assert(rounds <= 4, s"clique should collapse almost immediately, got $rounds rounds")
    releaseLabelSnapshots()
  }

  test("stars: 1000-node path converges and matches minLabel") {
    val sp = spark
    import sp.implicits._
    val n = 1000
    val nodes = (0L until n.toLong).toDF("id")
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a", "b")
    val (df, rounds) = ConnectedComponents.starsCounted(nodes, edges)
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n && got.values.forall(_ == 0L))
    // alternating star rounds halve path depth: O(log n) in practice
    assert(rounds <= 25, s"expected O(log n) star rounds on a path, got $rounds")
    releaseLabelSnapshots()
  }

  test("stars == minLabel on the sf0.001 near-dup graph, node for node") {
    val sp = spark
    val pairs = SparkEntry.queries("l2_minhash_neardup")(sp, sf0001)
      .select("d1", "d2")
    val nodes = graft.core.Tables(sp, sf0001, "documents").select("doc_id")
    val a = ConnectedComponents.minLabel(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = ConnectedComponents.stars(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.nonEmpty && a == b)
    releaseLabelSnapshots()
    sp.catalog.clearCache()
  }

  test("x80 incremental maintenance == x12 full recompute on sf0.001") {
    // the whole incremental claim: forest ∪ batch-pairs must label
    // every doc exactly as the full-corpus recompute does
    val full = SparkEntry.queries("x12_dedup_clusters")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val inc = SparkEntry.queries("x80_incremental_clusters")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full.nonEmpty && inc == full)
    releaseLabelSnapshots()
    spark.catalog.clearCache()
  }

  test("x12 clusters are consistent with the l2 pair set on sf0.001") {
    val clusters = SparkEntry.queries("x12_dedup_clusters")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = SparkEntry.queries("l2_minhash_neardup")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // every near-dup pair lands in the same cluster
    pairs.foreach { case (d1, d2) => assert(clusters(d1) == clusters(d2)) }
    // labels are component minima: each cluster_id is a member of its own cluster
    clusters.values.foreach(c => assert(clusters(c) == c))
    spark.catalog.clearCache()
  }
}
