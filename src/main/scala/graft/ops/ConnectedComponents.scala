package graft.ops

import graft.core.CacheScope
import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components: min-label propagation accelerated
  * by pointer jumping.
  *
  * Each round every ACTIVE node (one that appears in an edge — inert
  * singletons never enter the loop and are labeled by a final
  * left-join) adopts the minimum of (a) its own label, (b) its
  * neighbors' labels, and (c) its label's label — the pointer-jumping
  * shortcut `lbl ← lbl(lbl)`, which doubles the distance a label has
  * travelled per round. On a path of length d plain neighbor-min needs
  * d rounds; with jumping the reach is 2^(r-1), so convergence is
  * O(log diameter) — the property that makes chain-shaped near-dup
  * clusters (doc i ≈ doc i+1, typical of template corpora) safe at
  * 100 TB, where the corpus is huge but the dup GRAPH is small.
  *
  * The loop itself runs on RDDs — the one genuinely iterative operator
  * in the engine, and the one place the DataFrame API is the wrong
  * tool: Catalyst re-analyzes, re-optimizes and re-codegens the plan
  * EVERY round (measured ~0.6 s/round of pure driver time at sf0.1,
  * 10x the actual 0.06 s/round of cluster work), while the RDD loop
  * replans nothing. The edge list is hash-partitioned once; labels
  * come back from each round's reduceByKey with the same partitioner,
  * so the neighbor join is narrow (zero shuffle) every round — the
  * Pregel shape. Per round exactly ONE job runs: neighbor + jump label
  * reads, the min-label reduce, and the convergence check (an
  * accumulator counting changed labels) all ride the materializing
  * `count()`. The previous round's blocks are unpersisted as soon as
  * the next round lands, so executor storage holds at most two label
  * snapshots regardless of round count. No driver-side union-find, no
  * collected adjacency.
  */
object ConnectedComponents {

  /** @param nodes single-column DataFrame of node ids (numeric)
    * @param edges two-column DataFrame of undirected edges, each pair
    *              listed once in either direction
    * @return (id, lbl) with lbl = min node id of the component; every
    *         id of `nodes` appears exactly once
    */
  def minLabel(nodes: DataFrame, edges: DataFrame): DataFrame =
    minLabelCounted(nodes, edges)._1

  /** As `minLabel`, also returning the number of rounds run (the last
    * round is the fixpoint-confirming one that changes nothing). */
  private[graft] def minLabelCounted(nodes: DataFrame, edges: DataFrame): (DataFrame, Int) = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val idCol = nodes.columns.head
    val Array(srcCol, dstCol) = edges.columns.take(2)
    val sc = spark.sparkContext
    val part = new HashPartitioner(sc.defaultParallelism)

    // (src, tgt) request edges in both directions, partitioned once by
    // the label owner (src) — every round's neighbor join is narrow.
    val symBySrc = edges
      .select(col(srcCol).cast("long"), col(dstCol).cast("long"))
      .as[(Long, Long)].rdd
      .flatMap { case (a, b) => Iterator((a, b), (b, a)) }
      .partitionBy(part)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Active nodes (edge endpoints). Initialization already performs
    // the first neighbor-min round for free: lbl0(v) = min(v, min
    // neighbor of v) is one reduceByKey over the partitioned edge list
    // — the values at key v ARE v's neighbors — where a join-based
    // round would cost the same shuffle plus a join.
    var prevRdd: RDD[(Long, Long)] = symBySrc
      .reduceByKey(part, (a: Long, b: Long) => math.min(a, b))
      .mapPartitions(_.map { case (id, minNbr) => (id, math.min(id, minNbr)) },
        preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nActive = prevRdd.count()

    var rounds = 0
    var changed = nActive > 0
    while (changed) {
      rounds += 1
      val labels = prevRdd
      // Neighbor reads: co-partitioned narrow join, no shuffle.
      val nbr = symBySrc.join(labels)
        .map { case (_, (tgt, lbl)) => (tgt, lbl) }
      // Pointer-jump reads: node id asks for its label's label. The
      // request side shuffles (it's keyed by the label), the label side
      // stays put.
      val jump = labels.map { case (id, lbl) => (lbl, id) }.join(labels)
        .map { case (_, (tgt, lbl)) => (tgt, lbl) }
      // Min-label reduce; each node's own row carries its previous
      // label so the convergence check needs no extra join. Value =
      // (candidate lbl, old lbl, hasOld).
      val self = labels.mapPartitions(
        _.map { case (id, lbl) => (id, (lbl, lbl, true)) }, preservesPartitioning = true)
      val upd = (nbr ++ jump).map { case (id, lbl) => (id, (lbl, 0L, false)) }
      val acc = sc.longAccumulator("cc-changed")
      val rdd = (self ++ upd)
        .reduceByKey(part,
          (x: (Long, Long, Boolean), y: (Long, Long, Boolean)) =>
            (math.min(x._1, y._1), if (x._3) x._2 else y._2, x._3 || y._3))
        .mapPartitions(_.map { case (id, (lbl, old, _)) =>
          if (lbl < old) acc.add(1)
          (id, lbl)
        }, preservesPartitioning = true)
        .persist(StorageLevel.MEMORY_AND_DISK)
      rdd.count() // the round's one job
      changed = acc.value > 0
      prevRdd.unpersist(false)
      prevRdd = rdd
    }
    symBySrc.unpersist(false)

    // Inert nodes (no edges) label themselves; actives take the loop's
    // fixpoint.
    val active = spark.createDataset(prevRdd).toDF("aid", "lbl")
    val out = nodes.select(col(idCol).cast("long").as("id"))
      .join(active, col("id") === col("aid"), "left")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("lbl"))
    // The final snapshot backs the returned DataFrame; free it once the
    // caller's query materializes (no-op outside a CacheScope).
    val last = prevRdd
    CacheScope.release(() => { last.unpersist(false); () })
    (out, rounds)
  }
}
