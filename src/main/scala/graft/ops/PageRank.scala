package graft.ops

/** Integer-exact weighted PageRank over a SMALL aggregated graph.
  *
  * The division of labor mirrors KMeans: the corpus-sized work (edge
  * extraction — joins + groupBy over the fact tables) runs distributed
  * in Spark; the iteration runs driver-hosted over the AGGREGATED
  * graph, whose size is bounded by the dimension vocabulary (nations²
  * = 625 edges), not the data. At 100 TB the edge aggregation is the
  * only term that grows; this loop stays 625 rows forever.
  *
  * All arithmetic is integer so the result is bit-identical across
  * engines (the x20/x46 no-doubles discipline):
  *   - ranks are parts-per-billion longs, r0 = 10^9 div N;
  *   - each edge carries ppm = (w * 10^6) div W(src), its integer
  *     share of the source's out-weight;
  *   - one step: r'(v) = (0.15 * 10^9) div N
  *                     + Σ_src (r(src) * 850 * ppm) div 10^9
  *     (damping 0.85, exact integer ops, overflow-safe: r ≤ ~10^9,
  *     ppm ≤ 10^6, so the product ≤ ~8.5·10^17 < Long.MaxValue).
  *
  * Declared simplification: mass lost to integer floors and to
  * dangling nodes (no out-edges) is NOT redistributed — the rank
  * vector's sum may drift slightly below 10^9. Both engines apply the
  * identical floors, so the gate is exact; the RANKING is what the
  * operator exists for.
  */
object PageRank {

  /** @param edges (src, dst, weight>0) aggregated adjacency
    * @param iters fixed iteration count (no convergence test — the
    *              oracle unrolls the same count)
    * @return node -> rank in parts-per-billion after `iters` steps
    */
  def ranks(edges: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] = {
    require(edges.forall(_._3 > 0), "edge weights must be positive")
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length.toLong
    if (n == 0) return Map.empty
    val outW = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val shares = edges.map { case (s, d, w) => (s, d, w * 1000000L / outW(s)) }
    val teleport = 150000000L / n
    var r: Map[Long, Long] = nodes.map(_ -> 1000000000L / n).toMap
    var i = 0
    while (i < iters) {
      val in = shares
        .groupBy(_._2)
        .map { case (d, es) =>
          d -> es.map { case (s, _, ppm) => r(s) * 850L * ppm / 1000000000L }.sum
        }
      r = nodes.map(v => v -> (teleport + in.getOrElse(v, 0L))).toMap
      i += 1
    }
    r
  }
}
