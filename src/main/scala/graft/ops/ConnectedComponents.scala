package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation.
  *
  * Each round every node adopts the minimum label among itself and its
  * neighbors; the fixpoint labels every component with its minimum node
  * id. All work is joins + aggregations — no driver-side union-find, no
  * collected adjacency — so it runs wherever the edge list fits a
  * shuffle. Rounds = O(component diameter); for near-dup clusters
  * (the x12 use case) components are shallow and this converges in a
  * handful of rounds. For adversarially deep graphs at extreme scale,
  * the alternating large-star/small-star variant halves diameter per
  * round; min-label is the simple, predictable default.
  */
object ConnectedComponents {

  /** @param nodes single-column DataFrame of node ids (numeric)
    * @param edges two-column DataFrame of undirected edges, each pair
    *              listed once in either direction
    * @return (id, label) with label = min node id of the component
    */
  def minLabel(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val idCol = nodes.columns.head
    val Array(srcCol, dstCol) = edges.columns.take(2)
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .persist()
    var labels = nodes.select(col(idCol).as("id"), col(idCol).as("lbl"))
      .localCheckpoint()
    var converged = false
    while (!converged) {
      // localCheckpoint truncates lineage so the plan stays O(1) per
      // round instead of growing with iteration count.
      val prop = sym.join(labels, sym("b") === labels("id"))
        .select(sym("a").as("id"), col("lbl"))
      val next = labels.union(prop)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint()
      converged = next.as("n")
        .join(labels.as("o"), "id")
        .filter(col("n.lbl") < col("o.lbl"))
        .isEmpty
      labels = next
    }
    sym.unpersist()
    labels
  }
}
