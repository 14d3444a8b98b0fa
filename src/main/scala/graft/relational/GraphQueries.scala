package graft.relational

import graft.core.{Q, Tables}
import graft.ops.PageRank
import org.apache.spark.sql.functions._

/** Graph analytics over the trade network the fact tables imply.
  * Complements ops/ConnectedComponents (x12's cluster resolution —
  * O(log d) pointer jumping for COMPONENT structure) with the other
  * canonical iterative graph kernel: a fixed-point CENTRALITY score.
  */
object GraphQueries {

  private val Iters = 10

  /** The unrolled oracle iteration CTEs c1/r1 .. c{Iters}/r{Iters} —
    * same shape as KMeans.oracleCtes: DuckDB replays the exact
    * integer fixed-point computation rather than trusting Spark's.
    */
  private def iterCtes: String =
    (1 to Iters).map { k =>
      s"""c$k AS (SELECT sh.dst, SUM((r.r * 850 * sh.ppm) // 1000000000) AS m
         |  FROM sh JOIN r${k - 1} r ON r.nk = sh.src GROUP BY sh.dst),
         |r$k AS (SELECT nodes.nk, tp.t + COALESCE(c.m, 0) AS r
         |  FROM nodes CROSS JOIN tp LEFT JOIN c$k c ON c.dst = nodes.nk)""".stripMargin
    }.mkString(",\n")

  val all: Seq[Q] = Seq(

    // X49 — weighted PageRank over the nation trade graph: which
    // nations sit at the center of the supply network? Edges are
    // supplier-nation → customer-nation weighted by shipped lineitem
    // count; ranks are damping-0.85 PageRank run for a FIXED 10
    // iterations in exact integer arithmetic (parts-per-billion ranks,
    // ppm edge shares — PageRank.scala documents the overflow-safe
    // bounds and the floor/dangling mass simplification both engines
    // share).
    // SCALE SHAPE: the corpus-sized term is the edge extraction — a
    // 3-way keyed join (lineitem⋈orders⋈customer, lineitem⋈supplier)
    // feeding a (src,dst) groupBy whose output is bounded by nations²
    // = 625 rows, data-independent. The iteration is driver-hosted
    // over that aggregated graph (the KMeans codebook precedent:
    // driver traffic bounded by the vocabulary, never the corpus).
    // At 100 TB the joins broadcast the dimension sides and the
    // partial-agg combine collapses each partition to ≤625 rows
    // before the shuffle; the loop itself never grows.
    Q(
      "x49_nation_pagerank",
      s"""WITH e0 AS (SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
         |    count(*) AS w
         |  FROM lineitem l
         |  JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |  GROUP BY 1, 2),
         |wsum AS (SELECT src, SUM(w) AS tw FROM e0 GROUP BY 1),
         |sh AS (SELECT e0.src, e0.dst, (e0.w * 1000000) // wsum.tw AS ppm
         |  FROM e0 JOIN wsum ON wsum.src = e0.src),
         |nodes AS (SELECT src AS nk FROM e0 UNION SELECT dst FROM e0),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |tp AS (SELECT 150000000 // n AS t FROM nn),
         |r0 AS (SELECT nk, 1000000000 // n AS r FROM nodes CROSS JOIN nn),
         |$iterCtes
         |SELECT n.n_name AS nation, r.r AS rank_ppb
         |FROM r$Iters r JOIN nation n ON n.n_nationkey = r.nk
         |ORDER BY n.n_name""".stripMargin
    ) { (spark, dir) =>
      val l = Tables(spark, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val o = Tables(spark, dir, "orders").select("o_orderkey", "o_custkey")
      val c = Tables(spark, dir, "customer").select("c_custkey", "c_nationkey")
      val s = Tables(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
      val edges = l
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
        .count()
        .select(col("src").cast("long"), col("dst").cast("long"), col("count"))
        // bounded collect: ≤ nations² rows regardless of data scale
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
      val ranks = PageRank.ranks(edges, Iters)
      val n = Tables(spark, dir, "nation").select("n_nationkey", "n_name")
      import spark.implicits._
      ranks.toSeq.toDF("nk", "rank_ppb")
        .join(broadcast(n), col("n_nationkey") === col("nk"))
        .select(col("n_name").as("nation"), col("rank_ppb"))
        .orderBy("nation")
    }
  )
}
