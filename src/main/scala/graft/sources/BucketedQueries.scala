package graft.sources

import graft.core.Cols._
import graft.core.{Q, Tables}
import graft.streaming.TempWork
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table source/sink: the co-located-join layout (SURVEY.md
  * §2B "Scans/sources"). `bucketBy(n, key)` at write time hash-splits
  * every file by key with Spark's shuffle hash (murmur3), so a later
  * join on that key between two tables bucketed the same way needs NO
  * Exchange on either side — the partitioning is a property of the
  * data layout, proven to the planner by the catalog. At 100 TB this
  * is the difference between shuffling both fact tables on every join
  * and shuffling them once at ingest: the canonical lakehouse layout
  * for a fact table that is always joined on the same key.
  *
  * b1 is the end-to-end demonstration, oracle-gated on its VALUES and
  * spec-gated on its PLAN (BucketingSpec asserts the join subtree is
  * exchange-free and that a bucket-key filter prunes to 1/16 of the
  * buckets at scan time).
  */
object BucketedQueries {

  val NumBuckets = 16

  /** Write `df` as a bucketed external table at `path`. The
    * repartition by the bucket key uses the SAME hash family and
    * count as the bucketing, so each write task holds exactly one
    * bucket's rows and emits ONE file per bucket — the layout that
    * also lets a sorted-bucket scan skip its sort when each bucket is
    * a single file. */
  def writeBucketed(df: DataFrame, key: String, table: String, path: String): Unit =
    df.repartition(NumBuckets, col(key))
      .write
      .bucketBy(NumBuckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(table)

  /** The b1 join+agg over two already-bucketed catalog tables —
    * shared by the gated query and BucketingSpec's plan assertions. */
  def pairsJoin(ss: SparkSession, liTable: String, ordersTable: String): DataFrame =
    ss.table(liTable)
      .join(ss.table(ordersTable), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        (sum(fixed(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000)) / 10000.0)
          .as("revenue"))
      .orderBy("o_orderpriority")

  /** Drop leftover b1 tables from earlier invocations in this JVM
    * (their backing dirs are TempWork-registered and die at exit). */
  private def dropStale(spark: SparkSession): Unit =
    spark.catalog.listTables().collect()
      .filter(t => t.name.startsWith("graft_b1_") && !t.isTemporary)
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${t.name}"))

  val all: Seq[Q] = Seq(

    // B1 — co-located fact⋈fact join over bucketed tables: lineitem
    // and orders land bucketed 16 ways on their join key, then the
    // revenue-per-priority join runs WITHOUT shuffling either table —
    // the only Exchanges left in the plan belong to the 5-row
    // aggregate/sort tail. The child session pins broadcast OFF so the
    // plan is the sort-merge join a 100 TB fact⋈fact actually runs
    // (at bench scale the dimension side would broadcast and hide the
    // point). The ingest write IS part of the measured query — the
    // honest accounting of the layout's cost: pay the shuffle once at
    // write, never again per join.
    Q(
      "b1_bucketed_join",
      """SELECT o.o_orderpriority, count(*) AS n_items,
        |  SUM(CAST(round(l.l_extendedprice*(1-l.l_discount)*10000) AS BIGINT)) / 10000.0 AS revenue
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (spark, dir) =>
      dropStale(spark)
      val tag = java.lang.Long.toHexString(System.nanoTime())
      val loc = TempWork.dir("graft_b1_tables")
      val liT = s"graft_b1_lineitem_$tag"
      val ordT = s"graft_b1_orders_$tag"
      writeBucketed(
        Tables(spark, dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount"),
        "l_orderkey", liT, s"$loc/lineitem")
      writeBucketed(
        Tables(spark, dir, "orders").select("o_orderkey", "o_orderpriority"),
        "o_orderkey", ordT, s"$loc/orders")
      // Isolated SQLConf (shared catalog): broadcast disabled in both
      // the static planner and AQE so the fact⋈fact stays a sort-merge
      // join, which the bucketing then runs exchange-free.
      val ss = spark.newSession()
      ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      ss.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      pairsJoin(ss, liT, ordT)
    }
  )
}
