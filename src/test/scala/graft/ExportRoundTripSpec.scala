package graft

import graft.core.Tables
import graft.sources.{ExportQueries, RoundTripQueries}
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates behind the x39/x40/b2/b3 rows that the cross-engine hash
  * can't see: the posting-list truncation contract, the exported
  * shard layout (directory structure + intra-file order), and the
  * lossless-round-trip property the b2/b3 audits summarize.
  */
class ExportRoundTripSpec extends AnyFunSuite {
  import TestSpark._

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf0001)

  test("x39 postings are the true first-8 ascending doc ids per term") {
    val out = run("x39_inverted_index").collect()
    assert(out.nonEmpty)
    // reference postings via a window over the same tokenization
    val tok = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), explode(graft.core.Cols.wsTokens(col("text"))).as("t"))
      .select("t", "doc_id").distinct()
    val ref = tok
      .withColumn("rk", row_number().over(Window.partitionBy("t").orderBy("doc_id")))
      .filter(col("rk") <= 8)
      .groupBy("t")
      .agg(array_join(sort_array(collect_list(col("doc_id"))), ",").as("p"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val term = r.getAs[String]("term")
      val postings = r.getAs[String]("postings")
      val ids = postings.split(",").map(_.toLong).toSeq
      assert(ids.size <= 8 && ids == ids.sorted, s"$term: $postings")
      assert(r.getAs[Long]("df") >= ids.size.toLong, term)
      assert(postings == ref(term), s"$term: $postings vs ${ref(term)}")
    }
  }

  test("x40 export lays out 16 pruned shard dirs with doc-sorted files") {
    // run the gated query (which writes the layout), then inspect the
    // most recent x40 export dir it produced
    val audit = run("x40_shard_export").collect()
    assert(audit.map(_.getAs[Long]("n_docs")).sum ==
      Tables(spark, sf0001, "documents").count())
    val base = new java.io.File(System.getProperty("java.io.tmpdir"))
    val root = base.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("graft_x40_shards"))
      .maxBy(_.lastModified())
    val shardDirs = root.listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(shardDirs.length == ExportQueries.NumShards, shardDirs.mkString(","))
    // intra-file order: every file is ascending by doc_id (the
    // sortWithinPartitions contract a loader relies on for sequential
    // reads); check one shard's files
    val one = spark.read.parquet(s"$root/shard=0")
      .withColumn("f", input_file_name())
      .select("f", "doc_id").collect()
    one.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val ids = rows.map(_.getLong(1)).toSeq
      assert(ids == ids.sorted)
    }
  }

  test("b2/b3 audits equal the same aggregate computed without the round trip") {
    // if the text format corrupted any value, the audit and the direct
    // aggregate would diverge somewhere in counts, cents, or micros
    def direct(table: String, agg: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Seq[Row] =
      agg(Tables(spark, sf0001, table)).collect().toSeq
    import graft.core.Cols._
    val b2direct = direct("events", df => df.groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("users"),
        sumFixed(col("value"), 10000).as("v_sum"),
        min(epochUs(col("ts"))).as("ts_min"), max(epochUs(col("ts"))).as("ts_max"))
      .orderBy("event_type"))
    assert(run("b2_jsonl_roundtrip").collect().toSeq == b2direct)
    val b3direct = direct("customer", df => df.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), countDistinct(col("c_nationkey")).as("nations"),
        sumFixed(col("c_acctbal"), 100).as("bal_sum"),
        min(col("c_custkey")).as("first_cust"), max(col("c_custkey")).as("last_cust"))
      .orderBy("c_mktsegment"))
    assert(run("b3_csv_roundtrip").collect().toSeq == b3direct)
    RoundTripQueries.all.size // touch the object so an unregistered Q fails loud
  }

  test("x84: HRW rebalance never moves a doc between two OLD shards, ~1/3 move to new ones") {
    val rows = SparkEntry.queries("x84_rendezvous_rebalance")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (o, n, _) =>
      assert(o >= 0 && o < 16 && n >= 0 && n < 24, s"shard out of ring: ($o, $n)")
      // THE rendezvous property: a doc keeps its shard or moves to an
      // ADDED one — old -> different-old movement cannot happen
      assert(o == n || n >= 16, s"old->old movement: $o -> $n")
    }
    val total = rows.map(_._3).sum
    val moved = rows.filter(r => r._1 != r._2).map(_._3).sum
    assert(total == Tables(spark, sf0001, "documents").count())
    // expected moved fraction = 8/24; allow a generous band
    assert(moved * 100 >= total * 20 && moved * 100 <= total * 48,
      s"moved $moved of $total — outside the 8/24 band")
    // every old shard is populated (the mid-square mix is not degenerate)
    assert(rows.map(_._1).distinct.length == 16)
  }

  test("r30: LATERAL top-3 equals the window-rank computation") {
    import graft.core.Cols._
    val got = SparkEntry.queries("r30_lateral_topk")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty)
    val o = Tables(spark, sf0001, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        fixed(col("o_totalprice"), 100L).as("cents"))
    val c = Tables(spark, sf0001, "customer")
      .filter(col("c_mktsegment") === "MACHINERY" && col("c_custkey") % 10 === 0)
      .select("c_custkey")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("cents").desc, col("o_orderkey"))
    val want = o.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") <= 3)
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("o_orderkey"), col("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(t => (t._1, -t._3, t._2))
    assert(got == want, s"lateral=${got.size} window=${want.size}")
  }

  test("r29: filtered aggregates equal independently computed slices") {
    import graft.core.Cols._
    val got = SparkEntry.queries("r29_filtered_aggs")(spark, sf0001).collect()
    assert(got.nonEmpty)
    val o = Tables(spark, sf0001, "orders")
      .select(col("o_orderpriority"), col("o_orderstatus"), col("o_orderkey"),
        fixed(col("o_totalprice"), 100L).as("cents"))
    got.foreach { r =>
      val p = r.getString(0)
      val slice = o.filter(col("o_orderpriority") === p)
      assert(r.getLong(1) == slice.count())
      assert(r.getLong(2) == slice.filter(col("cents") > 10000000L).count())
      val fSum = slice.filter(col("o_orderstatus") === "F")
        .agg(coalesce(sum("cents"), lit(0L))).head().getLong(0)
      assert(r.getLong(3) == fSum)
      assert(r.getLong(4) == slice.filter(col("o_orderstatus") === "O").count())
      // top_orderkey is the key of the group's (cents, key)-max row
      val top = slice.orderBy(col("cents").desc, col("o_orderkey").desc)
        .select("o_orderkey").head().getLong(0)
      assert(r.getLong(7) == top, s"priority $p argmax")
    }
  }
}
