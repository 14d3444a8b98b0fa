package graft

import graft.core.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Training-shard output: the write path that turns a processed corpus
  * into bounded-size shards — directory-partitioned by a routing column
  * (language here) with `maxRecordsPerFile` capping every file. At
  * 100 TB this is what keeps downstream loaders balanced: shard count
  * scales with data volume, no shard exceeds the cap, and the layout is
  * readable back with partition pruning on the routing column.
  */
class ShardSinkSpec extends AnyFunSuite {
  import TestSpark._

  test("partitionBy(lang) + maxRecordsPerFile caps every shard and preserves rows") {
    val dir = Files.createTempDirectory("graft_shards").toString
    val docs = Tables(spark, sf0001, "documents").select("doc_id", "lang", "n_chars")
    val cap = 100L

    docs.write.mode("overwrite")
      .option("maxRecordsPerFile", cap)
      .partitionBy("lang")
      .parquet(dir)

    // one directory per language, hive-style
    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).sorted
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(dirs.toSeq == langs.map("lang=" + _).toSeq)

    // no shard file exceeds the cap, and rows survive exactly
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    // project the file name first: input_file_name() is
    // non-deterministic and can't sit inside an aggregate argument
    val withFile = back.withColumn("f", input_file_name())
    val perFile = withFile.groupBy("f").count().collect()
    assert(perFile.nonEmpty && perFile.forall(_.getLong(1) <= cap),
      perFile.map(_.getLong(1)).mkString(","))
    // the cap actually bit: at least one language needed multiple files
    val filesPerLang = withFile.groupBy(col("lang")).agg(
      countDistinct(col("f")).as("nf")).collect()
    assert(filesPerLang.exists(_.getLong(1) > 1), filesPerLang.mkString(","))

    // the routing column prunes on read
    val plan = spark.read.parquet(dir).filter(col("lang") === langs.head)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
  }
}
