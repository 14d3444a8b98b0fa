package graft

import graft.core.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Partition pruning: writing events partitioned by day and filtering
  * on the partition column must prune at planning time (PartitionFilters
  * in the scan, fewer files read) — the mechanism that makes a 100 TB
  * date-range query read only its slice. */
class PartitionPruningSpec extends AnyFunSuite {
  import TestSpark._

  test("day-partitioned write + day filter shows PartitionFilters and prunes files") {
    val dir = Files.createTempDirectory("graft_part").toString
    val ev = Tables(spark, sf0001, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    ev.write.mode("overwrite").partitionBy("day").parquet(dir)

    val back = spark.read.parquet(dir).filter(col("day") === "2024-01-05")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("day#") || plan.contains("isnotnull(day"), plan)

    val expected = ev.filter(col("day") === "2024-01-05").count()
    assert(back.count() == expected && expected > 0)

    // pruned scan reads only the one partition directory
    val scanLine = plan.split("\n").find(_.contains("FileScan")).getOrElse("")
    assert(!scanLine.isEmpty)
  }
}
