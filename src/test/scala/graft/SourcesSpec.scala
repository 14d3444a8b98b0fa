package graft

import graft.core.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Source/sink coverage beyond parquet (SURVEY.md §2B row 1-2): json and
  * csv round-trips, and text lines (the reference's only input format,
  * word_count.rs:73-88). */
class SourcesSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String) =
    Files.createTempDirectory(s"graft_$name").toString

  test("json sink/source round-trip preserves rows") {
    val dir = tmp("json")
    val src = Tables(spark, sf0001, "customer")
    src.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == src.count())
    val a = src.select(col("c_custkey"), col("c_mktsegment")).collect().map(_.toString).sorted.toSeq
    val b = back.select(col("c_custkey"), col("c_mktsegment")).collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("csv sink/source round-trip with header and schema") {
    val dir = tmp("csv")
    val src = Tables(spark, sf0001, "region")
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    assert(back.collect().map(_.toString).sorted.toSeq ==
      src.collect().map(_.toString).sorted.toSeq)
  }

  test("orc sink/source round-trip preserves rows and schema") {
    val dir = tmp("orc")
    val src = Tables(spark, sf0001, "nation")
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == src.schema)
    assert(back.collect().map(_.toString).sorted.toSeq ==
      src.collect().map(_.toString).sorted.toSeq)
  }

  test("text source reads lines (reference input format)") {
    val lines = spark.read.textFile("/root/reference/article/1.txt")
    assert(lines.count() > 20)
    assert(lines.collect().exists(_.contains("Do not go gentle")))
  }
}
