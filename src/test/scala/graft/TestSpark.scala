package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = graft.core.GraftSession.builder("local[8]", 8)
      .appName("graft-test")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"

  /** Drop every persisted RDD — used by suites that call minLabel
    * directly (outside a CacheScope), whose final label snapshot is
    * otherwise retained for the caller. */
  def releaseAllRdds(): Unit =
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
}
