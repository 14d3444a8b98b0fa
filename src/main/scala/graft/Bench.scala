package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Bench main: runs every registered query against SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line {"metric","value","unit","queries","sf"}.
  *
  * Each query is fully materialized through the `noop` sink — unlike
  * count(), noop cannot let Catalyst prune projections, so the measured
  * time is the real end-to-end query cost. A tiny warm-up query first
  * absorbs session/codegen/parquet-footer initialization so per-query
  * numbers measure the queries, not JVM startup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
      } finally {
        // Queries may persist() intermediates that feed multiple
        // branches of their own plan; drop them afterwards — ALSO on
        // failure — so one query's cached blocks never distort the
        // next one's run. Guarded: on a dead session clearCache can
        // itself throw, and that must not mask the -1.0 sentinel or
        // abort the remaining queries.
        try spark.catalog.clearCache()
        catch { case e: Throwable =>
          System.err.println(s"[bench] clearCache after $name failed: ${e.getMessage}")
        }
      }
    }

    // One warm run (JIT/codegen/parquet footers), then three timed runs;
    // reported value = the MEDIAN — the same protocol BASELINE.md's rows
    // were recorded under. A single sample carries ±30% measured noise,
    // which a 2x threshold misreads as regressions; the median of 3 is
    // stable within ~15%.
    val timedRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    def exec(name: String): Double = {
      if (once(name) < 0) -1.0
      else {
        val ts = Array.fill(timedRuns)(once(name))
        if (ts.exists(_ < 0)) -1.0 else ts.sorted.apply(timedRuns / 2)
      }
    }

    val results = SparkEntry.registry.map(q => q.name -> exec(q.name))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // Also write the line to a file: the driver launches Bench through
    // sbt, whose log prefixes make stdout unparseable as bare JSON.
    Files.writeString(Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json")), line + "\n")
    spark.stop()
  }
}
