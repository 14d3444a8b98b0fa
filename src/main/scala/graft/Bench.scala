package graft

import java.nio.file.{Files, Paths}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession

/** Bench main: runs every registered query against SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line {"metric","value","unit","queries","sf"}
  * (plus a "diag" key with per-query GC/fence/raw-run diagnostics).
  *
  * Each query is fully materialized through the `noop` sink — unlike
  * count(), noop cannot let Catalyst prune projections, so the measured
  * time is the real end-to-end query cost. A tiny warm-up query first
  * absorbs session/codegen/parquet-footer initialization so per-query
  * numbers measure the queries, not JVM startup.
  *
  * HYGIENE BARRIER (round 5): after every materialization — warm or
  * timed, success or failure — and BEFORE the next timer starts, the
  * loop (1) drains the async listener bus so CacheScope's deferred
  * unpersists execute now, (2) clears the session cache, and (3) makes
  * one synchronous round-trip to the block-manager master so queued
  * removal requests are processed. Without the barrier that cleanup
  * lands inside the NEXT query's timed window — the mechanism behind
  * round 4's "unchanged code runs 4x its baseline mid-suite" (x2, s3).
  */
object Bench {

  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
  }

  /** Cumulative JIT compilation time — a query whose runs stay slow
    * while jit_ms stays flat is running interpreted (code cache full:
    * the one JVM pathology that makes a whole suite tail uniformly
    * 3-4x slower; build.sbt reserves 512 MB against it). */
  private def jitMillis(): Long = {
    val cb = java.lang.management.ManagementFactory.getCompilationMXBean
    if (cb != null && cb.isCompilationTimeMonitoringSupported)
      cb.getTotalCompilationTime
    else 0L
  }

  /** Current CodeHeap usage in MB across the segmented code cache. */
  private def codeCacheMb(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.startsWith("CodeHeap"))
      .map(_.getUsage.getUsed).sum / (1024 * 1024)
  }

  /** Cumulative count of SYNCHRONOUS Janino whole-stage-codegen
    * compilations (CodegenMetrics). Unlike HotSpot JIT (async), each of
    * these blocks the calling thread ~tens of ms; a query whose every
    * run shows dozens of fresh compiles is missing the generated-class
    * cache — the remaining suspect for residual in-suite bimodality. */
  private def janinoCompiles(): Long =
    org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getCount

  /** Approximate cumulative Janino compile ms (reservoir mean x count —
    * the count delta is the reliable signal; this is corroboration). */
  private def janinoMillis(): Long = {
    val h = org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME
    (h.getSnapshot.getMean * h.getCount).toLong
  }

  /** Median with the even-N case averaged (ADVICE r4: upper-middle
    * sample is not the median for even SPARK_GRAFT_BENCH_RUNS). */
  private def median(ts: Array[Double]): Double = {
    val s = ts.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Per-round CC diagnostics are useful exactly here (long-lived
    // suite JVM); library embedders get silence by default.
    sys.props("spark.graft.cc.trace") = "true"

    // 1 warm + N timed runs; reported value = the MEDIAN, the protocol
    // BASELINE.md's rows are recorded under. A single sample carries
    // ±30% measured noise, which a 2x threshold misreads as
    // regressions. Malformed env falls back to 3 (ADVICE r4).
    val timedRuns = math.max(1, sys.env.get("SPARK_GRAFT_BENCH_RUNS")
      .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(3))

    // name -> (median, diag json fragment)
    def exec(name: String): (Double, String) = {
      val fences = ArrayBuffer[Double]()
      def once(): Double = {
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
          // The barrier (see object doc) — also on failure, and guarded:
          // on a dead session these can themselves throw, which must not
          // mask the -1.0 sentinel or abort the remaining queries.
          val f0 = System.nanoTime()
          try {
            if (!org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext))
              System.err.println(s"[bench] listener bus drain timed out after $name")
            spark.catalog.clearCache()
            // Unload orphaned state-store providers left by finished
            // streaming runs (s5/s6 checkpoint-per-run) so the periodic
            // maintenance thread can't snapshot dozens of dead stores
            // inside a later timed window. Safe here: queries run
            // serially, so no stream is active at the barrier.
            org.apache.spark.sql.graftbridge.StateDrain.unloadAll()
            spark.sparkContext.getExecutorMemoryStatus
          } catch { case e: Throwable =>
            System.err.println(s"[bench] barrier after $name failed: ${e.getMessage}")
          }
          fences += (System.nanoTime() - f0) / 1e9
        }
      }
      val gc0 = gcMillis()
      val jit0 = jitMillis()
      val jan0 = janinoCompiles()
      val janMs0 = janinoMillis()
      val ts: Array[Double] =
        if (once() < 0) Array.empty
        else {
          val t = Array.fill(timedRuns)(once())
          if (t.exists(_ < 0)) Array.empty else t
        }
      val m = if (ts.isEmpty) -1.0 else median(ts)
      val diag =
        s"""{"gc_ms":${gcMillis() - gc0},""" +
          s""""jit_ms":${jitMillis() - jit0},""" +
          s""""janino_n":${janinoCompiles() - jan0},""" +
          s""""janino_ms":${janinoMillis() - janMs0},""" +
          s""""codecache_mb":${codeCacheMb()},""" +
          s""""fence_s":${fences.map(f => f"$f%.3f").mkString("[", ",", "]")},""" +
          s""""runs":${ts.map(t => f"$t%.3f").mkString("[", ",", "]")}}"""
      (m, diag)
    }

    val results = SparkEntry.registry.map { q =>
      val (m, diag) = exec(q.name)
      (q.name, m, diag)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val diags = results.map { case (k, _, d) => "\"" + k + "\":" + d }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","diag":$diags}"""
    println(line)
    // Also write the line to a file: the driver launches Bench through
    // sbt, whose log prefixes make stdout unparseable as bare JSON.
    Files.writeString(Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json")), line + "\n")
    spark.stop()
  }
}
