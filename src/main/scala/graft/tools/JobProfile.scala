package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-JOB wall-clock attribution for one bench row (guide §1: find
  * where a multi-job lifecycle row actually spends its time before
  * touching it). Runs each named query once untimed (warm) and once
  * measured, printing every Spark job of the measured run — call site,
  * wall ms, task count — plus the job-count total and the wall covered
  * by jobs vs the row's end-to-end time (the gap is driver-side work:
  * planning, manifest arithmetic, file listing, renames).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.JobProfile b27_forest_daily_chain"
  * Measurement aid only — no bench contract, no registry surface.
  */
object JobProfile {

  private final case class Job(id: Int, site: String, ms: Long, tasks: Int)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val starts = mutable.Map[Int, (String, Long, Int)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[Job]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = synchronized {
        // stage names carry the call site (e.g. "parquet at Fs.scala:42");
        // the final stage of the job is the action's own site
        val site = js.stageInfos.sortBy(_.stageId).lastOption
          .map(_.name).getOrElse("?")
        starts(js.jobId) = (site, js.time, js.stageInfos.map(_.numTasks).sum)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = synchronized {
        starts.remove(je.jobId).foreach { case (site, t0, n) =>
          done.add(Job(je.jobId, site, je.time - t0, n))
        }
      }
    })

    // Per-ACTION attribution: every eager action inside a lifecycle row
    // (parquet save, cacheEager count, manifest collect) is its own
    // QueryExecution; funcName + the command's output path identify it.
    final case class Act(funcName: String, ms: Long, head: String)
    val acts = new java.util.concurrent.ConcurrentLinkedQueue[Act]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      private def headOf(qe: org.apache.spark.sql.execution.QueryExecution): String = {
        val cmd = qe.analyzed match {
          case c: org.apache.spark.sql.catalyst.plans.logical.Command => c.toString
          case _ => qe.analyzed.toString
        }
        cmd.linesIterator.take(1).mkString.take(160)
      }
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        acts.add(Act(funcName, durationNs / 1000000L, headOf(qe)))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit =
        acts.add(Act(funcName + "!FAIL", durationNs0, headOf(qe)))
      private val durationNs0 = 0L
    })

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntryAccess.run(spark, sfDir, name)
      val s = (System.nanoTime() - t0) / 1e9
      // barrier, as Bench does
      org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      spark.catalog.clearCache()
      org.apache.spark.sql.graftbridge.StateDrain.unloadAll()
      spark.sparkContext.getExecutorMemoryStatus
      s
    }

    for (name <- args) {
      runOnce(name) // warm
      done.clear(); acts.clear()
      val wallS = runOnce(name)
      // drain listener bus so every JobEnd of the measured run is in
      Thread.sleep(500)
      import scala.jdk.CollectionConverters._
      val jobs = done.asScala.toSeq.sortBy(_.id)
      println(f"== $name: wall ${wallS}%.2f s, ${jobs.size} jobs, " +
        f"job-covered ${jobs.map(_.ms).sum / 1e3}%.2f s ==")
      println("-- actions (QueryExecution), in order --")
      for (a <- acts.asScala)
        println(f"  ${a.ms}%6d ms  ${a.funcName}%-12s ${a.head}")
      println("-- top jobs --")
      for (j <- jobs.sortBy(-_.ms).take(12))
        println(f"  job=${j.id}%4d ms=${j.ms}%6d tasks=${j.tasks}%5d  ${j.site}")
    }
    spark.stop()
  }
}

/** Indirection so the profiler never holds a reference that would make
  * SparkEntry's registry reachable before session init. */
private object SparkEntryAccess {
  def run(spark: org.apache.spark.sql.SparkSession, sfDir: String, name: String): Unit =
    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
}
