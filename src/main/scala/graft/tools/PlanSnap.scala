package graft.tools

import graft.SparkEntry
import graft.core.GraftSession

import java.nio.file.{Files, Paths}

/** Per-query plan snapshots for optimization-round evidence: writes
  * `{outDir}/{query}_{tag}.txt` with the formatted physical plan of
  * each named query — the before/after artifacts plans/r14/ carries.
  * Usage: java -cp ... graft.tools.PlanSnap <sfDir> <outDir> <tag> q1[,q2,...]
  *
  * Lifecycle rows (b13/b26/...) run their builder side effects while
  * the DataFrame is constructed — the printed plan is the final serve/
  * assembly stage, same convention as PlanDump/PLANS.md.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: PlanSnap <sfDir> <outDir> <tag> <q1,q2,...>")
    val Array(sfDir, outDir, tag, qlist) = args
    val spark = GraftSession.local(8)
    Files.createDirectories(Paths.get(outDir))
    qlist.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), plan)
      println(s"wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
