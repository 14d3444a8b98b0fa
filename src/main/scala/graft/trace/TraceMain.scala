package graft.trace

import java.nio.file.{Files, Paths}

/** EP3 artifact parity with the reference's entry point
  * (/root/reference/src/main.rs:12-26): run the reference-shape GEMM
  * (m=128, n=128, k=512, main.rs:13-14), print each op human-readably
  * (format_op, main.rs:19) and write the full op list as a pretty JSON
  * array (dump2json → serde_json::to_writer_pretty, main.rs:22-24).
  *
  * Default output path mirrors the reference's
  * `result/outer-product-no-amorsram.json` — but the directory is
  * created first instead of crashing on a missing `result/`
  * (main.rs:22's unwrap).
  */
object TraceMain {

  /** Artifact filename keyed by the amorphous-SRAM flag, exactly as the
    * reference names it (main.rs:22 writes
    * `result/outer-product-no-amorsram.json` for its `false` flag). The
    * flag changes only the artifact name here: the reference's SRAM
    * tier simulation maps to Spark's UnifiedMemoryManager (SURVEY §4),
    * not to a graft code path. */
  def defaultOut(amorsram: Boolean): String =
    if (amorsram) "result/outer-product-amorsram.json"
    else "result/outer-product-no-amorsram.json"

  def main(args: Array[String]): Unit = {
    val amorsram = args.contains("--amorsram")
    val out = Paths.get(args.filterNot(_ == "--amorsram").headOption
      .getOrElse(defaultOut(amorsram)))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val c = graft.gemm.GemmQueries.matC(spark)
    c.write.mode("overwrite").format("noop").save() // execute the multiply

    println(TraceExport.formatOps(c))
    if (out.getParent != null) Files.createDirectories(out.getParent)
    Files.writeString(out, TraceExport.toJson(c) + "\n")
    println(s"[trace] wrote ${out.toAbsolutePath}")
    spark.stop()
  }
}
