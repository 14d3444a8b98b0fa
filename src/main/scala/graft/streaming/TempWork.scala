package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Lifecycle for the scratch directories the end-to-end streaming
  * queries need (arrival dir, checkpoint, sink). Each run of s5/s6
  * writes a full parquet copy of the events table into its arrival dir;
  * left behind, a median-of-3 bench run accumulates 4 such triples per
  * query (ADVICE r4). The arrival and checkpoint dirs are deleted
  * explicitly the moment the stream stops; the sink dir must outlive
  * the query (the returned DataFrame reads it lazily, possibly more
  * than once), so it is reclaimed by a single JVM-exit hook instead.
  */
private[graft] object TempWork {

  private val pending = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val hookInstalled: Boolean = {
    sys.addShutdownHook { pending.forEach(d => deleteNow(d)) }
    true
  }

  /** Create a temp dir registered for deletion at JVM exit. */
  def dir(prefix: String): String = {
    hookInstalled
    val p = Files.createTempDirectory(prefix).toString
    pending.add(p)
    p
  }

  /** Stamp every data file currently in `dir` 10 minutes older and
    * return how many there are. The file stream source processes
    * files oldest-first, so files written BEFORE this call form the
    * first trigger's batch when maxFilesPerTrigger equals the returned
    * count — the single-start two-chunk arrival s5/s6 use. 10 min
    * dwarfs any filesystem timestamp granularity. */
  def stampOlder(dir: String): Int = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    files.foreach(f => f.setLastModified(f.lastModified() - 600000L))
    files.length
  }

  /** Delete now (recursively, best-effort) and drop the exit hook entry. */
  def delete(path: String): Unit = {
    deleteNow(path)
    pending.remove(path)
  }

  private def deleteNow(path: String): Unit =
    try {
      val root = Paths.get(path)
      if (Files.exists(root)) {
        val s = Files.walk(root)
        try s.sorted(Comparator.reverseOrder[Path]())
          .forEach(p => try Files.deleteIfExists(p) catch { case _: Throwable => () })
        finally s.close()
      }
    } catch { case _: Throwable => () }
}
