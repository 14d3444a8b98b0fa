package graft

import org.scalatest.funsuite.AnyFunSuite

/** §2A row 16 discharged by demonstration (VERDICT r11 task 4): the
  * reference's memory-tier allocator spills reducer state to main
  * memory when the SRAM tiers overflow (outer_product.rs:262-282); on
  * Spark that tier is the UnifiedMemoryManager + automatic spill, and
  * this spec RUNS it — one memory-starved child session whose task
  * metrics must show real spill bytes, one roomy session that must
  * show none, and bit-identical answers from both. Child JVMs because
  * `spark.testing.memory`/`spark.memory.fraction` are fixed at
  * SparkEnv creation — the shared test session cannot be
  * re-constrained in place.
  */
class SpillSpec extends AnyFunSuite {

  private val AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")

  private case class Probe(mem: Long, disk: Long, checksum: Long,
      groups: Long, top: Long)

  private def runProbe(xmx: String, testingMemory: Long, fraction: Double,
      partitions: Int): Probe = {
    val cmd = Seq("java") ++
      AddOpens.flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED")) ++
      Seq(s"-Xmx$xmx", "-Dspark.ui.enabled=false",
        "-cp", sys.props("java.class.path"),
        "graft.tools.SpillProbe",
        testingMemory.toString, fraction.toString, partitions.toString)
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    assert(proc.waitFor() == 0, s"probe JVM failed:\n${out.takeRight(3000)}")
    val line = out.linesIterator.find(_.startsWith("SPILL-PROBE: "))
      .getOrElse(fail(s"no SPILL-PROBE line in:\n${out.takeRight(3000)}"))
    def field(k: String): Long =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(line)
        .getOrElse(fail(s"no $k in $line")).group(1).toLong
    Probe(field("mem_spilled"), field("disk_spilled"),
      field("checksum"), field("groups"), field("top"))
  }

  test("constrained unified memory spills to disk and the answer is unchanged") {
    // starved: 480 MB "system" x 0.1 fraction ≈ 18 MB unified region
    // for a ~150 MB aggregation state + a 3M-row external sort. The
    // PHYSICAL heap stays 2g: the constraint under test is the managed
    // UnifiedMemoryManager region (spark.testing.memory overrides
    // systemMemory), not raw JVM headroom — untracked task overhead
    // must not OOM before the manager gets to spill.
    val starved = runProbe("2g", 480L << 20, 0.1, 4)
    // roomy: 4 GB x the default-ish 0.6 — everything fits in memory
    val roomy = runProbe("4g", 4096L << 20, 0.6, 8)
    assert(starved.mem > 0 && starved.disk > 0,
      s"starved run did not spill: $starved")
    // The property under test is spill-vs-answer invariance, pinned by
    // the starved leg; the roomy leg only has to be FAR below it, not
    // bit-zero (ADVICE r12: an incidental spill under ambient memory
    // pressure on a loaded runner must not fail the suite when the
    // contract holds).
    assert(roomy.mem == 0 || roomy.mem < starved.mem / 100,
      s"roomy run spilled like the starved one: $roomy vs $starved")
    assert(roomy.disk == 0 || roomy.disk < starved.disk / 100,
      s"roomy run spilled like the starved one: $roomy vs $starved")
    assert(starved.groups == 3000000L && roomy.groups == 3000000L)
    assert(starved.checksum == roomy.checksum && starved.top == roomy.top,
      s"spill changed the answer: $starved vs $roomy")
  }
}
