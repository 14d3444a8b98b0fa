package graft

import org.scalatest.funsuite.AnyFunSuite

/** t1 smoke (SURVEY.md §5): every declared query runs at sf0.001,
  * returns rows, and is stable across two executions (determinism). */
class QuerySmokeSpec extends AnyFunSuite {
  import TestSpark._

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} runs, non-empty, stable") {
      val df1 = q.run(spark, sf0001)
      val r1 = df1.collect()
      assert(r1.nonEmpty, s"${q.name} returned no rows")
      val r2 = q.run(spark, sf0001).collect()
      assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq,
        s"${q.name} is not deterministic across runs")
    }
  }

  test("every query has an oracle (or is explicitly rows-only)") {
    // HLL sketches are implementation-defined → rows-only by design.
    val rowsOnly = Set("x9_approx_distinct")
    val noOracle = SparkEntry.registry.filter(_.oracle.isEmpty).map(_.name).toSet
    assert(noOracle == rowsOnly, s"queries without oracle: ${noOracle -- rowsOnly}")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
