package graft

import org.scalatest.funsuite.AnyFunSuite

/** The façade delegates correctly. */
class GraftFacadeSpec extends AnyFunSuite {
  import TestSpark._

  test("facade exposes the registry, tables, wordcount and topK") {
    assert(Graft.queries.size == SparkEntry.registry.size)
    assert(Graft.table(spark, sf0001, "region").count() == 5)
    assert(Graft.wordCount(spark, "/root/reference/article/1.txt").scoreboard()("rage") == 8L)
    val t = Graft.topKPerKey(Graft.table(spark, sf0001, "orders"),
      Seq("o_custkey"), Seq(("o_orderkey", true)), 1)
    assert(t.count() == 150) // one row per customer
  }
}
