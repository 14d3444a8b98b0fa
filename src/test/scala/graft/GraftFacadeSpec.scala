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

  test("facade connected components resolve a chain") {
    val sp = spark
    import sp.implicits._
    val got = Graft.connectedComponents(
        Seq(1L, 2L, 3L, 9L).toDF("id"), Seq(1L -> 2L, 2L -> 3L).toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
    TestSpark.releaseAllRdds()
  }

  test("every facade query releases its cached intermediates after materialization") {
    spark.catalog.clearCache()
    // CacheScope can only manage what queries register; anything a
    // prior suite persisted outside a scope is not this test's subject.
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    val cm = spark.sharedState.cacheManager
    def leftover = spark.sparkContext.getPersistentRDDs.keySet -- baseline
    Graft.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      fn(spark, sf0001).write.mode("overwrite").format("noop").save()
      // the one-shot CacheScope listener fires on the async listener bus
      val deadline = System.currentTimeMillis() + 30000
      while (!(cm.isEmpty && leftover.isEmpty) && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(cm.isEmpty, s"$name left cached plans behind")
      assert(leftover.isEmpty, s"$name left persisted RDDs behind: $leftover")
    }
  }
}
