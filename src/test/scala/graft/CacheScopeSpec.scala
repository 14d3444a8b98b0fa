package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CacheScope.cacheEager: the fan-out-race guard (BASELINE.md round-5
  * root cause). Eager means the cache blocks EXIST before the caller's
  * plan fans out — not merely that a persist was registered.
  */
class CacheScopeSpec extends AnyFunSuite {
  import TestSpark._

  test("cacheEager materializes at build time; lazy cache does not") {
    spark.catalog.clearCache()
    val sp = spark
    import sp.implicits._
    def storedBlocks(df: org.apache.spark.sql.DataFrame): Boolean = {
      val ir = sp.sharedState.cacheManager
        .lookupCachedData(df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]])
        .map(_.cachedRepresentation)
      ir.exists(_.cacheBuilder.isCachedColumnBuffersLoaded)
    }
    val lazyDf = graft.core.CacheScope.cache((1 to 100).toDF("v").filter($"v" > 5))
    assert(!storedBlocks(lazyDf), "lazy cache must not compute at build time")
    val eagerDf = graft.core.CacheScope.cacheEager((1 to 100).toDF("w").filter($"w" > 5))
    assert(storedBlocks(eagerDf), "cacheEager must materialize all partitions")
    lazyDf.unpersist(true)
    eagerDf.unpersist(true)
  }

  test("cacheEager inside a scope releases after the result materializes") {
    spark.catalog.clearCache()
    val sp = spark
    import sp.implicits._
    val result = graft.core.CacheScope.scoped {
      val mid = graft.core.CacheScope.cacheEager((1 to 50).toDF("v"))
      // two branches of one plan consuming the shared intermediate
      mid.agg(sum("v").as("a")).crossJoin(mid.agg(count(lit(1)).as("b")))
    }
    val rows = result.collect()
    assert(rows.head.getLong(0) == 1275L && rows.head.getLong(1) == 50L)
    val cm = sp.sharedState.cacheManager
    val deadline = System.currentTimeMillis() + 30000
    while (!cm.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(cm.isEmpty, "scope did not release the eager cache")
  }
}
