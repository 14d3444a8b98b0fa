package graft

import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws of the set operations on seeded random key sets
  * (SURVEY.md §5 property tests). */
class SetOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("union/intersect/except algebra matches Scala set algebra") {
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      val sp = spark
      import sp.implicits._
      val xs = Set.fill(rnd.nextInt(40))(rnd.nextLong(30))
      val ys = Set.fill(rnd.nextInt(40))(rnd.nextLong(30))
      val xdf = xs.toSeq.toDF("k")
      val ydf = ys.toSeq.toDF("k")
      def keys(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.getLong(0)).toSet
      assert(keys(xdf.union(ydf).distinct()) == (xs | ys))
      assert(keys(xdf.intersect(ydf)) == (xs & ys))
      assert(keys(xdf.except(ydf)) == (xs -- ys))
      // |A| + |B| = |A∪B| + |A∩B|
      assert(xs.size + ys.size == (xs | ys).size + (xs & ys).size)
    }
  }
}
