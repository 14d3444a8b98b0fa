package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Remaining SURVEY §5 item-3 properties: dedup idempotence and window
  * aggregation invariance under input permutation (seeded cases). */
class PropertySpec extends AnyFunSuite {
  import TestSpark._

  test("exact dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(11)
    val docs = Seq.fill(300)(rnd.nextInt(40)).zipWithIndex
      .map { case (t, i) => (i.toLong, s"text body number $t") }.toDF("doc_id", "text")
    val once = docs.dropDuplicates("text")
    val twice = once.dropDuplicates("text")
    assert(once.count() == twice.count())
    assert(once.select("text").collect().map(_.getString(0)).sorted.toSeq ==
      twice.select("text").collect().map(_.getString(0)).sorted.toSeq)
  }

  test("windowed counts are invariant under input row permutation") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (1 to 500).map(i => (i.toLong, rnd.nextInt(7).toLong, rnd.nextInt(100).toLong))
    def ranked(input: Seq[(Long, Long, Long)]) = {
      val w = Window.partitionBy("k").orderBy(col("v"), col("id"))
      input.toDF("id", "k", "v")
        .select(col("id"), col("k"), row_number().over(w).as("rn"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(t => (t._1))
    }
    val base = ranked(rows)
    val shuffled = ranked(rnd.shuffle(rows))
    assert(base.toSeq == shuffled.toSeq)
  }
}
