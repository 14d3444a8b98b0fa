package graft

import graft.functions.VectorExpressions.quantizeStats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit parity of the native QuantizeStats expression against the
  * retired declarative spelling (array_min/array_max +
  * aggregate(transform(...)) + array_max(transform(...))) — the last
  * interpreted-HOF chain that lived on a gated hot path (x16). The
  * native form exists because HOFs never whole-stage-codegen and their
  * shared interpreted dispatch degrades in long-lived JVMs
  * (BASELINE.md round-5 notes; MinHashSigs has the full account).
  */
class QuantizeStatsSpec extends AnyFunSuite {
  import TestSpark._

  /** The exact declarative chain x16 shipped through round 5. */
  private def declarative(vs: DataFrame): DataFrame =
    vs.withColumn("mn", array_min(col("v")))
      .withColumn("mx", array_max(col("v")))
      .withColumn("rng",
        when(col("mx") === col("mn"), lit(1.0)).otherwise(col("mx") - col("mn")))
      .select(col("vec_id"), col("mn"), col("mx"),
        aggregate(
          transform(col("v"), x => floor((x - col("mn")) / col("rng") * 255).cast("long")),
          lit(0L), (s, x) => s + x).as("qsum"),
        array_max(transform(col("v"), x =>
          abs(x - (col("mn") + floor((x - col("mn")) / col("rng") * 255) * col("rng") / lit(255)))))
          .as("max_err"))

  private def native(vs: DataFrame): DataFrame =
    vs.select(col("vec_id"), quantizeStats(col("v")).as("qs"))
      .select(col("vec_id"), col("qs.mn").as("mn"), col("qs.mx").as("mx"),
        col("qs.qsum").as("qsum"), col("qs.max_err").as("max_err"))

  test("native stats equal the declarative chain on the embeddings table") {
    val vs = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val n = native(vs).orderBy("vec_id").collect()
    val d = declarative(vs).orderBy("vec_id").collect()
    assert(n.length == d.length && n.length > 0)
    assert(n.map(_.toString).toSeq == d.map(_.toString).toSeq)
  }

  test("edge vectors: constant, single-element, empty, null elements, null array") {
    val sp = spark
    import sp.implicits._
    val vs = Seq(
      (1L, Some(Seq[java.lang.Double](3.5, 3.5, 3.5))), // mx == mn -> rng 1.0
      (2L, Some(Seq[java.lang.Double](-2.25))),
      (3L, Some(Seq.empty[java.lang.Double])), // qsum 0 (fold init), rest null
      (4L, Some(Seq[java.lang.Double](1.0, null, 4.0))), // qsum poisons, mn/mx/max_err skip
      (5L, Some(Seq[java.lang.Double](null, null))), // all-null elements
      (6L, None) // null array
    ).toDF("vec_id", "v").select(col("vec_id"), col("v").cast("array<double>").as("v"))
    val n = native(vs).orderBy("vec_id").collect()
    val d = declarative(vs).orderBy("vec_id").collect()
    assert(n.map(_.toString).toSeq == d.map(_.toString).toSeq,
      s"native ${n.mkString("; ")} vs declarative ${d.mkString("; ")}")
    // Spot the documented fold-init quirk: empty array has qsum 0.
    assert(n(2).getLong(3) == 0L && n(2).isNullAt(1))
  }

  test("native stats equal a scala reference on random vectors (seeded property)") {
    val rnd = new scala.util.Random(1723)
    for (_ <- 1 to 200) {
      val n = 1 + rnd.nextInt(96)
      val v = Array.fill(n)(rnd.nextDouble() * 8 - 4)
      val mn = v.min
      val mx = v.max
      val rng = if (mx == mn) 1.0 else mx - mn
      val qs = v.map(x => math.floor((x - mn) / rng * 255).toLong).sum
      val me = v.map { x =>
        val q = math.floor((x - mn) / rng * 255)
        math.abs(x - (mn + q * rng / 255))
      }.max
      val row = graft.functions.QuantizeStats
        .compute(new org.apache.spark.sql.catalyst.util.GenericArrayData(v))
      assert(row.getDouble(0) == mn && row.getDouble(1) == mx)
      assert(row.getLong(2) == qs)
      assert(row.getDouble(3) == me)
    }
  }

  test("x16 plan is HOF-free and evaluates the expression once") {
    val vs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val plan = native(vs).queryExecution.optimizedPlan.toString
    assert("graft_quantize_stats".r.findAllIn(plan).length == 1,
      s"expected exactly 1 graft_quantize_stats eval in:\n$plan")
    assert(!plan.contains("aggregate(") && !plan.contains("transform("),
      s"HOFs crept back into the x16 plan:\n$plan")
  }
}
