package graft

import graft.llm.KMeans
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Convergence + determinism contract of the fixed-point Lloyd trainer
  * behind x29_ann_ivf_trained (round-5 VERDICT task 2: replace x13's
  * fixture codebook with a real, oracle-checkable training job).
  */
class KMeansSpec extends AnyFunSuite {
  import TestSpark._

  private def vecs(dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private def collectVecs(df: DataFrame): Array[Array[Double]] =
    df.select("v").collect().map(_.getSeq[Double](0).toArray)

  /** Within-cluster SSE of a codebook over a vector set: each vector
    * charged to its NEAREST centroid (same argmin rule as the engine:
    * score cc - 2*v·c, smaller cid on ties — the ||v||^2 term is
    * assignment-invariant but kept so the quantity is a true SSE). */
  private def sse(cent: IndexedSeq[Array[Double]], vs: Array[Array[Double]]): Double =
    vs.map { v =>
      var vv = 0.0
      var i = 0
      while (i < v.length) { vv += v(i) * v(i); i += 1 }
      cent.map { c =>
        var cc = 0.0
        var vc = 0.0
        var j = 0
        while (j < c.length) { cc += c(j) * c(j); vc += v(j) * c(j); j += 1 }
        vv - 2 * vc + cc
      }.min
    }.sum

  test("SSE is non-increasing across the trained iterations (sf0.001 and sf0.01)") {
    for (dir <- Seq(sf0001, sf001)) {
      val data = vecs(dir)
      val hist = KMeans.train(data)
      assert(hist.length == KMeans.Iters + 1)
      val vs = collectVecs(data)
      val costs = hist.map(c => sse(c, vs))
      costs.sliding(2).foreach { case Seq(a, b) =>
        assert(b <= a + 1e-9, s"SSE increased on $dir: $costs")
      }
      assert(costs.last < costs.head, s"trainer never improved on $dir: $costs")
    }
  }

  test("training is deterministic: two runs produce the identical codebook") {
    val data = vecs(sf0001)
    val a = KMeans.train(data).last
    val b = KMeans.train(data).last
    assert(a.map(_.toSeq) == b.map(_.toSeq))
  }

  test("centroids are fixed-point dyadic rationals (value * 2^16 is integral)") {
    // The exactness argument (KMeans scaladoc) rests on every centroid
    // component being floor(s/n)/2^16 — i.e. integral at scale 2^16.
    val last = KMeans.train(vecs(sf0001)).last
    for (c <- last; x <- c)
      assert((x * KMeans.Scale) == math.rint(x * KMeans.Scale), s"non-dyadic component $x")
  }

  test("an emptied cell keeps its previous centroid") {
    val sp = spark
    import sp.implicits._
    // Seeds 0..15 on a 2-dim line; seed 15 duplicates seed 14, so every
    // vector tie-breaks to cid 14 and cell 15 is empty from iteration 1.
    val rows = (0 until 16).map { i =>
      val x = if (i == 15) 14.0 else i.toDouble
      (i.toLong, Seq(x, 0.0))
    } ++ Seq((100L, Seq(3.25, 0.5)), (101L, Seq(7.75, -0.5)))
    val data = rows.toDF("vec_id", "v")
    val hist = KMeans.train(data)
    val (init, last) = (hist.head, hist.last)
    assert(last(15).toSeq == init(15).toSeq, "empty cell 15 must keep its seed centroid")
    // ...while a populated cell moved (cell 3 absorbs vec 100).
    assert(last(3).toSeq != init(3).toSeq)
  }

  test("x32 PQ codes are in range, non-degenerate, and deterministic") {
    val run1 = SparkEntry.queries("x32_pq_codes")(spark, sf0001).collect()
    val run2 = SparkEntry.queries("x32_pq_codes")(spark, sf0001).collect()
    assert(run1.length == vecs(sf0001).count())
    assert(run1.map(_.toString).toSeq == run2.map(_.toString).toSeq,
      "PQ encoding is not deterministic")
    for (m <- 0 until 4) {
      val codes = run1.map(_.getAs[Long](s"code_$m"))
      assert(codes.forall(c => c >= 0 && c < KMeans.K), s"subspace $m code out of range")
      assert(codes.distinct.length >= 2,
        s"subspace $m collapsed to one cell — codebook training is broken")
    }
  }

  test("fused trainProduct is bit-identical to 4 separate per-subspace train runs") {
    val data = vecs(sf0001)
    val fused = KMeans.trainProduct(data, 4, 16)
    for (m <- 0 until 4) {
      val sep = KMeans.train(data.select(col("vec_id"),
        org.apache.spark.sql.functions.slice(col("v"), m * 16 + 1, 16).as("v"))).last
      assert(fused(m).map(_.toSeq) == sep.map(_.toSeq),
        s"fused subspace $m diverged from the separate job")
    }
  }

  test("trainJoint matches train + trainProduct bit for bit") {
    val data = vecs(sf0001)
    val (coarse, subs) = KMeans.trainJoint(data, 4, 16)
    assert(coarse.map(_.toSeq) == KMeans.train(data).last.map(_.toSeq),
      "joint coarse codebook diverged from the separate job")
    val sep = KMeans.trainProduct(data, 4, 16)
    for (m <- 0 until 4)
      assert(subs(m).map(_.toSeq) == sep(m).map(_.toSeq),
        s"joint subspace $m diverged from trainProduct")
  }

  test("per-subspace PQ distortion beats whole-space scalar assignment of the init seeds") {
    // The point of PQ: 4 independent 16-dim codebooks reconstruct
    // better than the same bit budget spent on the untrained seeds.
    val data = vecs(sf0001)
    val vs = collectVecs(data)
    for (m <- 0 until 4) {
      val sub = data.select(col("vec_id"),
        org.apache.spark.sql.functions.slice(col("v"), m * 16 + 1, 16).as("v"))
      val hist = KMeans.train(sub)
      val subVs = vs.map(_.slice(m * 16, (m + 1) * 16))
      assert(sse(hist.last, subVs) <= sse(hist.head, subVs) + 1e-9,
        s"subspace $m training increased distortion")
    }
  }

  test("x33 ADC results are ranked, bounded, and cell-consistent with x29") {
    val adc = SparkEntry.queries("x33_ivf_pq_search")(spark, sf0001).collect()
    assert(adc.nonEmpty)
    // Same coarse trainer in both queries — each query vector must land
    // in the same IVF cell whichever index form searches it.
    val ivfCell = SparkEntry.queries("x29_ann_ivf_trained")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("cell")).toMap
    adc.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rows) =>
      assert(rows.length <= 5)
      val sims = rows.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("sim"))
      sims.zip(sims.tail).foreach { case (a, b) => assert(a >= b, s"qid $qid unsorted") }
      sims.foreach(s => assert(s >= -1.0001 && s <= 1.0001, s"qid $qid sim $s out of range"))
      ivfCell.get(qid).foreach(c =>
        assert(rows.forall(_.getAs[Long]("cell") == c), s"qid $qid cell mismatch vs x29"))
    }
  }

  test("assignCell agrees with a plain scala argmin on the corpus") {
    val data = vecs(sf0001)
    val cent = KMeans.train(data).last
    val got = data.select(col("vec_id"), KMeans.assignCell(col("v"), cent).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = data.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    for ((id, v) <- rows) {
      val want = cent.zipWithIndex.map { case (c, j) =>
        var cc = 0.0; var vc = 0.0; var i = 0
        while (i < c.length) { cc += c(i) * c(i); vc += v(i) * c(i); i += 1 }
        (cc - 2 * vc, j.toLong)
      }.min._2
      assert(got(id) == want, s"cell mismatch for vec $id")
    }
  }

  test("assignCells rank 1 equals assignCell; probes are distinct and ranked") {
    val data = vecs(sf0001)
    val cent = KMeans.train(data).last
    val rows = data.select(col("vec_id"),
      KMeans.assignCell(col("v"), cent).as("c1"),
      KMeans.assignCells(col("v"), cent, 2).as("probes"))
      .collect()
    for (r <- rows) {
      val probes = r.getSeq[Long](2)
      assert(probes.length == 2)
      assert(probes.head == r.getLong(1),
        s"vec ${r.getLong(0)}: multi-probe rank 1 ${probes.head} != argmin ${r.getLong(1)}")
      assert(probes(0) != probes(1), s"vec ${r.getLong(0)}: duplicate probe")
    }
  }

  test("x34 multi-probe candidates are a superset of the nprobe=1 pairs") {
    // The property that justifies nprobe=2: widening the probe set can
    // only ADD candidate pairs (cell-boundary pairs), never drop any —
    // so the verified x34 pair set contains every same-nearest-cell
    // pair that clears the cosine threshold.
    val sp = spark
    val data = graft.core.Tables(sp, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // x34 trains at corpus-scaled capacity (round 7) — mirror it.
    val cent = KMeans.train(data, KMeans.scaledK(data.count())).last
    val cells = data.select(col("vec_id"), KMeans.assignCell(col("v"), cent).as("cell"))
    val a = cells.toDF("v1", "c1")
    val b = cells.toDF("v2", "c2")
    val rank1Pairs = a.join(b, col("c1") === col("c2") && col("v1") < col("v2"))
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val x34 = SparkEntry.queries("x34_semantic_dedup")(sp, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every rank-1 pair clearing the threshold must appear in x34
    val e = data.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var xy = 0.0; var xx = 0.0; var yy = 0.0; var i = 0
      while (i < x.length) { xy += x(i) * y(i); xx += x(i) * x(i); yy += y(i) * y(i); i += 1 }
      xy / (math.sqrt(xx) * math.sqrt(yy))
    }
    val rank1Near = rank1Pairs.filter { case (p, q) =>
      BigDecimal(cos(e(p), e(q))).setScale(4, BigDecimal.RoundingMode.HALF_UP) >= 0.4
    }
    assert(rank1Near.subsetOf(x34),
      s"nprobe=2 lost rank-1 pairs: ${rank1Near.diff(x34)}")
    assert(x34.nonEmpty, "x34 found no near-dup pairs at sf0.001")
  }

  test("scaledK is the smallest power of two whose square covers n") {
    import graft.llm.KMeans.scaledK
    assert(scaledK(1) == 1)
    assert(scaledK(2) == 2)
    assert(scaledK(4) == 2)
    assert(scaledK(5) == 4)
    assert(scaledK(16) == 4)
    assert(scaledK(17) == 8)
    assert(scaledK(200) == 16)   // the sf0.01 gate corpus -> the fixed search K
    assert(scaledK(256) == 16)   // exact square boundary stays exact (no FP)
    assert(scaledK(257) == 32)
    assert(scaledK(2000) == 64)
    assert(scaledK(20000) == 256)
    for (n <- 1L to 5000L) {
      val k = scaledK(n).toLong
      assert(k * k >= n && (k == 1 || (k / 2) * (k / 2) < n), s"n=$n k=$k")
    }
  }

  test("trainingStride bounds the sample; identity at tested scales") {
    import graft.llm.KMeans.{trainingStride, TrainCap}
    // identity at every scale factor the gates run (sf0.001..sf1.0)
    for (n <- Seq(20L, 200L, 2000L, 20000L, TrainCap))
      assert(trainingStride(n) == 1L, s"n=$n")
    // bound holds and stride is minimal past the cap
    for (n <- Seq(TrainCap + 1, 1000000L, 1000000000L)) {
      val s = trainingStride(n)
      assert(n / s <= TrainCap && n / (s / 2) > TrainCap, s"n=$n s=$s")
      // the sample still holds at least scaledK(n) seed vectors
      assert(n / s >= KMeans.scaledK(n), s"n=$n sample=${n / s} k=${KMeans.scaledK(n)}")
    }
  }

  test("training on a stride>1 sample seeds from the sample and stays valid") {
    val data = vecs(sf0001)
    val n = data.count()
    // force a tiny cap so the stride ring is exercised for real
    val sample = KMeans.trainingSet(data, n, cap = 8)
    val stride = KMeans.trainingStride(n, cap = 8)
    assert(stride > 1 && sample.count() <= 8)
    assert(sample.select("vec_id").collect().forall(_.getLong(0) % stride == 0))
    val k = 4
    val cent = KMeans.train(sample, k).last
    assert(cent.length == k && cent.forall(_.length == 64))
    // seeds are the k smallest vec_ids OF THE SAMPLE (0, s, 2s, 3s);
    // training stays fixed-point dyadic and assigns every corpus
    // vector to a valid cell
    val cells = data.select(KMeans.assignCell(col("v"), cent).as("cell"))
      .collect().map(_.getLong(0))
    assert(cells.forall(c => c >= 0 && c < k))
    cent.foreach(_.foreach(x => assert((x * KMeans.Scale) == math.rint(x * KMeans.Scale))))
  }
}
