package graft.llm

import graft.core.Cols._
import graft.core.{CacheScope, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the embedding column.
  *
  * l3 is the brute-force cosine top-k baseline (the query set is small —
  * the scan side stays linear; the query side is broadcast). x8 is the
  * scale path: deterministic sign-random-projection LSH — 8 fixed
  * integer hyperplanes bucket the vectors, then top-k runs inside each
  * bucket only. Bucketing is part of the declared semantics, so the
  * oracle applies the identical planes and the results match exactly.
  */
object SimilarityQueries {

  /** Deterministic LSH hyperplanes: w(p,d) = ((p*131 + d*17) % 19) - 9
    * — the same formula at every plane index, so the fixed 8-plane
    * family (x3/x8) and the corpus-scaled family (x79) draw from ONE
    * plane sequence and the scaled signature at np = 8 is bit-identical
    * to the fixed one. */
  private def planes(np: Int): Seq[Seq[Double]] =
    (0 until np).map(p => (0 until 64).map(d => (((p * 131 + d * 17) % 19) - 9).toDouble))

  /** Corpus-scaled plane count: the smallest p with 2^p >= n — buckets
    * track the corpus (expected occupancy <= 1), so candidate volume
    * stays ~linear per decade where a FIXED width saturates
    * (SCALING.md measured x3's 8 planes at 17.7x/decade at sf1.0: 20k
    * vectors crammed into 256 buckets). ~log2(n) probes per vector is
    * the price — the multi-probe fan-out grows by ~3.3 per decade
    * while the per-bucket quadratic term stops growing at all. Integer
    * -exact (shift compare, no FP log) and restated verbatim in the
    * oracle's pp CTE — KMeans.scaledK's pattern applied to the LSH
    * family. */
  private[llm] def scaledPlanes(n: Long): Int =
    (1 to 62).find(p => (1L << p) >= n).get

  /** LSH signature over the first `np` planes of the shared sequence
    * (x3/x8 pass the fixed 8; x79 passes [[scaledPlanes]] of the
    * corpus count). Each plane projection runs through the native
    * in-order DotProduct expression — same bits as the
    * aggregate(zip_with(...)) fold it replaces (both sum in index
    * order), but codegen'd: HOFs evaluate on the shared interpreted
    * path, which degrades in long-lived JVMs (see MinHashSigs). */
  private[llm] def lshSigN(v: Column, np: Int): Column =
    (0 until np).map { p =>
      val dp = graft.core.Cols.dot(v, typedLit(planes(np)(p)))
      when(dp > 0, 1L << p).otherwise(0L)
    }.reduce(_ + _)

  /** The fixed 8-plane signature of the x3/x8 family. */
  private[llm] def lshSig(v: Column): Column = lshSigN(v, 8)

  /** Oracle-SQL `sg` CTE computing the same signatures as `lshSig`,
    * stated as in-order list_dot_product against LITERAL weight lists —
    * not an order-unspecified SUM over an unnested join — so the oracle
    * folds each dot product in the same element order as the engine.
    * FP addition is non-associative; a dp near zero under a different
    * summation order could flip a sign bit and with it a candidate
    * bucket. Shared by x8 and x3 (DedupQueries). */
  private[llm] val sigSql: String = {
    val terms = (0 until 8).map { p =>
      val w = (0 until 64)
        .map(d => (((p * 131 + d * 17) % 19) - 9).toDouble.toString)
        .mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product(v, $w) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")
    s"sg AS (SELECT vec_id, CAST($terms AS BIGINT) AS sig FROM e)"
  }

  private def vectors(spark: SparkSession, dir: String): DataFrame =
    Tables.fanOut(Tables(spark, dir, "embeddings"))
      .select(col("vec_id"), vecD(col("embedding")).as("v"))

  /** The half-trained / full-assigned search oracle shared by b8
    * (batch encode-and-append) and s14 (the same append arriving
    * through a stream): codebooks train on the first half of the
    * corpus (replayed CTEs), then ALL vectors — including ones the
    * trainer never saw — are assigned and reconstructed against those
    * codebooks, and the cell-pruned cosine top-5 runs over the merged
    * set. */
  private[llm] def ivfPqAppendSql: String = {
    val it = KMeans.Iters
    val sub = (0 until 4).map { m =>
      s"s${m}e1 AS (SELECT vec_id, v[${m * 16 + 1}:${(m + 1) * 16}] AS v FROM e1),\n" +
        KMeans.oracleCtes(s"s${m}e1", 16, s"s$m") + ",\n" +
        s"s${m}ea AS (SELECT vec_id, v[${m * 16 + 1}:${(m + 1) * 16}] AS v FROM e),\n" +
        KMeans.oracleAssign(s"s${m}aa", s"s${m}ea", s"s${m}c$it")
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |hh AS (SELECT count(*) // 2 AS h FROM e),
       |e1 AS (SELECT e.vec_id, e.v FROM e CROSS JOIN hh WHERE e.vec_id < hh.h),
       |${KMeans.scaledKSql("e1")},
       |${KMeans.oracleCtes("e1", 64, "", "(SELECT k FROM kk)")},
       |${KMeans.oracleAssign("aa", "e", s"c$it")},
       |$sub,
       |rec AS (SELECT a.vec_id, a.cell,
       |    flatten([b0.cv, b1.cv, b2.cv, b3.cv]) AS rv
       |  FROM aa a
       |  JOIN s0aa a0 ON a0.vec_id = a.vec_id JOIN s0c$it b0 ON b0.cid = a0.cell
       |  JOIN s1aa a1 ON a1.vec_id = a.vec_id JOIN s1c$it b1 ON b1.cid = a1.cell
       |  JOIN s2aa a2 ON a2.vec_id = a.vec_id JOIN s2c$it b2 ON b2.cid = a2.cell
       |  JOIN s3aa a3 ON a3.vec_id = a.vec_id JOIN s3c$it b3 ON b3.cid = a3.cell),
       |p AS (SELECT q.vec_id AS qid, q.cell AS cell, r.vec_id AS nid,
       |    round(list_dot_product(qe.v, r.rv)
       |      / (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(r.rv, r.rv))), 4) AS sim
       |  FROM rec q JOIN e qe ON qe.vec_id = q.vec_id
       |  JOIN rec r ON r.cell = q.cell AND r.vec_id <> q.vec_id
       |  WHERE q.vec_id < 20),
       |rr AS (SELECT qid, cell, nid, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn FROM p)
       |SELECT qid, cell, nid, sim, rn FROM rr WHERE rn <= 5 ORDER BY qid, rn""".stripMargin
  }

  /** b11's oracle: ivfPqAppendSql's half-trained / full-assigned search
    * restricted to the SURVIVING vector set — vec_id % 10 = 3 is
    * deleted after build+append, so neither the query side nor the
    * corpus side of the final search may see those ids (deleted ids
    * that fall inside the first-20 query range simply stop being
    * queries). Training is NOT restated: deletes happen after the
    * codebooks exist and never retrain them — exactly the tombstone
    * contract (a takedown must stop a vector from being SERVED
    * immediately; codebook refresh waits for the next rebuild). */
  private[llm] def ivfPqDeleteSql: String = {
    val it = KMeans.Iters
    val sub = (0 until 4).map { m =>
      s"s${m}e1 AS (SELECT vec_id, v[${m * 16 + 1}:${(m + 1) * 16}] AS v FROM e1),\n" +
        KMeans.oracleCtes(s"s${m}e1", 16, s"s$m") + ",\n" +
        s"s${m}ea AS (SELECT vec_id, v[${m * 16 + 1}:${(m + 1) * 16}] AS v FROM e),\n" +
        KMeans.oracleAssign(s"s${m}aa", s"s${m}ea", s"s${m}c$it")
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |hh AS (SELECT count(*) // 2 AS h FROM e),
       |e1 AS (SELECT e.vec_id, e.v FROM e CROSS JOIN hh WHERE e.vec_id < hh.h),
       |${KMeans.scaledKSql("e1")},
       |${KMeans.oracleCtes("e1", 64, "", "(SELECT k FROM kk)")},
       |${KMeans.oracleAssign("aa", "e", s"c$it")},
       |$sub,
       |rec AS (SELECT a.vec_id, a.cell,
       |    flatten([b0.cv, b1.cv, b2.cv, b3.cv]) AS rv
       |  FROM aa a
       |  JOIN s0aa a0 ON a0.vec_id = a.vec_id JOIN s0c$it b0 ON b0.cid = a0.cell
       |  JOIN s1aa a1 ON a1.vec_id = a.vec_id JOIN s1c$it b1 ON b1.cid = a1.cell
       |  JOIN s2aa a2 ON a2.vec_id = a.vec_id JOIN s2c$it b2 ON b2.cid = a2.cell
       |  JOIN s3aa a3 ON a3.vec_id = a.vec_id JOIN s3c$it b3 ON b3.cid = a3.cell),
       |p AS (SELECT q.vec_id AS qid, q.cell AS cell, r.vec_id AS nid,
       |    round(list_dot_product(qe.v, r.rv)
       |      / (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(r.rv, r.rv))), 4) AS sim
       |  FROM rec q JOIN e qe ON qe.vec_id = q.vec_id
       |  JOIN rec r ON r.cell = q.cell AND r.vec_id <> q.vec_id
       |  WHERE q.vec_id < 20 AND q.vec_id % 10 <> 3 AND r.vec_id % 10 <> 3),
       |rr AS (SELECT qid, cell, nid, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn FROM p)
       |SELECT qid, cell, nid, sim, rn FROM rr WHERE rn <= 5 ORDER BY qid, rn""".stripMargin
  }

  /** The IVF-PQ top-5 search oracle: joint coarse + 4 subspace k-means
    * trainings replayed as CTEs, codes expanded back to reconstructed
    * vectors, cell-pruned cosine top-5 for the first 20 queries.
    * Shared verbatim by x33 (in-plan build + search) and b7 (the same
    * search run from PERSISTED index artifacts) — one oracle, two
    * engine paths that must both hash-match it. */
  private[llm] def ivfPqTop5Sql: String = {
    val sub = (0 until 4).map { m =>
      s"s${m}e AS (SELECT vec_id, v[${m * 16 + 1}:${(m + 1) * 16}] AS v FROM e),\n" +
        KMeans.oracleCtes(s"s${m}e", 16, s"s$m")
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |${KMeans.scaledKSql("e")},
       |${KMeans.oracleCtes("e", 64, "", "(SELECT k FROM kk)")},
       |$sub,
       |rec AS (SELECT a.vec_id, a.cell,
       |    flatten([b0.cv, b1.cv, b2.cv, b3.cv]) AS rv
       |  FROM af a
       |  JOIN s0af a0 ON a0.vec_id = a.vec_id JOIN s0c${KMeans.Iters} b0 ON b0.cid = a0.cell
       |  JOIN s1af a1 ON a1.vec_id = a.vec_id JOIN s1c${KMeans.Iters} b1 ON b1.cid = a1.cell
       |  JOIN s2af a2 ON a2.vec_id = a.vec_id JOIN s2c${KMeans.Iters} b2 ON b2.cid = a2.cell
       |  JOIN s3af a3 ON a3.vec_id = a.vec_id JOIN s3c${KMeans.Iters} b3 ON b3.cid = a3.cell),
       |p AS (SELECT q.vec_id AS qid, q.cell AS cell, r.vec_id AS nid,
       |    round(list_dot_product(qe.v, r.rv)
       |      / (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(r.rv, r.rv))), 4) AS sim
       |  FROM rec q JOIN e qe ON qe.vec_id = q.vec_id
       |  JOIN rec r ON r.cell = q.cell AND r.vec_id <> q.vec_id
       |  WHERE q.vec_id < 20),
       |rr AS (SELECT qid, cell, nid, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn FROM p)
       |SELECT qid, cell, nid, sim, rn FROM rr WHERE rn <= 5 ORDER BY qid, rn""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // L3 — brute-force cosine top-5 for the first 20 query vectors.
    Q(
      "l3_ann_bruteforce",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |p AS (SELECT q.vec_id AS qid, x.vec_id AS nid,
        |    round(list_dot_product(q.v, x.v)
        |      / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(x.v, x.v))), 4) AS sim
        |  FROM e q JOIN e x ON x.vec_id <> q.vec_id WHERE q.vec_id < 20),
        |r AS (SELECT qid, nid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn FROM p)
        |SELECT qid, nid, sim, rn FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin
    ) { (spark, dir) =>
      val e = vectors(spark, dir).withColumn("nrm", l2norm(col("v")))
      val q = e.filter(col("vec_id") < 20).toDF("qid", "qv", "qn")
      val x = e.toDF("nid", "xv", "xn")
      val scored = broadcast(q).join(x, col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"),
          r4(dot(col("qv"), col("xv")) / (col("qn") * col("xn"))).as("sim"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("sim").desc, col("nid"))
      scored.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .orderBy("qid", "rn")
    },

    // X8 — LSH-bucketed ANN: candidates restricted to the query's bucket.
    Q(
      "x8_ann_lsh",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |$sigSql,
        |ev AS (SELECT e.vec_id, e.v, sg.sig FROM e JOIN sg USING (vec_id)),
        |p2 AS (SELECT q.vec_id AS qid, x.vec_id AS nid,
        |    round(list_dot_product(q.v, x.v)
        |      / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(x.v, x.v))), 4) AS sim
        |  FROM ev q JOIN ev x ON q.sig = x.sig AND x.vec_id <> q.vec_id WHERE q.vec_id < 20),
        |r AS (SELECT qid, nid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn FROM p2)
        |SELECT qid, nid, sim, rn FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin
    ) { (spark, dir) =>
      val e = CacheScope.cacheEager(vectors(spark, dir)
        .withColumn("nrm", l2norm(col("v")))
        .withColumn("sig", lshSig(col("v"))))
      val q = e.filter(col("vec_id") < 20).toDF("qid", "qv", "qn", "qsig")
      val x = e.toDF("nid", "xv", "xn", "xsig")
      val scored = broadcast(q)
        .join(x, col("qsig") === col("xsig") && col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"),
          r4(dot(col("qv"), col("xv")) / (col("qn") * col("xn"))).as("sim"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("sim").desc, col("nid"))
      scored.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .orderBy("qid", "rn")
    },

    // X13 — IVF-bucketed ANN, the inverted-file counterpart to x8's
    // LSH: a fixed 16-vector codebook (the vectors with vec_id < 16 —
    // deliberately data-independent so the DuckDB oracle can restate
    // it; x29 below is the same search over a codebook a real k-means
    // training job produces), every vector assigned to its nearest centroid
    // by L2 (argmin of cc - 2*v·c; ties to the smaller centroid id),
    // probes searching ONLY their own cell (nprobe = 1, the recall
    // knob). Assignment is a broadcast of the codebook + one partial
    // aggregation — linear, map-side, no shuffle of the vectors beyond
    // the argmin combine; the probe join keys on the cell id, cutting
    // the candidate space ~K-fold. The argmin is an in-order
    // struct-min, and both engines fold the dot products in element
    // order, so cell assignment is bit-deterministic.
    Q(
      "x13_ann_ivf",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv, list_dot_product(v, v) AS cc FROM e WHERE vec_id < 16),
        |s AS (SELECT e.vec_id, e.v, c.cid, (c.cc - 2 * list_dot_product(e.v, c.cv)) AS score
        |  FROM e CROSS JOIN c),
        |a AS (SELECT vec_id, v, cid AS cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) AS rk FROM s) t
        |  WHERE rk = 1),
        |p AS (SELECT q.vec_id AS qid, x.vec_id AS nid,
        |    round(list_dot_product(q.v, x.v)
        |      / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(x.v, x.v))), 4) AS sim
        |  FROM a q JOIN a x ON q.cell = x.cell AND x.vec_id <> q.vec_id WHERE q.vec_id < 20),
        |r AS (SELECT qid, nid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn FROM p)
        |SELECT qid, nid, sim, rn FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin
    ) { (spark, dir) =>
      val e = vectors(spark, dir).withColumn("nrm", l2norm(col("v")))
      val cent = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("v").as("cv"),
          dot(col("v"), col("v")).as("cc"))
      val assigned = CacheScope.cacheEager(e.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("v"), col("nrm"),
          struct((col("cc") - lit(2.0) * dot(col("v"), col("cv"))).as("score"),
            col("cid").as("cid")).as("sc"))
        .groupBy("vec_id")
        .agg(min("sc").as("m"), first("v").as("v"), first("nrm").as("nrm"))
        .select(col("vec_id"), col("v"), col("nrm"), col("m.cid").as("cell")))
      val q = assigned.filter(col("vec_id") < 20).toDF("qid", "qv", "qn", "qcell")
      val x = assigned.toDF("nid", "xv", "xn", "xcell")
      val scored = broadcast(q)
        .join(x, col("qcell") === col("xcell") && col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"),
          r4(dot(col("qv"), col("xv")) / (col("qn") * col("xn"))).as("sim"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("sim").desc, col("nid"))
      scored.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .orderBy("qid", "rn")
    },

    // X29 — IVF search over a TRAINED codebook: the k-means training
    // job x13's fixture codebook stood in for. KMeans.train runs 3
    // deterministic fixed-point Lloyd iterations (init = the vec_id <
    // K seed vectors, fixed-point means, ties to smaller cid — see
    // KMeans's scaladoc for why every step is exact and
    // order-independent), then the query searches nprobe=1 cells
    // exactly like x13. K is corpus-scaled — KMeans.scaledK, K² >= n —
    // so cell occupancy stays ~sqrt(n) and the per-query probe cost
    // sublinear as the corpus grows (the whole trained-IVF family uses
    // the same rule: x33/x37/x47, AnnIndex, x34). The oracle replays
    // the K selection (kk CTE) and the identical 3 iterations as
    // unrolled CTEs, so cell assignments AND the trained centroids are
    // hash-gated, not just the final neighbors. Training cost: Iters
    // linear scans with literal-centroid assignment (no join), each
    // reduced map-side to K*64 groups; the only driver traffic is the
    // K*64-number codebook per iteration.
    Q(
      "x29_ann_ivf_trained",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |${KMeans.scaledKSql("e")},
        |${KMeans.oracleCtes("e", 64, "", "(SELECT k FROM kk)")},
        |p AS (SELECT q.vec_id AS qid, q.cell, x.vec_id AS nid,
        |    round(list_dot_product(q.v, x.v)
        |      / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(x.v, x.v))), 4) AS sim
        |  FROM af q JOIN af x ON q.cell = x.cell AND x.vec_id <> q.vec_id WHERE q.vec_id < 20),
        |r AS (SELECT qid, cell, nid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn FROM p)
        |SELECT qid, cell, nid, sim, rn FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin
    ) { (spark, dir) =>
      // The vector table is scanned Iters+1 times (3 training assigns
      // + the final one) — cache it eagerly for the loop. At real
      // scale this is the standard cache-if-it-fits k-means layout;
      // uncached, each iteration is one extra parquet scan — still
      // linear, just slower.
      val e = CacheScope.cacheEager(
        vectors(spark, dir).withColumn("nrm", l2norm(col("v"))))
      val n = e.count()
      val codebook = KMeans.train(KMeans.trainingSet(
        e.select(col("vec_id"), col("v")), n), KMeans.scaledK(n)).last
      // cacheEager: assigned feeds both the broadcast query side and
      // the probe side — the broadcast stage mostly serializes the
      // branches, but an eager materialization removes the lazy-cache
      // fan-out race outright (ADVICE r6).
      val assigned = CacheScope.cacheEager(e.select(col("vec_id"), col("v"), col("nrm"),
        KMeans.assignCell(col("v"), codebook).as("cell")))
      val q = assigned.filter(col("vec_id") < 20).toDF("qid", "qv", "qn", "qcell")
      val x = assigned.toDF("nid", "xv", "xn", "xcell")
      val scored = broadcast(q)
        .join(x, col("qcell") === col("xcell") && col("qid") =!= col("nid"))
        .select(col("qid"), col("qcell").as("cell"), col("nid"),
          r4(dot(col("qv"), col("xv")) / (col("qn") * col("xn"))).as("sim"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("sim").desc, col("nid"))
      scored.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .orderBy("qid", "rn")
    },

    // X16 — embedding scalar quantization: per-vector min/max int8
    // encoding (the storage-shrink step ahead of large-scale ANN — 4x
    // smaller than float32, 8x smaller than the double working form),
    // reported as the code checksum plus the max reconstruction error.
    // Every output is either an exact integer sum or an element-wise
    // chain of IEEE ops in fixed order with an order-independent max —
    // no floating-point SUM anywhere, so the oracle matches bit-for-bit.
    // At scale this is a pure map over the vectors: no shuffle, no
    // state, codec parameters (mn, mx) ride with each row. The stats
    // come from the native QuantizeStats expression (round 6) — the
    // declarative aggregate(transform(...)) spelling was the last
    // interpreted higher-order function on a gated hot path; the
    // native form whole-stage-codegens and touches each element twice
    // (min/max pass + quantize pass) with zero per-element allocation.
    Q(
      "x16_embedding_quantize",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |g AS (SELECT vec_id, v, list_aggregate(v, 'min') AS mn, list_aggregate(v, 'max') AS mx,
        |    CASE WHEN list_aggregate(v, 'max') = list_aggregate(v, 'min') THEN 1.0
        |         ELSE list_aggregate(v, 'max') - list_aggregate(v, 'min') END AS rng
        |  FROM e)
        |SELECT vec_id, mn, mx,
        |  CAST(list_sum(list_transform(v, x -> CAST(floor(((x - mn) / rng) * 255) AS BIGINT))) AS BIGINT) AS qsum,
        |  list_aggregate(list_transform(v,
        |    x -> abs(x - (mn + (floor(((x - mn) / rng) * 255) * rng) / 255))), 'max') AS max_err
        |FROM g ORDER BY vec_id""".stripMargin
    ) { (spark, dir) =>
      Tables.fanOut(Tables(spark, dir, "embeddings"))
        .select(col("vec_id"), vecD(col("embedding")).as("v"))
        .select(col("vec_id"),
          graft.functions.VectorExpressions.quantizeStats(col("v")).as("qs"))
        .select(col("vec_id"), col("qs.mn").as("mn"), col("qs.mx").as("mx"),
          col("qs.qsum").as("qsum"), col("qs.max_err").as("max_err"))
        .orderBy("vec_id")
    },

    // X32 — product quantization: the third leg of the ANN compression
    // stack (x16 scalar-quantizes, x13/x29 coarse-quantize into IVF
    // cells; PQ is what a billion-vector index stores INSIDE each
    // cell). The 64-dim space splits into 4 16-dim subspaces, each
    // with its own 16-centroid codebook trained by the same
    // deterministic fixed-point Lloyd's job as x29 — so a vector
    // compresses to 4 codes = 2 bytes, 128x smaller than float32.
    // The oracle replays all FOUR training jobs (12 unrolled
    // assign/update CTE pairs) and the final per-subspace argmin, so
    // every code of every vector is hash-gated against an independent
    // restatement. SCALE SHAPE: training is FUSED — each of the Iters
    // iterations is one scan of the cached vectors computing all 4
    // subspace assignments in a single projection, reduced map-side to
    // (subspace, cell, dim) groups (KMeans.trainProduct; bit-identical
    // to 4 separate jobs, asserted by KMeansSpec); encoding is ONE pure map
    // computing all 4 argmins inside whole-stage codegen — no join,
    // no shuffle, the same plan a petabyte encode wants.
    Q(
      "x32_pq_codes", {
        val sub = (0 until 4).map { m =>
          s"s${m}e AS (SELECT vec_id, v[${m * 16 + 1}:${(m + 1) * 16}] AS v FROM e),\n" +
            KMeans.oracleCtes(s"s${m}e", 16, s"s$m")
        }.mkString(",\n")
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |$sub
           |SELECT a.vec_id, a.cell AS code_0, b.cell AS code_1,
           |  c.cell AS code_2, d.cell AS code_3
           |FROM s0af a JOIN s1af b ON a.vec_id = b.vec_id
           |  JOIN s2af c ON a.vec_id = c.vec_id
           |  JOIN s3af d ON a.vec_id = d.vec_id
           |ORDER BY a.vec_id""".stripMargin
      }
    ) { (spark, dir) =>
      val e = CacheScope.cacheEager(vectors(spark, dir))
      val codebooks = KMeans.trainProduct(e, 4, 16)
      e.select(col("vec_id") +:
        (0 until 4).map(m =>
          KMeans.assignCell(slice(col("v"), m * 16 + 1, 16), codebooks(m))
            .as(s"code_$m")): _*)
        .orderBy("vec_id")
    },

    // X33 — IVF-PQ asymmetric-distance search: the index layout a
    // billion-vector deployment actually ships (FAISS's IVFPQ): the
    // coarse k-means codebook (x29's trainer) prunes candidates to
    // the query's cell, and within the cell each database vector is
    // scored from its PQ RECONSTRUCTION (x32's 4 subspace codebooks)
    // against the RAW query — asymmetric distance, the query is never
    // quantized. Both training jobs AND the reconstruction arithmetic
    // replay in the oracle: centroids are dyadic rationals, the
    // reconstructed vector is 4 exact centroid slices concatenated,
    // and the cosine folds in index order on both engines. SCALE
    // SHAPE: everything the x29/x32 comments establish, plus the
    // search itself — a broadcast of the 20 raw query rows against a
    // cell-keyed candidate scan whose data column is 2 BYTES of codes
    // (the reconstruction expands codes inside the map via literal
    // codebook lookup, so the shuffled/scanned width is the code
    // width, not 64 doubles — the whole point of PQ at 100 TB).
    Q(
      "x33_ivf_pq_search", ivfPqTop5Sql
    ) { (spark, dir) =>
      val e = CacheScope.cacheEager(
        vectors(spark, dir).withColumn("nrm", l2norm(col("v"))))
      // Coarse and PQ codebooks train in the SAME Iters scans
      // (KMeans.trainJoint) — the whole index trains in 3 passes.
      // Coarse capacity tracks the corpus (K² >= n — the count is free,
      // e was just eagerly materialized); PQ stays at 16 codes/subspace
      // (compression width). Oracle restates K via the kk CTE.
      val n = e.count()
      val (coarse, pq) = KMeans.trainJoint(KMeans.trainingSet(
        e.select(col("vec_id"), col("v")), n), 4, 16, KMeans.scaledK(n))
      // Reconstruction: per subspace, the code indexes a LITERAL
      // 16-entry codebook array baked into the plan; concat of the 4
      // looked-up slices rebuilds the 64-dim vector inside the map.
      val rv = concat((0 until 4).map { m =>
        element_at(typedLit(pq(m).map(_.toSeq)),
          (KMeans.assignCell(slice(col("v"), m * 16 + 1, 16), pq(m)) + 1).cast("int"))
      }: _*)
      // cacheEager: enc fans out to the broadcast query side and the
      // probe side — see x29's note (ADVICE r6).
      val enc = CacheScope.cacheEager(e.select(col("vec_id"), col("v"), col("nrm"),
        KMeans.assignCell(col("v"), coarse).as("cell"), rv.as("rv")))
      val q = enc.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("nrm").as("qn"), col("cell").as("qcell"))
      val x = enc.select(col("vec_id").as("nid"), col("rv").as("xv"),
        col("cell").as("xcell"))
      val scored = broadcast(q)
        .join(x, col("qcell") === col("xcell") && col("qid") =!= col("nid"))
        .select(col("qid"), col("qcell").as("cell"), col("nid"),
          r4(dot(col("qv"), col("xv")) / (col("qn") * l2norm(col("xv")))).as("sim"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("sim").desc, col("nid"))
      scored.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .orderBy("qid", "rn")
    },

    // B7 — PERSISTED ANN INDEX round trip (round-7 VERDICT task 3):
    // x33's trained artifacts — coarse codebook, 4 PQ codebooks, and
    // the coded corpus — are WRITTEN to parquet (AnnIndex.save), the
    // in-memory index is discarded, and the search runs entirely from
    // the LOADED artifacts (AnnIndex.load + searchTop5). The gate is
    // the strongest possible statement of artifact fidelity: the
    // oracle is x33's VERBATIM — a search over the saved-then-loaded
    // index must hash-match the search over the index that never left
    // memory. This closes the build-once/search-many gap: x33/x37/x47
    // retrain in-plan because their oracles replay the training; a
    // production deployment calls AnnIndex.build + save once (3
    // linear scans), then every query is load (a (M+1)·K-row bounded
    // read) + one cell-keyed probe join over 2-byte codes. Reference
    // anchor: the produce-once/consume-downstream trace-artifact
    // contract (main.rs:17-25) applied to index artifacts.
    Q(
      "b7_ann_index_roundtrip", ivfPqTop5Sql
    ) { (spark, dir) =>
      val e = CacheScope.cacheEager(vectors(spark, dir))
      val built = AnnIndex.build(e)
      val path = graft.streaming.TempWork.dir("graft_b7_annidx")
      AnnIndex.save(spark, built, path)
      val loaded = AnnIndex.load(spark, path)
      AnnIndex.searchTop5(loaded, e, 20)
    },

    // B8 — INCREMENTAL INDEX APPEND: the index is built and persisted
    // from only the FIRST HALF of the corpus; the second half is then
    // coded with the LOADED codebooks — no retraining, a pure
    // codegen'd encode map over the new batch — and appended to the
    // codes artifact; the search runs over the merged index. This is
    // how a production IVF-PQ deployment grows between rebuilds:
    // codebooks are versioned artifacts, new data streams in as
    // encode-and-append (one linear scan of the batch), and existing
    // codes never change. The oracle replays the half-corpus training
    // and then assigns ALL vectors against the trained codebooks
    // (KMeans.oracleAssign), so the gate proves the appended codes
    // are bit-identical to what a from-scratch encode of the full
    // corpus against those codebooks would produce. Quantization
    // quality for the appended half degrades gracefully (its vectors
    // never influenced the centroids) — exactly the trade the
    // pattern accepts until the next rebuild, and the search output
    // prices it in identically on both engines.
    Q(
      "b8_ann_index_append", ivfPqAppendSql
    ) { (spark, dir) =>
      val e = CacheScope.cacheEager(vectors(spark, dir))
      // bounded: one scalar — the corpus midpoint the oracle restates
      val half = e.count() / 2
      val built = AnnIndex.build(e.filter(col("vec_id") < half))
      val path = graft.streaming.TempWork.dir("graft_b8_annidx")
      AnnIndex.save(spark, built, path)
      val loaded = AnnIndex.load(spark, path)
      AnnIndex.append(spark, loaded, e.filter(col("vec_id") >= half), path)
      val merged = AnnIndex.load(spark, path)
      AnnIndex.searchTop5(merged, e, 20)
    },

    // S14 — STREAMING INDEX INGESTION: b8's encode-and-append arriving
    // through Structured Streaming. The index is built and persisted
    // from the first half of the corpus; the second half lands as
    // parquet files consumed by a file-source stream whose foreachBatch
    // codes each micro-batch with the LOADED codebooks and appends to
    // the artifact — the continuously-growing vector index every
    // retrieval deployment runs (new embeddings stream in, codebooks
    // stay versioned until the next rebuild). The search over the
    // merged artifact gates against b8's VERBATIM oracle: however the
    // appends were micro-batched, the final index must equal the batch
    // one — chunking-independence, the s11 upsert contract applied to
    // index artifacts — and the run is REPLAY-BEARING: an injected
    // post-commit crash forces the engine to re-deliver an epoch,
    // which the idempotent append must skip (details at the run
    // body's comment below).
    Q(
      "s14_stream_index_append", ivfPqAppendSql
    ) { (spark, dir) =>
      val e = CacheScope.cacheEager(vectors(spark, dir))
      val half = e.count() / 2
      val built = AnnIndex.build(e.filter(col("vec_id") < half))
      val path = graft.streaming.TempWork.dir("graft_s14_annidx")
      AnnIndex.save(spark, built, path)
      val loaded = AnnIndex.load(spark, path)
      val in = graft.streaming.TempWork.dir("graft_s14_in")
      val ckpt = graft.streaming.TempWork.dir("graft_s14_ck")
      e.filter(col("vec_id") >= half)
        .repartition(2).write.mode("append").parquet(in)
      // Child session: narrowed shuffle width for the tiny stream
      // (the s5 pattern); the parent session's conf is untouched.
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      // maxFilesPerTrigger=1 FORCES one append job per file — the
      // gated run really executes MULTIPLE micro-batch appends, so
      // the chunking-independence the oracle checks is exercised,
      // not assumed (2 files → 2 triggers → 2 appends).
      def stream = ss.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", "1").parquet(in)
      // REPLAY-BEARING (round-8 VERDICT task 4): the append is the
      // IDEMPOTENT form (AnnIndex.appendIdempotent — since round 10 a
      // STAGED ATOMIC COMMIT: the batch lands as one renamed
      // `batch-{id}` directory, with the per-epoch marker as the
      // compaction-surviving ledger), and this run PROVES it by
      // really crashing and replaying through the engine: foreachBatch
      // throws an injected failure AFTER epoch 1's commit+marker
      // completed but BEFORE returning, so the engine never records
      // that epoch; the restarted query (SAME checkpoint — epoch ids
      // are stable because they come from the WAL offset log, which
      // is also why a fresh-checkpoint "replay" would be unsound to
      // skip on) re-delivers the SAME micro-batch with the SAME epoch
      // id, the skip fires (marker or committed directory — either is
      // durable evidence), and the search hash-matches the batch
      // oracle. An unconditional append would double-code the
      // replayed batch and fail the gate (duplicate candidates shift
      // the top-5 ranks). A crash INSIDE the staging write leaves an
      // invisible partial stage the replay overwrites — at-least-once
      // within staging, exactly-once across committed batches; the
      // crash BETWEEN commit and marker is s16's gated scenario.
      val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
      def run(injectCrash: Boolean): Unit = {
        val q = stream.writeStream
          .foreachBatch { (batch: DataFrame, epochId: Long) =>
            AnnIndex.appendIdempotent(
              batch.sparkSession, loaded, batch, path, epochId)
            if (injectCrash && epochId == 1 && crashed.compareAndSet(false, true))
              throw new RuntimeException(
                "injected post-commit crash (s14 replay proof)")
          }
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
        try q.processAllAvailable()
        catch {
          case _: org.apache.spark.sql.streaming.StreamingQueryException => ()
        } finally if (q.isActive) q.stop()
      }
      try {
        run(injectCrash = true)   // crashes after epoch 1's append
        run(injectCrash = false)  // engine replays epoch 1; marker skips it
      } finally {
        graft.streaming.TempWork.delete(in)
        graft.streaming.TempWork.delete(ckpt)
      }
      AnnIndex.searchTop5(AnnIndex.load(spark, path), e, 20)
    },

    // B10 — INDEX COMPACTION: the OPTIMIZE maintenance pass for the
    // persisted index. b8/s14 grow the codes artifact by appending
    // one file set per batch; left alone, an ingesting deployment
    // accumulates exactly the small-file fragmentation b6 compacts
    // away on tables — and appends interleave cells across files, so
    // the (cell, vec_id) clustering the base write established (and
    // cell-pruned searches exploit as contiguous row-group runs)
    // erodes. AnnIndex.compact rewrites the codes into measured-bytes
    // bin-packed files hash-clustered by cell into a NEW artifact
    // generation (pointer-swap deployment). The gate is b8's VERBATIM
    // oracle: a search over the compacted index must hash-match the
    // search over the fragmented one — compaction is a pure layout
    // change, no row gained/lost/recoded. AnnIndexSpec pins the
    // layout contract itself (file count, clustering, row identity).
    Q(
      "b10_ann_index_compact", ivfPqAppendSql
    ) { (spark, dir) =>
      val e = CacheScope.cacheEager(vectors(spark, dir))
      val half = e.count() / 2
      val built = AnnIndex.build(e.filter(col("vec_id") < half))
      val path = graft.streaming.TempWork.dir("graft_b10_annidx")
      AnnIndex.save(spark, built, path)
      val loaded = AnnIndex.load(spark, path)
      AnnIndex.append(spark, loaded, e.filter(col("vec_id") >= half), path)
      val compacted = graft.streaming.TempWork.dir("graft_b10_compact")
      AnnIndex.compact(spark, path, compacted)
      AnnIndex.searchTop5(AnnIndex.load(spark, compacted), e, 20)
    },

    // B11 — INDEX DELETES (round-8 VERDICT task 3: "the persisted
    // index grows and compacts but cannot forget"). The full artifact
    // lifecycle in one gated chain: build on the first half, append
    // the second, then DELETE every vec_id % 10 = 3 (takedowns /
    // dedup-then-reindex removals) and COMPACT. Deletes are tombstones
    // (AnnIndex.delete): a bounded id-only artifact appended next to
    // the codes, never rewriting them — the Delta/Iceberg delete-file
    // pattern, because a per-takedown rewrite of a 100 TB codes
    // artifact is a full table write. AnnIndex.load anti-joins the
    // tombstone set out (a broadcast of bare ids), so a masked search
    // stops serving deleted vectors the moment the tombstone lands;
    // compact makes the delete physical and starts the new generation
    // tombstone-free (AnnIndexSpec pins masked == compacted and the
    // physical absence of tombstoned rows). The oracle replays the
    // half-corpus training and searches ONLY the surviving set — on
    // both the query side (deleted ids in the first-20 range stop
    // being queries) and the corpus side. Codebooks are deliberately
    // NOT retrained on the survivors: a takedown must stop a vector
    // from being SERVED immediately; quantizer refresh waits for the
    // next rebuild, and the gate prices that in identically on both
    // engines.
    Q(
      "b11_ann_index_delete", ivfPqDeleteSql
    ) { (spark, dir) =>
      val e = CacheScope.cacheEager(vectors(spark, dir))
      val half = e.count() / 2
      val built = AnnIndex.build(e.filter(col("vec_id") < half))
      val path = graft.streaming.TempWork.dir("graft_b11_annidx")
      AnnIndex.save(spark, built, path)
      val loaded = AnnIndex.load(spark, path)
      AnnIndex.append(spark, loaded, e.filter(col("vec_id") >= half), path)
      AnnIndex.delete(spark, e.filter(col("vec_id") % 10 === 3), path)
      val compacted = graft.streaming.TempWork.dir("graft_b11_compact")
      AnnIndex.compact(spark, path, compacted)
      AnnIndex.searchTop5(AnnIndex.load(spark, compacted),
        e.filter(col("vec_id") % 10 =!= 3), 20)
    },

    // B25 — SHARD MERGE: two ingest pipelines encode against the SAME
    // published codebook generation (trained once on the first half of
    // the corpus) and land separate artifacts partitioned by vec_id
    // parity; a takedown list (vec_id % 10 = 3) is broadcast to BOTH
    // shards — landing as a tombstone on each, though the targeted
    // rows physically live only in the odd shard — and
    // AnnIndex.mergeShards consolidates the two into one fresh
    // serving generation (codebook-parity-checked, id-disjointness-
    // checked, per-shard tombstones applied during the rewrite, no
    // epoch ledger carried — per-pipeline epoch counters would collide
    // in one ledger, so neither source stream may resume into the
    // merge). The search over the merged artifact gates against b11's
    // VERBATIM oracle: however the corpus was sharded, the merged
    // index must equal the single-pipeline build+append+delete one —
    // the sharding-independence contract, s14's chunking-independence
    // applied across ARTIFACTS instead of across micro-batches.
    Q(
      "b25_ann_index_shard_merge", ivfPqDeleteSql
    ) { (spark, dir) =>
      val e = CacheScope.cacheEager(vectors(spark, dir))
      val half = e.count() / 2
      val built = AnnIndex.build(e.filter(col("vec_id") < half))
      val pa = graft.streaming.TempWork.dir("graft_b25_shard_a")
      val pb = graft.streaming.TempWork.dir("graft_b25_shard_b")
      AnnIndex.save(spark, built.copy(codes = AnnIndex.encode(
        e.filter(col("vec_id") % 2 === 0), built.coarse, built.pq)), pa)
      AnnIndex.save(spark, built.copy(codes = AnnIndex.encode(
        e.filter(col("vec_id") % 2 === 1), built.coarse, built.pq)), pb)
      val takedown = e.filter(col("vec_id") % 10 === 3).select("vec_id")
      AnnIndex.delete(spark, takedown, pa)
      AnnIndex.delete(spark, takedown, pb)
      val merged = graft.streaming.TempWork.dir("graft_b25_merged")
      AnnIndex.mergeShards(spark, pa, pb, merged)
      AnnIndex.searchTop5(AnnIndex.load(spark, merged),
        e.filter(col("vec_id") % 10 =!= 3), 20)
    },

    // B12 — the MASKED serve path: b11's lifecycle up to the delete,
    // searched WITHOUT compacting — the state a production index is
    // in between a takedown and the next OPTIMIZE pass, when deleted
    // vectors must already be unservable but the codes artifact still
    // physically holds them. AnnIndex.load anti-joins the (bounded,
    // id-only, broadcast) tombstone set out of the codes scan, so the
    // search sees exactly the surviving set. The gate is b11's
    // VERBATIM oracle: masked-before-compact and physical-after-
    // compact must be the same answer — the two halves of the
    // tombstone contract, each hash-gated on its own row (AnnIndexSpec
    // additionally pins their row-identity and the compacted
    // artifact's physical exclusion). Scale shape: identical to b7's
    // serve path plus one broadcast anti-join whose build side is the
    // tombstone id set — bounded by deletes, not by the corpus.
    Q(
      "b12_ann_index_masked_search", ivfPqDeleteSql
    ) { (spark, dir) =>
      val e = CacheScope.cacheEager(vectors(spark, dir))
      val half = e.count() / 2
      val built = AnnIndex.build(e.filter(col("vec_id") < half))
      val path = graft.streaming.TempWork.dir("graft_b12_annidx")
      AnnIndex.save(spark, built, path)
      val loaded = AnnIndex.load(spark, path)
      AnnIndex.append(spark, loaded, e.filter(col("vec_id") >= half), path)
      AnnIndex.delete(spark, e.filter(col("vec_id") % 10 === 3), path)
      AnnIndex.searchTop5(AnnIndex.load(spark, path),
        e.filter(col("vec_id") % 10 =!= 3), 20)
    },

    // B16 — SNAPSHOT-PINNED READS (time travel): the b-family's
    // lifecycle mutations (append/delete/compact) are all append-only
    // at the FILE level — new code files, new tombstone files, new
    // generation directories; nothing rewrites in place — which is
    // exactly the invariant that makes versioned manifests free
    // (Delta/Iceberg's core move). AnnIndex.snapshot commits the
    // artifact's current file sets as a numbered manifest after each
    // mutation; AnnIndex.loadAt reads the index AS OF a version —
    // code files added later are invisible, tombstones written later
    // do not mask. The chain here: build+save on the first half
    // (v1), append the second half (v2), tombstone every
    // vec_id % 10 = 3 (v3) — and then the gated search reads the
    // index PINNED AT v2. The oracle is b8's VERBATIM append oracle:
    // the v2 read must serve the full pre-delete corpus, deleted ids
    // and all, even though the artifact's CURRENT state (b12's gated
    // masked serve) no longer would. That is the capability a
    // directory read structurally cannot provide: takedown audits
    // ("what did retrieval serve before the delete batch?"),
    // bit-reproducible evaluation runs against a pinned index, and
    // rollback after a bad append — each just a loadAt at the right
    // version. SCALE SHAPE: a snapshot commit is one bounded
    // listStatus + a file-count-sized manifest write; loadAt adds one
    // bounded manifest collect (file NAMES, never data) before the
    // same distributed pinned-file scans b7's serve path runs — cost
    // tracks manifest length, not the corpus, at any scale.
    Q(
      "b16_index_time_travel", ivfPqAppendSql
    ) { (spark, dir) =>
      val e = CacheScope.cacheEager(vectors(spark, dir))
      val half = e.count() / 2
      val built = AnnIndex.build(e.filter(col("vec_id") < half))
      val path = graft.streaming.TempWork.dir("graft_b16_annidx")
      AnnIndex.save(spark, built, path)
      AnnIndex.snapshot(spark, path, 1)
      val loaded = AnnIndex.load(spark, path)
      AnnIndex.append(spark, loaded, e.filter(col("vec_id") >= half), path)
      AnnIndex.snapshot(spark, path, 2)
      AnnIndex.delete(spark, e.filter(col("vec_id") % 10 === 3), path)
      AnnIndex.snapshot(spark, path, 3)
      // pinned read at v2: pre-delete corpus, post-append — must
      // hash-match b8's oracle although the artifact has moved on
      AnnIndex.searchTop5(AnnIndex.loadAt(spark, path, 2), e, 20)
    },

    // B17 — ARTIFACT RELOCATION under pinned reads: b16's snapshot
    // chain (build+save v1, append v2, delete v3), then the WHOLE
    // artifact directory is MOVED — one atomic rename, the pointer-
    // swap every generation deployment performs (compact lands a new
    // generation, the serving pointer advances, the old directory is
    // eventually re-homed or archived) — and the gated search reads
    // the index pinned at v2 FROM THE NEW LOCATION. This is the row
    // ADVICE r9 demanded: snapshot manifests used to record ABSOLUTE
    // file URIs, so every pinned version died with its original
    // directory; manifests now store artifact-root-RELATIVE paths that
    // loadAt resolves against wherever the artifact lives today. The
    // gate is honest by construction — the old path is GONE after the
    // rename (nothing to fall back to), and the oracle is b8's
    // VERBATIM append oracle, so the moved artifact must serve the
    // full pre-delete corpus bit-for-bit. SCALE SHAPE: the move is one
    // directory rename (metadata-only on HDFS; a manifest pointer
    // update on object stores) — cost independent of artifact size —
    // and the pinned read is b16's: one bounded manifest collect, then
    // b7's distributed serve scans.
    Q(
      "b17_index_relocate", ivfPqAppendSql
    ) { (spark, dir) =>
      val e = CacheScope.cacheEager(vectors(spark, dir))
      val half = e.count() / 2
      val built = AnnIndex.build(e.filter(col("vec_id") < half))
      val root = graft.streaming.TempWork.dir("graft_b17_annidx")
      val path = s"$root/gen0"
      AnnIndex.save(spark, built, path)
      AnnIndex.snapshot(spark, path, 1)
      val loaded = AnnIndex.load(spark, path)
      AnnIndex.append(spark, loaded, e.filter(col("vec_id") >= half), path)
      AnnIndex.snapshot(spark, path, 2)
      AnnIndex.delete(spark, e.filter(col("vec_id") % 10 === 3), path)
      AnnIndex.snapshot(spark, path, 3)
      // the pointer swap: relocate the artifact, old path ceases to exist
      val moved = s"$root/gen0-rehomed"
      graft.core.Fs.rename(spark, path, moved)
      AnnIndex.searchTop5(AnnIndex.loadAt(spark, moved, 2), e, 20)
    },

    // B18 — the CELL-PARTITIONED serve layout: b8's grown artifact
    // compacted into one `cell=N/` partition directory per coarse cell
    // (AnnIndex.compactPartitioned) and searched through
    // loadPartitioned — the "production variant" the AnnIndex header
    // promises for large K. Against the flat layout a cell-pruned
    // search still opens every file and relies on row-group skipping;
    // against this one Spark plans DYNAMIC PARTITION PRUNING — the
    // broadcast query side's cell set becomes a runtime partition
    // filter, so only the probed cells' directories are ever read
    // (the scan's PartitionFilters carries `dynamicpruning#...` —
    // PLANS.md dumps it). The partition column round-trips as LONG by
    // declared read schema, not directory-name inference, both for
    // schema fidelity and because a cast above the scan would defeat
    // DPP. The gate is b8's VERBATIM oracle: partitioning is a pure
    // layout change — not a row gained, lost, or recoded (AnnIndexSpec
    // additionally pins directory count == occupied cells and
    // row-identity across layouts). SCALE SHAPE: at K = scaledK(n)
    // each cell holds ~sqrt(n) vectors, so one file per cell is the
    // RIGHT shape once cells are row-group-sized (n ≳ 10^8) — below
    // that flat row-group locality wins, which is why this is a
    // compaction TARGET, not the default save shape; a 20-query probe
    // at nprobe=1 then reads ≤ 20 directories of a 10k-directory
    // layout instead of every footer in the corpus.
    Q(
      "b18_cell_partitioned_search", ivfPqAppendSql
    ) { (spark, dir) =>
      val e = CacheScope.cacheEager(vectors(spark, dir))
      val half = e.count() / 2
      val built = AnnIndex.build(e.filter(col("vec_id") < half))
      val path = graft.streaming.TempWork.dir("graft_b18_annidx")
      AnnIndex.save(spark, built, path)
      val loaded = AnnIndex.load(spark, path)
      AnnIndex.append(spark, loaded, e.filter(col("vec_id") >= half), path)
      val served = graft.streaming.TempWork.dir("graft_b18_part")
      AnnIndex.compactPartitioned(spark, path, served)
      AnnIndex.searchTop5(AnnIndex.loadPartitioned(spark, served), e, 20)
    },

    // B19 — ROLLBACK: the restore side of the snapshot layer. b16/b17
    // prove a pinned READ of history; this row proves history can be
    // made CURRENT again — the recovery move after a bad batch. The
    // chain: build+save v1, append the second half v2, then the
    // incident — a mis-encoded junk batch (the whole corpus re-coded
    // under shifted vec_ids; its duplicate codes land in the same
    // cells and visibly corrupt every top-5 through sim ties) AND an
    // over-broad tombstone delete — snapshotted as v3. rollback(2)
    // physically deletes every data file no manifest ≤ v2 references
    // (files compared in the manifest's own root-relative
    // coordinates), drops the v3 manifest, and removes the emptied
    // tombstone artifact — after which a plain DIRECTORY load (NOT
    // loadAt) serves exactly the v2 state, gated against b8's
    // VERBATIM oracle. Append-only mutation is why file-set
    // subtraction restores bit-exact state: nothing v2 referenced was
    // ever rewritten. SCALE SHAPE: one bounded manifest collect per
    // retained version + one recursive listing + per-file deletes —
    // tracks file count, never data volume; the junk batch's cost in
    // this row is the encode+append itself (corpus-linear, same as
    // b8), and the rollback undoes it in metadata time.
    Q(
      "b19_index_rollback", ivfPqAppendSql
    ) { (spark, dir) =>
      val e = CacheScope.cacheEager(vectors(spark, dir))
      val half = e.count() / 2
      val built = AnnIndex.build(e.filter(col("vec_id") < half))
      val path = graft.streaming.TempWork.dir("graft_b19_annidx")
      AnnIndex.save(spark, built, path)
      AnnIndex.snapshot(spark, path, 1)
      val loaded = AnnIndex.load(spark, path)
      AnnIndex.append(spark, loaded, e.filter(col("vec_id") >= half), path)
      AnnIndex.snapshot(spark, path, 2)
      // the incident: a junk append (shifted ids → duplicate codes in
      // every cell) and an over-broad delete, committed as v3
      AnnIndex.append(spark, loaded,
        e.withColumn("vec_id", col("vec_id") + lit(1048576L)), path)
      AnnIndex.delete(spark, e.filter(col("vec_id") % 10 === 3), path)
      AnnIndex.snapshot(spark, path, 3)
      AnnIndex.rollback(spark, path, 2)
      // a plain directory read must now BE the v2 state
      AnnIndex.searchTop5(AnnIndex.load(spark, path), e, 20)
    },

    // B22 — SNAPSHOT RETENTION (vacuum): rollback forgets the FUTURE
    // of a version; expire forgets the PAST. Unbounded time-travel
    // history is untenable at 100 TB — every retained version pins its
    // file set against reclamation — so a deployment expires all but
    // the last N versions, exactly Delta VACUUM / Iceberg
    // expire_snapshots. The chain is b16's (build+save v1, append v2,
    // delete v3), then expire(keepLast = 2): v1's manifest is dropped
    // — loadAt(1) is gone for good — while the gated search reads the
    // index PINNED AT THE RETAINED v2 against b8's VERBATIM append
    // oracle: expiring history must be invisible to every retained
    // pinned read AND to the current state. File reclamation is
    // rollback's file-set subtraction generalized ("referenced by an
    // expired manifest and no retained one"); under append-only
    // mutation that exclusive set is empty — newer manifests are
    // supersets — so this row also proves expire deletes NO data file
    // a retained version needs (AnnIndexSpec pins the file-level
    // contract, including the subtraction actually firing on a
    // history with out-of-band removals). SCALE SHAPE: one bounded
    // manifest collect per version + per-file deletes — tracks
    // manifest length, never data volume.
    Q(
      "b22_index_expire", ivfPqAppendSql
    ) { (spark, dir) =>
      val e = CacheScope.cacheEager(vectors(spark, dir))
      val half = e.count() / 2
      val built = AnnIndex.build(e.filter(col("vec_id") < half))
      val path = graft.streaming.TempWork.dir("graft_b22_annidx")
      AnnIndex.save(spark, built, path)
      AnnIndex.snapshot(spark, path, 1)
      val loaded = AnnIndex.load(spark, path)
      AnnIndex.append(spark, loaded, e.filter(col("vec_id") >= half), path)
      AnnIndex.snapshot(spark, path, 2)
      AnnIndex.delete(spark, e.filter(col("vec_id") % 10 === 3), path)
      AnnIndex.snapshot(spark, path, 3)
      AnnIndex.expire(spark, path, keepLast = 2)
      // the retained pinned read serves the full pre-delete corpus,
      // bit-for-bit, although v1's history is forgotten
      AnnIndex.searchTop5(AnnIndex.loadAt(spark, path, 2), e, 20)
    },

    // X37 — nprobe as the DECLARED recall/cost dial (VERDICT r6
    // stretch): the same jointly-trained IVF-PQ index as x33, searched
    // at nprobe=1 AND nprobe=4, scored against the exact brute-force
    // top-5 ground truth — one gated row per query reporting the
    // candidate count (the COST side) and the ground-truth hits in the
    // ADC top-5 (the RECALL side) at both settings, plus the delta.
    // This is the dial a real IVF deployment tunes: more probed cells
    // = more candidates scanned = higher recall, and the row makes
    // the trade measurable instead of asserted. MEASURED at sf0.01:
    // candidates grow ~4x (≈30 → ≈130 per query) while per-query
    // hit deltas land in {-1, 0, +1} — the negative cases are ADC
    // approximation noise (extra candidates ranked by RECONSTRUCTED
    // similarity can displace a true neighbor from the fixed top-5),
    // which is precisely why deployments pair nprobe increases with
    // exact re-ranking of the ADC shortlist; NprobePipelineSpec pins
    // the superset/bounds invariants and documents the non-monotone
    // possibility. Output is ALL exact
    // integers (counts and set intersections — no float column), so
    // the hash gate is immune to rounding concerns; the r4-rounded
    // ADC cosine is used only for RANKING, identically in both
    // engines. SCALE SHAPE: identical to x33 (3 joint training scans,
    // cell-keyed candidate join, 2-byte scanned code width) — the
    // query side just explodes to nprobe keyed probe rows, and the
    // ground-truth pass is l3's broadcast-20-queries linear scan (the
    // recall AUDIT a deployment runs on a sample, not on every query).
    Q(
      "x37_ivf_nprobe", {
        val sub = (0 until 4).map { m =>
          s"s${m}e AS (SELECT vec_id, v[${m * 16 + 1}:${(m + 1) * 16}] AS v FROM e),\n" +
            KMeans.oracleCtes(s"s${m}e", 16, s"s$m")
        }.mkString(",\n")
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |${KMeans.scaledKSql("e")},
           |${KMeans.oracleCtes("e", 64, "", "(SELECT k FROM kk)")},
           |$sub,
           |rec AS (SELECT a.vec_id, a.cell,
           |    flatten([b0.cv, b1.cv, b2.cv, b3.cv]) AS rv
           |  FROM af a
           |  JOIN s0af a0 ON a0.vec_id = a.vec_id JOIN s0c${KMeans.Iters} b0 ON b0.cid = a0.cell
           |  JOIN s1af a1 ON a1.vec_id = a.vec_id JOIN s1c${KMeans.Iters} b1 ON b1.cid = a1.cell
           |  JOIN s2af a2 ON a2.vec_id = a.vec_id JOIN s2c${KMeans.Iters} b2 ON b2.cid = a2.cell
           |  JOIN s3af a3 ON a3.vec_id = a.vec_id JOIN s3c${KMeans.Iters} b3 ON b3.cid = a3.cell),
           |qp AS (SELECT vec_id AS qid, cid AS pcell, rk AS pi FROM (
           |    SELECT e.vec_id, c.cid,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY (list_dot_product(c.cv, c.cv) - 2 * list_dot_product(e.v, c.cv)), c.cid) AS rk
           |    FROM e CROSS JOIN c${KMeans.Iters} c WHERE e.vec_id < 20) t
           |  WHERE rk <= 4),
           |cand AS (SELECT q.qid, q.pi, r.vec_id AS nid,
           |    round(list_dot_product(qe.v, r.rv)
           |      / (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(r.rv, r.rv))), 4) AS sim
           |  FROM qp q JOIN e qe ON qe.vec_id = q.qid
           |  JOIN rec r ON r.cell = q.pcell AND r.vec_id <> q.qid),
           |t1 AS (SELECT qid, nid FROM (SELECT qid, nid,
           |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
           |  FROM cand WHERE pi = 1) WHERE rn <= 5),
           |t4 AS (SELECT qid, nid FROM (SELECT qid, nid,
           |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
           |  FROM cand) WHERE rn <= 5),
           |ex AS (SELECT qid, nid FROM (SELECT q.vec_id AS qid, x.vec_id AS nid,
           |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
           |      round(list_dot_product(q.v, x.v)
           |        / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(x.v, x.v))), 4) DESC,
           |      x.vec_id) AS rn
           |  FROM e q JOIN e x ON x.vec_id <> q.vec_id WHERE q.vec_id < 20) WHERE rn <= 5),
           |cc AS (SELECT qid,
           |    CAST(SUM(CASE WHEN pi = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cands_p1,
           |    CAST(COUNT(*) AS BIGINT) AS cands_p4 FROM cand GROUP BY qid),
           |h1 AS (SELECT t1.qid, CAST(COUNT(*) AS BIGINT) AS hits
           |  FROM t1 JOIN ex ON ex.qid = t1.qid AND ex.nid = t1.nid GROUP BY t1.qid),
           |h4 AS (SELECT t4.qid, CAST(COUNT(*) AS BIGINT) AS hits
           |  FROM t4 JOIN ex ON ex.qid = t4.qid AND ex.nid = t4.nid GROUP BY t4.qid),
           |base AS (SELECT vec_id AS qid FROM e WHERE vec_id < 20)
           |SELECT base.qid,
           |  COALESCE(cc.cands_p1, 0) AS cands_p1, COALESCE(cc.cands_p4, 0) AS cands_p4,
           |  COALESCE(h1.hits, 0) AS hits_p1, COALESCE(h4.hits, 0) AS hits_p4,
           |  COALESCE(h4.hits, 0) - COALESCE(h1.hits, 0) AS recall_gain
           |FROM base LEFT JOIN cc ON cc.qid = base.qid
           |  LEFT JOIN h1 ON h1.qid = base.qid LEFT JOIN h4 ON h4.qid = base.qid
           |ORDER BY base.qid""".stripMargin
      }
    ) { (spark, dir) =>
      val e = CacheScope.cacheEager(
        vectors(spark, dir).withColumn("nrm", l2norm(col("v"))))
      // Coarse capacity tracks the corpus (K² >= n — the count is free,
      // e was just eagerly materialized); PQ stays at 16 codes/subspace
      // (compression width). Oracle restates K via the kk CTE.
      val n = e.count()
      val (coarse, pq) = KMeans.trainJoint(KMeans.trainingSet(
        e.select(col("vec_id"), col("v")), n), 4, 16, KMeans.scaledK(n))
      val rv = concat((0 until 4).map { m =>
        element_at(typedLit(pq(m).map(_.toSeq)),
          (KMeans.assignCell(slice(col("v"), m * 16 + 1, 16), pq(m)) + 1).cast("int"))
      }: _*)
      // cacheEager: enc fans out to the probe-side scan and the
      // query side (same shape as x33).
      val enc = CacheScope.cacheEager(e.select(col("vec_id"), col("v"), col("nrm"),
        KMeans.assignCell(col("v"), coarse).as("cell"), rv.as("rv")))
      // Query side: each of the 20 queries explodes to its 4 nearest
      // cells, pi = 1-based probe rank (pi=1 IS x33's nprobe=1 cell —
      // assignCells' (score, cid) tie rule matches assignCell).
      val qprobes = enc.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
          posexplode(KMeans.assignCells(col("v"), coarse, 4)).as(Seq("pi0", "pcell")))
        .withColumn("pi", (col("pi0") + 1).cast("long")).drop("pi0")
      val x = enc.select(col("vec_id").as("nid"), col("rv").as("xv"),
        col("cell").as("xcell"))
      // Each (qid, nid) meets at most once per probe (a data vector
      // lives in exactly one cell), so no distinct() is needed.
      val cand = CacheScope.cacheEager(broadcast(qprobes)
        .join(x, col("pcell") === col("xcell") && col("qid") =!= col("nid"))
        .select(col("qid"), col("pi"), col("nid"),
          r4(dot(col("qv"), col("xv")) / (col("qn") * l2norm(col("xv")))).as("sim")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("sim").desc, col("nid"))
      val t1 = cand.filter(col("pi") === 1)
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select("qid", "nid")
      val t4 = cand
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select("qid", "nid")
      // Ground truth: l3's broadcast linear scan over the RAW vectors.
      val q20 = e.filter(col("vec_id") < 20).toDF("eqid", "eqv", "eqn")
      val ex = broadcast(q20)
        .join(e.toDF("nid", "xv2", "xn2"), col("eqid") =!= col("nid"))
        .select(col("eqid").as("qid"), col("nid"),
          r4(dot(col("eqv"), col("xv2")) / (col("eqn") * col("xn2"))).as("sim"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select("qid", "nid")
      val cc = cand.groupBy("qid").agg(
        sum(when(col("pi") === 1, 1L).otherwise(0L)).as("cands_p1"),
        count(lit(1)).as("cands_p4"))
      val h1 = t1.join(ex, Seq("qid", "nid")).groupBy("qid")
        .agg(count(lit(1)).as("hits_p1"))
      val h4 = t4.join(ex, Seq("qid", "nid")).groupBy("qid")
        .agg(count(lit(1)).as("hits_p4"))
      e.filter(col("vec_id") < 20).select(col("vec_id").as("qid"))
        .join(cc, Seq("qid"), "left").join(h1, Seq("qid"), "left")
        .join(h4, Seq("qid"), "left")
        .select(col("qid"),
          coalesce(col("cands_p1"), lit(0L)).as("cands_p1"),
          coalesce(col("cands_p4"), lit(0L)).as("cands_p4"),
          coalesce(col("hits_p1"), lit(0L)).as("hits_p1"),
          coalesce(col("hits_p4"), lit(0L)).as("hits_p4"),
          (coalesce(col("hits_p4"), lit(0L)) - coalesce(col("hits_p1"), lit(0L)))
            .as("recall_gain"))
        .orderBy("qid")
    },

    // X47 — two-stage retrieval: PQ shortlist, exact re-rank — the
    // deployment pattern x37's measurement motivates (its negative
    // recall deltas are ADC approximation displacing true neighbors;
    // the standard fix is to over-fetch by ADC and re-rank the
    // shortlist by TRUE distance). Stage 1 is x37's nprobe=4 ADC
    // search kept to a top-20 shortlist per query; stage 2 recomputes
    // exact cosine on the shortlist's RAW vectors and emits the top 5.
    // SCALE SHAPE: stage 1 is x33's (3 joint training scans, cell-
    // keyed candidate join, 2-byte scanned code width); stage 2
    // touches exactly 20 raw vectors per query — an id-keyed join
    // whose cost is O(queries * shortlist), independent of corpus
    // size. This is the piece that makes aggressive PQ compression
    // safe: approximation error only has to keep the true top-5
    // inside the top-20, not rank it.
    Q(
      "x47_pq_rerank", {
        val sub = (0 until 4).map { m =>
          s"s${m}e AS (SELECT vec_id, v[${m * 16 + 1}:${(m + 1) * 16}] AS v FROM e),\n" +
            KMeans.oracleCtes(s"s${m}e", 16, s"s$m")
        }.mkString(",\n")
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |${KMeans.scaledKSql("e")},
           |${KMeans.oracleCtes("e", 64, "", "(SELECT k FROM kk)")},
           |$sub,
           |rec AS (SELECT a.vec_id, a.cell,
           |    flatten([b0.cv, b1.cv, b2.cv, b3.cv]) AS rv
           |  FROM af a
           |  JOIN s0af a0 ON a0.vec_id = a.vec_id JOIN s0c${KMeans.Iters} b0 ON b0.cid = a0.cell
           |  JOIN s1af a1 ON a1.vec_id = a.vec_id JOIN s1c${KMeans.Iters} b1 ON b1.cid = a1.cell
           |  JOIN s2af a2 ON a2.vec_id = a.vec_id JOIN s2c${KMeans.Iters} b2 ON b2.cid = a2.cell
           |  JOIN s3af a3 ON a3.vec_id = a.vec_id JOIN s3c${KMeans.Iters} b3 ON b3.cid = a3.cell),
           |qp AS (SELECT vec_id AS qid, cid AS pcell FROM (
           |    SELECT e.vec_id, c.cid,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY (list_dot_product(c.cv, c.cv) - 2 * list_dot_product(e.v, c.cv)), c.cid) AS rk
           |    FROM e CROSS JOIN c${KMeans.Iters} c WHERE e.vec_id < 20) t
           |  WHERE rk <= 4),
           |cand AS (SELECT q.qid, r.vec_id AS nid,
           |    round(list_dot_product(qe.v, r.rv)
           |      / (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(r.rv, r.rv))), 4) AS adc
           |  FROM qp q JOIN e qe ON qe.vec_id = q.qid
           |  JOIN rec r ON r.cell = q.pcell AND r.vec_id <> q.qid),
           |sl AS (SELECT qid, nid FROM (SELECT qid, nid,
           |    row_number() OVER (PARTITION BY qid ORDER BY adc DESC, nid) AS rn
           |  FROM cand) WHERE rn <= 20),
           |rr AS (SELECT sl.qid, sl.nid,
           |    round(list_dot_product(q.v, x.v)
           |      / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(x.v, x.v))), 4) AS sim
           |  FROM sl JOIN e q ON q.vec_id = sl.qid JOIN e x ON x.vec_id = sl.nid),
           |f AS (SELECT qid, nid, sim,
           |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn FROM rr)
           |SELECT qid, nid, sim, rn FROM f WHERE rn <= 5 ORDER BY qid, rn""".stripMargin
      }
    ) { (spark, dir) =>
      val e = CacheScope.cacheEager(
        vectors(spark, dir).withColumn("nrm", l2norm(col("v"))))
      // Coarse capacity tracks the corpus (K² >= n — the count is free,
      // e was just eagerly materialized); PQ stays at 16 codes/subspace
      // (compression width). Oracle restates K via the kk CTE.
      val n = e.count()
      val (coarse, pq) = KMeans.trainJoint(KMeans.trainingSet(
        e.select(col("vec_id"), col("v")), n), 4, 16, KMeans.scaledK(n))
      val rv = concat((0 until 4).map { m =>
        element_at(typedLit(pq(m).map(_.toSeq)),
          (KMeans.assignCell(slice(col("v"), m * 16 + 1, 16), pq(m)) + 1).cast("int"))
      }: _*)
      // cacheEager: enc fans out to the probe-side scan and the query
      // side (same shape as x33/x37 — ADVICE r6's fan-out rule).
      val enc = CacheScope.cacheEager(e.select(col("vec_id"), col("v"), col("nrm"),
        KMeans.assignCell(col("v"), coarse).as("cell"), rv.as("rv")))
      val qprobes = enc.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
          explode(KMeans.assignCells(col("v"), coarse, 4)).as("pcell"))
      val x = enc.select(col("vec_id").as("nid"), col("rv").as("xv"),
        col("cell").as("xcell"))
      // Stage 1: ADC scoring against RECONSTRUCTED vectors, top-20.
      val cand = broadcast(qprobes)
        .join(x, col("pcell") === col("xcell") && col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"),
          r4(dot(col("qv"), col("xv")) / (col("qn") * l2norm(col("xv")))).as("adc"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("adc").desc, col("nid"))
      val sl = cand.withColumn("rn", row_number().over(w)).filter(col("rn") <= 20)
        .select("qid", "nid")
      // Stage 2: exact cosine on the shortlist's RAW vectors, top-5.
      val rq = e.select(col("vec_id").as("rqid"), col("v").as("rqv"), col("nrm").as("rqn"))
      val rx = e.select(col("vec_id").as("rnid"), col("v").as("rxv"), col("nrm").as("rxn"))
      val wf = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("sim").desc, col("nid"))
      sl.join(rq, col("qid") === col("rqid"))
        .join(rx, col("nid") === col("rnid"))
        .select(col("qid"), col("nid"),
          r4(dot(col("rqv"), col("rxv")) / (col("rqn") * col("rxn"))).as("sim"))
        .withColumn("rn", row_number().over(wf).cast("long"))
        .filter(col("rn") <= 5)
        .orderBy("qid", "rn")
    },

    // X62 — EMBEDDING DRIFT monitor: per-dimension distribution stats
    // of the embedding column, split into two slices (labels 0-4 vs
    // 5-9 — standing in for "yesterday's shards vs today's"), in exact
    // integer ten-thousandths. The ML-ops health check every embedding
    // pipeline runs: a model regression or feature-order bug shows up
    // as a per-dim mean/variance shift long before retrieval quality
    // visibly degrades, and the all-integer sums make day-over-day
    // diffs byte-comparable. SHAPE: posexplode → 64-key partial
    // aggregation — combines map-side to 64 rows per partition, one
    // 64-row exchange, zero joins; at 100 TB it is a single scan. The
    // float32→double promotion is explicit on BOTH engines so the
    // ten-thousandth rounding sees the identical IEEE value.
    Q(
      "x62_embedding_drift",
      """WITH v AS (SELECT label,
        |    i - 1 AS dim, CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS v10k
        |  FROM (SELECT label, embedding, unnest(generate_series(1, len(embedding))) AS i
        |        FROM embeddings) u)
        |SELECT dim,
        |  CAST(SUM(CASE WHEN label < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |  CAST(SUM(CASE WHEN label >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |  CAST(SUM(CASE WHEN label < 5 THEN v10k ELSE 0 END) AS BIGINT) AS sum_a,
        |  CAST(SUM(CASE WHEN label >= 5 THEN v10k ELSE 0 END) AS BIGINT) AS sum_b,
        |  CAST(SUM(CASE WHEN label < 5 THEN v10k * v10k ELSE 0 END) AS BIGINT) AS sq_a,
        |  CAST(SUM(CASE WHEN label >= 5 THEN v10k * v10k ELSE 0 END) AS BIGINT) AS sq_b,
        |  min(v10k) AS lo, max(v10k) AS hi
        |FROM v GROUP BY dim ORDER BY dim""".stripMargin
    ) { (spark, dir) =>
      val isA = col("label") < 5
      Tables.fanOut(Tables(spark, dir, "embeddings"))
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "f")))
        .select(col("label"), col("dim").cast("long").as("dim"),
          fixed(col("f").cast("double"), 10000L).as("v10k"))
        .groupBy("dim")
        .agg(sum(when(isA, 1L).otherwise(0L)).as("n_a"),
          sum(when(!isA, 1L).otherwise(0L)).as("n_b"),
          sum(when(isA, col("v10k")).otherwise(0L)).as("sum_a"),
          sum(when(!isA, col("v10k")).otherwise(0L)).as("sum_b"),
          sum(when(isA, col("v10k") * col("v10k")).otherwise(0L)).as("sq_a"),
          sum(when(!isA, col("v10k") * col("v10k")).otherwise(0L)).as("sq_b"),
          min("v10k").as("lo"), max("v10k").as("hi"))
        .orderBy("dim")
    },

    // X68 — CLASS-CENTROID OUTLIERS: for every label, the 5 vectors
    // farthest from their class centroid — the standard mislabeled-
    // example / embedding-corruption detector a training pipeline runs
    // over its labeled slices. DIVISION-FREE EXACTNESS: the natural
    // score ‖v − s/n‖² needs a rational centroid, so the query scores
    // n²·‖v − c‖² = Σ_d (n·v_d − s_d)² instead — exact integers over
    // ten-thousandths, same ranking within a label (n is constant per
    // label). Bounds: |n·v_d − s_d| ≤ 2n·10^4 = 10^8 at sf1.0's
    // n = 5,000/label ⇒ each square ≤ 10^16, the 64-dim sum ≤ 6.4·10^17
    // < 2^63; past n ≈ 10^5 a deployment keeps (n, s_d) exact and
    // scores in double — the ranking tolerates 1-ulp noise. SHAPE:
    // per-(label, dim) centroid agg (10 x 64 rows, partial map-side)
    // broadcast back onto the exploded vectors, one per-vec rollup,
    // one tiny top-5 window per label — two bounded exchanges, no
    // corpus-sized join.
    Q(
      "x68_centroid_outliers",
      """WITH v AS (SELECT vec_id, label, i - 1 AS dim,
        |    CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS v10k
        |  FROM (SELECT vec_id, label, embedding,
        |        unnest(generate_series(1, len(embedding))) AS i FROM embeddings) u),
        |c AS (SELECT label, dim, CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(v10k) AS BIGINT) AS s FROM v GROUP BY 1, 2),
        |d AS (SELECT v.vec_id, v.label,
        |    CAST(SUM((c.n * v.v10k - c.s) * (c.n * v.v10k - c.s)) AS BIGINT) AS n2dev2
        |  FROM v JOIN c ON c.label = v.label AND c.dim = v.dim
        |  GROUP BY 1, 2),
        |r AS (SELECT label, vec_id, n2dev2,
        |    row_number() OVER (PARTITION BY label ORDER BY n2dev2 DESC, vec_id) AS rk
        |  FROM d)
        |SELECT CAST(label AS BIGINT) AS label, vec_id, n2dev2, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 5 ORDER BY label, rk""".stripMargin
    ) { (spark, dir) =>
      val v = CacheScope.cacheEager(
        Tables.fanOut(Tables(spark, dir, "embeddings"))
          .select(col("vec_id"), col("label"),
            posexplode(col("embedding")).as(Seq("dim", "f")))
          .select(col("vec_id"), col("label").cast("long").as("label"),
            col("dim").cast("long").as("dim"),
            fixed(col("f").cast("double"), 10000L).as("v10k")))
      val c = v.groupBy(col("label").as("cl"), col("dim").as("cd"))
        .agg(count(lit(1)).as("n"), sum("v10k").as("s"))
      val dev = col("n") * col("v10k") - col("s")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("label").orderBy(col("n2dev2").desc, col("vec_id"))
      v.join(broadcast(c), col("label") === col("cl") && col("dim") === col("cd"))
        .groupBy("vec_id", "label")
        .agg(sum(dev * dev).as("n2dev2"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 5)
        .select(col("label"), col("vec_id"), col("n2dev2"), col("rk"))
        .orderBy("label", "rk")
    },

    // X72 — HYBRID retrieval fusion: a dense embedding top-k and the
    // sparse rare-trigram top-k (x65's inverted probes, same query
    // set doc_id % 100 = 17) fused per query with reciprocal-rank
    // fusion. RRF is the production-standard way to combine a
    // BM25-ish lexical list with an embedding list (each ranker votes
    // 1/(60+rank)); stated here in exact integer fixed point —
    // 1000000 DIV (60+rank) — so the fused score is a BIGINT both
    // engines compute identically (a double 1/(60+r) sum would be
    // order-sensitive). A doc missing from one list contributes 0
    // from that list; in_dense/in_sparse flags expose which ranker(s)
    // surfaced each hit.
    //
    // DENSE LEG (round-8 VERDICT task 2 — the round-8 form was the
    // suite's one genuine scale-killer): x47's two-stage trained-index
    // retrieval — IVF-PQ trained at scaledK, nprobe=4 ADC candidates,
    // top-20 shortlist, exact re-rank of the shortlist's raw vectors —
    // NOT a brute-force scorer. The query set here is 1% OF THE CORPUS
    // (it grows with n), which is exactly why all-pairs was wrong
    // (O(n²/100)) and why the probe join below is a plain cell-keyed
    // shuffle equi-join, not a broadcast: per-query work is probed-
    // cell occupancy (~4·sqrt(n) codes at scaledK) + a 20-row exact
    // re-rank, so the leg is O(n^1.5/100) total and nothing driver- or
    // broadcast-side grows with the corpus. The oracle replays the
    // same index CTEs as x47's. Scale shape elsewhere: both fused
    // lists are per-query top-20 (bounded), so the fusion join is tiny
    // regardless of corpus size; the sparse leg probes rare postings
    // (df <= 20), never a full inverted scan.
    Q(
      "x72_hybrid_fusion", {
        val sub = (0 until 4).map { m =>
          s"s${m}e AS (SELECT vec_id, v[${m * 16 + 1}:${(m + 1) * 16}] AS v FROM e),\n" +
            KMeans.oracleCtes(s"s${m}e", 16, s"s$m")
        }.mkString(",\n")
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |${KMeans.scaledKSql("e")},
        |${KMeans.oracleCtes("e", 64, "", "(SELECT k FROM kk)")},
        |$sub,
        |rec AS (SELECT a.vec_id, a.cell,
        |    flatten([b0.cv, b1.cv, b2.cv, b3.cv]) AS rv
        |  FROM af a
        |  JOIN s0af a0 ON a0.vec_id = a.vec_id JOIN s0c${KMeans.Iters} b0 ON b0.cid = a0.cell
        |  JOIN s1af a1 ON a1.vec_id = a.vec_id JOIN s1c${KMeans.Iters} b1 ON b1.cid = a1.cell
        |  JOIN s2af a2 ON a2.vec_id = a.vec_id JOIN s2c${KMeans.Iters} b2 ON b2.cid = a2.cell
        |  JOIN s3af a3 ON a3.vec_id = a.vec_id JOIN s3c${KMeans.Iters} b3 ON b3.cid = a3.cell),
        |qp AS (SELECT vec_id AS qid, cid AS pcell FROM (
        |    SELECT e.vec_id, c.cid,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY (list_dot_product(c.cv, c.cv) - 2 * list_dot_product(e.v, c.cv)), c.cid) AS rk
        |    FROM e CROSS JOIN c${KMeans.Iters} c WHERE e.vec_id % 100 = 17) t
        |  WHERE rk <= 4),
        |cand AS (SELECT q.qid, r.vec_id AS nid,
        |    round(list_dot_product(qe.v, r.rv)
        |      / (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(r.rv, r.rv))), 4) AS adc
        |  FROM qp q JOIN e qe ON qe.vec_id = q.qid
        |  JOIN rec r ON r.cell = q.pcell AND r.vec_id <> q.qid),
        |dsl AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY adc DESC, nid) AS rn
        |  FROM cand) WHERE rn <= 20),
        |drr AS (SELECT dsl.qid, dsl.nid,
        |    round(list_dot_product(q.v, x.v)
        |      / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(x.v, x.v))), 4) AS sim
        |  FROM dsl JOIN e q ON q.vec_id = dsl.qid JOIN e x ON x.vec_id = dsl.nid),
        |dr AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn FROM drr),
        |dl AS (SELECT qid, nid AS did, 1000000 // (60 + rn) AS dc FROM dr),
        |t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks FROM documents),
        |g AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS tg
        |      FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
        |            FROM t WHERE len(toks) >= 3) u),
        |df AS (SELECT tg, CAST(count(*) AS BIGINT) AS df FROM g GROUP BY tg),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |rare AS (SELECT g.doc_id, g.tg, df.df FROM g JOIN df USING (tg) WHERE df.df <= 20),
        |hits AS (SELECT q.doc_id AS qid, c.doc_id AS did, SUM((nn.n * 100) // q.df) AS score
        |  FROM rare q JOIN g c ON c.tg = q.tg AND c.doc_id <> q.doc_id
        |  CROSS JOIN nn
        |  WHERE q.doc_id % 100 = 17
        |  GROUP BY 1, 2),
        |sr AS (SELECT qid, did, row_number() OVER (PARTITION BY qid ORDER BY score DESC, did) AS rn FROM hits),
        |sl AS (SELECT qid, did, 1000000 // (60 + rn) AS sc FROM sr WHERE rn <= 20),
        |f AS (SELECT COALESCE(dl.qid, sl.qid) AS qid, COALESCE(dl.did, sl.did) AS did,
        |    CAST(COALESCE(dc, 0) + COALESCE(sc, 0) AS BIGINT) AS fused,
        |    CAST(CASE WHEN dc IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS in_dense,
        |    CAST(CASE WHEN sc IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS in_sparse
        |  FROM dl FULL OUTER JOIN sl ON sl.qid = dl.qid AND sl.did = dl.did),
        |r AS (SELECT qid, did, fused, in_dense, in_sparse,
        |    row_number() OVER (PARTITION BY qid ORDER BY fused DESC, did) AS rn FROM f)
        |SELECT qid, did, fused, in_dense, in_sparse, CAST(rn AS BIGINT) AS rn
        |FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin
      }
    ) { (spark, dir) =>
      // Dense leg — x47's trained-index two-stage retrieval (see the
      // query doc): IVF-PQ at scaledK, nprobe=4 ADC shortlist of 20,
      // exact re-rank. Query set vec_id % 100 = 17 grows with the
      // corpus, so nothing here broadcasts the query side.
      val e = CacheScope.cacheEager(
        vectors(spark, dir).withColumn("nrm", l2norm(col("v"))))
      val n = e.count()
      val (coarse, pq) = KMeans.trainJoint(KMeans.trainingSet(
        e.select(col("vec_id"), col("v")), n), 4, 16, KMeans.scaledK(n))
      val rv = concat((0 until 4).map { m =>
        element_at(typedLit(pq(m).map(_.toSeq)),
          (KMeans.assignCell(slice(col("v"), m * 16 + 1, 16), pq(m)) + 1).cast("int"))
      }: _*)
      // cacheEager: enc fans out to the probe side and the query side.
      val enc = CacheScope.cacheEager(e.select(col("vec_id"), col("v"), col("nrm"),
        KMeans.assignCell(col("v"), coarse).as("cell"), rv.as("rv")))
      val qprobes = enc.filter(col("vec_id") % 100 === 17)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
          explode(KMeans.assignCells(col("v"), coarse, 4)).as("pcell"))
      val x = enc.select(col("vec_id").as("nid"), col("rv").as("xv"),
        col("cell").as("xcell"))
      // Plain cell-keyed shuffle equi-join (NOT broadcast — the query
      // side is 1% of the corpus). Each (qid, nid) meets at most once:
      // a data vector lives in exactly one cell and a query's 4 probed
      // cells are distinct.
      val cand = qprobes
        .join(x, col("pcell") === col("xcell") && col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"),
          r4(dot(col("qv"), col("xv")) / (col("qn") * l2norm(col("xv")))).as("adc"))
      val wa = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("adc").desc, col("nid"))
      val dsl = cand.withColumn("rn", row_number().over(wa)).filter(col("rn") <= 20)
        .select("qid", "nid")
      // Exact re-rank of the 20-row shortlist against the RAW vectors —
      // an id-keyed join touching 20 vectors per query.
      val rq = e.select(col("vec_id").as("rqid"), col("v").as("rqv"), col("nrm").as("rqn"))
      val rx = e.select(col("vec_id").as("rnid"), col("v").as("rxv"), col("nrm").as("rxn"))
      val wd = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("sim").desc, col("nid"))
      val dense = dsl.join(rq, col("qid") === col("rqid"))
        .join(rx, col("nid") === col("rnid"))
        .select(col("qid"), col("nid"),
          r4(dot(col("rqv"), col("rxv")) / (col("rqn") * col("rxn"))).as("sim"))
        .withColumn("rn", row_number().over(wd))
        .select(col("qid").as("dqid"), col("nid").as("ddid"),
          expr("1000000L DIV (60 + rn)").as("dc"))
      // Sparse leg — x65's rare-trigram inverted probes, same query set.
      val g = CacheScope.cacheEager(
        Tables.fanOut(Tables(spark, dir, "documents"))
          .filter(size(wsTokens(col("text"))) >= 3)
          .select(col("doc_id"), explode(graft.functions.ShingleExpressions
            .tokenNgrams(wsTokens(col("text")), 3)).as("tg"))
          .distinct())
      val dfc = g.groupBy("tg").agg(count(lit(1)).as("df"))
      val nn = Tables(spark, dir, "documents").agg(count(lit(1)).as("n"))
      val rare = g.join(dfc, "tg").filter(col("df") <= 20)
        .filter(col("doc_id") % 100 === 17)
        .select(col("tg").as("qtg"), col("doc_id").as("pqid"), col("df"))
      val ws = org.apache.spark.sql.expressions.Window
        .partitionBy("sqid").orderBy(col("score").desc, col("sdid"))
      val sparse = g
        .join(rare, col("tg") === col("qtg") && col("doc_id") =!= col("pqid"))
        .crossJoin(broadcast(nn))
        .select(col("pqid").as("sqid"), col("doc_id").as("sdid"),
          expr("(n * 100) DIV df").as("wt"))
        .groupBy("sqid", "sdid")
        .agg(sum("wt").as("score"))
        .withColumn("rn", row_number().over(ws))
        .filter(col("rn") <= 20)
        .select(col("sqid"), col("sdid"),
          expr("1000000L DIV (60 + rn)").as("sc"))
      // Fuse: per-(query, doc) merge of the two bounded lists. Each leg
      // emits at most ONE row per (qid, did) — dense is a row_number
      // shortlist, sparse a (qid, did) aggregate — so the FULL OUTER
      // join is exactly a union + per-(qid, did) aggregate, and that
      // spelling shuffles ONCE where the join shuffled twice and the
      // fusion window a third time (round 15, VERDICT r14 item 5 /
      // guide §2.4): the explicit qid repartition satisfies the
      // aggregate's (qid, did) clustering by the subset rule AND the
      // window's qid partitioning — 3 Exchanges + 2 join sorts → 1
      // Exchange. A present-but-NULL-scored leg row cannot exist (both
      // legs' scores are 1000000 DIV (60+rn) > 0), so sum-over-one-row
      // preserves the join's NULL/flag semantics bit-for-bit; the
      // oracle keeps the FULL OUTER spelling and gates the equality.
      val wf = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("fused").desc, col("did"))
      dense
        .select(col("dqid").as("qid"), col("ddid").as("did"),
          col("dc"), lit(null).cast("long").as("sc"))
        .unionByName(sparse.select(col("sqid").as("qid"), col("sdid").as("did"),
          lit(null).cast("long").as("dc"), col("sc")))
        .repartition(col("qid"))
        .groupBy("qid", "did")
        .agg(sum("dc").as("dc"), sum("sc").as("sc"))
        .select(col("qid"), col("did"),
          (coalesce(col("dc"), lit(0L)) + coalesce(col("sc"), lit(0L))).as("fused"),
          when(col("dc").isNotNull, 1L).otherwise(0L).as("in_dense"),
          when(col("sc").isNotNull, 1L).otherwise(0L).as("in_sparse"))
        .withColumn("rn", row_number().over(wf).cast("long"))
        .filter(col("rn") <= 5)
        .orderBy("qid", "rn")
    },

    // X75 — MMR DIVERSITY RERANK (maximal marginal relevance): the
    // post-retrieval stage every RAG/dedup-aware serving stack runs —
    // the raw top-k of a similarity search is often near-duplicates of
    // one answer, so the served set is re-picked GREEDILY: first the
    // most relevant candidate, then 4 more each maximizing
    // λ·relevance − (1−λ)·max-similarity-to-already-picked (λ = 0.7,
    // carried as the exact integer form 7·rel4 − 3·ms4 over
    // ten-thousandth-scaled cosines, so every comparison is BIGINT
    // arithmetic — no float ordering can diverge across engines; ties
    // break by nid, and the one rounding per cosine is the same
    // measure-zero-risk r4 class the whole family gates on). The
    // candidate pool is l3's audit shape: the exact top-20 per query
    // from the broadcast-20-query linear scan. SCALE SHAPE: in
    // production the pool comes from the trained-index shortlist
    // (x47) instead — MMR itself never touches the corpus: 20
    // candidates per query → 380 pairwise sims per query, and the 4
    // greedy steps are (qid)-keyed joins + windows over those bounded
    // relations, so rerank cost scales with QUERY COUNT only, at any
    // corpus size. The 5 picks and every intermediate are hash-gated
    // (qid, rk, nid, rel4 — all integers).
    Q(
      "x75_mmr_diversify", {
        val steps = (2 to 5).map { k =>
          s"""m$k AS (SELECT r.qid, r.nid, r.rel4, max(p.sim4) AS ms
             |  FROM cand r JOIN ps p ON p.qid = r.qid AND p.a = r.nid
             |  JOIN sel${k - 1} s ON s.qid = p.qid AND s.nid = p.b
             |  WHERE NOT EXISTS (SELECT 1 FROM sel${k - 1} z
             |                    WHERE z.qid = r.qid AND z.nid = r.nid)
             |  GROUP BY 1, 2, 3),
             |s$k AS (SELECT qid, nid, rel4, CAST($k AS BIGINT) AS rk FROM (
             |    SELECT qid, nid, rel4, row_number() OVER (PARTITION BY qid
             |      ORDER BY 7 * rel4 - 3 * ms DESC, nid) AS rn FROM m$k) WHERE rn = 1),
             |sel$k AS (SELECT qid, nid, rel4, rk FROM sel${k - 1}
             |          UNION ALL SELECT qid, nid, rel4, rk FROM s$k)""".stripMargin
        }.mkString(",\n")
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |p0 AS (SELECT q.vec_id AS qid, x.vec_id AS nid,
           |    CAST(round(list_dot_product(q.v, x.v)
           |      / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(x.v, x.v)))
           |      * 10000) AS BIGINT) AS rel4
           |  FROM e q JOIN e x ON x.vec_id <> q.vec_id WHERE q.vec_id < 20),
           |cand AS (SELECT qid, nid, rel4 FROM (
           |    SELECT qid, nid, rel4, row_number() OVER (PARTITION BY qid
           |      ORDER BY rel4 DESC, nid) AS rn FROM p0) WHERE rn <= 20),
           |cv AS (SELECT c.qid, c.nid, e.v FROM cand c JOIN e ON e.vec_id = c.nid),
           |ps AS (SELECT a.qid, a.nid AS a, b.nid AS b,
           |    CAST(round(list_dot_product(a.v, b.v)
           |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
           |      * 10000) AS BIGINT) AS sim4
           |  FROM cv a JOIN cv b ON a.qid = b.qid AND a.nid <> b.nid),
           |sel1 AS (SELECT qid, nid, rel4, CAST(1 AS BIGINT) AS rk FROM (
           |    SELECT qid, nid, rel4, row_number() OVER (PARTITION BY qid
           |      ORDER BY rel4 DESC, nid) AS rn FROM cand) WHERE rn = 1),
           |$steps
           |SELECT qid, rk, nid, rel4 FROM sel5 ORDER BY qid, rk""".stripMargin
      }
    ) { (spark, dir) =>
      val e = CacheScope.cacheEager(
        vectors(spark, dir).withColumn("nrm", l2norm(col("v"))))
      val q = e.filter(col("vec_id") < 20).toDF("qid", "qv", "qn")
      val x = e.toDF("nid", "xv", "xn")
      def c4(num: Column, den: Column): Column =
        round(num / den * 10000).cast("long")
      val scored = broadcast(q).join(x, col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"),
          c4(dot(col("qv"), col("xv")), col("qn") * col("xn")).as("rel4"))
      val wTop = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("rel4").desc, col("nid"))
      val cand = CacheScope.cacheEager(
        scored.withColumn("rn", row_number().over(wTop))
          .filter(col("rn") <= 20).drop("rn"))
      // pairwise candidate sims: a per-qid 20x20 self-join — bounded by
      // the shortlist width, never by the corpus
      val cvx = cand.join(x, "nid")
      val a = cvx.select(col("qid"), col("nid").as("a"),
        col("xv").as("av"), col("xn").as("an"))
      val b = cvx.select(col("qid"), col("nid").as("b"),
        col("xv").as("bv"), col("xn").as("bn"))
      val ps = CacheScope.cacheEager(
        a.join(b, Seq("qid")).filter(col("a") =!= col("b"))
          .select(col("qid"), col("a"), col("b"),
            c4(dot(col("av"), col("bv")), col("an") * col("bn")).as("sim4")))
      // The greedy selection runs per query group in a typed
      // flatMapGroups — the m3/x71 justification: a sequential
      // data-dependent argmax chain has no Catalyst builtin, and the
      // declarative alternative (k chained anti-join + max-agg +
      // window stages, each referencing the selection-so-far twice)
      // was MEASURED paying superlinear Catalyst analysis on the
      // growing lineage — 17-22 s at sf0.1, all planning overhead,
      // even with each step's 100-row result cached eagerly. Here the
      // group is one query's shortlist: ≤ 20 candidates + their ≤ 380
      // pairwise sims — bounded state by construction, one (qid)
      // exchange, one pass, at any corpus size.
      import spark.implicits._
      // LEFT join so a 1-candidate pool (no pairs) still carries its
      // rank-1 pick; -1 marks the no-pair sentinel (vec_ids are >= 0)
      val picks = cand.select(col("qid"), col("nid").as("a"), col("rel4"))
        .join(ps.select(col("qid"), col("a"), col("b"), col("sim4")),
          Seq("qid", "a"), "left")
        .select(col("qid"), col("a"), col("rel4"),
          coalesce(col("b"), lit(-1L)).as("b"),
          coalesce(col("sim4"), lit(0L)).as("sim4"))
        .as[(Long, Long, Long, Long, Long)]
        .groupByKey(_._1)
        .flatMapGroups { (qid: Long, it: Iterator[(Long, Long, Long, Long, Long)]) =>
          val rel = scala.collection.mutable.LongMap.empty[Long]
          val sim = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
          it.foreach { case (_, a, r, b, s) =>
            rel(a) = r; if (b >= 0L) sim((a, b)) = s
          }
          // (rel4 desc, nid asc) — the same total order as the oracle
          val cands = rel.toSeq.sortBy { case (id, r) => (-r, id) }
          val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          if (cands.nonEmpty) sel += ((cands.head._1, cands.head._2))
          var k = 2
          while (k <= 5 && sel.length == k - 1) {
            val chosen = sel.map(_._1).toSet
            var bSc = Long.MinValue; var bId = Long.MaxValue; var bRel = 0L
            cands.foreach { case (id, r) =>
              if (!chosen(id)) {
                var ms = Long.MinValue
                sel.foreach { s =>
                  val v = sim((id, s._1)); if (v > ms) ms = v
                }
                val sc = 7L * r - 3L * ms
                if (sc > bSc || (sc == bSc && id < bId)) {
                  bSc = sc; bId = id; bRel = r
                }
              }
            }
            if (bSc != Long.MinValue) sel += ((bId, bRel))
            k += 1
          }
          sel.iterator.zipWithIndex.map { case ((nid, r), i) =>
            (qid, (i + 1).toLong, nid, r)
          }
        }
        .toDF("qid", "rk", "nid", "rel4")
      picks.orderBy("qid", "rk")
    },

    // X81 — MATRYOSHKA TRUNCATION RECALL: how much of the exact
    // full-dimension top-5 survives when vectors are truncated to
    // their first 16 / 32 of 64 dimensions? The standard embedding
    // cost dial next to x37's nprobe (cells searched) and x16's
    // scalar quantization (bits per dimension): matryoshka-style
    // prefix truncation cuts BOTH index bytes and per-candidate FLOPs
    // by the dimension ratio, and this row MEASURES what that buys
    // back in recall, per query, as exact integers. Three cosine legs
    // (d=64 ground truth, d=32, d=16) are computed in ONE pass over a
    // single broadcast-join scan — the projection emits all three
    // fixed-point sims per (query, candidate) — then three qid-window
    // top-5s reuse the one exchange. Output: the ground-truth id
    // checksum plus hits@5 for each truncated leg, 20 all-BIGINT rows.
    // SCALE SHAPE: identical to l3's declared brute-force baseline
    // (query side fixed at 20 and broadcast; corpus side one linear
    // scan), so the truncation dial adds no new asymptotics — it
    // divides the constant. Ranking uses ten-thousandth fixed-point
    // sims (x75's c4 discipline) so the cross-engine order is integer-
    // exact.
    Q(
      "x81_matryoshka_recall", {
        def leg(d: Int, nm: String) =
          s"""p$nm AS (SELECT q.vec_id AS qid, x.vec_id AS nid,
             |    CAST(round(list_dot_product(q.v[1:$d], x.v[1:$d])
             |      / (sqrt(list_dot_product(q.v[1:$d], q.v[1:$d]))
             |         * sqrt(list_dot_product(x.v[1:$d], x.v[1:$d]))) * 10000) AS BIGINT) AS rel
             |  FROM e q JOIN e x ON x.vec_id <> q.vec_id WHERE q.vec_id < 20),
             |t$nm AS (SELECT qid, nid FROM (SELECT qid, nid,
             |    row_number() OVER (PARTITION BY qid ORDER BY rel DESC, nid) AS rn
             |  FROM p$nm) WHERE rn <= 5)""".stripMargin
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |${leg(64, "64")},
           |${leg(32, "32")},
           |${leg(16, "16")},
           |gt AS (SELECT qid, CAST(SUM(nid) AS BIGINT) AS gt_sum FROM t64 GROUP BY 1),
           |h32 AS (SELECT a.qid, count(*) AS h FROM t64 a JOIN t32 b
           |  ON b.qid = a.qid AND b.nid = a.nid GROUP BY 1),
           |h16 AS (SELECT a.qid, count(*) AS h FROM t64 a JOIN t16 b
           |  ON b.qid = a.qid AND b.nid = a.nid GROUP BY 1)
           |SELECT gt.qid, gt.gt_sum,
           |  CAST(COALESCE(h32.h, 0) AS BIGINT) AS hits_d32,
           |  CAST(COALESCE(h16.h, 0) AS BIGINT) AS hits_d16
           |FROM gt LEFT JOIN h32 ON h32.qid = gt.qid
           |LEFT JOIN h16 ON h16.qid = gt.qid ORDER BY gt.qid""".stripMargin
      }
    ) { (spark, dir) =>
      val e = vectors(spark, dir)
      val q = e.filter(col("vec_id") < 20).toDF("qid", "qv")
      val x = e.toDF("nid", "xv")
      def relAt(d: Int): Column = {
        val (a, b) =
          if (d == 64) (col("qv"), col("xv"))
          else (slice(col("qv"), 1, d), slice(col("xv"), 1, d))
        round(dot(a, b) / (l2norm(a) * l2norm(b)) * 10000).cast("long")
      }
      // one scan, all three fixed-point sims per candidate pair
      val scored = CacheScope.cacheEager(
        broadcast(q).join(x, col("qid") =!= col("nid"))
          .select(col("qid"), col("nid"),
            relAt(64).as("rel64"), relAt(32).as("rel32"), relAt(16).as("rel16")))
      def top5(relCol: String): DataFrame = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col(relCol).desc, col("nid"))
        scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5).select("qid", "nid")
      }
      val t64 = top5("rel64")
      val gt = t64.groupBy("qid").agg(sum("nid").as("gt_sum"))
      def hits(t: DataFrame, nm: String): DataFrame =
        t64.join(t, Seq("qid", "nid")).groupBy("qid")
          .agg(count(lit(1)).as(nm))
      gt.join(hits(top5("rel32"), "h32"), Seq("qid"), "left")
        .join(hits(top5("rel16"), "h16"), Seq("qid"), "left")
        .select(col("qid"), col("gt_sum"),
          coalesce(col("h32"), lit(0L)).as("hits_d32"),
          coalesce(col("h16"), lit(0L)).as("hits_d16"))
        .orderBy("qid")
    }
  )
}
