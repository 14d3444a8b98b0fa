package graft.llm

import graft.core.{Q, Tables}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic stub (MediaDecode.decodeStub) — but the
  * Spark-side plumbing is real: a binary column, a metadata struct, and
  * a batched `mapPartitions` over a typed Dataset, which is exactly the
  * shape a Pandas-UDF/mapInPandas or JNI decoder would slot into (one
  * partition = one batch; the decoder is a pure record-wise function,
  * so partitioning is preserved and the stage stays embarrassingly
  * parallel at 100 TB).
  */
object MultimodalQueries {

  /** Decoded "media" features. */
  final case class MediaFeatures(
      doc_id: Long, byte_len: Long, byte_sum: Long, width: Long, frames: Long)

  /** STUB: stands in for an image/audio decoder (real codecs are not in
    * this container). Deterministic features of the raw payload only. */
  def decodeStub(id: Long, payload: Array[Byte]): MediaFeatures = {
    var s = 0L
    var k = 0
    while (k < payload.length) { s += payload(k) & 0xff; k += 1 }
    val len = payload.length.toLong
    MediaFeatures(id, len, s, len % 640, len % 30 + 1)
  }

  val all: Seq[Q] = Seq(

    // L5 — multimodal join: text docs ⋈ embedding vectors into a struct
    // record (text, lang, embedding), counted per (lang, label).
    Q(
      "l5_multimodal_join",
      """SELECT d.lang, e.label, count(*) AS n
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |GROUP BY 1, 2 ORDER BY lang, label""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir, "documents")
        .join(Tables(spark, dir, "embeddings"), col("doc_id") === col("vec_id"))
        .select(struct(col("text"), col("lang"), col("embedding")).as("rec"), col("label"))
        .groupBy(col("rec.lang").as("lang"), col("label"))
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "label")
    },

    // M1 — binary-column pipeline: encode → mapPartitions(decodeStub) →
    // feature table. Oracle reproduces the stub arithmetically (the
    // corpus is ASCII, so UTF-8 byte values == code points).
    Q(
      "m1_media_features",
      """WITH ch AS (SELECT doc_id, unnest(generate_series(1, length(text))) AS pos, text FROM documents),
        |agg AS (SELECT doc_id, CAST(SUM(ascii(substr(text, pos, 1))) AS BIGINT) AS byte_sum,
        |        count(*) AS byte_len FROM ch GROUP BY 1)
        |SELECT doc_id, CAST(byte_len AS BIGINT) AS byte_len, byte_sum,
        |  CAST(byte_len % 640 AS BIGINT) AS width,
        |  CAST(byte_len % 30 + 1 AS BIGINT) AS frames
        |FROM agg ORDER BY doc_id""".stripMargin
    ) { (spark, dir) =>
      val sp = spark
      import sp.implicits._
      Tables(spark, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
        .toDF()
        .orderBy("doc_id")
    },

    // M2 — frame sampling over the binary payload: one output row per
    // sampled "frame" (evenly spaced offsets, count from the stubbed
    // metadata), each carrying the byte at its offset — the Spark-side
    // shape of video frame extraction (flatMap over a typed Dataset,
    // 1 record in -> k records out, partition-preserving).
    Q(
      "m2_frame_sample",
      """WITH d AS (SELECT doc_id, text, length(text) AS len, length(text) % 30 + 1 AS frames
        |  FROM documents),
        |f AS (SELECT doc_id, text, len, frames,
        |      unnest(generate_series(0, frames - 1)) AS frame FROM d)
        |SELECT doc_id, CAST(frame AS BIGINT) AS frame,
        |  CAST(frame * (len // frames) AS BIGINT) AS off,
        |  CAST(ascii(substr(text, frame * (len // frames) + 1, 1)) AS BIGINT) AS b
        |FROM f ORDER BY doc_id, frame""".stripMargin
    ) { (spark, dir) =>
      val sp = spark
      import sp.implicits._
      Tables(spark, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
        .flatMap { case (id, bytes) =>
          // STUB decode: frame count/offsets from payload length only.
          val len = bytes.length
          val frames = len % 30 + 1
          val step = len / frames
          (0 until frames).map { f =>
            val off = f * step
            (id, f.toLong, off.toLong, (bytes(off) & 0xff).toLong)
          }
        }
        .toDF("doc_id", "frame", "off", "b")
        .orderBy("doc_id", "frame")
    },

    // M3 — PAYLOAD INTEGRITY SCAN: recompute each binary payload's
    // position-weighted checksum (Σ byte·pos — order-SENSITIVE, so a
    // swapped block is caught, unlike a plain byte sum) and compare
    // it against the stored manifest value — the bit-rot / corrupt-
    // object sweep every petabyte object store schedules. The corpus
    // has no corruption, so the fixture FLIPS the first byte of
    // hash-selected payloads (doc_id % 97 == 13 → b0 := 255 − b0,
    // always detectable since valid ASCII < 128) after recording the
    // clean checksum — the planted-fixture discipline (COVERAGE.md
    // round-7 notes). The byte-level work is a typed mapPartitions
    // over the binary column (m1's decoder slot — this is what an
    // S3-inventory integrity job looks like on Spark); checksums stay
    // exact in int64 (≤ 126·Σpos ≈ 1.6e7 per 500-byte payload). Audit
    // per language: payload count, corrupt count, summed stored vs
    // recomputed checksums — the corruption shows up twice (count and
    // checksum-sum delta), so a scrubbed-but-miscounted or
    // counted-but-unscrubbed bug cannot pass.
    // CROSS-ENGINE EQUIVALENCE CONTRACT (ADVICE r7): the oracle walks
    // CHARACTER positions with ascii() codepoints while the Spark side
    // walks UTF-8 BYTE offsets — equivalent iff text is ASCII. That
    // invariant is now ASSERTED (IntegrityRobustSpec "m3 ascii invariant"
    // fails the suite if any documents.text byte ≥ 0x80), and the
    // zero-length case is structural: the LEFT JOIN below keeps empty
    // docs in n_payloads with stored = 0, matching the mapPartitions
    // side, and the corruption branch guards b0 IS NOT NULL exactly as
    // the Scala guards bytes.length > 0.
    Q(
      "m3_integrity_scan",
      """WITH ch AS (SELECT doc_id, text,
        |    unnest(generate_series(1, length(text))) AS pos FROM documents),
        |agg AS (SELECT doc_id,
        |    CAST(SUM(ascii(substr(text, pos, 1)) * pos) AS BIGINT) AS stored,
        |    CAST(MAX(CASE WHEN pos = 1 THEN ascii(substr(text, 1, 1)) END) AS BIGINT) AS b0
        |  FROM ch GROUP BY doc_id),
        |ck AS (SELECT d.doc_id, d.lang, COALESCE(a.stored, 0) AS stored, a.b0
        |  FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id),
        |f AS (SELECT doc_id, lang, stored,
        |    CASE WHEN doc_id % 97 = 13 AND b0 IS NOT NULL
        |      THEN stored + 255 - 2 * b0 ELSE stored END AS actual
        |  FROM ck)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_payloads,
        |  CAST(SUM(CASE WHEN actual <> stored THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
        |  CAST(SUM(stored) AS BIGINT) AS sum_stored,
        |  CAST(SUM(actual) AS BIGINT) AS sum_actual
        |FROM f GROUP BY lang ORDER BY lang""".stripMargin
    ) { (spark, dir) =>
      val sp = spark
      import sp.implicits._
      Tables(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, String, Array[Byte])]
        .mapPartitions(_.map { case (id, lang, bytes) =>
          var clean = 0L
          var i = 0
          while (i < bytes.length) { clean += (bytes(i) & 0xff).toLong * (i + 1); i += 1 }
          // FIXTURE: plant the corruption after recording the manifest
          if (id % 97 == 13 && bytes.length > 0)
            bytes(0) = (255 - (bytes(0) & 0xff)).toByte
          var actual = 0L
          i = 0
          while (i < bytes.length) { actual += (bytes(i) & 0xff).toLong * (i + 1); i += 1 }
          (id, lang, clean, actual)
        })
        .toDF("doc_id", "lang", "stored", "actual")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_payloads"),
          sum(when(col("actual") =!= col("stored"), 1L).otherwise(0L)).as("n_corrupt"),
          sum("stored").cast("long").as("sum_stored"),
          sum("actual").cast("long").as("sum_actual"))
        .orderBy("lang")
    }
  )
}
