package graft

import graft.core.Cols._
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of r28 (robust stats), b6 (compaction) and m3 (integrity
  * scan) beyond their oracle gates: the literal statistic definitions,
  * the file-count contract the cross-engine hash cannot see, and the
  * exact arithmetic signature of the planted corruption.
  */
class IntegrityRobustSpec extends AnyFunSuite {
  import TestSpark._

  test("r28: median/MAD/IQR match a literal sorted-array recompute") {
    val got = SparkEntry.queries("r28_robust_stats")(spark, sf0001)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    val raw = Tables(spark, sf0001, "events")
      .select(col("event_type"), col("event_id"), fixed(col("value"), 10000L).as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    raw.groupBy(_._1).foreach { case (et, rows) =>
      // rank definition: value at rn = ceil(f*cnt) under (v, event_id)
      val vs = rows.sortBy(t => (t._3, t._2)).map(_._3)
      val n = vs.length
      val med = vs(((n + 1) / 2 - 1))
      val p25 = vs(((n + 3) / 4 - 1))
      val p75 = vs(((3 * n + 3) / 4 - 1))
      val devs = rows.sortBy(t => (math.abs(t._3 - med), t._2)).map(t => math.abs(t._3 - med))
      val mad = devs(((n + 1) / 2 - 1))
      val outliers = vs.count(v => math.abs(v - med) > 3 * mad).toLong
      val (gn, gmed, gp25, gp75, giqr, gmad, gout) = got(et)
      assert(gn == n && gmed == med && gp25 == p25 && gp75 == p75, et)
      assert(giqr == p75 - p25 && gmad == mad && gout == outliers, et)
    }
  }

  test("b6: compaction obeys the ceil(bytes/4MiB) file-count contract") {
    val frag = graft.streaming.TempWork.dir("graft_b6spec_frag")
    val out = graft.streaming.TempWork.dir("graft_b6spec_out")
    Tables(spark, sf0001, "events").repartition(64)
      .write.mode("overwrite").parquet(frag)
    val files = new java.io.File(frag).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(files.length == 64, s"fragmented layout has ${files.length} files")
    val bytes = files.map(_.length).sum
    val target = math.max(1L, (bytes + (4L << 20) - 1) / (4L << 20)).toInt
    spark.read.parquet(frag).coalesce(target)
      .write.mode("overwrite").parquet(out)
    val compacted = new java.io.File(out).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(compacted == target && compacted < 64,
      s"compacted to $compacted files, target $target")
    // nothing lost
    assert(spark.read.parquet(out).count() ==
      Tables(spark, sf0001, "events").count())
  }

  test("m3: corruption count and checksum delta match the planted fixture exactly") {
    val rows = SparkEntry.queries("m3_integrity_scan")(spark, sf0001).collect()
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), ascii(substring(col("text"), 1, 1)).cast("long").as("b0"))
    val planted = docs.filter(col("doc_id") % 97 === 13)
    assert(rows.map(_.getLong(2)).sum == planted.count())
    // per-payload delta is exactly 255 − 2·b0 (first byte flipped)
    val wantDelta = planted.agg(sum(lit(255L) - lit(2L) * col("b0"))).head().getLong(0)
    val gotDelta = rows.map(r => r.getLong(4) - r.getLong(3)).sum
    assert(gotDelta == wantDelta)
    assert(rows.map(_.getLong(2)).sum > 0, "no corruption planted — vacuous")
  }

  test("m3 ascii invariant: the char-position oracle is valid for this corpus") {
    // The m3 oracle walks CHARACTER positions with ascii() codepoints;
    // the Spark side walks UTF-8 BYTE offsets. Equivalent iff every
    // text is pure ASCII (then char index = byte index and codepoint =
    // byte value). Assert that invariant here so the cross-engine gate
    // is justified structurally, not by luck of the corpus (ADVICE r7).
    val nonAscii = Tables(spark, sf0001, "documents")
      .filter(col("text").rlike("[^\\x00-\\x7F]"))
      .count()
    assert(nonAscii == 0L,
      s"$nonAscii documents contain non-ASCII text — the m3 oracle's " +
        "char-position arithmetic no longer matches the byte-offset scan")
  }
}
