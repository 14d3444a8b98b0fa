package graft

import graft.core.Cols._
import graft.core.Tables
import graft.llm.AnnIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the persisted IVF-PQ index beyond b7's oracle gate:
  * artifact fidelity (save→load is bit-exact) and path equivalence
  * (the search over loaded artifacts is row-identical to x33's
  * never-persisted in-plan search).
  */
class AnnIndexSpec extends AnyFunSuite {
  import TestSpark._

  private def vecs = Tables(spark, sf0001, "embeddings")
    .select(col("vec_id"), vecD(col("embedding")).as("v"))

  test("save/load round-trips every codebook bit-exactly") {
    val built = AnnIndex.build(vecs)
    val path = java.nio.file.Files.createTempDirectory("graft_annidx_spec").toString
    try {
      AnnIndex.save(spark, built, path)
      val loaded = AnnIndex.load(spark, path)
      assert(loaded.coarse.length == built.coarse.length)
      built.coarse.zip(loaded.coarse).foreach { case (b, l) =>
        assert(java.util.Arrays.equals(b, l))
      }
      assert(loaded.pq.length == AnnIndex.M)
      built.pq.zip(loaded.pq).foreach { case (bs, ls) =>
        bs.zip(ls).foreach { case (b, l) => assert(java.util.Arrays.equals(b, l)) }
      }
      // coded corpus survives intact: same rows, same codes
      val a = built.codes.orderBy("vec_id").collect()
      val b = loaded.codes.orderBy("vec_id").collect()
      assert(a.length == b.length && a.length > 0)
      a.zip(b).foreach { case (x, y) =>
        assert(x.getLong(0) == y.getLong(0) && x.getLong(1) == y.getLong(1))
        assert(x.getSeq[Long](2) == y.getSeq[Long](2))
      }
    } finally {
      val root = java.nio.file.Paths.get(path)
      val s = java.nio.file.Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally s.close()
    }
  }

  test("append codes new vectors identically to a from-scratch encode") {
    val all = vecs
    val half = all.count() / 2
    val built = AnnIndex.build(all.filter(col("vec_id") < half))
    val path = java.nio.file.Files.createTempDirectory("graft_annidx_app").toString
    try {
      AnnIndex.save(spark, built, path)
      val loaded = AnnIndex.load(spark, path)
      AnnIndex.append(spark, loaded, all.filter(col("vec_id") >= half), path)
      val merged = AnnIndex.load(spark, path).codes
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      // contract: merged artifact == encoding the FULL corpus against
      // the half-trained codebooks in one shot
      val oneShot = AnnIndex.encode(all, built.coarse, built.pq)
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      assert(merged.length == oneShot.length && merged.length == all.count())
      merged.zip(oneShot).foreach { case (a, b) => assert(a == b) }
    } finally {
      val root = java.nio.file.Paths.get(path)
      val s = java.nio.file.Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally s.close()
    }
  }

  test("search from the loaded index is row-identical to x33's in-plan search") {
    val fromIndex = SparkEntry.queries("b7_ann_index_roundtrip")(spark, sf0001)
      .collect().map(_.toSeq)
    val inPlan = SparkEntry.queries("x33_ivf_pq_search")(spark, sf0001)
      .collect().map(_.toSeq)
    assert(fromIndex.length == inPlan.length && fromIndex.nonEmpty)
    fromIndex.zip(inPlan).foreach { case (a, b) => assert(a == b) }
  }

  test("compact: bin-packed file count, cell clustering, row-identical codes") {
    val all = vecs
    val half = all.count() / 2
    val built = AnnIndex.build(all.filter(col("vec_id") < half))
    val path = java.nio.file.Files.createTempDirectory("graft_annidx_cpa").toString
    val path2 = java.nio.file.Files.createTempDirectory("graft_annidx_cpb").toString
    def parquetFiles(p: String) = new java.io.File(s"$p/codes.parquet")
      .listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
    def rm(p: String): Unit = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(q => java.nio.file.Files.deleteIfExists(q))
      finally s.close()
    }
    try {
      AnnIndex.save(spark, built, path)
      val loaded = AnnIndex.load(spark, path)
      AnnIndex.append(spark, loaded, all.filter(col("vec_id") >= half), path)
      val fragFiles = parquetFiles(path).length
      AnnIndex.compact(spark, path, path2)
      // layout contract: measured-bytes bin-packing (tiny codes at
      // spec scale → exactly 1 file), strictly fewer than the
      // fragmented layout's base+append file sets
      val bytes = parquetFiles(path).map(_.length).sum
      val target = math.max(1L, (bytes + (4L << 20) - 1) / (4L << 20)).toInt
      assert(parquetFiles(path2).length == target && target < fragFiles)
      // compaction is a pure layout change: same rows, same codes,
      // same codebooks
      val a = AnnIndex.load(spark, path).codes.orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      val b = AnnIndex.load(spark, path2).codes.orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      assert(a.length == b.length && a.length > 0)
      a.zip(b).foreach { case (x, y) => assert(x == y) }
      val l2 = AnnIndex.load(spark, path2)
      loaded.coarse.zip(l2.coarse).foreach { case (x, y) =>
        assert(java.util.Arrays.equals(x, y))
      }
      // clustering contract: within every compacted file, rows are
      // sorted by (cell, vec_id) — the row-group locality a
      // cell-pruned search exploits
      parquetFiles(path2).foreach { f =>
        val rows = spark.read.parquet(f.getAbsolutePath)
          .select("cell", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        assert(rows.sameElements(rows.sorted))
      }
    } finally { rm(path); rm(path2) }
  }

  private def rmDir(p: String): Unit = {
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
    try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(q => java.nio.file.Files.deleteIfExists(q))
    finally s.close()
  }

  test("delete: masked load == physical compaction; tombstoned rows are gone") {
    val all = vecs
    val built = AnnIndex.build(all)
    val path = java.nio.file.Files.createTempDirectory("graft_annidx_del").toString
    val path2 = java.nio.file.Files.createTempDirectory("graft_annidx_dlc").toString
    try {
      AnnIndex.save(spark, built, path)
      AnnIndex.delete(spark, all.filter(col("vec_id") % 10 === 3), path)
      // masked view: the tombstone anti-join serves the surviving set
      // immediately, no rewrite
      val masked = AnnIndex.load(spark, path).codes.orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      assert(masked.nonEmpty && masked.forall(_._1 % 10 != 3))
      assert(masked.length == all.filter(col("vec_id") % 10 =!= 3).count())
      // compaction makes the delete physical: identical surviving rows,
      // and the raw (unmasked) compacted artifact holds nothing else
      AnnIndex.compact(spark, path, path2)
      val compacted = AnnIndex.load(spark, path2).codes.orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      assert(masked.sameElements(compacted))
      val raw = spark.read.parquet(s"$path2/codes.parquet")
        .select("vec_id").collect().map(_.getLong(0))
      assert(raw.length == masked.length && raw.forall(_ % 10 != 3))
      // the new generation starts tombstone-free
      assert(!graft.core.Fs.exists(spark, s"$path2/tombstones.parquet"))
    } finally { rmDir(path); rmDir(path2) }
  }

  test("appendIdempotent: a replayed epoch id is skipped, no double-coding") {
    val all = vecs
    val half = all.count() / 2
    val built = AnnIndex.build(all.filter(col("vec_id") < half))
    val path = java.nio.file.Files.createTempDirectory("graft_annidx_idp").toString
    try {
      AnnIndex.save(spark, built, path)
      val loaded = AnnIndex.load(spark, path)
      val batch = all.filter(col("vec_id") >= half)
      assert(AnnIndex.appendIdempotent(spark, loaded, batch, path, 7L))
      val once = AnnIndex.load(spark, path).codes.count()
      // replay of the SAME epoch id: skipped outright
      assert(!AnnIndex.appendIdempotent(spark, loaded, batch, path, 7L))
      assert(AnnIndex.load(spark, path).codes.count() == once)
      assert(once == all.count())
      // a NEW epoch id still applies (the ledger is per-epoch, not a latch)
      assert(AnnIndex.appendIdempotent(spark, loaded,
        batch.limit(0), path, 8L))
    } finally { rmDir(path) }
  }

  test("snapshot/loadAt: pinned versions see exactly their commit-time state") {
    val all = vecs
    val n = all.count()
    val half = n / 2
    val built = AnnIndex.build(all.filter(col("vec_id") < half))
    val path = java.nio.file.Files.createTempDirectory("graft_annidx_tt").toString
    try {
      AnnIndex.save(spark, built, path)
      AnnIndex.snapshot(spark, path, 1)
      val loaded = AnnIndex.load(spark, path)
      AnnIndex.append(spark, loaded, all.filter(col("vec_id") >= half), path)
      AnnIndex.snapshot(spark, path, 2)
      AnnIndex.delete(spark, all.filter(col("vec_id") % 10 === 3), path)
      AnnIndex.snapshot(spark, path, 3)
      assert(AnnIndex.versions(spark, path) == Seq(1, 2, 3))
      // v1: the half-corpus build — later appends invisible
      val v1 = AnnIndex.loadAt(spark, path, 1).codes
        .select("vec_id").collect().map(_.getLong(0))
      assert(v1.length == half && v1.forall(_ < half))
      // v2: post-append, PRE-delete — later tombstones must not mask
      val v2 = AnnIndex.loadAt(spark, path, 2).codes
        .select("vec_id").collect().map(_.getLong(0)).sorted
      assert(v2.length == n && v2.exists(_ % 10 == 3))
      // v3 == the current (masked) directory read, row for row
      val v3 = AnnIndex.loadAt(spark, path, 3).codes
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      val cur = AnnIndex.load(spark, path).codes
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      assert(v3.nonEmpty && v3.sameElements(cur) && v3.forall(_._1 % 10 != 3))
      // pinned codebooks are the saved ones, bit for bit
      val at = AnnIndex.loadAt(spark, path, 2)
      built.coarse.zip(at.coarse).foreach { case (b, l) =>
        assert(java.util.Arrays.equals(b, l))
      }
    } finally { rmDir(path) }
  }

  test("a batch committed without its marker is skipped on replay (ADVICE r9)") {
    val all = vecs
    val half = all.count() / 2
    val built = AnnIndex.build(all.filter(col("vec_id") < half))
    val path = java.nio.file.Files.createTempDirectory("graft_annidx_cw").toString
    try {
      AnnIndex.save(spark, built, path)
      val loaded = AnnIndex.load(spark, path)
      val batch = all.filter(col("vec_id") >= half)
      // simulate the crash window: data commit lands, marker never does
      AnnIndex.commitBatch(spark, loaded, batch, path, 3L)
      assert(!graft.core.Fs.exists(spark, s"$path/_applied/batch-3"))
      val once = AnnIndex.load(spark, path).codes.count()
      assert(once == all.count())
      // engine replays epoch 3: the committed directory is the evidence;
      // the replay is skipped and the missing marker heals
      assert(!AnnIndex.appendIdempotent(spark, loaded, batch, path, 3L))
      assert(AnnIndex.load(spark, path).codes.count() == once)
      assert(graft.core.Fs.exists(spark, s"$path/_applied/batch-3"))
    } finally rmDir(path)
  }

  test("compact carries the applied-epoch ledger into the new generation") {
    val all = vecs
    val half = all.count() / 2
    val built = AnnIndex.build(all.filter(col("vec_id") < half))
    val path = java.nio.file.Files.createTempDirectory("graft_annidx_lg").toString
    val path2 = java.nio.file.Files.createTempDirectory("graft_annidx_lg2").toString
    try {
      AnnIndex.save(spark, built, path)
      val loaded = AnnIndex.load(spark, path)
      val batch = all.filter(col("vec_id") >= half)
      assert(AnnIndex.appendIdempotent(spark, loaded, batch, path, 5L))
      AnnIndex.compact(spark, path, path2)
      // the new generation remembers epoch 5 although its batch dir is
      // rewritten away — a checkpoint-replayed epoch must not re-append
      assert(graft.core.Fs.exists(spark, s"$path2/_applied/batch-5"))
      val n = AnnIndex.load(spark, path2).codes.count()
      assert(!AnnIndex.appendIdempotent(spark, loaded, batch, path2, 5L))
      assert(AnnIndex.load(spark, path2).codes.count() == n)
    } finally { rmDir(path); rmDir(path2) }
  }

  test("manifests are root-relative; a relocated artifact serves pinned history") {
    val all = vecs
    val n = all.count()
    val half = n / 2
    val built = AnnIndex.build(all.filter(col("vec_id") < half))
    val root = java.nio.file.Files.createTempDirectory("graft_annidx_mv").toString
    val path = s"$root/gen0"
    try {
      AnnIndex.save(spark, built, path)
      AnnIndex.snapshot(spark, path, 1)
      val loaded = AnnIndex.load(spark, path)
      AnnIndex.append(spark, loaded, all.filter(col("vec_id") >= half), path)
      AnnIndex.snapshot(spark, path, 2)
      // stored paths are artifact-root-relative, never absolute URIs
      val stored = spark.read.parquet(s"$path/manifest/v00002.parquet")
        .select("file").collect().map(_.getString(0))
      assert(stored.nonEmpty)
      assert(stored.forall(f => !f.startsWith("/") && !f.contains(":/")))
      val before = AnnIndex.loadAt(spark, path, 2).codes
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      // relocate the WHOLE artifact directory (pointer-swap move) —
      // the old path is gone, so an absolute manifest would fail here
      val moved = s"$root/gen1"
      graft.core.Fs.rename(spark, path, moved)
      assert(!graft.core.Fs.exists(spark, path))
      val after = AnnIndex.loadAt(spark, moved, 2).codes
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      assert(after.length == n && before.sameElements(after))
    } finally rmDir(root)
  }

  test("versions(): stray names ignored, in-flight snapshots not listed") {
    val built = AnnIndex.build(vecs)
    val path = java.nio.file.Files.createTempDirectory("graft_annidx_vr").toString
    try {
      AnnIndex.save(spark, built, path)
      AnnIndex.snapshot(spark, path, 1)
      AnnIndex.snapshot(spark, path, 2)
      // a stray non-numeric name must not throw (old code: toInt NFE)
      java.nio.file.Files.createDirectory(
        java.nio.file.Paths.get(s"$path/manifest/vNOTES.parquet"))
      java.nio.file.Files.createFile(
        java.nio.file.Paths.get(s"$path/manifest/README.txt"))
      // an in-flight snapshot (still carrying _temporary) is not committed
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$path/manifest/v00009.parquet/_temporary"))
      assert(AnnIndex.versions(spark, path) == Seq(1, 2))
    } finally rmDir(path)
  }

  test("cell-partitioned generation: layout change only, search-identical") {
    val all = vecs
    val half = all.count() / 2
    val built = AnnIndex.build(all.filter(col("vec_id") < half))
    val path = java.nio.file.Files.createTempDirectory("graft_annidx_cp1").toString
    val path2 = java.nio.file.Files.createTempDirectory("graft_annidx_cp2").toString
    try {
      AnnIndex.save(spark, built, path)
      val loaded = AnnIndex.load(spark, path)
      AnnIndex.append(spark, loaded, all.filter(col("vec_id") >= half), path)
      AnnIndex.compactPartitioned(spark, path, path2)
      // physical layout: one cell=N directory per occupied coarse cell
      val dirs = new java.io.File(s"$path2/codes.parquet").listFiles()
        .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell="))
      val occupied = AnnIndex.load(spark, path).codes
        .select("cell").distinct().count()
      assert(dirs.length == occupied)
      // loadPartitioned restores the standard (vec_id, cell: long, codes)
      // shape, row for row
      val part = AnnIndex.loadPartitioned(spark, path2)
      assert(part.codes.columns.toSeq == Seq("vec_id", "cell", "codes"))
      assert(part.codes.schema("cell").dataType ==
        org.apache.spark.sql.types.LongType)
      val a = AnnIndex.load(spark, path).codes.orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      val b = part.codes.orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      assert(a.length == b.length && a.nonEmpty)
      a.zip(b).foreach { case (x, y) => assert(x == y) }
      // and the search is bit-identical across layouts
      val s1 = AnnIndex.searchTop5(AnnIndex.load(spark, path), all, 20)
        .collect().map(_.toSeq)
      val s2 = AnnIndex.searchTop5(part, all, 20).collect().map(_.toSeq)
      assert(s1.length == s2.length && s1.nonEmpty)
      s1.zip(s2).foreach { case (x, y) => assert(x == y) }
    } finally { rmDir(path); rmDir(path2) }
  }

  test("rollback physically restores a pinned version as the current state") {
    val all = vecs
    val n = all.count()
    val half = n / 2
    val built = AnnIndex.build(all.filter(col("vec_id") < half))
    val path = java.nio.file.Files.createTempDirectory("graft_annidx_rb").toString
    try {
      AnnIndex.save(spark, built, path)
      AnnIndex.snapshot(spark, path, 1)
      val loaded = AnnIndex.load(spark, path)
      // v2 arrives as a STREAM-STYLE committed batch dir with its marker
      assert(AnnIndex.appendIdempotent(spark, loaded,
        all.filter(col("vec_id") >= half), path, 11L))
      AnnIndex.snapshot(spark, path, 2)
      val v2 = AnnIndex.loadAt(spark, path, 2).codes.orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      // the incident: a junk batch (flat append), an over-broad delete,
      // a staged-but-never-committed batch — all post-v2
      AnnIndex.append(spark, loaded,
        all.withColumn("vec_id", col("vec_id") + lit(1048576L)), path)
      AnnIndex.delete(spark, all.filter(col("vec_id") % 10 === 3), path)
      AnnIndex.snapshot(spark, path, 3)
      new java.io.File(s"$path/_staging/batch-99").mkdirs()
      AnnIndex.rollback(spark, path, 2)
      // the directory state IS v2 again, row for row
      val cur = AnnIndex.load(spark, path).codes.orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      assert(cur.length == n && cur.sameElements(v2))
      // physical assertions: junk ids gone from the raw artifact,
      // tombstone artifact gone, v3 manifest gone, staging reclaimed,
      // the v2 committed batch dir and its marker retained
      val raw = spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$path/codes.parquet").select("vec_id").collect()
        .map(_.getLong(0))
      assert(raw.length == n && raw.forall(_ < 1048576L))
      assert(!graft.core.Fs.exists(spark, s"$path/tombstones.parquet"))
      assert(AnnIndex.versions(spark, path) == Seq(1, 2))
      assert(!graft.core.Fs.exists(spark, s"$path/_staging"))
      assert(graft.core.Fs.exists(spark, s"$path/codes.parquet/batch-11"))
      assert(graft.core.Fs.exists(spark, s"$path/_applied/batch-11"))
    } finally rmDir(path)
  }

  test("rollback past a committed batch dir removes it AND its epoch marker") {
    val all = vecs
    val half = all.count() / 2
    val built = AnnIndex.build(all.filter(col("vec_id") < half))
    val path = java.nio.file.Files.createTempDirectory("graft_annidx_rb2").toString
    try {
      AnnIndex.save(spark, built, path)
      AnnIndex.snapshot(spark, path, 1)
      val loaded = AnnIndex.load(spark, path)
      val batch = all.filter(col("vec_id") >= half)
      // the bad batch arrives as a committed epoch AFTER v1
      assert(AnnIndex.appendIdempotent(spark, loaded, batch, path, 4L))
      AnnIndex.rollback(spark, path, 1)
      assert(!graft.core.Fs.exists(spark, s"$path/codes.parquet/batch-4"))
      assert(!graft.core.Fs.exists(spark, s"$path/_applied/batch-4"))
      assert(AnnIndex.load(spark, path).codes.count() == half)
      // the epoch can legitimately RE-APPLY: its data was rolled away
      assert(AnnIndex.appendIdempotent(spark, loaded, batch, path, 4L))
      assert(AnnIndex.load(spark, path).codes.count() == all.count())
    } finally rmDir(path)
  }

  test("Fs.layoutBytes fails loudly on a missing layout") {
    val ex = intercept[IllegalArgumentException] {
      graft.core.Fs.layoutBytes(spark, "/tmp/graft_no_such_layout_dir")
    }
    assert(ex.getMessage.contains("does not exist"))
  }

  test("Fs.rename refuses an existing destination; loser's staging reclaimed") {
    val root = java.nio.file.Files.createTempDirectory("graft_fs_rn").toString
    try {
      // the winner's committed batch
      val dst = s"$root/codes.parquet/batch-3"
      new java.io.File(dst).mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dst/winner.parquet"), "w")
      // the loser's staged copy of the SAME batch
      val src = s"$root/_staging/batch-3-attempt2"
      new java.io.File(src).mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$src/loser.parquet"), "l")
      graft.core.Fs.rename(spark, src, dst)
      // ADVICE r10: FileSystem.rename onto an existing directory would
      // NEST the source (batch-3/batch-3-attempt2) and recursive readers
      // would double-count the batch. The refuse-existing rename must
      // leave the destination untouched and reclaim the staged source.
      val names = new java.io.File(dst).listFiles().map(_.getName).toSet
      assert(names == Set("winner.parquet"))
      assert(!graft.core.Fs.exists(spark, src))
      // a genuine (no-destination) rename still moves
      val src2 = s"$root/_staging/batch-4-attempt1"
      new java.io.File(src2).mkdirs()
      graft.core.Fs.rename(spark, src2, s"$root/codes.parquet/batch-4")
      assert(graft.core.Fs.exists(spark, s"$root/codes.parquet/batch-4"))
      assert(!graft.core.Fs.exists(spark, src2))
    } finally rmDir(root)
  }

  test("loadAt serves a pinned snapshot of a cell-partitioned generation") {
    val all = vecs
    val half = all.count() / 2
    val built = AnnIndex.build(all.filter(col("vec_id") < half))
    val path = java.nio.file.Files.createTempDirectory("graft_annidx_pp1").toString
    val path2 = java.nio.file.Files.createTempDirectory("graft_annidx_pp2").toString
    try {
      AnnIndex.save(spark, built, path)
      val loaded = AnnIndex.load(spark, path)
      AnnIndex.append(spark, loaded, all.filter(col("vec_id") >= half), path)
      AnnIndex.compactPartitioned(spark, path, path2)
      AnnIndex.snapshot(spark, path2, 1)
      // ADVICE r10: the manifest's explicit file list loses the
      // directory-encoded cell column unless loadAt re-anchors partition
      // discovery at the artifact's basePath; a pinned read of a
      // partitioned generation used to fail on the missing column.
      val at = AnnIndex.loadAt(spark, path2, 1)
      assert(at.codes.columns.toSeq == Seq("vec_id", "cell", "codes"))
      assert(at.codes.schema("cell").dataType ==
        org.apache.spark.sql.types.LongType)
      val a = AnnIndex.loadPartitioned(spark, path2).codes
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      val b = at.codes.orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      assert(a.length == b.length && a.nonEmpty)
      a.zip(b).foreach { case (x, y) => assert(x == y) }
      val s1 = AnnIndex.searchTop5(at, all, 20).collect().map(_.toSeq)
      val s2 = AnnIndex.searchTop5(AnnIndex.loadPartitioned(spark, path2), all, 20)
        .collect().map(_.toSeq)
      assert(s1.length == s2.length && s1.nonEmpty)
      s1.zip(s2).foreach { case (x, y) => assert(x == y) }
    } finally { rmDir(path); rmDir(path2) }
  }

  test("rollback restores FLAT-append epoch markers from the recorded ledger") {
    val all = vecs
    val half = all.count() / 2
    val built = AnnIndex.build(all.filter(col("vec_id") < half))
    val path = java.nio.file.Files.createTempDirectory("graft_annidx_rb3").toString
    try {
      AnnIndex.save(spark, built, path)
      // a FLAT-append epoch with its marker (the carried-ledger shape a
      // compacted generation has: marker, no batch directory)
      val loaded = AnnIndex.load(spark, path)
      AnnIndex.append(spark, loaded,
        all.filter(col("vec_id") >= half && col("vec_id") % 2 === 0), path)
      graft.core.Fs.touch(spark, s"$path/_applied/batch-21")
      AnnIndex.snapshot(spark, path, 1)
      val v1 = AnnIndex.loadAt(spark, path, 1).codes.orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      // a second flat epoch + marker, snapshotted as v2
      AnnIndex.append(spark, loaded,
        all.filter(col("vec_id") >= half && col("vec_id") % 2 === 1), path)
      graft.core.Fs.touch(spark, s"$path/_applied/batch-22")
      AnnIndex.snapshot(spark, path, 2)
      AnnIndex.rollback(spark, path, 1)
      // ADVICE r10: epoch 22's flat files leave no batch directory, so
      // the dir-emptied heuristic never touched its marker — a restarted
      // stream would then never re-apply the deliberately-removed epoch.
      // The recorded ledger restores the marker set to its v1 state.
      assert(!graft.core.Fs.exists(spark, s"$path/_applied/batch-22"))
      assert(graft.core.Fs.exists(spark, s"$path/_applied/batch-21"))
      val cur = AnnIndex.load(spark, path).codes.orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      assert(cur.nonEmpty && cur.sameElements(v1))
    } finally rmDir(path)
  }

  test("expire drops old manifests, keeps every retained-referenced file") {
    val all = vecs
    val n = all.count()
    val half = n / 2
    val built = AnnIndex.build(all.filter(col("vec_id") < half))
    val path = java.nio.file.Files.createTempDirectory("graft_annidx_exp").toString
    try {
      AnnIndex.save(spark, built, path)
      AnnIndex.snapshot(spark, path, 1)
      val loaded = AnnIndex.load(spark, path)
      AnnIndex.append(spark, loaded, all.filter(col("vec_id") >= half), path)
      AnnIndex.snapshot(spark, path, 2)
      AnnIndex.delete(spark, all.filter(col("vec_id") % 10 === 3), path)
      AnnIndex.snapshot(spark, path, 3)
      val preV2 = AnnIndex.loadAt(spark, path, 2).codes.orderBy("vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      val preCur = AnnIndex.load(spark, path).codes.orderBy("vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      val preFiles = graft.core.Fs.listDataFiles(spark, s"$path/codes.parquet")
      AnnIndex.expire(spark, path, keepLast = 2)
      // v1 is forgotten; v2/v3 remain
      assert(AnnIndex.versions(spark, path) == Seq(2, 3))
      assert(!graft.core.Fs.exists(spark, f"$path/manifest/v${1}%05d.parquet"))
      intercept[Exception] { AnnIndex.loadAt(spark, path, 1).codes.count() }
      // append-only history: v1's files are all in v2/v3's supersets, so
      // NO data file may be reclaimed — retained pinned reads and the
      // current masked state are bit-identical to before
      assert(graft.core.Fs.listDataFiles(spark, s"$path/codes.parquet") == preFiles)
      val postV2 = AnnIndex.loadAt(spark, path, 2).codes.orderBy("vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      assert(postV2.length == n && postV2.sameElements(preV2))
      val postCur = AnnIndex.load(spark, path).codes.orderBy("vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      assert(postCur.sameElements(preCur))
      // keeping at least the full history is a no-op
      AnnIndex.expire(spark, path, keepLast = 5)
      assert(AnnIndex.versions(spark, path) == Seq(2, 3))
    } finally rmDir(path)
  }

  test("expire reclaims files exclusive to expired versions (subtraction fires)") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_annidx_exf").toString
    try {
      // a two-file codes artifact with centroids, snapshotted as v1
      Seq((0, 0, Seq(0.0))).toDF("space", "cid", "cv")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids.parquet")
      Seq((1L, 0L, Seq(0L))).toDF("vec_id", "cell", "codes")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/codes.parquet/batch-1")
      Seq((2L, 0L, Seq(0L))).toDF("vec_id", "cell", "codes")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/codes.parquet/batch-2")
      graft.core.Fs.touch(spark, s"$path/_applied/batch-1")
      graft.core.Fs.touch(spark, s"$path/_applied/batch-2")
      AnnIndex.snapshot(spark, path, 1)
      // an out-of-band removal between snapshots (foreign writer /
      // partial restore): batch-1 leaves the lineage before v2 — v2's
      // manifest records only batch-2, yet batch-1's files are back on
      // disk when expire runs. This is exactly the history shape the
      // file-set subtraction exists for.
      val parked = java.nio.file.Files.createTempDirectory("graft_annidx_prk").toString
      graft.core.Fs.delete(spark, parked)
      graft.core.Fs.rename(spark, s"$path/codes.parquet/batch-1", parked)
      AnnIndex.snapshot(spark, path, 2)
      graft.core.Fs.rename(spark, parked, s"$path/codes.parquet/batch-1")
      AnnIndex.expire(spark, path, keepLast = 1)
      // batch-1 was referenced only by the expired v1: reclaimed, with
      // its emptied dir and epoch marker; batch-2 (retained) survives
      assert(!graft.core.Fs.exists(spark, s"$path/codes.parquet/batch-1"))
      assert(!graft.core.Fs.exists(spark, s"$path/_applied/batch-1"))
      assert(graft.core.Fs.exists(spark, s"$path/codes.parquet/batch-2"))
      assert(graft.core.Fs.exists(spark, s"$path/_applied/batch-2"))
      assert(AnnIndex.versions(spark, path) == Seq(2))
      val ids = spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$path/codes.parquet")
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      assert(ids == Seq(2L))
    } finally rmDir(path)
  }

  test("two committers racing one epoch id apply it exactly once") {
    val all = vecs
    val half = all.count() / 2
    val built = AnnIndex.build(all.filter(col("vec_id") < half))
    val path = java.nio.file.Files.createTempDirectory("graft_annidx_race").toString
    try {
      AnnIndex.save(spark, built, path)
      val loaded = AnnIndex.load(spark, path)
      val batch = all.filter(col("vec_id") >= half)
      // a zombie executor and its replacement: both stage privately and
      // race the atomic rename; Fs.rename's refuse-existing-destination
      // arbitration must leave exactly ONE committed copy (ADVICE r10:
      // the legacy rename semantics nested the loser INTO the winner and
      // recursive readers double-counted the batch).
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val ts = (1 to 2).map { _ =>
        new Thread(() => {
          try {
            barrier.await()
            AnnIndex.appendIdempotent(spark, loaded, batch, path, 42L)
            ()
          } catch { case t: Throwable => errs.add(t); () }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join(300000))
      assert(errs.isEmpty, s"racing committer failed: ${errs.peek()}")
      // single application: no nested directory, one data copy, marker on
      val dir = new java.io.File(s"$path/codes.parquet/batch-42")
      assert(dir.isDirectory && dir.listFiles().forall(!_.isDirectory))
      assert(AnnIndex.load(spark, path).codes.count() == all.count())
      assert(graft.core.Fs.exists(spark, s"$path/_applied/batch-42"))
      // the replayed epoch stays skipped after the race
      assert(!AnnIndex.appendIdempotent(spark, loaded, batch, path, 42L))
      assert(AnnIndex.load(spark, path).codes.count() == all.count())
    } finally rmDir(path)
  }

  test("mergeShards: refusals, tombstones applied per shard, merged == single-pipeline") {
    val all = vecs
    val half = all.count() / 2
    val built = AnnIndex.build(all.filter(col("vec_id") < half))
    val pa = java.nio.file.Files.createTempDirectory("graft_merge_a").toString
    val pb = java.nio.file.Files.createTempDirectory("graft_merge_b").toString
    val pm = java.nio.file.Files.createTempDirectory("graft_merge_m").toString
    val pSingle = java.nio.file.Files.createTempDirectory("graft_merge_s").toString
    try {
      AnnIndex.save(spark, built.copy(codes = AnnIndex.encode(
        all.filter(col("vec_id") % 2 === 0), built.coarse, built.pq)), pa)
      AnnIndex.save(spark, built.copy(codes = AnnIndex.encode(
        all.filter(col("vec_id") % 2 === 1), built.coarse, built.pq)), pb)
      // refusal 1: different codebooks (trained on a different slice)
      val other = AnnIndex.build(all.filter(col("vec_id") >= half))
      val pOther = java.nio.file.Files.createTempDirectory("graft_merge_o").toString
      try {
        AnnIndex.save(spark, other, pOther)
        intercept[IllegalArgumentException] {
          AnnIndex.mergeShards(spark, pa, pOther, pm)
        }
      } finally rmDir(pOther)
      // refusal 2: overlapping vec_id spaces (a shard merged with itself)
      intercept[IllegalArgumentException] {
        AnnIndex.mergeShards(spark, pa, pa, pm)
      }
      // refusal 3: destination is a source / already holds artifact files
      intercept[IllegalArgumentException] {
        AnnIndex.mergeShards(spark, pa, pb, pa)
      }
      // refusal 3b: an ALIASED spelling of a source (trailing slash,
      // doubled separator) is still the source — the identity guard
      // compares canonical paths, not strings (ADVICE r11)
      intercept[IllegalArgumentException] {
        AnnIndex.mergeShards(spark, pa, pb, pa + "/")
      }
      intercept[IllegalArgumentException] {
        AnnIndex.mergeShards(spark, pa, pb, pb.replaceFirst("/graft_", "//graft_"))
      }
      // ... and a `dir/../dir` spelling (ADVICE r12: Hadoop Path leaves
      // dot-dot segments intact; Fs.qualified now URI-normalizes them)
      val paDotDot = {
        val p = java.nio.file.Paths.get(pa)
        s"${p.getParent}/${p.getFileName}/../${p.getFileName}"
      }
      intercept[IllegalArgumentException] {
        AnnIndex.mergeShards(spark, pa, pb, paDotDot)
      }
      // refusal 3c: a reused destination carrying only a stale ledger
      // or manifest (no codes/tombstones) is NOT fresh — a leftover
      // _applied/batch-N would make a later appendIdempotent silently
      // skip epoch N, and a stale manifest/ poisons loadAt (ADVICE r11)
      val pStale = java.nio.file.Files.createTempDirectory("graft_merge_stale").toString
      try {
        graft.core.Fs.touch(spark, s"$pStale/_applied/batch-7")
        intercept[IllegalArgumentException] {
          AnnIndex.mergeShards(spark, pa, pb, pStale)
        }
        graft.core.Fs.delete(spark, s"$pStale/_applied")
        graft.core.Fs.touch(spark, s"$pStale/manifest/v00001.parquet")
        intercept[IllegalArgumentException] {
          AnnIndex.mergeShards(spark, pa, pb, pStale)
        }
      } finally rmDir(pStale)
      // takedown broadcast to both shards; rows live only in the odd one
      val takedown = all.filter(col("vec_id") % 10 === 3).select("vec_id")
      AnnIndex.delete(spark, takedown, pa)
      AnnIndex.delete(spark, takedown, pb)
      AnnIndex.mergeShards(spark, pa, pb, pm)
      // merged generation is tombstone-free and physically excludes them
      assert(!graft.core.Fs.exists(spark, s"$pm/tombstones.parquet"))
      val mergedIds = spark.read.parquet(s"$pm/codes.parquet")
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val wantIds = all.filter(col("vec_id") % 10 =!= 3)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(mergedIds == wantIds)
      // sharding-independence: the merged search equals the
      // single-pipeline artifact's (same codebooks, same survivors)
      AnnIndex.save(spark, built.copy(codes = AnnIndex.encode(
        all, built.coarse, built.pq)), pSingle)
      AnnIndex.delete(spark, takedown, pSingle)
      val q = all.filter(col("vec_id") % 10 =!= 3)
      val got = AnnIndex.searchTop5(AnnIndex.load(spark, pm), q, 20)
        .collect().map(_.toString).sorted.toSeq
      val want = AnnIndex.searchTop5(AnnIndex.load(spark, pSingle), q, 20)
        .collect().map(_.toString).sorted.toSeq
      assert(got.nonEmpty && got == want)
    } finally { rmDir(pa); rmDir(pb); rmDir(pm); rmDir(pSingle) }
  }
}
