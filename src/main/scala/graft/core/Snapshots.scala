package graft.core

import org.apache.spark.sql.SparkSession

/** The versioned-manifest layer shared by every persisted index
  * artifact (AnnIndex since round 9, DedupIndex since round 11) — the
  * Delta/Iceberg commit pattern distilled: every artifact mutation is
  * append-only (appends add data files, deletes add tombstone files,
  * save/compact write NEW directories), so recording the CURRENT file
  * sets as a manifest freezes a servable version forever; pinned reads,
  * rollback, and retention are all file-set operations over those
  * manifests. The machinery is artifact-agnostic — an artifact is just
  * its root `path`, its data directory names, and the `_applied` epoch
  * ledger — which is why it lives here rather than in either index:
  * the contracts (root-relative paths for relocatability, the
  * applied-ledger sentinel for exact marker restore, the
  * in-flight-write guard in versions()) were each bought with a gated
  * bug (ADVICE r9/r10) and must not fork per artifact.
  *
  * Path coordinates: manifests store ARTIFACT-ROOT-RELATIVE paths
  * (ADVICE r9: absolute URIs break every pinned version the moment the
  * artifact relocates — including the compact pointer-swap pattern);
  * [[resolve]] re-anchors them at read time, and legacy absolute
  * entries pass through for backward compatibility.
  */
object Snapshots {

  def manifestPath(path: String, version: Int): String =
    f"$path/manifest/v$version%05d.parquet"

  /** Record the artifact's CURRENT file sets as snapshot `version`: one
    * (kind, file) row per data file of each `(kind, dirName)` in
    * `dataDirs`, plus the `_applied` epoch-marker set and the
    * `applied-ledger-v1` meta sentinel (the sentinel distinguishes
    * "this manifest records the ledger" from a pre-ledger manifest
    * whose empty applied set means "unknown", not "none" — ADVICE r10).
    * Bounded by FILE COUNT — the driver-side manifest scale every real
    * table format accepts.
    *
    * Kinds in `latestGenOnly` hold gen-N commit-unit DIRECTORIES whose
    * readers only ever serve the latest generation (DedupIndex's label
    * forest): for those, the manifest records just the served gen —
    * recording superseded gens would pin them in every future
    * manifest, so [[expire]] could never vacuum an old generation
    * while any newer snapshot existed. An older gen stays reachable
    * exactly as long as a retained manifest records it as ITS latest —
    * the as-of pinning contract is unchanged.
    *
    * WHICH gen is served comes from `pinnedGens` when the caller just
    * wrote one (it knows the number — DedupIndex.snapshot threads it
    * from saveForest's caller), else is CARRIED FORWARD from the
    * previous manifest: a snapshot that did not touch the forest
    * serves whatever the last snapshot served. ADVICE r13: the old
    * newest-non-empty-directory inference would silently promote a
    * complete-but-ABANDONED higher-numbered gen (crash after
    * saveForest's commit, before its snapshot) into the next
    * snapshot's serve state. The directory inference remains only as
    * the first-ever-snapshot fallback (no previous manifest to carry
    * from). */
  def snapshot(spark: SparkSession, path: String, version: Int,
      dataDirs: Seq[(String, String)],
      latestGenOnly: Set[String] = Set.empty,
      pinnedGens: Map[String, Int] = Map.empty): Unit = {
    import spark.implicits._
    lazy val prev: Option[Seq[(String, String)]] =
      versions(spark, path).filter(_ < version).lastOption
        .map(v => entries(spark, path, v))
    def files(kind: String, dir: String): Seq[(String, String)] =
      if (latestGenOnly(kind)) pinnedGens.get(kind) match {
        case Some(n) =>
          val fs = Fs.listDataFiles(spark, s"$dir/gen-$n")
          require(fs.nonEmpty,
            s"snapshot: pinned $kind gen-$n at $dir has no data files")
          fs.map(f => (kind, Fs.relativize(spark, path, f)))
        case None if prev.isDefined =>
          // carry the previous manifest's served generation forward
          // (possibly none, when the artifact has never had one)
          prev.get.filter(_._1 == kind)
        case None =>
          if (!Fs.exists(spark, dir)) Seq.empty
          // first-ever snapshot of a pre-existing directory: newest
          // gen WITH data files — a crashed writer's empty or
          // in-flight gen dir (hidden `_temporary` only) must not
          // mask the generation actually being served
          else Fs.listPrefixedDirs(spark, dir, "gen-")
            .flatMap(g => scala.util.Try(g.stripPrefix("gen-").toInt).toOption)
            .sorted.reverse.iterator
            .map(n => Fs.listDataFiles(spark, s"$dir/gen-$n"))
            .find(_.nonEmpty).getOrElse(Seq.empty)
            .map(f => (kind, Fs.relativize(spark, path, f)))
      }
      else if (!Fs.exists(spark, dir)) Seq.empty
      else
        Fs.listDataFiles(spark, dir)
          .map(f => (kind, Fs.relativize(spark, path, f)))
    val applied = Fs.listMarkers(spark, s"$path/_applied")
      .map(m => ("applied", s"_applied/$m"))
    (dataDirs.flatMap { case (kind, dirName) =>
      files(kind, s"$path/$dirName")
    } ++ applied :+ (("meta", "applied-ledger-v1")))
      .toDF("kind", "file")
      .coalesce(1).sortWithinPartitions("kind", "file")
      .write.mode("overwrite").parquet(manifestPath(path, version))
  }

  private val VersionName = """v(\d+)\.parquet""".r

  /** The committed snapshot versions, ascending — one bounded
    * listStatus of the manifest directory. Only entries matching
    * `v{digits}.parquet` count (a stray name no longer throws —
    * ADVICE r9), and an IN-FLIGHT snapshot write (its directory still
    * carrying `_temporary`) is not yet a committed version. */
  def versions(spark: SparkSession, path: String): Seq[Int] = {
    val dir = new org.apache.hadoop.fs.Path(s"$path/manifest")
    val hfs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!hfs.exists(dir)) Seq.empty
    else hfs.listStatus(dir).flatMap { st =>
      st.getPath.getName match {
        case VersionName(n) if !hfs.exists(
          new org.apache.hadoop.fs.Path(st.getPath, "_temporary")) =>
          Some(n.toInt)
        case _ => None
      }
    }.sorted.toSeq
  }

  /** One bounded collect of a manifest's (kind, file) rows. */
  def entries(spark: SparkSession, path: String, version: Int): Seq[(String, String)] =
    spark.read.parquet(manifestPath(path, version))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq

  /** Resolve a manifest entry against THIS artifact root, so a
    * relocated artifact serves its pinned history from wherever it
    * lives now. Absolute entries (pre-relative manifests) pass through
    * untouched. */
  def resolve(path: String, file: String): String =
    if (file.startsWith("/") || file.contains(":/")) file
    else s"$path/$file"

  private def relativized(spark: SparkSession, path: String, file: String): String =
    if (file.startsWith("/") || file.contains(":/"))
      Fs.relativize(spark, path, file)
    else file

  /** ROLL BACK the artifact to snapshot `toVersion`: every data file
    * under `dirNames` not referenced by a manifest ≤ `toVersion` is
    * deleted (compared by root-relative name — the manifest's own
    * coordinate system), newer manifests are dropped, emptied
    * committed-batch dirs disappear with their `_applied` markers (the
    * rolled-back epochs SHOULD re-apply if a restarted stream
    * re-delivers them — their data was deliberately removed), emptied
    * artifact dirs are removed outright (an empty parquet dir would
    * fail schema inference on load), and `_staging` leftovers are
    * reclaimed (staged-but-uncommitted work is replayable by
    * definition). When the target manifest records the versioned
    * applied ledger (the meta sentinel), the marker set is additionally
    * restored to exactly its as-of state — what makes the re-apply
    * contract hold for FLAT-append epochs whose files leave no batch
    * directory behind (ADVICE r10); for a legacy manifest the batch-dir
    * heuristic remains the only marker cleanup (restoring to an
    * unrecorded set could drop markers of surviving flat epochs and
    * double-apply them on replay). Append-only mutation is what makes
    * this safe: a file referenced by v≤N was never rewritten afterward,
    * so keeping exactly the referenced set restores the bit-exact v≤N
    * state. Cost: one bounded manifest collect per retained version +
    * one recursive listing + per-file deletes — tracks FILE COUNT,
    * never data volume. */
  def rollback(spark: SparkSession, path: String, toVersion: Int,
      dirNames: Seq[String]): Unit = {
    val vs = versions(spark, path)
    require(vs.contains(toVersion), s"no committed snapshot v$toVersion at $path")
    // One manifest collect per retained version; toVersion's rows are
    // reused below for the ledger restore (round 15, guide §1.2: the
    // old shape collected toVersion's manifest a second time — one
    // redundant Spark job + parquet read per rollback).
    val collected: Seq[(Int, Seq[(String, String)])] =
      vs.filter(_ <= toVersion).map(v => v -> entries(spark, path, v))
    val keep: Set[String] = collected.flatMap { case (_, es) =>
      es.map { case (_, f) => relativized(spark, path, f) }
    }.toSet
    dirNames.foreach { dirName =>
      val dir = s"$path/$dirName"
      if (Fs.exists(spark, dir)) {
        Fs.listDataFiles(spark, dir).foreach { f =>
          if (!keep(Fs.relativize(spark, path, f))) Fs.delete(spark, f)
        }
        dropEmptiedDirs(spark, path, dir)
      }
    }
    val manRows = collected.last._2 // == entries(toVersion); vs is ascending
    if (manRows.contains(("meta", "applied-ledger-v1"))) {
      val recorded = manRows.collect {
        case ("applied", f) => f.stripPrefix("_applied/")
      }.toSet
      val current = Fs.listMarkers(spark, s"$path/_applied")
      current.filterNot(recorded)
        .foreach(m => Fs.delete(spark, s"$path/_applied/$m"))
      recorded.diff(current.toSet)
        .foreach(m => Fs.touch(spark, s"$path/_applied/$m"))
    }
    vs.filter(_ > toVersion)
      .foreach(v => Fs.delete(spark, manifestPath(path, v)))
    Fs.delete(spark, s"$path/_staging")
  }

  /** EXPIRE snapshot history older than the last `keepLast` versions —
    * retention/vacuum, exactly Delta/Iceberg `VACUUM` /
    * `expire_snapshots`: the OLDEST `versions - keepLast` manifests are
    * dropped, and any data file (a manifest row whose kind is in
    * `dataKinds`) referenced by an expired manifest but by NO retained
    * one — rollback's file-set subtraction generalized from "roll back
    * to v" to "forget before v" — is deleted, with emptied batch dirs
    * losing their `_applied` markers. The CURRENT state is untouched by
    * construction: a file the directory still serves is either in a
    * retained manifest (kept) or in no manifest at all (post-snapshot
    * appends — never in the expired-referenced set). Under append-only
    * mutation newer manifests are supersets of older ones, so the
    * exclusive set is empty and expire reclaims only manifest history;
    * the subtraction is what makes expire SAFE on histories with
    * out-of-band removals. No `_staging` sweep: expire may run beside a
    * live writer whose staged work is in flight. */
  def expire(spark: SparkSession, path: String, keepLast: Int,
      dataKinds: Set[String], dirNames: Seq[String]): Unit = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val vs = versions(spark, path)
    if (vs.length <= keepLast) return
    val (expired, retained) = vs.splitAt(vs.length - keepLast)
    def fileSet(v: Int): Set[String] =
      entries(spark, path, v).collect {
        case (k, f) if dataKinds(k) => relativized(spark, path, f)
      }.toSet
    val keep = retained.flatMap(fileSet).toSet
    expired.flatMap(fileSet).toSet.diff(keep)
      .foreach(f => Fs.delete(spark, s"$path/$f"))
    dirNames.foreach { dirName =>
      val dir = s"$path/$dirName"
      if (Fs.exists(spark, dir)) dropEmptiedDirs(spark, path, dir)
    }
    expired.foreach(v => Fs.delete(spark, manifestPath(path, v)))
  }

  /** A committed-batch dir emptied of data files is gone — and its
    * epoch marker with it, so the epoch can legitimately re-apply; an
    * artifact dir emptied of data files is gone outright. */
  private def dropEmptiedDirs(spark: SparkSession, path: String, dir: String): Unit = {
    Fs.listBatchDirs(spark, dir).foreach { b =>
      if (Fs.listDataFiles(spark, s"$dir/$b").isEmpty) {
        Fs.delete(spark, s"$dir/$b")
        Fs.delete(spark, s"$path/_applied/$b")
      }
    }
    // forest generations follow the same commit-unit discipline but
    // carry no applied-epoch marker: an emptied gen-N is simply gone
    // (a rolled-back maintenance run's gen must not linger as an empty
    // directory next to the retained generations)
    Fs.listPrefixedDirs(spark, dir, "gen-").foreach { g =>
      if (Fs.listDataFiles(spark, s"$dir/$g").isEmpty)
        Fs.delete(spark, s"$dir/$g")
    }
    if (Fs.listDataFiles(spark, dir).isEmpty) Fs.delete(spark, dir)
  }
}
