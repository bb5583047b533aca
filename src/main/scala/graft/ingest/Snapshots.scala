package graft.ingest

import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned snapshot log for topic tables — the minimal transactional
  * lakehouse layer (the reference offloads to Delta; with no Delta jar
  * in the container we own the commit log, SURVEY.md §7).
  *
  * Layout: `<root>/<prefix>._log/v%05d.json`, each snapshot pinning
  * the exact data-file set, the files it superseded (compaction), and
  * the offload watermark at commit time:
  *
  * {{{ {"version": 2, "maxPos": 2999, "files": [...], "removed": [...]} }}}
  *
  * Properties:
  *  - readers of version N see exactly N's file set — concurrent
  *    appends never tear a scan (snapshot isolation);
  *  - time travel = reading an old version;
  *  - the commit is one atomic CREATE_NEW file create — two writers
  *    racing to the same version lose deterministically
  *    ([[ConcurrentCommitException]]); append commits retry against
  *    the fresh log state (append⋈append never conflicts logically,
  *    exactly Delta's optimistic-concurrency rule);
  *  - [[compact]] rewrites a snapshot's small files into one file per
  *    partition and commits a version that supersedes (NOT deletes)
  *    the originals — older versions stay readable until [[vacuum]];
  *  - at 100 TB the log stores file names, not data — O(files) cost,
  *    same shape Delta/Iceberg manifests take.
  */
object Snapshots {

  final class ConcurrentCommitException(version: Int)
    extends RuntimeException(s"concurrent commit lost the race for v$version")

  private def logDir(root: String, prefix: String): Path =
    Paths.get(s"$root/$prefix._log")

  private def dataDir(root: String, prefix: String): Path =
    Paths.get(Topics.tableDir(root, prefix))

  /** Current committed versions, ascending. */
  def versions(root: String, prefix: String): Seq[Int] = {
    val d = logDir(root, prefix)
    if (!Files.isDirectory(d)) Seq.empty
    else Files.list(d).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.matches("v\\d{5}\\.json") => s.substring(1, 6).toInt }
      .toSeq.sorted
  }

  /** List current data files under the table dir (recursive, parquet
    * only), relative to the table dir. */
  private def listDataFiles(root: String, prefix: String): Seq[String] = {
    val base = dataDir(root, prefix)
    if (!Files.isDirectory(base)) Seq.empty
    else Files.walk(base).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .map(p => base.relativize(p).toString)
      .toSeq.sorted
  }

  /** Every file any snapshot ≤ `upTo` superseded via compaction. */
  private def removedUpTo(root: String, prefix: String, upTo: Int): Set[String] =
    versions(root, prefix).filter(_ <= upTo)
      .flatMap(v => snapshot(root, prefix, Some(v)).map(_.removed).getOrElse(Seq.empty))
      .toSet

  /** Every file any committed snapshot pins. */
  private def referencedFiles(root: String, prefix: String): Set[String] =
    versions(root, prefix)
      .flatMap(v => snapshot(root, prefix, Some(v)).map(_.files).getOrElse(Seq.empty))
      .toSet

  /** Marker prefix for compaction rewrites. Compaction must write its
    * output BEFORE committing the snapshot that pins it; if that commit
    * loses the race or the process dies, the rewrites are orphans on
    * disk. A directory-listing commit would adopt them — duplicating
    * every compacted row — so rewrites carry this basename marker and
    * [[commit]] only trusts marked files a snapshot already references. */
  private[graft] val CompactedPrefix = "compacted-"

  private def isCompacted(relPath: String): Boolean =
    Paths.get(relPath).getFileName.toString.startsWith(CompactedPrefix)

  /** Atomic write of one snapshot version; loses the race loudly.
    * (private[graft]: the conflict spec exercises the collision
    * directly — a live thread race can't be scheduled deterministically.) */
  private[graft] def writeSnapshot(root: String, prefix: String, version: Int,
                            maxPos: Long, files: Seq[String],
                            removed: Seq[String]): Int = {
    def arr(xs: Seq[String]) = xs.map(f => "\"" + f + "\"").mkString("[", ", ", "]")
    val json =
      s"""{"version": $version, "maxPos": $maxPos, "files": ${arr(files)}, "removed": ${arr(removed)}}"""
    Files.createDirectories(logDir(root, prefix))
    try {
      Files.writeString(logDir(root, prefix).resolve(f"v$version%05d.json"), json,
        StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
      version
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new ConcurrentCommitException(version)
    }
  }

  /** Commit the table's current state as the next version. Append
    * commits never conflict logically, so a lost race is retried
    * against the re-read log (bounded; then the exception surfaces). */
  def commit(root: String, prefix: String, maxPos: Long, retries: Int = 5): Int = {
    val next = versions(root, prefix).lastOption.map(_ + 1).getOrElse(0)
    val referenced = referencedFiles(root, prefix)
    val files = (listDataFiles(root, prefix).toSet --
      removedUpTo(root, prefix, next - 1))
      // orphaned compaction rewrites (lost race / mid-compact crash)
      // re-pack rows the originals still deliver — adopting them would
      // double those rows, so only snapshot-referenced ones qualify
      .filter(f => !isCompacted(f) || referenced(f))
      .toSeq.sorted
    try writeSnapshot(root, prefix, next, maxPos, files, Seq.empty)
    catch {
      case e: ConcurrentCommitException =>
        if (retries > 0) commit(root, prefix, maxPos, retries - 1) else throw e
    }
  }

  final case class Snapshot(version: Int, maxPos: Long,
                            files: Seq[String], removed: Seq[String])

  /** Load a snapshot (latest if version is None). */
  def snapshot(root: String, prefix: String, version: Option[Int] = None): Option[Snapshot] = {
    val vs = versions(root, prefix)
    val v = version match {
      case Some(x) => if (vs.contains(x)) Some(x) else None
      case None => vs.lastOption
    }
    v.map { ver =>
      val s = Files.readString(logDir(root, prefix).resolve(f"v$ver%05d.json"))
      val maxPos = "\"maxPos\":\\s*(-?\\d+)".r.findFirstMatchIn(s).map(_.group(1).toLong).getOrElse(-1L)
      def arr(key: String): Seq[String] =
        s"""\"$key\":\\s*\\[([^\\]]*)\\]""".r.findFirstMatchIn(s)
          .map(m => "\"([^\"]+)\"".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq)
          .getOrElse(Seq.empty)
      val files = arr("files")
      // pre-"removed" snapshots (round 1) stored only "files"
      Snapshot(ver, maxPos, files, arr("removed"))
    }
  }

  /** Read the table as of a version (default latest): exactly the
    * committed file set, regardless of files appended since. */
  def read(spark: SparkSession, root: String, prefix: String,
           version: Option[Int] = None): DataFrame = {
    val snap = snapshot(root, prefix, version).getOrElse(
      sys.error(s"no snapshot for $prefix${version.map(" v" + _).getOrElse("")}"))
    val base = dataDir(root, prefix)
    if (snap.files.isEmpty) spark.emptyDataFrame
    else spark.read
      // partition-column recovery needs the table root
      .option("basePath", base.toString)
      .parquet(snap.files.map(f => base.resolve(f).toString): _*)
  }

  /** Incremental read (CDC-style): exactly the rows ADDED between
    * `fromVersion` (exclusive) and `toVersion` (inclusive, default
    * latest) — the file-set difference, excluding compaction rewrites
    * (a compacted file only re-packs rows an earlier version already
    * delivered, so it is NOT a change). Consumers that checkpoint the
    * last version they processed get append-only change feeds without
    * rescanning the table. */
  def readChanges(spark: SparkSession, root: String, prefix: String,
                  fromVersion: Int, toVersion: Option[Int] = None): DataFrame = {
    require(snapshot(root, prefix, Some(fromVersion)).isDefined,
      s"no snapshot v$fromVersion for $prefix")
    val to = snapshot(root, prefix, toVersion).getOrElse(
      sys.error(s"no snapshot for $prefix"))
    // per-commit attribution: an append commit's changes are its file
    // additions; a compaction commit (removed non-empty) re-packs rows
    // earlier versions already delivered — it contributes nothing, and
    // skipping it keeps earlier appends' files (not their compacted
    // replacements) as the change source
    val added = versions(root, prefix)
      .filter(v => v > fromVersion && v <= to.version)
      .flatMap { v =>
        val cur = snapshot(root, prefix, Some(v)).get
        if (cur.removed.nonEmpty) Seq.empty
        else (cur.files.toSet --
          snapshot(root, prefix, Some(v - 1)).map(_.files.toSet).getOrElse(Set.empty)).toSeq
      }.distinct.sorted
    val base = dataDir(root, prefix)
    if (added.isEmpty) {
      // empty frame with the table's schema
      read(spark, root, prefix, Some(to.version)).limit(0)
    } else spark.read
      .option("basePath", base.toString)
      .parquet(added.map(f => base.resolve(f).toString): _*)
  }

  /** Compact the latest snapshot: per partition directory, rewrite its
    * small files into one, and commit a version that pins the rewritten
    * set and records the originals as superseded. Data is unchanged
    * (same rows, same watermark); old versions stay readable until
    * [[vacuum]]. Returns the committed version. */
  def compact(spark: SparkSession, root: String, prefix: String): Int = {
    val snap = snapshot(root, prefix, None).getOrElse(
      sys.error(s"nothing to compact for $prefix"))
    val base = dataDir(root, prefix)
    val byDir = snap.files.groupBy(f =>
      Option(Paths.get(f).getParent).map(_.toString).getOrElse(""))
    val keep = Seq.newBuilder[String]
    val superseded = Seq.newBuilder[String]
    byDir.foreach { case (dir, fs) =>
      if (fs.size <= 1) keep ++= fs // already one file — nothing to win
      else {
        val before = listDataFiles(root, prefix).toSet
        val df = spark.read.option("basePath", base.toString)
          .parquet(fs.map(f => base.resolve(f).toString): _*)
        // partition values live in the directory name — drop the
        // recovered column before writing back INTO that directory
        val dirCols = dir.split("/").filter(_.contains("=")).map(_.split("=")(0))
        dirCols.foldLeft(df)((d, c) => d.drop(c))
          .coalesce(1).write.mode("append")
          .parquet(base.resolve(dir).toString)
        // mark the rewrites: until a snapshot pins them they are
        // UNCOMMITTED, and commit() must never adopt them from a
        // directory listing (lost race / crash ⇒ duplicated rows)
        (listDataFiles(root, prefix).toSet -- before).foreach { rel =>
          val abs = base.resolve(rel)
          val marked = abs.resolveSibling(CompactedPrefix + abs.getFileName)
          Files.move(abs, marked)
          keep += base.relativize(marked).toString
        }
        superseded ++= fs
      }
    }
    val removed = superseded.result()
    if (removed.isEmpty) snap.version // nothing rewritten — no new version
    else {
      // the compaction snapshot = (latest files − originals) + rewrites;
      // recomputing against the CURRENT latest on each attempt lets a
      // lost race against a concurrent append retry with that append's
      // files included (append ⋈ compact never conflicts logically)
      val rewrites = keep.result()
      val gone = removed.toSet
      var attempts = 5
      var committed = -1
      while (committed < 0) {
        val cur = snapshot(root, prefix, None).get
        val files = ((cur.files.toSet -- gone) ++ rewrites).toSeq.sorted
        try committed = writeSnapshot(root, prefix, cur.version + 1,
          cur.maxPos max snap.maxPos, files, removed)
        catch {
          case e: ConcurrentCommitException =>
            attempts -= 1; if (attempts <= 0) throw e
        }
      }
      committed
    }
  }

  /** Physically delete files that only versions older than `keepFrom`
    * reference, then drop those versions' log entries (Delta VACUUM +
    * log cleanup). Time travel below `keepFrom` is gone afterwards. */
  def vacuum(root: String, prefix: String, keepFrom: Int): Unit = {
    val vs = versions(root, prefix)
    val keepVs = vs.filter(_ >= keepFrom)
    val referenced = keepVs
      .flatMap(v => snapshot(root, prefix, Some(v)).map(_.files).getOrElse(Seq.empty))
      .toSet
    val base = dataDir(root, prefix)
    listDataFiles(root, prefix)
      .filterNot(referenced)
      .foreach(f => Files.deleteIfExists(base.resolve(f)))
    vs.filter(_ < keepFrom).foreach(v =>
      Files.deleteIfExists(logDir(root, prefix).resolve(f"v$v%05d.json")))
  }
}
