package graft.ingest

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned snapshot log for topic tables — the minimal transactional
  * lakehouse layer (the reference offloads to Delta; with no Delta jar
  * in the container we own the commit log, SURVEY.md §7).
  *
  * Layout: `<root>/<prefix>._log/v%05d.json`, each snapshot pinning
  * the exact data-file set and the offload watermark at commit time:
  *
  * {{{ {"version": 2, "maxPos": 2999, "files": ["part-...parquet", ...]} }}}
  *
  * Properties:
  *  - readers of version N see exactly N's file set — concurrent
  *    appends never tear a scan (snapshot isolation);
  *  - time travel = reading an old version;
  *  - the commit is one atomic file create (rename-free on local fs;
  *    on object storage this would be a conditional put);
  *  - at 100 TB the log stores file names, not data — O(files) cost,
  *    same shape Delta/Iceberg manifests take.
  */
object Snapshots {

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

  /** Commit the table's current state as the next version. */
  def commit(root: String, prefix: String, maxPos: Long): Int = {
    val next = versions(root, prefix).lastOption.map(_ + 1).getOrElse(0)
    val files = listDataFiles(root, prefix)
    val json = s"""{"version": $next, "maxPos": $maxPos, "files": [""" +
      files.map(f => "\"" + f + "\"").mkString(", ") + "]}"
    Files.createDirectories(logDir(root, prefix))
    Files.writeString(logDir(root, prefix).resolve(f"v$next%05d.json"), json)
    next
  }

  final case class Snapshot(version: Int, maxPos: Long, files: Seq[String])

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
      val files = "\"([^\"]+\\.parquet)\"".r.findAllMatchIn(s).map(_.group(1)).toSeq
      Snapshot(ver, maxPos, files)
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
}
