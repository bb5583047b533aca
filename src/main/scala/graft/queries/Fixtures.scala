package graft.queries

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

import graft.Tables

/** Content-keyed once-per-fixture staging (the stageEventsDir idiom,
  * shared): queries whose declared behavior is a READ over a derived
  * layout (partitioned fact table, bucketed catalog table) build that
  * layout once per fixture content and re-use it afterwards — so a
  * timed run measures the declared read, not fixture construction,
  * and timings don't depend on run order. The staged dir is built in
  * a temp dir renamed into place atomically; an interrupted run can
  * never leave a half-staged dir a later run would trust. */
object Fixtures {

  /** Digest of the source table's identity + content stamp. Folds
    * every file's (path, mtime, size) — walking partitioned/nested
    * layouts recursively — so regenerating fixture data in place
    * (same part-file names overwritten, parent mtime untouched) still
    * changes the key. SHA-256 truncated to 96 bits: a 32-bit
    * String.hashCode collision between two fixture contents would
    * silently serve a stale staged layout (including q67's persisted
    * IVF index, where staleness changes RESULTS with no error). */
  private[queries] def contentKey(dir: String, table: String): String = {
    val f = new java.io.File(Tables.path(dir, table))
    def walk(x: java.io.File): Seq[java.io.File] =
      if (x.isDirectory)
        Option(x.listFiles()).map(_.toSeq.sortBy(_.getName).flatMap(walk)).getOrElse(Seq.empty)
      else Seq(x)
    val perFile = walk(f)
      .map(c => s"${c.getAbsolutePath}:${c.lastModified}:${c.length}").mkString(",")
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest((dir + "@" + f.lastModified + ":" + f.length + "|" + perFile)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(12).map(b => f"$b%02x").mkString
  }

  /** Returns a directory staged by `build` exactly once per
    * (tag, source content); concurrent/racing builders lose cleanly. */
  def stagedDir(dir: String, srcTable: String, tag: String)
               (build: String => Unit): String = synchronized {
    val staged = new java.io.File(s"/tmp/graft/${tag}_${contentKey(dir, srcTable)}")
    if (!staged.isDirectory) {
      staged.getParentFile.mkdirs()
      val tmp = new java.io.File(staged.getParent,
        staged.getName + ".tmp." + UUID.randomUUID().toString.take(8))
      build(tmp.getAbsolutePath)
      if (!tmp.renameTo(staged)) { // lost a cross-process race: theirs is complete
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(tmp)
      }
    }
    staged.getAbsolutePath
  }

  private val live = new ConcurrentHashMap[(SparkSession, String), String]()

  /** Run `build` when the (session, tag)'s LIVE source content differs
    * from the last build — for catalog side effects (bucketed tables)
    * that live in the session, not on disk. A later call with a
    * different scale factor rebuilds (the table name is shared, so
    * "built once ever" would silently serve the wrong fixture). */
  def once(s: SparkSession, dir: String, srcTable: String, tag: String)
          (build: => Unit): Unit = {
    val key = contentKey(dir, srcTable)
    live.compute((s, tag), (_, prev) => { if (prev != key) build; key })
    ()
  }

  /** The SHARED staged IVF index over `embeddings` — one artifact on
    * disk serving q67's search, q227's SemDeDup, q255b's blocked
    * SMOTE, q273's nprobe curve, q278's label noise, and q304's
    * decontamination. Cell count SCALES with the corpus
    * ([[graft.operators.IvfIndex.scaledK]]: k = max(16, ⌊√n⌋)) so the
    * blocked operators' in-cell pair work stays sub-quadratic at any
    * scale; the DuckDB twin ([[ivfAssignCtes]]) computes the same k
    * from the same COUNT(*). */
  private[graft] def stagedIvf(s: SparkSession, dir: String): String = {
    import org.apache.spark.sql.functions.{col, transform}
    import graft.operators.IvfIndex
    stagedDir(dir, "embeddings", "ivf_index_v3") { tmp =>
      val emb = Tables.embeddings(s, dir)
      val k = IvfIndex.scaledK(emb.count())
      val built = IvfIndex.centroids(emb, "vec_id", "embedding", k)
      IvfIndex.persist(IvfIndex.assignCells(
        emb.select(col("vec_id").as("id"),
          transform(col("embedding"), x => x.cast("double")).as("v")),
        "v", built.map(_.toIndexedSeq).toIndexedSeq), tmp)
      IvfIndex.writeCentroids(built, tmp)
    }
  }

  /** Left-fold distance² between two DuckDB lists (the q35-proven
    * list_reduce form — sequential accumulation, matching Spark's
    * aggregate(zip_with(...)) bit-for-bit). */
  private[queries] def ivfD2(vec: String, cent: String): String =
    s"""list_reduce(list_prepend(0.0, list_transform(generate_series(1,64),
       |      i -> ($vec[i]-$cent[i])*($vec[i]-$cent[i]))), (acc,x) -> acc+x)""".stripMargin

  /** SQL reference to the corpus-scaled cell count (the `kk` CTE of
    * [[ivfAssignCtes]]) — for oracle clauses that need k outside the
    * shared CTEs (q67's probe-cell ranking, q273's curve). */
  private[queries] val ivfKSql: String = "(SELECT k FROM kk)"

  /** DuckDB replay of the IVF coarse quantizer (IvfIndex.centroids +
    * assignCells): k = max(16, ⌊√n⌋) lowest-id seeds (the SAME scaling
    * rule as IvfIndex.scaledK, computed from the same COUNT(*)) →
    * argmin assignment → per-dimension means rounded to micros (AVG
    * ulp noise cannot flip a cell) → re-assignment. Ends in
    * `a1(vec_id, v, cell)` and keeps `cents`/`kk` in scope — shared by
    * the q67 search, q227 SemDeDup, q255b blocked-SMOTE, q273 curve,
    * q278 label-noise, and q304 decontamination oracles. The cell
    * generator is a fixed 0..4095 range filtered to k (table-function
    * args must be constants): k = 4096 corresponds to ~16.7M vectors —
    * far past any oracle SF. */
  private[queries] val ivfAssignCtes: String =
    s"""kk AS (SELECT GREATEST(16, CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT)) AS k
       |       FROM embeddings),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |seeds AS (SELECT list(v ORDER BY vec_id) AS s FROM (
       |            SELECT vec_id, v, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
       |            FROM e)
       |          WHERE rn <= $ivfKSql),
       |a0 AS (
       |  SELECT vec_id, v, list_position(ds, list_min(ds)) - 1 AS cell
       |  FROM (SELECT vec_id, v,
       |    list_transform(s, c -> ${ivfD2("v", "c")}) AS ds
       |    FROM e CROSS JOIN seeds)),
       |m AS (
       |  SELECT cell, list(mm ORDER BY pos) AS mean FROM (
       |    SELECT cell, i.i AS pos, ROUND(AVG(v[i.i]) * 1e6) / 1e6 AS mm
       |    FROM a0, generate_series(1,64) i(i)
       |    GROUP BY cell, i.i)
       |  GROUP BY cell),
       |cents AS (
       |  SELECT list(c ORDER BY cell) AS cs FROM (
       |    SELECT g.g AS cell, COALESCE(m.mean, s.s[g.g+1]) AS c
       |    FROM generate_series(0,4095) g(g)
       |    LEFT JOIN m ON m.cell = g.g
       |    CROSS JOIN seeds s
       |    WHERE g.g < $ivfKSql)),
       |a1 AS (
       |  SELECT vec_id, v, list_position(ds, list_min(ds)) - 1 AS cell
       |  FROM (SELECT vec_id, v,
       |    list_transform(cs, c -> ${ivfD2("v", "c")}) AS ds
       |    FROM e CROSS JOIN cents))""".stripMargin
}
