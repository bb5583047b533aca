package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Continuously-maintained aggregate view over a snapshot table — the
  * materialized-view consumer of the row-grain change feed.
  *
  * The view is itself a snapshot table keyed by the group columns and
  * holding `cnt` (COUNT(*)) plus one `sum_<col>` per requested sum —
  * exactly the self-maintainable aggregate family: every change-feed
  * row contributes a signed delta (+insert/update-post-image,
  * −update-pre-image/delete), so a refresh needs ONE pass over the
  * not-yet-applied feed window and a join against the (group-sized,
  * not table-sized) view state. A 100-TB source with a million-row
  * change window refreshes in O(window), never O(table).
  *
  * Exactly-once: each refresh commits under a transaction id derived
  * from the applied source-version window (`agg:<from>:<to>` on the
  * upsert, `aggd:<from>:<to>` on the vanished-group delete), and the
  * next window starts from the HIGHEST `agg:` txn in the view's own
  * log — a replayed/crashed-and-restarted refresh recomputes the same
  * window and no-ops, the at-least-once → exactly-once turn the
  * reference's ack loop makes (reference:
  * PerformanceConsumer.java:253).
  */
object AggView {

  /** The view's schema/definition applied as a full query — also the
    * seed computation and the recompute an equivalence probe uses. */
  def aggOf(df: DataFrame, keys: Seq[String], sums: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("cnt") +:
      sums.map(c => sum(col(c)).cast("bigint").as(s"sum_$c"))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Highest source version this view has applied, from its own log. */
  def appliedVersion(root: String, prefix: String): Option[Int] =
    Snapshots.snapshot(root, prefix, None).toSeq.flatMap(_.txns)
      .flatMap { s =>
        if (s.startsWith("agg:")) s.split(':') match {
          case Array(_, _, to) => to.toIntOption
          case _ => None
        } else None
      }.maxOption

  /** Bring the view up to the source's latest version. Returns the
    * view's committed version (unchanged if already current). */
  def refresh(spark: SparkSession, srcRoot: String, srcPrefix: String,
              mvRoot: String, mvPrefix: String,
              keys: Seq[String], sums: Seq[String]): Int = {
    val src = Snapshots.snapshot(srcRoot, srcPrefix, None).getOrElse(
      sys.error(s"no source table $srcPrefix to aggregate"))
    appliedVersion(mvRoot, mvPrefix) match {
      case None => // first refresh: full seed at the source's version
        aggOf(Snapshots.read(spark, srcRoot, srcPrefix, Some(src.version)),
          keys, sums)
          .write.mode("append").parquet(Topics.tableDir(mvRoot, mvPrefix))
        Snapshots.commit(mvRoot, mvPrefix, maxPos = src.version,
          txn = Some(s"agg:0:${src.version}"))
      case Some(from) if from >= src.version =>
        Snapshots.snapshot(mvRoot, mvPrefix, None).get.version // current
      case Some(from) =>
        val feed = Snapshots.readChangeFeed(spark, srcRoot, srcPrefix,
          fromVersion = from, toVersion = Some(src.version))
        val sign = when(
          col("_change_type").isin("insert", "update_postimage"), 1L)
          .otherwise(-1L)
        val dAggs = sum(sign).as("d_cnt") +:
          sums.map(c => sum(sign * col(c)).cast("bigint").as(s"d_sum_$c"))
        val delta = feed.groupBy(keys.map(col): _*)
          .agg(dAggs.head, dAggs.tail: _*)
          .localCheckpoint(true) // reused: join below + vanished filter
        // only TOUCHED groups are read+rewritten: the state join is
        // left (delta-driven), and merge()'s manifest pruning keeps
        // the rewrite to the files holding those groups
        val state = Snapshots.read(spark, mvRoot, mvPrefix)
        def z(c: String): Column = coalesce(col(c), lit(0L))
        val post = delta.join(state, keys, "left")
          .select((keys.map(col) :+
            (z("cnt") + z("d_cnt")).as("cnt")) ++
            sums.map(c => (z(s"sum_$c") + z(s"d_sum_$c")).as(s"sum_$c")): _*)
        Snapshots.merge(spark, mvRoot, mvPrefix, post, keys,
          txn = Some(s"agg:$from:${src.version}"))
        // groups whose membership dropped to zero leave the view
        Snapshots.delete(spark, mvRoot, mvPrefix, col("cnt") === 0,
          txn = Some(s"aggd:$from:${src.version}"))
    }
  }

  /** Streaming maintenance: each micro-batch runs one [[refresh]] —
    * the tick stream only schedules work (its rows are ignored), so
    * view freshness follows the SOURCE log, and the per-window txn
    * ids make replayed batches no-ops (foreachBatch is at-least-once;
    * the view log turns it exactly-once). */
  def stream(tick: DataFrame, srcRoot: String, srcPrefix: String,
             mvRoot: String, mvPrefix: String,
             keys: Seq[String], sums: Seq[String],
             checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    tick.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        refresh(batch.sparkSession, srcRoot, srcPrefix, mvRoot, mvPrefix,
          keys, sums)
        ()
      }
      .start()
}
