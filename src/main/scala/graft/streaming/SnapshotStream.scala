package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftStreamingShim, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{Offset => ConnectorOffset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.StructType

import graft.ingest.Snapshots

/** The snapshot table as a STREAMING SOURCE (Delta's table-as-stream
  * analog, the read-side complement of `Snapshots.replicateStream`):
  * `spark.readStream.format(classOf[SnapshotSourceProvider].getName)
  * .option("root", …).option("prefix", …).load()` turns every commit
  * into a micro-batch of the rows it appended.
  *
  * Offsets ARE commit versions — the checkpoint stores the last
  * version a batch covered, so a restarted stream resumes exactly
  * where the log says it stopped (the same replay-safety anchor the
  * reference's consumer gets from broker acks,
  * PerformanceConsumer.java:253). Batch (start, end] delivers the
  * files ADDED by versions in that range via `Snapshots.readChanges`:
  * file grain IS row grain for appends; compaction / restore /
  * delete / merge-on-read commits deliver nothing (the documented
  * [[Snapshots.readChanges]] contract — replicas that need row-grain
  * deletes apply the change FEED via `replicateStream` instead).
  *
  * Options: `startingVersion` (first version to deliver, default 0 =
  * replay the whole log), `maxVersionsPerTrigger` (rate limit: at
  * most that many commits per micro-batch — the lakehouse equivalent
  * of the reference consumer's poll cap, A14). Schema is pinned at
  * stream start; evolve the table, restart the stream (Delta's rule).
  *
  * At 100 TB nothing here scales with table size: getOffset lists the
  * log (O(versions)), a batch scans only the files its versions
  * added. */
class SnapshotSourceProvider extends StreamSourceProvider {

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val (root, prefix) = SnapshotSourceProvider.params(parameters)
    ("graft-snapshot", Snapshots.tableSchema(ctx.sparkSession, root, prefix))
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val (root, prefix) = SnapshotSourceProvider.params(parameters)
    new SnapshotStreamSource(ctx.sparkSession, root, prefix,
      parameters.get("startingVersion").map(_.toLong - 1).getOrElse(-1L),
      parameters.get("maxVersionsPerTrigger").map(_.toInt))
  }
}

object SnapshotSourceProvider {
  private def params(parameters: Map[String, String]): (String, String) =
    (parameters.getOrElse("root", sys.error("snapshot source needs option 'root'")),
      parameters.getOrElse("prefix", sys.error("snapshot source needs option 'prefix'")))
}

private[graft] class SnapshotStreamSource(spark: SparkSession,
                                              root: String, prefix: String,
                                              floor: Long,
                                              maxPerTrigger: Option[Int])
  extends Source with SupportsTriggerAvailableNow {

  // O(epochs) derivation — a stream start must not analyze (and
  // path-check) a full-table frame just for its schema
  private val schema0 = Snapshots.tableSchema(spark, root, prefix)

  /** Trigger.AvailableNow pin: versions committed after the trigger
    * started are left for the next run (the engine drains batches
    * until [[latestOffset]] stops advancing). */
  private var availableNowCap: Option[Long] = None

  override def schema: StructType = schema0

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Snapshots.versions(root, prefix).lastOption.map(_.toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Admission control: the next batch ends at the latest committed
    * version, clamped by maxVersionsPerTrigger and the AvailableNow
    * pin; null = nothing new. Stateless in the source — the engine
    * hands back the checkpointed start, so restarts resume exactly. */
  override def latestOffset(start: ConnectorOffset, limit: ReadLimit): ConnectorOffset = {
    val from = Option(start).map(ver).getOrElse(floor)
    val latest0 = Snapshots.versions(root, prefix).lastOption
      .map(_.toLong).getOrElse(-1L)
    val latest = availableNowCap.fold(latest0)(math.min(latest0, _))
    val next = maxPerTrigger.map(m => math.min(latest, from + m)).getOrElse(latest)
    if (next <= from) null else LongOffset(next)
  }

  // the engine prefers the admission-control surface above; this is
  // the plain-Source equivalent for completeness
  override def getOffset: Option[Offset] =
    Option(latestOffset(null, getDefaultReadLimit))
      .map(o => LongOffset(o.asInstanceOf[LongOffset].offset))

  private def ver(o: ConnectorOffset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(o => ver(o)).getOrElse(floor)
    val batch = Snapshots.readChanges(spark, root, prefix,
      from.toInt, Some(ver(end).toInt))
    GraftStreamingShim.asStreaming(spark, batch)
  }

  override def stop(): Unit = ()

  override def toString: String = s"SnapshotStreamSource[$prefix@$root]"
}
