package graft.queries

import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.{QueryDef, QueryRegistry, Tables}
import Qf._

/** Q43–Q50: Structured Streaming surface, replayed over the parquet
  * fixtures as file streams and verified against batch semantics
  * (SURVEY.md §2A: A4 rate limiting → maxFilesPerTrigger, A7 offload
  * watermark → event-time watermark, A9 ack → checkpointed exactly-once).
  *
  * Each query runs a real streaming query to completion (file source →
  * memory sink) and returns the final table, so the driver's harness
  * sees ordinary DataFrames. Queries whose final state equals a batch
  * query (tumbling windows, stream-static join, stateful counts) carry
  * a DuckDB oracle; purely temporal behaviors (session windows,
  * late-data drop, dedup-within-watermark) are batch-eq / property
  * checked in the test suite instead.
  */
object StreamingQueries extends QueryRegistry {

  /** Stage `events` into a directory of N parquet files in ascending
    * event-time order with monotonically increasing mtimes, so the file
    * stream source (which processes oldest-file-first) replays the
    * stream in realistic time order — each trigger advances the
    * watermark, like the reference's offload watermark advancing per
    * scan pass (reference: PerformanceConsumer.java:204-232). */
  private[graft] def stageEventsDir(s: SparkSession, dir: String, chunks: Int = 4): String = synchronized {
    // Key the staged copy on fixture *content* (mtime+size), not just
    // the path, so a regenerated fixture gets a fresh staging dir; and
    // stage into a temp dir renamed into place atomically, so an
    // interrupted run can never leave a half-staged dir that a later
    // run would silently re-append to (duplicating events).
    // Staged ts is ALWAYS Long epoch-µs (the `_us_` dir tag), whatever
    // the fixture's physical type — see [[rawEventsMicros]].
    val key = Fixtures.contentKey(dir, "events") // shared wide digest
    val staged = new java.io.File(s"/tmp/graft/stream_events_us_$key")
    if (!staged.isDirectory) {
      val tmp = new java.io.File(staged.getParent,
        staged.getName + ".tmp." + UUID.randomUUID().toString.take(8))
      val ev = rawEventsMicros(s, dir) // ts: Long micros
      val mm = ev.agg(min("ts"), max("ts")).head()
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      for (i <- 0 until chunks) {
        val a = lo + (hi - lo) / chunks * i
        val b = if (i == chunks - 1) hi + 1 else lo + (hi - lo) / chunks * (i + 1)
        ev.filter(col("ts") >= a && col("ts") < b)
          .coalesce(1).write.mode("append").parquet(tmp.getAbsolutePath)
        Thread.sleep(10) // distinct file mtimes → deterministic replay order
      }
      if (!tmp.renameTo(staged)) { // lost a cross-process race: theirs is complete
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(tmp)
      }
    }
    staged.getAbsolutePath
  }

  /** A predicate that Catalyst cannot push below an EventTimeWatermark
    * node: `PushPredicateThroughNonJoin` pushes any conjunct that does
    * not reference the watermark column, so a plain
    * `event_type = 'x'` filter written AFTER withWatermark still ends
    * up BELOW it — and the watermark then tracks only that type's
    * events. With a sparse type (signups), the global watermark stalls
    * hours behind the source and outer-join/timer emissions never
    * happen (observed: q176 lost its last 3 unmatched rows this way).
    * Adding a `ts IS NULL` disjunct makes the conjunct reference the
    * event-time column, pinning it above the watermark; it is inert
    * (null ts never reaches the join — `ts < cutoff` is null-rejecting)
    * and not constant-foldable while ts is nullable. */
  private def unpushedTypeIs(t: String) =
    col("ts").isNull || col("event_type") === t

  /** `events` with ts normalized to Long epoch-µs, whatever the
    * fixture's physical type: earlier driver rounds wrote INT64
    * TIMESTAMP(NANOS) (read as Long nanos under `nanosAsLong`), the
    * current round writes timestamp[us] (read as TIMESTAMP_NTZ).
    * Integer `div`, never float division: epoch-nanos ≈ 1.7e18
    * exceeds double's 2⁵³ mantissa. The ntz branch casts through the
    * instant type (identity under the UTC session) for unix_micros. */
  private def rawEventsMicros(s: SparkSession, dir: String): DataFrame = {
    val raw = s.read.parquet(Tables.path(dir, "events"))
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("ts div 1000"))
      case _ =>
        raw.withColumn("ts", unix_micros(col("ts").cast("timestamp")))
    }
  }

  /** Max event time as epoch-µs — the shared cutoff anchor the
    * bounded-replay queries derive their watermark horizon from.
    *
    * Answered from parquet FOOTER statistics when every file carries
    * complete INT64 ts stats (guide §6: min/max anchors are metadata,
    * not a scan — the same contract the graft source's manifest stats
    * implement; parquet INT64 min/max is exact, never truncated).
    * max commutes with both µs normalizations — `div 1000` on
    * positive epoch-nanos and the UTC instant cast on timestamps are
    * monotone non-decreasing — so footer-max then normalize equals
    * the previous scan-then-max. ~10 bounded-replay queries pay this
    * anchor before their stream starts; any file without usable stats
    * falls back to the full Spark aggregate (correct, just unpruned). */
  private[graft] def maxTsMicros(s: SparkSession, dir: String): Long = {
    // r15 (r14 VERDICT #3 + ADVICE): the footer walk is serial,
    // driver-side, per invocation — fine for a fixture-sized events
    // dir, a scale hazard at 10^5+ files where the distributed
    // aggregate it replaces is not. Cap the fast path by file count.
    val footerMaxFiles = 256
    // returns the footer max ALREADY normalized to epoch-µs, or None
    // → distributed fallback. r14 ADVICE (medium): the old path
    // assumed INT64 stats were micros/nanos from the SPARK type alone;
    // a TIMESTAMP(MILLIS) fixture (same physical INT64) would come out
    // 1000× off. Decide from the parquet LogicalTypeAnnotation itself:
    //   - TimestampLogicalTypeAnnotation(unit) → convert per unit;
    //   - plain INT64 (no logical type) surfacing as LongType → the
    //     fixture's epoch-nanos contract (nanosAsLong), truncating
    //     division by 1000 — monotone, so max commutes;
    //   - anything else → fallback.
    def footerMax(): Option[Long] = try {
      val p = new java.io.File(Tables.path(dir, "events"))
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory)
          Option(f.listFiles()).map(_.toSeq.flatMap(walk)).getOrElse(Seq.empty)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty
      val files = walk(p)
      if (files.isEmpty || files.length > footerMaxFiles) return None
      import org.apache.parquet.schema.LogicalTypeAnnotation
      import LogicalTypeAnnotation.TimeUnit
      val sparkIsLong =
        s.read.parquet(Tables.path(dir, "events")).schema("ts").dataType ==
          org.apache.spark.sql.types.LongType
      // µs normalization per column chunk, decided from ITS annotation
      def toMicros(raw: Long, ann: LogicalTypeAnnotation): Option[Long] = ann match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          t.getUnit match {
            case TimeUnit.MICROS => Some(raw)
            case TimeUnit.MILLIS => Some(Math.multiplyExact(raw, 1000L))
            // truncating division like the scan path's `div 1000` —
            // monotone, so max still commutes
            case TimeUnit.NANOS => Some(raw / 1000L)
            case _ => None
          }
        case null if sparkIsLong => Some(raw / 1000L) // epoch-nanos contract
        case _ => None
      }
      val maxes = files.map { f =>
        val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.toURI),
            new org.apache.hadoop.conf.Configuration()))
        try {
          val sts = rd.getFooter.getBlocks.asScala.toSeq.map { b =>
            val c = b.getColumns.asScala
              .find(_.getPath.toDotString == "ts").orNull
            if (c == null ||
              c.getPrimitiveType.getPrimitiveTypeName !=
                org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64)
              None
            else if (c.getStatistics == null || c.getStatistics.isEmpty ||
              !c.getStatistics.hasNonNullValue) None
            else toMicros(
              c.getStatistics.genericGetMax.asInstanceOf[java.lang.Long].longValue,
              c.getPrimitiveType.getLogicalTypeAnnotation)
          }
          if (sts.isEmpty || sts.exists(_.isEmpty)) None
          else Some(sts.flatten.max)
        } finally rd.close()
      }
      if (maxes.exists(_.isEmpty)) None else Some(maxes.flatten.max)
    } catch { case _: Throwable => None }

    footerMax() match {
      case Some(m) => m
      case None => rawEventsMicros(s, dir).agg(max("ts")).head().getLong(0)
    }
  }

  /** Stream `events` (schema from the staged µs-normalized files; the
    * watermark needs the instant type, so ts becomes TIMESTAMP here and
    * the NTZ normalization happens on the *output* side of each
    * query). */
  private def eventStream(s: SparkSession, dir: String, maxFilesPerTrigger: Int = 1): DataFrame = {
    val staged = stageEventsDir(s, dir)
    val schema = s.read.parquet(staged).schema // ts: Long micros
    val raw = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(staged)
    raw.withColumn("ts", timestamp_micros(col("ts")))
  }

  /** Run a streaming DataFrame to completion into a memory sink and
    * return the collected result as a (batch) DataFrame.
    *
    * The sink's rows are copied out (localCheckpoint) and the memory
    * table is dropped immediately: a long-lived session running all
    * queries (Verify/Bench) would otherwise accumulate ~10 fully
    * materialized streams in the catalog and degrade everything after
    * them (round-1 bench showed 7–25× inflation from exactly this). */
  private def runToMemory(s: SparkSession, df: DataFrame, mode: String): DataFrame = {
    val name = "graft_sink_" + UUID.randomUUID().toString.replace("-", "")
    // every stateful operator opens one state store PER shuffle
    // partition PER micro-batch; at the replay's state volume (≤100k
    // rows) store setup dominates compute, so the stream runs at 2
    // partitions (8 → 2 cut the stream-stream joins ~35%). A
    // production deployment sizes this to state volume / throughput —
    // the value is fixed at the first checkpoint, which each replay
    // recreates. Restored afterwards; batch plans unaffected.
    val key = "spark.sql.shuffle.partitions"
    val prior = s.conf.get(key)
    s.conf.set(key, sys.env.getOrElse("SPARK_GRAFT_STREAM_SHUFFLE", "2"))
    // state-store provider switch (SPARK_GRAFT_STATESTORE=rocksdb):
    // measured round 5 over the five replay-heavy queries
    // (q89/q109/q176/q47/q139, sf0.1, 2 runs each) — RocksDB vs the
    // HDFS-backed in-memory maps is a wash (37-39 s wall either way,
    // within run noise) with BIT-IDENTICAL outputs: at replay state
    // volumes (≤100k rows, 2 partitions, AvailableNow batches) store
    // choice doesn't matter. Default stays HDFS-backed; the switch
    // keeps the experiment re-runnable where state outgrows the heap.
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val priorProv = s.conf.getOption(provKey)
    if (sys.env.get("SPARK_GRAFT_STATESTORE").contains("rocksdb"))
      s.conf.set(provKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = df.writeStream
        .format("memory").queryName(name)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // dev aid (SPARK_GRAFT_STREAM_DEBUG=1): per-batch duration
      // breakdown from the progress reports — where a replay's wall
      // time actually goes (planning vs WAL commits vs state vs sink)
      if (sys.env.get("SPARK_GRAFT_STREAM_DEBUG").contains("1"))
        q.recentProgress.foreach { p =>
          System.err.println(s"[streamdbg] batch=${p.batchId} " +
            s"rows=${p.numInputRows} durationMs=${p.durationMs}")
        }
      // late-drop canary: the declared replays are time-ordered, so NO
      // row may be dropped by a watermark. A nonzero count means an
      // optimizer change re-pushed a filter below the watermark node
      // (per-type stall → watermark races ahead of admissible data) or
      // a watermark moved wrongly — silent row loss, not a perf issue.
      val dropped = q.recentProgress.toSeq
        .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
        .map(_.numRowsDroppedByWatermark).sum
      require(dropped == 0,
        s"$dropped row(s) dropped by watermark during a time-ordered replay")
      val out = s.table(name).localCheckpoint(true)
      s.catalog.dropTempView(name)
      out
    } finally {
      s.conf.set(key, prior)
      priorProv match {
        case Some(v) => s.conf.set(provKey, v)
        case None => s.conf.unset(provKey)
      }
    }
  }

  def defs: Seq[QueryDef] = Seq(

    // A4/A5 semantics: rate-governed ingest, conservation counter —
    // the streamed table equals the batch read exactly.
    QueryDef("q43_stream_conservation",
      (s, dir) => {
        val out = runToMemory(s, eventStream(s, dir), "append")
        out.agg(count(lit(1)).as("cnt"),
          sum("event_id").cast("bigint").as("sum_id"))
      },
      Some("SELECT COUNT(*) AS cnt, CAST(SUM(event_id) AS BIGINT) AS sum_id FROM events")),

    QueryDef("q44_stream_tumbling_window",
      (s, dir) => {
        // complete-mode final state is batch-count independent → drain
        // in one AvailableNow batch (per-batch state-store churn would
        // otherwise dominate; the per-trigger replay semantics are
        // demonstrated by q43/q47)
        val agg = eventStream(s, dir, maxFilesPerTrigger = 4)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
        runToMemory(s, agg, "complete")
          .select(col("window.start").cast("timestamp_ntz").as("wstart"), col("event_type"), col("cnt"), col("sum_value"))
          .orderBy("wstart", "event_type")
      },
      Some(s"""SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS wstart,
              |event_type, COUNT(*) AS cnt, ${sqlDsum("value")} AS sum_value
              |FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin)),

    QueryDef("q45_stream_sliding_window",
      (s, dir) => {
        val agg = eventStream(s, dir, maxFilesPerTrigger = 4)
          .groupBy(window(col("ts"), "1 hour", "15 minutes"))
          .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
        runToMemory(s, agg, "complete")
          .select(col("window.start").cast("timestamp_ntz").as("wstart"), col("cnt"), col("sum_value"))
          .orderBy("wstart")
      },
      Some(s"""SELECT time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP)) - INTERVAL (k.k * 15) MINUTE AS wstart,
              |COUNT(*) AS cnt, ${sqlDsum("value")} AS sum_value
              |FROM events CROSS JOIN (VALUES (0),(1),(2),(3)) k(k)
              |GROUP BY 1 ORDER BY wstart""".stripMargin)),

    // Session windows (30 min gap) per user, in APPEND mode — the
    // scale-safe formulation: a session emits exactly once, when the
    // watermark passes its end, and leaves the state store. (Complete
    // mode would re-materialize every session ever seen per micro-batch
    // — unbounded output on an unbounded stream.) The q176 cutoff
    // technique makes the final state batch-expressible: only events
    // older than max(ts)−3h enter the aggregation, while the watermark
    // node (placed BEFORE the filter) still sees the full flow, so the
    // final watermark max(ts) provably passes every session end
    // (< cutoff+30min). The DuckDB oracle replays the sessionization in
    // SQL under the same cutoff: a session breaks when the gap to the
    // previous event is >= the gap duration (Spark's session end is
    // exclusive: [start, last+gap)), sessions are numbered by a running
    // sum of break flags, then grouped.
    QueryDef("q46_stream_session_window",
      (s, dir) => {
        val cutoff = timestamp_micros(lit(maxTsMicros(s, dir) - 3L * 3600 * 1000000))
        val agg = eventStream(s, dir, maxFilesPerTrigger = 4)
          .withWatermark("ts", "0 seconds")
          .filter(col("ts") < cutoff)
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("cnt"))
        runToMemory(s, agg, "append")
          .select(col("session_window.start").cast("timestamp_ntz").as("sstart"), col("user_id"), col("cnt"))
          .orderBy("user_id", "sstart")
      },
      Some("""WITH m AS (SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 3 HOUR AS cutoff FROM events)
             |SELECT MIN(ts) AS sstart, user_id, COUNT(*) AS cnt FROM (
             |  SELECT user_id, ts,
             |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
             |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
             |  FROM (
             |    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             |      CASE WHEN CAST(ts AS TIMESTAMP)
             |                  - LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts)
             |                < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS is_new
             |    FROM events, m WHERE CAST(ts AS TIMESTAMP) < m.cutoff))
             |GROUP BY user_id, sess
             |ORDER BY user_id, sstart""".stripMargin)),

    // Timer-driven sessionization (SessionTimeoutProcessor on
    // transformWithState + TimeMode.EventTime, append mode): the
    // pattern session_window can't express — arbitrary per-session
    // payload and a data-decided emission deadline. Each open session
    // re-arms an event-time timer at (last event + gap); the WATERMARK
    // firing the timer emits the closed session and clears its state,
    // so the store holds only OPEN sessions (state tracks concurrent
    // activity, not history — the 100 TB bound). Same q176 cutoff as
    // q46 so every session provably closes. Session bounds emit as
    // epoch millis (the processor's clock), which the oracle replays
    // via epoch_ms().
    QueryDef("q46b_session_timers",
      (s, dir) => {
        import s.implicits._
        val providerKey = "spark.sql.streaming.stateStore.providerClass"
        val prior = s.conf.getOption(providerKey)
        s.conf.set(providerKey,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try {
          val cutoff = timestamp_micros(lit(maxTsMicros(s, dir) - 3L * 3600 * 1000000))
          val sessions = eventStream(s, dir, maxFilesPerTrigger = 4)
            .withWatermark("ts", "0 seconds")
            .filter(col("ts") < cutoff)
            .select(col("user_id"), col("ts"))
            .as[(Long, java.sql.Timestamp)]
            .groupByKey(_._1)
            .transformWithState(new graft.streaming.SessionTimeoutProcessor(gapMs = 30L * 60 * 1000),
              org.apache.spark.sql.streaming.TimeMode.EventTime(),
              org.apache.spark.sql.streaming.OutputMode.Append())
            .toDF("user_id", "cnt", "start_ms", "end_ms")
          runToMemory(s, sessions, "append")
            .orderBy("user_id", "start_ms")
        } finally prior match {
          case Some(v) => s.conf.set(providerKey, v)
          case None => s.conf.unset(providerKey)
        }
      },
      Some("""WITH m AS (SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 3 HOUR AS cutoff FROM events)
             |SELECT user_id, COUNT(*) AS cnt,
             |  epoch_ms(MIN(ts)) AS start_ms, epoch_ms(MAX(ts)) AS end_ms FROM (
             |  SELECT user_id, ts,
             |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
             |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
             |  FROM (
             |    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             |      CASE WHEN CAST(ts AS TIMESTAMP)
             |                  - LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts)
             |                < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS is_new
             |    FROM events, m WHERE CAST(ts AS TIMESTAMP) < m.cutoff))
             |GROUP BY user_id, sess
             |ORDER BY user_id, start_ms""".stripMargin)),

    // Watermark semantics (A7): aggregate with a 10-minute watermark in
    // append mode — only windows the watermark has passed emit. That
    // property IS the oracle: the time-ordered replay ends with
    // watermark = max(ts) - 10min, so exactly the windows closed by it
    // (end <= watermark) appear, with full batch counts. Late-injection
    // behavior is additionally property-tested in StreamingSpec.
    QueryDef("q47_stream_watermark",
      (s, dir) => {
        val agg = eventStream(s, dir)
          .withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "1 hour"))
          .agg(count(lit(1)).as("cnt"))
        runToMemory(s, agg, "append")
          .select(col("window.start").cast("timestamp_ntz").as("wstart"), col("cnt"))
          .orderBy("wstart")
      },
      Some("""SELECT wstart, cnt FROM (
             |  SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS wstart,
             |         COUNT(*) AS cnt
             |  FROM events GROUP BY 1)
             |WHERE wstart + INTERVAL 1 HOUR <=
             |  (SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 10 MINUTE FROM events)
             |ORDER BY wstart""".stripMargin)),

    // Streaming dedup under replay (A9 at-least-once → exactly-once):
    // the same file is replayed as two overlapping streams via union;
    // dropDuplicates keeps state across batches.
    QueryDef("q48_stream_dedup",
      (s, dir) => {
        val dedup = eventStream(s, dir, maxFilesPerTrigger = 4).dropDuplicates("event_id")
        val out = runToMemory(s, dedup, "append")
        out.agg(count(lit(1)).as("cnt"), sum("event_id").cast("bigint").as("sum_id"))
      },
      Some("SELECT COUNT(*) AS cnt, CAST(SUM(event_id) AS BIGINT) AS sum_id FROM (SELECT DISTINCT event_id FROM events)")),

    // Stateful running aggregate equals batch groupBy (single
    // AvailableNow pass → final state).
    QueryDef("q49_stream_stateful_agg",
      (s, dir) => {
        val agg = eventStream(s, dir, maxFilesPerTrigger = 4)
          .groupBy("user_id")
          .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
        runToMemory(s, agg, "complete").orderBy("user_id")
      },
      Some(s"""SELECT user_id, COUNT(*) AS cnt, ${sqlDsum("value")} AS sum_value
              |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Stream-stream interval join: purchases ⋈ clicks of the same user
    // within the preceding hour, both sides watermarked (state for
    // each side is bounded by watermark + interval — the 100 TB
    // requirement for any stream-stream join).
    QueryDef("q89_stream_stream_join",
      (s, dir) => {
        // single AvailableNow batch per side: the time-ordered chunks +
        // 1h watermark mean state eviction only ever removes rows that
        // can no longer match, so the joined set is batch-count
        // independent — and each extra batch pays two state stores
        // watermark first, then an unpushable type filter: a filter
        // below the watermark node would stall the watermark at the
        // filtered type's max ts — harmless to an inner join's OUTPUT
        // (less eviction, never wrong matches) but state would be
        // retained far past its match horizon at scale
        val p = eventStream(s, dir, maxFilesPerTrigger = 4)
          .withWatermark("ts", "1 hour")
          .filter(unpushedTypeIs("purchase"))
          .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
        val c = eventStream(s, dir, maxFilesPerTrigger = 4)
          .withWatermark("ts", "1 hour")
          .filter(unpushedTypeIs("click"))
          .select(col("event_id").as("c_id"), col("user_id").as("c_uid"), col("ts").as("c_ts"))
        val joined = p.join(c,
          col("user_id") === col("c_uid") &&
            col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
            col("c_ts") <= col("p_ts"))
        runToMemory(s, joined, "append")
          .select(col("p_id"), col("c_id"))
          .orderBy("p_id", "c_id")
      },
      Some("""SELECT p.event_id AS p_id, c.event_id AS c_id
             |FROM events p JOIN events c ON c.user_id = p.user_id
             |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
             |  AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 1 HOUR
             |  AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
             |ORDER BY p_id, c_id""".stripMargin)),

    // Stream-stream LEFT OUTER interval join: the outer (null-extended)
    // rows are watermark-gated — a purchase emits with no click only
    // once the watermark proves no matching click can still arrive.
    // Spark's exact eviction boundary is an internal interval
    // adjustment of the watermark (measured between wm-46min and
    // wm-27min here), so the declared query bounds its own outer
    // domain: purchases older than max(ts)-3h — far below any
    // plausible eviction threshold — which makes the final result
    // exactly batch-expressible: inner matches ∪ unmatched old
    // purchases with NULL. The cutoff is data-derived identically on
    // both sides.
    QueryDef("q109_stream_stream_left_join",
      (s, dir) => {
        // raw file ts is Long nanos (nanosAsLong); floor to micros like
        // eventStream, then back off 3h — identical to the oracle's
        // MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 3 HOUR (ns→µs truncates)
        val cutoff = timestamp_micros(lit(maxTsMicros(s, dir) - 3L * 3600 * 1000000))
        // watermark BEFORE the filters: the watermark node must see the
        // full event flow, otherwise the purchase side's own watermark
        // stalls at the cutoff and the outer rows near it never emit —
        // and the type filters use unpushedTypeIs so Catalyst can't
        // quietly push them back below the watermark node
        val p = eventStream(s, dir, maxFilesPerTrigger = 4)
          .withWatermark("ts", "1 hour")
          .filter(unpushedTypeIs("purchase") && col("ts") < cutoff)
          .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
        val c = eventStream(s, dir, maxFilesPerTrigger = 4)
          .withWatermark("ts", "1 hour")
          .filter(unpushedTypeIs("click"))
          .select(col("event_id").as("c_id"), col("user_id").as("c_uid"), col("ts").as("c_ts"))
        val joined = p.join(c,
          col("user_id") === col("c_uid") &&
            col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
            col("c_ts") <= col("p_ts"),
          "leftOuter")
        runToMemory(s, joined, "append")
          .select(col("p_id"), col("c_id"))
          .orderBy(col("p_id"), col("c_id").asc_nulls_first)
      },
      Some("""WITH m AS (SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 3 HOUR AS cutoff FROM events),
             |matched AS (
             |  SELECT p.event_id AS p_id, c.event_id AS c_id
             |  FROM events p JOIN events c ON c.user_id = p.user_id, m
             |  WHERE p.event_type = 'purchase' AND c.event_type = 'click'
             |    AND CAST(p.ts AS TIMESTAMP) < m.cutoff
             |    AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 1 HOUR
             |    AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP))
             |SELECT p_id, c_id FROM matched
             |UNION ALL
             |SELECT p.event_id AS p_id, NULL AS c_id
             |FROM events p, m
             |WHERE p.event_type = 'purchase'
             |  AND CAST(p.ts AS TIMESTAMP) < m.cutoff
             |  AND p.event_id NOT IN (SELECT p_id FROM matched)
             |ORDER BY p_id, c_id NULLS FIRST""".stripMargin)),

    // Chained streaming window aggregations (multiple stateful
    // operators, Spark 3.4+): hourly counts roll up into daily totals
    // inside ONE streaming query — append mode emits exactly the days
    // the final watermark closed, which is the oracle's filter.
    QueryDef("q131_chained_windows",
      (s, dir) => {
        val daily = eventStream(s, dir, maxFilesPerTrigger = 4)
          .withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "1 hour"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(window(col("window"), "1 day"))
          .agg(sum("cnt").cast("bigint").as("cnt"),
            count(lit(1)).cast("bigint").as("hours"))
        runToMemory(s, daily, "append")
          .select(col("window.start").cast("timestamp_ntz").as("dstart"),
            col("cnt"), col("hours"))
          .orderBy("dstart")
      },
      Some("""SELECT dstart, cnt, hours FROM (
             |  SELECT time_bucket(INTERVAL 1 DAY, wstart) AS dstart,
             |    CAST(SUM(cnt) AS BIGINT) AS cnt, CAST(COUNT(*) AS BIGINT) AS hours
             |  FROM (
             |    SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS wstart,
             |      COUNT(*) AS cnt
             |    FROM events GROUP BY 1)
             |  GROUP BY 1)
             |WHERE dstart + INTERVAL 1 DAY <=
             |  (SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 10 MINUTE FROM events)
             |ORDER BY dstart""".stripMargin)),

    // Spark 4 arbitrary-state API: per-user running (count, cents)
    // via a StatefulProcessor; after the AvailableNow replay the last
    // update per key equals the batch aggregate.
    QueryDef("q74_transform_with_state",
      (s, dir) => {
        import s.implicits._
        val providerKey = "spark.sql.streaming.stateStore.providerClass"
        val prior = s.conf.getOption(providerKey)
        s.conf.set(providerKey,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try {
          // single AvailableNow batch: multi-batch update semantics are
          // covered by StreamingSpec's MemoryStream test; per-batch
          // RocksDB store churn would otherwise dominate the runtime
          val ds = eventStream(s, dir, maxFilesPerTrigger = 4)
            .select(col("user_id"), round(col("value") * 100).cast("long").as("cents"))
            .as[(Long, Long)]
            .groupByKey(_._1)
            .transformWithState(new graft.streaming.RunningStatsProcessor,
              org.apache.spark.sql.streaming.TimeMode.None(),
              org.apache.spark.sql.streaming.OutputMode.Update())
            .toDF("user_id", "n", "cents")
          // the latest update per key is the row with the largest n
          // (strictly increasing per key); max_by keeps (n, cents)
          // from the SAME update — independent maxes would silently
          // break on multi-batch runs with non-monotonic cent sums
          runToMemory(s, ds, "update")
            .groupBy("user_id")
            .agg(max("n").as("n"), expr("max_by(cents, n)").as("cents"))
            .orderBy("user_id")
        } finally prior match {
          case Some(v) => s.conf.set(providerKey, v)
          case None => s.conf.unset(providerKey)
        }
      },
      Some("""SELECT user_id, COUNT(*) AS n,
             |CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS cents
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    QueryDef("q50_stream_static_join",
      (s, dir) => {
        val cust = Tables.customer(s, dir)
        val joined = eventStream(s, dir, maxFilesPerTrigger = 4)
          .join(cust, col("user_id") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
        runToMemory(s, joined, "complete").orderBy("c_mktsegment")
      },
      Some(s"""SELECT c_mktsegment, COUNT(*) AS cnt, ${sqlDsum("value")} AS sum_value
              |FROM events JOIN customer ON user_id = c_custkey
              |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // Bounded-state streaming dedup: q48's dropDuplicates keeps every
    // key forever (state grows without bound — a non-starter on an
    // unbounded 100 TB stream); dropDuplicatesWithinWatermark evicts
    // keys once the watermark passes them, so state is bounded by the
    // watermark horizon. Two independent readers of the same staged
    // dir make every event arrive twice (identical event-time twins);
    // the 35-day delay covers the fixture's 30-day span, so nothing is
    // evicted mid-replay and the result is exactly the distinct set —
    // deterministic, while still exercising the bounded-state
    // operator's eviction bookkeeping end-to-end.
    QueryDef("q169_stream_dedup_bounded",
      (s, dir) => {
        def side = eventStream(s, dir, maxFilesPerTrigger = 4)
          .withWatermark("ts", "35 days")
        val dedup = side.unionAll(side).dropDuplicatesWithinWatermark("event_id")
        runToMemory(s, dedup, "append")
          .agg(count(lit(1)).as("cnt"),
            sum("event_id").cast("bigint").as("sum_id"))
      },
      Some("SELECT COUNT(*) AS cnt, CAST(SUM(event_id) AS BIGINT) AS sum_id FROM (SELECT DISTINCT event_id FROM events)"))
    ,

    // FULL OUTER stream-stream join (q109's left-outer completes to
    // the full matrix): unmatched rows on EITHER side emit once the
    // watermark passes their join horizon. Both sides are cut off 3h
    // before stream end so the final watermark (max ts − 1h) provably
    // clears every row's eviction point — the unmatched-click rows are
    // exactly the ones a left join drops. Oracle = matched ∪ unmatched
    // purchases ∪ unmatched clicks under the same cutoff.
    QueryDef("q176_stream_full_outer_join",
      (s, dir) => {
        val cutoff = timestamp_micros(lit(maxTsMicros(s, dir) - 3L * 3600 * 1000000))
        val p = eventStream(s, dir, maxFilesPerTrigger = 4)
          .withWatermark("ts", "1 hour")
          .filter(unpushedTypeIs("purchase") && col("ts") < cutoff)
          .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
        val c = eventStream(s, dir, maxFilesPerTrigger = 4)
          .withWatermark("ts", "1 hour")
          .filter(unpushedTypeIs("signup") && col("ts") < cutoff)
          .select(col("event_id").as("c_id"), col("user_id").as("c_uid"), col("ts").as("c_ts"))
        val joined = p.join(c,
          col("user_id") === col("c_uid") &&
            col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
            col("c_ts") <= col("p_ts"),
          "fullOuter")
        runToMemory(s, joined, "append")
          .select(col("p_id"), col("c_id"))
          .orderBy(col("p_id").asc_nulls_last, col("c_id").asc_nulls_first)
      },
      Some("""WITH m AS (SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 3 HOUR AS cutoff FROM events),
             |p AS (SELECT event_id AS p_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts
             |      FROM events, m WHERE event_type = 'purchase' AND CAST(ts AS TIMESTAMP) < m.cutoff),
             |c AS (SELECT event_id AS c_id, user_id AS c_uid, CAST(ts AS TIMESTAMP) AS c_ts
             |      FROM events, m WHERE event_type = 'signup' AND CAST(ts AS TIMESTAMP) < m.cutoff),
             |matched AS (
             |  SELECT p_id, c_id FROM p JOIN c ON user_id = c_uid
             |    AND c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts)
             |SELECT p_id, c_id FROM matched
             |UNION ALL
             |SELECT p_id, NULL AS c_id FROM p WHERE p_id NOT IN (SELECT p_id FROM matched)
             |UNION ALL
             |SELECT NULL AS p_id, c_id FROM c WHERE c_id NOT IN (SELECT c_id FROM matched)
             |ORDER BY p_id NULLS LAST, c_id NULLS FIRST""".stripMargin)),

    // Streaming funnel — q206's ordered state machine run continuously
    // on transformWithState + event-time timers (FunnelProcessor): a
    // conversion row emits the moment the watermark finalizes a user's
    // signup→view→click→purchase chain. Events buffer until watermark-
    // final, so the fold replays the batch min-recurrence under ANY
    // admissible cross-batch disorder (the non-monotone-recurrence
    // hazard the processor's doc derives). Same q46 cutoff so the
    // final watermark provably finalizes every retained event; append
    // mode, one row per converted user, replay-deterministic.
    QueryDef("q214_stream_funnel",
      (s, dir) => {
        import s.implicits._
        // transformWithState needs column families → RocksDB provider
        // (same switch as q46b; restored after)
        val providerKey = "spark.sql.streaming.stateStore.providerClass"
        val prior = s.conf.getOption(providerKey)
        s.conf.set(providerKey,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try {
          val cutoff = timestamp_micros(lit(maxTsMicros(s, dir) - 3L * 3600 * 1000000))
          val code = when(col("event_type") === "signup", 1)
            .when(col("event_type") === "view", 2)
            .when(col("event_type") === "click", 3)
            .otherwise(4)
          val conversions = eventStream(s, dir, maxFilesPerTrigger = 4)
            .withWatermark("ts", "0 seconds")
            .filter(col("ts") < cutoff &&
              col("event_type").isin("signup", "view", "click", "purchase"))
            .select(col("user_id"), code.as("step"), col("ts"))
            .as[(Long, Int, java.sql.Timestamp)]
            .groupByKey(_._1)
            .transformWithState(new graft.streaming.FunnelProcessor(),
              org.apache.spark.sql.streaming.TimeMode.EventTime(),
              org.apache.spark.sql.streaming.OutputMode.Append())
            .toDF("user_id", "t1_us", "t4_us", "latency_us")
          runToMemory(s, conversions, "append").orderBy("user_id")
        } finally prior match {
          case Some(v) => s.conf.set(providerKey, v)
          case None => s.conf.unset(providerKey)
        }
      },
      Some("""WITH m AS (SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 3 HOUR AS cutoff FROM events),
             |ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
             |       FROM events, m WHERE CAST(ts AS TIMESTAMP) < m.cutoff),
             |s1 AS (SELECT user_id, MIN(ts) AS t1 FROM ev WHERE event_type = 'signup' GROUP BY 1),
             |s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM ev e JOIN s1 USING (user_id)
             |       WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY 1),
             |s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM ev e JOIN s2 USING (user_id)
             |       WHERE e.event_type = 'click' AND e.ts > s2.t2 GROUP BY 1),
             |s4 AS (SELECT e.user_id, MIN(e.ts) AS t4 FROM ev e JOIN s3 USING (user_id)
             |       WHERE e.event_type = 'purchase' AND e.ts > s3.t3 GROUP BY 1)
             |SELECT s1.user_id, epoch_us(s1.t1) AS t1_us, epoch_us(s4.t4) AS t4_us,
             |  epoch_us(s4.t4) - epoch_us(s1.t1) AS latency_us
             |FROM s4 JOIN s1 USING (user_id)
             |ORDER BY user_id""".stripMargin)),

    // CHAINED stateful operators in one streaming query (Spark's
    // multiple-stateful-operator support): a 5-minute tumbling count
    // per type feeds a SECOND event-time window aggregation — hourly
    // peak/total/bucket-count over the 5-minute buckets — with the
    // downstream operator keyed on `window_time` of the upstream
    // window. This is the production rollup-cascade shape (fine-grain
    // pre-aggregation → coarse-grain rollup) running as ONE query with
    // two state stores, both in append mode, both draining as the
    // watermark passes — per-operator state stays bounded by the
    // window horizon, never by stream history. The q46 cutoff makes
    // the final state batch-expressible for the oracle.
    QueryDef("q231_stream_chained_windows",
      (s, dir) => {
        val cutoff = timestamp_micros(lit(maxTsMicros(s, dir) - 3L * 3600 * 1000000))
        val m5 = eventStream(s, dir, maxFilesPerTrigger = 4)
          .withWatermark("ts", "0 seconds")
          .filter(col("ts") < cutoff)
          .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
          .agg(count(lit(1)).as("c5"))
        val hourly = m5
          .groupBy(window(window_time(col("window")), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n_buckets"), max("c5").as("max_c5"),
            sum("c5").cast("bigint").as("sum_c5"))
        runToMemory(s, hourly, "append")
          .select(col("window.start").cast("timestamp_ntz").as("wstart"),
            col("event_type"), col("n_buckets"), col("max_c5"), col("sum_c5"))
          .orderBy("wstart", "event_type")
      },
      Some("""WITH m AS (SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 3 HOUR AS cutoff FROM events),
             |b5 AS (
             |  SELECT time_bucket(INTERVAL 5 MINUTE, CAST(ts AS TIMESTAMP)) AS w5,
             |    event_type, COUNT(*) AS c5
             |  FROM events, m WHERE CAST(ts AS TIMESTAMP) < m.cutoff
             |  GROUP BY 1, 2)
             |SELECT time_bucket(INTERVAL 1 HOUR, w5) AS wstart, event_type,
             |  COUNT(*) AS n_buckets, MAX(c5) AS max_c5, CAST(SUM(c5) AS BIGINT) AS sum_c5
             |FROM b5 GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin)),

    // Stream-stream join CHAINED into a windowed aggregation — the
    // second multiple-stateful-operator combination (q231 chains two
    // window aggs): q89's purchase⋈click interval join feeds an
    // hourly pair-count aggregation in the SAME query, three state
    // stores total (two join sides + the window), all append-mode,
    // all watermark-bounded. The post-join watermark is the sides'
    // minimum minus the join interval, so the aggregation's emission
    // horizon trails by up to 2h — the cutoff sits 4h back, far below
    // it, making the final state batch-expressible.
    QueryDef("q240_stream_join_window",
      (s, dir) => {
        val cutoff = timestamp_micros(lit(maxTsMicros(s, dir) - 4L * 3600 * 1000000))
        val p = eventStream(s, dir, maxFilesPerTrigger = 4)
          .withWatermark("ts", "1 hour")
          .filter(unpushedTypeIs("purchase"))
          .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
        val c = eventStream(s, dir, maxFilesPerTrigger = 4)
          .withWatermark("ts", "1 hour")
          .filter(unpushedTypeIs("click"))
          .select(col("event_id").as("c_id"), col("user_id").as("c_uid"), col("ts").as("c_ts"))
        val agg = p.join(c,
            col("user_id") === col("c_uid") &&
              col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
              col("c_ts") <= col("p_ts"))
          .filter(col("p_ts") < cutoff)
          .groupBy(window(col("p_ts"), "1 hour"))
          .agg(count(lit(1)).as("n_pairs"),
            sum("c_id").cast("bigint").as("sum_cid"))
        runToMemory(s, agg, "append")
          .select(col("window.start").cast("timestamp_ntz").as("wstart"),
            col("n_pairs"), col("sum_cid"))
          .orderBy("wstart")
      },
      Some("""WITH m AS (SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 4 HOUR AS cutoff FROM events),
             |j AS (
             |  SELECT CAST(p.ts AS TIMESTAMP) AS p_ts, c.event_id AS c_id
             |  FROM events p JOIN events c ON c.user_id = p.user_id, m
             |  WHERE p.event_type = 'purchase' AND c.event_type = 'click'
             |    AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 1 HOUR
             |    AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
             |    AND CAST(p.ts AS TIMESTAMP) < m.cutoff)
             |SELECT time_bucket(INTERVAL 1 HOUR, p_ts) AS wstart,
             |  COUNT(*) AS n_pairs, CAST(SUM(c_id) AS BIGINT) AS sum_cid
             |FROM j GROUP BY 1 ORDER BY wstart""".stripMargin)),

    // DYNAMIC-gap session windows: the gap is a per-event expression
    // (purchases hold a session open 60 min, everything else 15 min)
    // — the "a conversion extends engagement" sessionization that a
    // fixed gap can't express. Spark merges an event into a session
    // while ts < session end and extends the end to max(end, ts+gap);
    // the oracle replays exactly that via a running max of (ts+gap)
    // over prior same-user events — a session breaks where ts reaches
    // it. Same q46 cutoff + append-mode discipline (state holds only
    // open sessions).
    QueryDef("q244_dynamic_gap_sessions",
      (s, dir) => {
        val cutoff = timestamp_micros(lit(maxTsMicros(s, dir) - 3L * 3600 * 1000000))
        val gap = when(col("event_type") === "purchase", lit("60 minutes"))
          .otherwise(lit("15 minutes"))
        val agg = eventStream(s, dir, maxFilesPerTrigger = 4)
          .withWatermark("ts", "0 seconds")
          .filter(col("ts") < cutoff)
          .groupBy(session_window(col("ts"), gap), col("user_id"))
          .agg(count(lit(1)).as("cnt"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("purchases"))
        runToMemory(s, agg, "append")
          .select(col("session_window.start").cast("timestamp_ntz").as("sstart"),
            col("user_id"), col("cnt"), col("purchases"))
          .orderBy("user_id", "sstart")
      },
      Some("""WITH m AS (SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 3 HOUR AS cutoff FROM events),
             |ev AS (
             |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
             |    CAST(ts AS TIMESTAMP) + CASE WHEN event_type = 'purchase'
             |      THEN INTERVAL 60 MINUTE ELSE INTERVAL 15 MINUTE END AS ends
             |  FROM events, m WHERE CAST(ts AS TIMESTAMP) < m.cutoff),
             |brk AS (
             |  SELECT user_id, ts, event_type,
             |    CASE WHEN ts >= MAX(ends) OVER
             |      (PARTITION BY user_id ORDER BY ts
             |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      OR ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) = 1
             |      THEN 1 ELSE 0 END AS is_new
             |  FROM ev),
             |sess AS (
             |  SELECT user_id, ts, event_type,
             |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM brk)
             |SELECT MIN(ts) AS sstart, user_id, COUNT(*) AS cnt,
             |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases
             |FROM sess GROUP BY user_id, sid
             |ORDER BY user_id, sstart""".stripMargin)),

    // Streaming top-k: hourly event-type leaderboard. The windowed
    // counts run APPEND-mode behind a watermark (only closed windows
    // emit — the state-bounded 100 TB shape; the q46 cutoff makes
    // every window provably close on a bounded replay), and the rank
    // itself is sink-side — per-window top-3 over the emitted closed
    // windows, the standard two-phase shape since streaming rank
    // isn't incrementally expressible. State is one count per open
    // (window, type), dropped at emission.
    QueryDef("q257_stream_topk",
      (s, dir) => {
        val cutoff = timestamp_micros(lit(maxTsMicros(s, dir) - 3L * 3600 * 1000000))
        val agg = eventStream(s, dir, maxFilesPerTrigger = 4)
          .withWatermark("ts", "0 seconds")
          .filter(col("ts") < cutoff)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
        runToMemory(s, agg, "append")
          .select(col("window.start").cast("timestamp_ntz").as("wstart"),
            col("event_type"), col("cnt"))
          .withColumn("rk", row_number().over(
            Window.partitionBy("wstart").orderBy(col("cnt").desc, col("event_type"))))
          .filter(col("rk") <= 3)
          .orderBy("wstart", "rk")
      },
      Some("""WITH m AS (SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 3 HOUR AS cutoff FROM events),
             |w AS (
             |  SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS wstart,
             |    event_type, COUNT(*) AS cnt
             |  FROM events, m WHERE CAST(ts AS TIMESTAMP) < m.cutoff
             |  GROUP BY 1, 2),
             |rk AS (SELECT *, ROW_NUMBER() OVER
             |         (PARTITION BY wstart ORDER BY cnt DESC, event_type) AS rk
             |       FROM w)
             |SELECT wstart, event_type, cnt, CAST(rk AS INT) AS rk
             |FROM rk WHERE rk <= 3 ORDER BY wstart, rk""".stripMargin)),

    // Stream-stream interval ANTI join: purchases with NO click from
    // the same user in the preceding hour — abandoned-attribution /
    // orphan detection. Implemented as the q109 watermarked LEFT
    // interval join with a sink-side IS NULL filter: the join's state
    // is watermark-bounded on both sides and the NULL (unmatched)
    // rows only emit once the watermark proves no match can arrive —
    // exactly the anti-join contract, and the only state-bounded way
    // to express it in Structured Streaming. Same q109 cutoff so the
    // bounded replay drains every pending outer row.
    QueryDef("q261_stream_interval_anti",
      (s, dir) => {
        val cutoff = timestamp_micros(lit(maxTsMicros(s, dir) - 3L * 3600 * 1000000))
        val p = eventStream(s, dir, maxFilesPerTrigger = 4)
          .withWatermark("ts", "1 hour")
          .filter(unpushedTypeIs("purchase") && col("ts") < cutoff)
          .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
        val c = eventStream(s, dir, maxFilesPerTrigger = 4)
          .withWatermark("ts", "1 hour")
          .filter(unpushedTypeIs("click"))
          .select(col("event_id").as("c_id"), col("user_id").as("c_uid"), col("ts").as("c_ts"))
        val joined = p.join(c,
          col("user_id") === col("c_uid") &&
            col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
            col("c_ts") <= col("p_ts"),
          "leftOuter")
        runToMemory(s, joined, "append")
          .filter(col("c_id").isNull)
          .select(col("p_id"), col("user_id"))
          .orderBy("p_id")
      },
      Some("""WITH m AS (SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 3 HOUR AS cutoff FROM events)
             |SELECT p.event_id AS p_id, p.user_id
             |FROM events p, m
             |WHERE p.event_type = 'purchase'
             |  AND CAST(p.ts AS TIMESTAMP) < m.cutoff
             |  AND NOT EXISTS (
             |    SELECT 1 FROM events c
             |    WHERE c.event_type = 'click' AND c.user_id = p.user_id
             |      AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 1 HOUR
             |      AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP))
             |ORDER BY p_id""".stripMargin))
  )
}
