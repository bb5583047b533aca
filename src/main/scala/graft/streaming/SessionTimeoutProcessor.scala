package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Timer-driven sessionization on `transformWithState` with
  * `TimeMode.EventTime`. Each key holds its PENDING sessions (open or
  * closed-by-data but not yet watermark-safe) in a ListState, ascending
  * by start. Arriving events merge-sweep into that list: events and
  * sessions closer than the gap coalesce (counts add), so an event may
  * extend a session, bridge two, or start its own — including an event
  * EARLIER than every pending session, which the global watermark can
  * still admit when it lags a key's activity. A session emits ONLY when
  * the watermark passes (end + gap) — via an event-time timer armed at
  * the earliest pending deadline — at which point no admissible event
  * can touch its span again (any future row carries ts ≥ watermark >
  * end + gap). Emission is therefore independent of how the stream is
  * batched AND of cross-batch disorder: any batch-boundary placement of
  * watermark-admissible events yields the same sessions. Closing on the
  * watermark — never on wall-clock — keeps replays bit-deterministic.
  *
  * This is the pattern `session_window` can't express: arbitrary
  * per-session payload (here count/min/max, in general anything), an
  * emission deadline decided by the data, and state whose lifetime the
  * processor controls. (Spark restricts TTLConfig to
  * TimeMode.ProcessingTime — in event-time mode the timer IS the state
  * bound: every pending session is covered by one, and firing clears
  * what it emits, so nothing can leak past the watermark.)
  *
  * Scale: state is one (count, start, end) tuple per PENDING session —
  * NOT per event — hash-partitioned by key across executors; sessions
  * leave the store as the watermark passes them, so state size tracks
  * in-flight activity inside the watermark delay, not history.
  */
class SessionTimeoutProcessor(gapMs: Long)
  extends StatefulProcessor[Long, (Long, Timestamp), (Long, Long, Long, Long)] {

  private val gapUs = gapMs * 1000L

  /** Pending sessions, ascending by start: (count, startUs, endUs) —
    * pairwise ≥ gap apart (the merge-sweep invariant). */
  @transient private var sessions: ListState[(Long, Long, Long)] = _
  /** The armed timer instant, carried so the next batch can disarm it
    * before re-arming at a possibly-earlier deadline. */
  @transient private var armed: ValueState[Tuple1[Long]] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    sessions = getHandle.getListState[(Long, Long, Long)](
      "sessions", Encoders.product[(Long, Long, Long)], TTLConfig.NONE)
    armed = getHandle.getValueState[Tuple1[Long]](
      "armedTimer", Encoders.product[Tuple1[Long]], TTLConfig.NONE)
  }

  /** Full-precision event time: Timestamp.getTime is ms-truncated;
    * fold the sub-ms nanos back in so gap comparisons match an
    * engine working in micros. */
  private def micros(ts: Timestamp): Long =
    ts.getTime / 1000 * 1000000L + ts.getNanos / 1000

  /** ms-granular timer instant for (end + gap); +1 ms so the coarse
    * timer can't fire a hair before the micros-precise deadline. */
  private def deadlineMs(hiUs: Long): Long = (hiUs + gapUs) / 1000 + 1

  override def handleInputRows(key: Long, rows: Iterator[(Long, Timestamp)],
                               timers: TimerValues): Iterator[(Long, Long, Long, Long)] = {
    val times = rows.map { case (_, ts) => micros(ts) }.toArray
    java.util.Arrays.sort(times)
    // merge-sweep: pending sessions and the batch's events, ascending
    // by start; consecutive pieces closer than the gap coalesce. The
    // pending list is already sorted and disjoint, so this is one
    // linear pass over (sessions + events).
    val pieces = (sessions.get().toArray ++ times.map(t => (1L, t, t))).sortBy(_._2)
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    pieces.foreach { case p @ (n, lo, hi) =>
      if (merged.nonEmpty && lo - merged.last._3 < gapUs) {
        val (pn, plo, phi) = merged.last
        merged(merged.size - 1) = (pn + n, plo, math.max(phi, hi))
      } else merged += p
    }
    sessions.clear()
    sessions.put(merged.toArray)
    Option(armed.get()).foreach(t => getHandle.deleteTimer(t._1))
    val deadline = deadlineMs(merged.head._3) // earliest pending deadline
    getHandle.registerTimer(deadline)
    armed.update(Tuple1(deadline))
    Iterator.empty // emission is watermark-gated — see handleExpiredTimer
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
                                  expired: ExpiredTimerInfo): Iterator[(Long, Long, Long, Long)] = {
    val wmMs = timers.getCurrentWatermarkInMs()
    val pending = sessions.get().toArray
    // sessions are ascending and ≥ gap apart, so ends ascend too: the
    // watermark-safe ones are a prefix
    val (ripe, rest) = pending.partition(s => deadlineMs(s._3) <= wmMs)
    sessions.clear()
    if (rest.nonEmpty) {
      sessions.put(rest)
      val next = deadlineMs(rest.head._3)
      getHandle.registerTimer(next)
      armed.update(Tuple1(next))
    } else armed.clear()
    ripe.iterator.map { case (n, lo, hi) => (key, n, lo / 1000, hi / 1000) }
  }
}
