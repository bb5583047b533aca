package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Timer-driven sessionization on `transformWithState` with
  * `TimeMode.EventTime`. Each key holds at most one OPEN session in a
  * ValueState. Arriving events (sorted, micros precision) extend it or
  * — when the gap to the previous event is >= the gap duration — close
  * it: a session provably closed by a LATER event emits immediately
  * from `handleInputRows`; only the trailing open session needs a
  * timer, re-armed each batch at (last event + gap) and fired when the
  * WATERMARK passes that instant. Closing on the watermark — never on
  * wall-clock — keeps replays and test runs bit-deterministic.
  *
  * This is the pattern `session_window` can't express: arbitrary
  * per-session payload (here count/min/max, in general anything), an
  * emission deadline decided by the data, and state whose lifetime the
  * processor controls. (Spark restricts TTLConfig to
  * TimeMode.ProcessingTime — in event-time mode the timer IS the state
  * bound: every open session carries one, and firing clears the state,
  * so nothing can leak past the watermark.)
  *
  * Scale: state is (one tuple + one timer) per OPEN session — NOT per
  * event — hash-partitioned by key across executors; closed sessions
  * leave the store, so state size tracks concurrent activity, not
  * history. Emission is independent of how the stream is batched:
  * any micro-batch boundary placement yields the same sessions.
  */
class SessionTimeoutProcessor(gapMs: Long)
  extends StatefulProcessor[Long, (Long, Timestamp), (Long, Long, Long, Long)] {

  private val gapUs = gapMs * 1000L

  @transient private var session: ValueState[(Long, Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    // (count, startUs, endUs, armedTimerMs) — the armed timer instant is
    // carried in state so the next batch can disarm it before re-arming
    session = getHandle.getValueState[(Long, Long, Long, Long)](
      "openSession", Encoders.product[(Long, Long, Long, Long)], TTLConfig.NONE)
  }

  /** Full-precision event time: Timestamp.getTime is ms-truncated;
    * fold the sub-ms nanos back in so gap comparisons match an
    * engine working in micros. */
  private def micros(ts: Timestamp): Long =
    ts.getTime / 1000 * 1000000L + ts.getNanos / 1000

  override def handleInputRows(key: Long, rows: Iterator[(Long, Timestamp)],
                               timers: TimerValues): Iterator[(Long, Long, Long, Long)] = {
    // events within a batch may be unordered; sessionization needs them
    // in time order (a batch is bounded, so the sort is per-key-per-batch)
    val times = rows.map { case (_, ts) => micros(ts) }.toArray
    java.util.Arrays.sort(times)
    var (n, lo, hi, armed) = Option(session.get()).getOrElse((0L, Long.MaxValue, Long.MinValue, -1L))
    val closed = Seq.newBuilder[(Long, Long, Long, Long)]
    times.foreach { t =>
      if (n > 0 && t - hi >= gapUs) { // gap reached → previous session closed
        closed += ((key, n, lo / 1000, hi / 1000))
        n = 0; lo = Long.MaxValue; hi = Long.MinValue
      }
      n += 1; lo = math.min(lo, t); hi = math.max(hi, t)
    }
    if (armed >= 0) getHandle.deleteTimer(armed)
    // +1ms guard: the ms-granular timer must not fire a hair before the
    // micros-precise session end has actually passed
    val deadline = (hi + gapUs) / 1000 + 1
    getHandle.registerTimer(deadline)
    session.update((n, lo, hi, deadline))
    closed.result().iterator
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
                                  expired: ExpiredTimerInfo): Iterator[(Long, Long, Long, Long)] = {
    val out = Option(session.get()).map { case (n, lo, hi, _) => (key, n, lo / 1000, hi / 1000) }
    session.clear()
    out.iterator
  }
}
