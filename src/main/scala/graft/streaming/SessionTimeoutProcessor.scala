package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Timer-driven sessionization on `transformWithState` with
  * `TimeMode.EventTime`: each key accumulates events into an open
  * session; every batch re-arms an event-time timer at (last event +
  * gap), and when the WATERMARK passes that instant the timer fires,
  * the closed session is emitted, and the state is cleared.
  *
  * This is the pattern `session_window` can't express: arbitrary
  * per-session payload (here count/min/max, in general anything), an
  * emission deadline decided by the data, and state whose lifetime the
  * processor controls. Closing on the watermark — never on wall-clock —
  * keeps replays and test runs bit-deterministic. (Spark restricts
  * TTLConfig to TimeMode.ProcessingTime — in event-time mode the timer
  * IS the state bound: every open session carries one, and firing
  * clears the state, so nothing can leak past the watermark.)
  *
  * Scale: state is (one tuple + one timer) per OPEN session, hash-
  * partitioned by key across executors; closed sessions leave the
  * store, so state size tracks concurrent activity, not history.
  */
class SessionTimeoutProcessor(gapMs: Long)
  extends StatefulProcessor[Long, (Long, Timestamp), (Long, Long, Long, Long)] {

  @transient private var session: ValueState[(Long, Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    // (count, startMs, endMs, armedTimerMs) — the armed timer instant is
    // carried in state so the next batch can disarm it before re-arming
    session = getHandle.getValueState[(Long, Long, Long, Long)](
      "openSession", Encoders.product[(Long, Long, Long, Long)], TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, Timestamp)],
                               timers: TimerValues): Iterator[(Long, Long, Long, Long)] = {
    var (n, lo, hi, armed) = Option(session.get()).getOrElse((0L, Long.MaxValue, Long.MinValue, -1L))
    rows.foreach { case (_, ts) =>
      val t = ts.getTime
      n += 1; lo = math.min(lo, t); hi = math.max(hi, t)
    }
    if (armed >= 0) getHandle.deleteTimer(armed)
    val deadline = hi + gapMs
    getHandle.registerTimer(deadline)
    session.update((n, lo, hi, deadline))
    Iterator.empty // sessions are emitted only when they close
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
                                  expired: ExpiredTimerInfo): Iterator[(Long, Long, Long, Long)] = {
    val out = Option(session.get()).map { case (n, lo, hi, _) => (key, n, lo, hi) }
    session.clear()
    out.iterator
  }
}
