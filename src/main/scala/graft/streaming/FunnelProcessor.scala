package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming funnel (the CEP state machine q206 computes in batch):
  * per user, first signup, then first view AFTER it, first click after
  * that, first purchase after that; a conversion row emits when the
  * chain completes. The fold over a user's events in event-time order
  * is equivalent to the batch min-recurrence (each step takes the
  * FIRST qualifying event after the previous step's time — the min of
  * qualifying times), but the recurrence is NOT monotone under
  * disorder: an earlier-arriving signup can retroactively re-qualify a
  * view already seen. So events BUFFER until the watermark passes
  * them, and only the watermark-final prefix is folded — processed in
  * (ts, step) order, emission is independent of how the stream is
  * batched and of any admissible cross-batch disorder (the
  * SessionTimeoutProcessor discipline).
  *
  * Scale: buffered state per user is bounded by the watermark delay ×
  * that user's funnel-step event rate (NOT history — folded events
  * leave the buffer); the fold state is one 4-tuple per user. Keys
  * hash-partition across executors; timers are per-key and clear on
  * conversion.
  */
class FunnelProcessor
  extends StatefulProcessor[Long, (Long, Int, Timestamp), (Long, Long, Long, Long)] {

  /** Watermark-pending funnel-step events: (stepCode 1..4, tsUs). */
  @transient private var buf: ListState[(Int, Long)] = _
  /** Fold progress: (t1,t2,t3,t4) µs, 0 = step not reached. The 5th
    * slot flags "conversion already emitted" (1) so a replayed batch
    * can never double-emit. */
  @transient private var prog: ValueState[(Long, Long, Long, Long, Long)] = _
  @transient private var armed: ValueState[Tuple1[Long]] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getListState[(Int, Long)](
      "buf", Encoders.product[(Int, Long)], TTLConfig.NONE)
    prog = getHandle.getValueState[(Long, Long, Long, Long, Long)](
      "prog", Encoders.product[(Long, Long, Long, Long, Long)], TTLConfig.NONE)
    armed = getHandle.getValueState[Tuple1[Long]](
      "armedTimer", Encoders.product[Tuple1[Long]], TTLConfig.NONE)
  }

  private def micros(ts: Timestamp): Long =
    ts.getTime / 1000 * 1000000L + ts.getNanos / 1000

  /** Timer instant (ms) at which an event at tsUs is watermark-final:
    * the coarse ms clock must be strictly past the µs instant. */
  private def finalMs(tsUs: Long): Long = tsUs / 1000 + 1

  private def rearm(earliestUs: Long): Unit = {
    Option(armed.get()).foreach(t => getHandle.deleteTimer(t._1))
    val d = finalMs(earliestUs)
    getHandle.registerTimer(d)
    armed.update(Tuple1(d))
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, Int, Timestamp)],
                               timers: TimerValues): Iterator[(Long, Long, Long, Long)] = {
    val add = rows.map { case (_, code, ts) => (code, micros(ts)) }.toArray
    if (add.nonEmpty) {
      val all = buf.get().toArray ++ add
      buf.put(all)
      rearm(all.iterator.map(_._2).min)
    }
    Iterator.empty // emission is watermark-gated — see handleExpiredTimer
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
                                  expired: ExpiredTimerInfo): Iterator[(Long, Long, Long, Long)] = {
    val wmUs = timers.getCurrentWatermarkInMs() * 1000L
    val (ripe, rest) = buf.get().toArray.partition(_._2 < wmUs)
    buf.clear()
    if (rest.nonEmpty) { buf.put(rest); rearm(rest.iterator.map(_._2).min) }
    else armed.clear()
    if (ripe.isEmpty) return Iterator.empty
    var (t1, t2, t3, t4, emitted) =
      Option(prog.get()).getOrElse((0L, 0L, 0L, 0L, 0L))
    // ts-major order; ties fold lower steps first, which matches the
    // batch recurrence's STRICT ts > prev-step inequality (an equal-ts
    // pair can never chain, whichever folds first)
    java.util.Arrays.sort(ripe, Ordering.by((e: (Int, Long)) => (e._2, e._1)))
    var fire = false
    ripe.foreach { case (code, t) =>
      code match {
        case 1 => if (t1 == 0L) t1 = t
        case 2 => if (t2 == 0L && t1 != 0L && t > t1) t2 = t
        case 3 => if (t3 == 0L && t2 != 0L && t > t2) t3 = t
        case _ => if (t4 == 0L && t3 != 0L && t > t3) { t4 = t; fire = true }
      }
    }
    val out = if (fire && emitted == 0L) {
      emitted = 1L
      Iterator.single((key, t1, t4, t4 - t1))
    } else Iterator.empty
    prog.update((t1, t2, t3, t4, emitted))
    out
  }
}
