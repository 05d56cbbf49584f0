package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

import graft.operators.Combine.CombineFn

/** Beam-style trigger/pane semantics on Spark 4's `transformWithState`
  * (SURVEY.md §2.4 trigger row and §7 Phase 3c — the reference's
  * ReduceFnRunner, [U] sdk/.../util/ReduceFnRunner.java, is the semantic
  * spec; this is a Spark-native re-derivation, not a port).
  *
  * Scope implemented (the trigger shapes real pipelines use):
  *  - AfterWatermark.pastEndOfWindow (the default): one ON_TIME pane when
  *    the watermark passes window end.
  *  - .withEarlyFirings(AfterCount(n) | PerBatch): EARLY panes while the
  *    window is open. PerBatch is the micro-batch rendering of Beam's
  *    AfterProcessingTime — the batch cadence is the processing-time clock.
  *  - .withLateFirings(PerBatch): LATE panes for data arriving after the
  *    on-time pane, within allowed lateness.
  *  - allowed lateness with state GC at window end + lateness; later data
  *    is dropped (same contract as Beam's LateDataDroppingDoFnRunner).
  *  - accumulating | discarding fired panes.
  *  - Never: suppress early/on-time firing; single final pane at GC.
  *
  * Each pane carries PaneInfo (timing EARLY/ON_TIME/LATE, index, isFirst,
  * isLast) — the columns Spark's own windowed aggregation cannot produce.
  *
  * State layout per key: MapState[windowStart → WindowState(acc, counts,
  * flags)]; event-time timers at window end (on-time) and end + lateness
  * (GC). Windows here are fixed/tumbling; sliding = run the engine over
  * exploded window assignments; merging sessions stay on
  * `session_window` (default trigger) per SURVEY §7 hard-part #4.
  */
object TriggerEngine {

  /** Early/late firing specs (subset of Beam's trigger algebra). */
  sealed trait Firing extends Serializable
  /** Fire after n new elements since the last pane. */
  final case class AfterCount(n: Int) extends Firing
  /** Fire once per micro-batch that saw data for the window. */
  case object PerBatch extends Firing
  /** Never fire (for early: no early panes; for late: drop late panes). */
  case object NoFiring extends Firing

  /** Trigger spec ≈ AfterWatermark.pastEndOfWindow
    * .withEarlyFirings(early).withLateFirings(late); `Never` suppresses
    * everything except the final GC pane. */
  final case class TriggerSpec(
      early: Firing = NoFiring,
      late: Firing = NoFiring,
      suppressOnTime: Boolean = false) extends Serializable

  object TriggerSpec {
    val default: TriggerSpec = TriggerSpec()
    val never: TriggerSpec = TriggerSpec(suppressOnTime = true)
  }

  sealed trait AccumulationMode extends Serializable
  case object Accumulating extends AccumulationMode
  case object Discarding extends AccumulationMode

  /** Emitted pane with Beam PaneInfo fields. */
  final case class Pane[K, O](
      key: K,
      windowStart: Timestamp,
      windowEnd: Timestamp,
      value: O,
      timing: String, // EARLY | ON_TIME | LATE | FINAL
      paneIndex: Long,
      isFirst: Boolean,
      isLast: Boolean)

  /** Per-window engine state. Serialized with kryo — accumulator type is
    * caller-defined. */
  final case class WindowState[Acc](
      acc: Acc,                 // accumulating-mode accumulator
      paneAcc: Acc,             // since-last-pane accumulator (discarding)
      sinceLastPane: Long,      // elements since last pane
      paneIndex: Long,
      firedOnTime: Boolean,
      timersSet: Boolean)

  /** The processor. Input rows: (key, eventTime, value).
    *
    * Clock translation: Spark's watermark both *filters late rows* upstream
    * of stateful operators and *drives timers*, while Beam separates "the
    * watermark passed the window" (on-time) from "data may still arrive for
    * `allowedLateness`" (late panes). We reconcile by setting the stream's
    * watermark delay to `allowedLateness`: Spark's row filter then
    * implements Beam's late-data drop exactly, and the engine recovers the
    * *true* (undelayed) event-time watermark as sparkWatermark + lateness.
    * Timers are registered in the Spark clock: on-time at
    * windowEnd - lateness, GC at windowEnd. (Near-epoch timestamps distort
    * the shift because Spark clamps its watermark at 0 — irrelevant for
    * real event times; guarded with a re-registration check.) */
  final class WindowTriggerProcessor[K, V, Acc, Out](
      windowSizeMs: Long,
      allowedLatenessMs: Long,
      trigger: TriggerSpec,
      mode: AccumulationMode,
      combine: CombineFn[V, Acc, Out])
      extends StatefulProcessor[K, (K, Timestamp, V), Pane[K, Out]] {

    @transient private var windows: MapState[Long, WindowState[Acc]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      windows = getHandle.getMapState[Long, WindowState[Acc]](
        "windows", Encoders.scalaLong,
        Encoders.kryo[WindowState[Acc]], TTLConfig.NONE)

    private def windowStart(tsMs: Long): Long = tsMs - Math.floorMod(tsMs, windowSizeMs)

    private def freshState(): WindowState[Acc] =
      WindowState(combine.createAccumulator(), combine.createAccumulator(),
        0L, 0L, firedOnTime = false, timersSet = false)

    private def paneValue(st: WindowState[Acc]): Out = mode match {
      case Accumulating => combine.extractOutput(st.acc)
      case Discarding   => combine.extractOutput(st.paneAcc)
    }

    private def afterPane(st: WindowState[Acc]): WindowState[Acc] =
      st.copy(paneAcc = combine.createAccumulator(), sinceLastPane = 0L,
        paneIndex = st.paneIndex + 1)

    private def emit(key: K, ws: Long, st: WindowState[Acc], timing: String,
                     isLast: Boolean): Pane[K, Out] =
      Pane(key, new Timestamp(ws), new Timestamp(ws + windowSizeMs),
        paneValue(st), timing, st.paneIndex, st.paneIndex == 0L, isLast)

    /** Spark watermark → true (undelayed) event-time watermark. */
    private def trueWm(sparkWm: Long): Long =
      if (sparkWm <= 0) 0L else sparkWm + allowedLatenessMs

    override def handleInputRows(key: K, rows: Iterator[(K, Timestamp, V)],
                                 timers: TimerValues): Iterator[Pane[K, Out]] = {
      val wm = trueWm(timers.getCurrentWatermarkInMs)
      val out = scala.collection.mutable.ArrayBuffer.empty[Pane[K, Out]]
      rows.toSeq.groupBy(r => windowStart(r._2.getTime)).foreach { case (ws, vs) =>
        val wEnd = ws + windowSizeMs
        if (wEnd + allowedLatenessMs > wm) { // else: beyond lateness → drop
          var st = windows.containsKey(ws) match {
            case true  => windows.getValue(ws)
            case false => freshState()
          }
          vs.foreach { case (_, _, v) =>
            st = st.copy(
              acc = combine.addInput(st.acc, v),
              paneAcc = combine.addInput(st.paneAcc, v),
              sinceLastPane = st.sinceLastPane + 1)
          }
          if (!st.timersSet) {
            // Spark-clock timers: on-time at wEnd - lateness, GC at wEnd
            getHandle.registerTimer(math.max(wEnd - allowedLatenessMs, 1L))
            if (allowedLatenessMs > 0) getHandle.registerTimer(wEnd)
            st = st.copy(timersSet = true)
          }
          val windowClosed = wEnd <= wm
          if (windowClosed) {
            // post-watermark arrival: LATE pane if configured
            trigger.late match {
              case PerBatch | AfterCount(_) if !trigger.suppressOnTime =>
                val fire = trigger.late match {
                  case AfterCount(n) => st.sinceLastPane >= n
                  case _             => true
                }
                if (fire) { out += emit(key, ws, st, "LATE", isLast = false); st = afterPane(st) }
              case _ => // buffered until GC (Never) or silently held
            }
          } else {
            val fireEarly = trigger.early match {
              case AfterCount(n) => st.sinceLastPane >= n
              case PerBatch      => true
              case NoFiring      => false
            }
            if (fireEarly && !trigger.suppressOnTime) {
              out += emit(key, ws, st, "EARLY", isLast = false)
              st = afterPane(st)
            }
          }
          windows.updateValue(ws, st)
        }
      }
      out.iterator
    }

    override def handleExpiredTimer(key: K, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[Pane[K, Out]] = {
      val sparkWm = timers.getCurrentWatermarkInMs
      val wm = trueWm(sparkWm)
      val out = scala.collection.mutable.ArrayBuffer.empty[Pane[K, Out]]
      val entries = windows.iterator().toSeq
      entries.foreach { case (ws, st0) =>
        var st = st0
        val wEnd = ws + windowSizeMs
        if (wEnd <= wm && !st.firedOnTime) {
          if (!trigger.suppressOnTime) {
            // on-time pane: fires even when empty-since-last-pane (Beam's
            // on-time marker semantics)
            out += emit(key, ws, st, "ON_TIME", isLast = allowedLatenessMs == 0)
            st = afterPane(st)
          }
          st = st.copy(firedOnTime = true)
          windows.updateValue(ws, st)
          if (allowedLatenessMs == 0) windows.removeKey(ws)
        } else if (wEnd > wm && !st.firedOnTime) {
          // near-epoch clamp: fired too early relative to the true
          // watermark — retry on the next watermark advance
          getHandle.registerTimer(sparkWm + 1)
        }
        if (wEnd + allowedLatenessMs <= wm && windows.containsKey(ws)) {
          if (trigger.suppressOnTime || st.sinceLastPane > 0) {
            // Never-trigger final pane, or residual late data not yet fired
            out += emit(key, ws, st, "FINAL", isLast = true)
          }
          windows.removeKey(ws)
        }
      }
      out.iterator
    }
  }

  /** Windowed aggregation with Beam trigger semantics over a raw
    * (key, eventTime, value) stream. The watermark delay is set to
    * `allowedLateness` here — that pairing is what makes Spark's upstream
    * late-row filter implement Beam's allowed-lateness drop (see the
    * processor's clock-translation note). Panes stream out in append mode. */
  def windowedAggregate[K, V, Acc, Out](
      input: Dataset[(K, Timestamp, V)],
      windowSize: java.time.Duration,
      allowedLateness: java.time.Duration,
      trigger: TriggerSpec,
      mode: AccumulationMode,
      combine: CombineFn[V, Acc, Out])(
      implicit ek: Encoder[K], ep: Encoder[Pane[K, Out]]): Dataset[Pane[K, Out]] = {
    val proc = new WindowTriggerProcessor[K, V, Acc, Out](
      windowSize.toMillis, allowedLateness.toMillis, trigger, mode, combine)
    input.withWatermark("_2", s"${allowedLateness.toMillis} milliseconds")
      .groupByKey(_._1)
      .transformWithState(proc, TimeMode.EventTime(), OutputMode.Append())
  }
}
