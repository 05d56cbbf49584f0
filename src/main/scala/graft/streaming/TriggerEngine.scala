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
  *  - .withEarlyFirings(...) / .withLateFirings(...) over the trigger
  *    algebra: AfterCount(n), PerBatch, AfterProcessingTimeDelay(d)
  *    (≡ AfterProcessingTime.pastFirstElementInPane.plusDelayOf),
  *    AfterFirst, AfterAll, Repeatedly, OrFinally, AfterEach.inOrder —
  *    with Beam's finishing semantics (see Firing's doc).
  *  - allowed lateness with state GC at window end + lateness; later data
  *    is dropped (same contract as Beam's LateDataDroppingDoFnRunner).
  *    Post-on-time data with NO late firings configured is dropped too
  *    (finished-trigger contract), not re-emitted at GC.
  *  - accumulating | discarding fired panes.
  *  - Never: suppress early/on-time firing; single final pane at GC.
  *
  * Each pane carries PaneInfo (timing EARLY/ON_TIME/LATE, index, isFirst,
  * isLast) — the columns Spark's own windowed aggregation cannot produce.
  *
  * State layout per key: MapState[windowStart → WindowState(acc, counts,
  * flags)]; event-time timers at window end (on-time) and end + lateness
  * (GC). Fixed/tumbling and sliding (multi-window assignment) are both
  * supported; merging sessions with early firings live in
  * [[SessionEngine]] (ListState of open windows).
  */
object TriggerEngine {

  /** GlobalWindow end sentinel (9999-12-31T23:59:59.999Z): the analogue of
    * Beam's GlobalWindow.MAX_TIMESTAMP, bounded so Spark's millis→micros
    * timestamp conversion cannot overflow. */
  val GlobalWindowEndMs: Long = 253402300799999L

  /** The clock AfterProcessingTime conditions read (VERDICT r12 task 2).
    * Injectable so the wall-clock half of the trigger algebra can be
    * driven deterministically: the engine hands each reading the max
    * event-time (ms) across the key's rows in the current micro-batch,
    * and the default implementation ignores it and reads the system
    * clock — production semantics are unchanged. A data-driven clock
    * (e.g. [[QuantizedEventClock]]) makes pane BOUNDARIES a pure
    * function of the feed, which is what lets a replay gate put
    * AfterProcessingTime's firing positions under a SQL oracle instead
    * of a conservation-only check. */
  trait EngineClock extends Serializable {
    /** @param batchMaxEventMs max event time (ms) over the key's rows in
      *                        this batch; 0 when the reading happens
      *                        outside row processing */
    def nowMs(batchMaxEventMs: Long): Long
  }

  /** Production clock: wall time, event times ignored. */
  case object SystemEngineClock extends EngineClock {
    def nowMs(batchMaxEventMs: Long): Long = System.currentTimeMillis()
  }

  /** Virtual clock for deterministic replay: "now" is the key's batch
    * max event time floored to the `cellMs` grid. On an ordered
    * one-file-per-grid-cell feed this reads exactly cell·cellMs for a
    * batch covering cell `cell`, so AfterProcessingTimeDelay(k·cellMs)
    * fires, per (key, window), at the key's first batch ≥ k cells after
    * the pane opened — replayable in SQL from per-(key, cell) presence
    * alone. */
  final case class QuantizedEventClock(cellMs: Long) extends EngineClock {
    require(cellMs > 0, "cellMs must be positive")
    def nowMs(batchMaxEventMs: Long): Long =
      if (batchMaxEventMs <= 0) 0L
      else batchMaxEventMs - Math.floorMod(batchMaxEventMs, cellMs)
  }

  /** Early/late firing specs — Beam's trigger algebra
    * ([U] W/Trigger.java + one file per composite: AfterPane, AfterFirst,
    * AfterAll, Repeatedly, OrFinallyTrigger, AfterProcessingTime).
    *
    * Finishing semantics — INTENTIONAL divergence from Beam's
    * AfterWatermarkEarlyAndLate: Beam wraps the entire early/late spec in
    * `Repeatedly.forever`, so a composite like AfterFirst(...) repeats
    * until the window closes and `OrFinally` can never actually stop an
    * early firing. Here `TriggerSpec(early = f)` applies the algebra
    * literally — only a bare atomic at the top level is implicitly
    * `Repeatedly` (the form real pipelines use); a composite finishes per
    * its own rule: an atomic/AfterFirst/AfterAll finishes once it fires,
    * `Repeatedly` never finishes, `OrFinally(main, until)` finishes when
    * `until`'s condition holds at a firing. This makes fire-once and
    * fire-until composites expressible as early firings, which Beam's
    * auto-wrap forecloses. For exact Beam behavior use
    * [[TriggerSpec.beamStyle]], which applies the `Repeatedly` wrap. */
  sealed trait Firing extends Serializable
  /** Fire after n new elements since the last pane (AfterPane
    * .elementCountAtLeast). */
  final case class AfterCount(n: Int) extends Firing
  /** Fire once per micro-batch that saw data for the window — the
    * micro-batch rendering of a zero-delay processing-time trigger. */
  case object PerBatch extends Firing
  /** Never fire (for early: no early panes; for late: drop late panes). */
  case object NoFiring extends Firing
  /** AfterProcessingTime.pastFirstElementInPane.plusDelayOf(delay): fire
    * once `delay` wall-clock ms have passed since the pane's first element.
    * Micro-batch rendering: the condition is checked when a batch touches
    * the KEY (any window of it — see the wall-clock sweep), so a firing
    * lands on the first such batch at-or-after the delay. A key that goes
    * completely quiet fires only when the watermark closes the window:
    * `transformWithState` runs in a single TimeMode, so an event-time
    * engine cannot also register wall-clock timers. Beam's own
    * processing-time triggers are documented best-effort; this is the
    * micro-batch analogue of that caveat. For the guaranteed-firing form
    * (quiet keys included) use [[processingTimeAggregate]] (wall clock as
    * its own TimeMode.ProcessingTime operator) or, for event-time windows
    * PLUS the wall-clock guarantee, the composed
    * [[windowedAggregateWithWallClockNudge]]. */
  final case class AfterProcessingTimeDelay(delayMs: Long) extends Firing
  /** Fire when ANY sub-trigger's condition holds; finishes on fire. */
  final case class AfterFirst(subs: Seq[Firing]) extends Firing
  /** Fire when ALL sub-trigger conditions hold; finishes on fire. */
  final case class AfterAll(subs: Seq[Firing]) extends Firing
  /** Repeat `sub` forever: each firing resets it instead of finishing. */
  final case class Repeatedly(sub: Firing) extends Firing
  /** Behave as `main` until `until`'s condition holds; that firing is the
    * last (Beam Trigger.orFinally). */
  final case class OrFinally(main: Firing, until: Firing) extends Firing
  /** Use each (atomic) sub-trigger once, in order: the i-th pane fires per
    * subs(i); finishes when the last has fired (Beam AfterEach.inOrder —
    * supported for atomic sub-triggers, the practical shape). */
  final case class AfterEach(subs: Seq[Firing]) extends Firing

  /** Condition inputs for firing evaluation: all atomic conditions are
    * monotone within a pane, so composites need no per-sub state.
    * `paneIndex` here is the count of panes fired by THE TRIGGER BEING
    * EVALUATED (early and late each keep their own count) — AfterEach as a
    * late trigger must start at its first sub, not skip the ones "used up"
    * by early/on-time panes of the window's global pane numbering. */
  private[streaming] final case class FiringCtx(sinceLastPane: Long, paneFirstWallMs: Long,
                                     nowMs: Long, paneIndex: Long)

  private[streaming] def ready(f: Firing, ctx: FiringCtx): Boolean = f match {
    case NoFiring                    => false
    case AfterCount(n)               => ctx.sinceLastPane >= n
    case PerBatch                    => ctx.sinceLastPane > 0
    case AfterProcessingTimeDelay(d) =>
      ctx.paneFirstWallMs > 0 && ctx.nowMs >= ctx.paneFirstWallMs + d
    case AfterFirst(subs)            => subs.exists(ready(_, ctx))
    case AfterAll(subs)              => subs.nonEmpty && subs.forall(ready(_, ctx))
    // Repeatedly resets a finished sub-trigger (Beam Repeatedly.forever):
    // for AfterEach that means cycling back to sub 0 after exhaustion
    // instead of stalling, so position is paneIndex mod |subs|.
    case Repeatedly(AfterEach(subs)) =>
      subs.nonEmpty && ready(subs((ctx.paneIndex % subs.length).toInt), ctx)
    case Repeatedly(sub)             => ready(sub, ctx)
    case OrFinally(main, until)      => ready(main, ctx) || ready(until, ctx)
    case AfterEach(subs)             =>
      ctx.paneIndex < subs.length && ready(subs(ctx.paneIndex.toInt), ctx)
  }

  private[streaming] def finishesOnFire(f: Firing, ctx: FiringCtx): Boolean = f match {
    case NoFiring               => false
    case Repeatedly(_)          => false
    case OrFinally(_, until)    => ready(until, ctx)
    case AfterEach(subs)        => ctx.paneIndex >= subs.length - 1
    case _                      => true // atomics and AfterFirst/AfterAll
  }

  /** Top-level bare atomics repeat (see trait doc). */
  private[streaming] def effective(f: Firing): Firing = f match {
    case AfterCount(_) | PerBatch | AfterProcessingTimeDelay(_) => Repeatedly(f)
    case other => other
  }

  private def usesWallClock(f: Firing): Boolean = f match {
    case AfterProcessingTimeDelay(_) => true
    case AfterFirst(s)               => s.exists(usesWallClock)
    case AfterAll(s)                 => s.exists(usesWallClock)
    case Repeatedly(s)               => usesWallClock(s)
    case OrFinally(m, u)             => usesWallClock(m) || usesWallClock(u)
    case _                           => false
  }

  /** Shape validation, applied at every engine entry point. The monotone-
    * context evaluation keeps pane-position state (paneIndex) only for the
    * TOP-LEVEL firing, so AfterEach — the one position-dependent
    * construct — is supported exactly as documented: at top level
    * (optionally under Repeatedly for the cycling form) with ATOMIC
    * sub-triggers. Anything else would not error at runtime; it would
    * silently stall once the global pane index passed the sub count (the
    * TriggerFuzzSpec counterexample), which is strictly worse than
    * failing fast here. */
  private[streaming] def validateFiring(f: Firing, top: Boolean = true): Unit = f match {
    case AfterEach(subs) =>
      require(top,
        "AfterEach is supported only as the top-level firing (optionally wrapped in " +
          "Repeatedly): nested under other composites its pane position would read the " +
          "global pane index and stall silently")
      subs.foreach {
        case AfterCount(_) | PerBatch | NoFiring | AfterProcessingTimeDelay(_) => ()
        case bad => throw new IllegalArgumentException(
          s"AfterEach supports atomic sub-triggers only (got $bad)")
      }
    case Repeatedly(sub)    => validateFiring(sub, top)
    case AfterFirst(subs)   => subs.foreach(validateFiring(_, top = false))
    case AfterAll(subs)     => subs.foreach(validateFiring(_, top = false))
    case OrFinally(m, u)    => validateFiring(m, top = false); validateFiring(u, top = false)
    case _                  => ()
  }

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

    /** Beam-exact AfterWatermark.pastEndOfWindow.withEarlyFirings(early)
      * .withLateFirings(late): both specs wrapped in `Repeatedly.forever`,
      * as [U] W/AfterWatermark.java does — composites repeat until the
      * window closes instead of finishing (see the Firing doc for why the
      * plain constructor diverges). */
    def beamStyle(early: Firing = NoFiring, late: Firing = NoFiring): TriggerSpec = {
      def wrap(f: Firing): Firing = f match {
        case NoFiring | Repeatedly(_) => f
        case other                    => Repeatedly(other)
      }
      TriggerSpec(wrap(early), wrap(late))
    }
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
    * caller-defined. NOTE: kryo field serialization means the state schema
    * is not evolvable in place — changing this case class requires a fresh
    * streaming checkpoint (the standard contract for kryo-encoded state). */
  final case class WindowState[Acc](
      acc: Acc,                 // accumulating-mode accumulator
      paneAcc: Acc,             // since-last-pane accumulator (discarding)
      sinceLastPane: Long,      // elements since last pane
      paneIndex: Long,
      firedOnTime: Boolean,
      timersSet: Boolean,
      paneFirstWallMs: Long = 0L,   // wall-clock of pane's first element
      earlyFinished: Boolean = false, // early trigger finished (algebra)
      lateFinished: Boolean = false,  // late trigger finished (algebra)
      earlyPanes: Long = 0L,          // panes fired by the early trigger
      latePanes: Long = 0L)           // panes fired by the late trigger

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
      combine: CombineFn[V, Acc, Out],
      slideMs: Long = 0L, // 0 → tumbling; else SlidingWindows(size, slide)
      clock: EngineClock = SystemEngineClock)
      extends StatefulProcessor[K, (K, Timestamp, V), Pane[K, Out]] {

    private val effectiveSlideMs = if (slideMs <= 0) windowSizeMs else slideMs

    @transient private var windows: MapState[Long, WindowState[Acc]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      windows = getHandle.getMapState[Long, WindowState[Acc]](
        "windows", Encoders.scalaLong,
        Encoders.kryo[WindowState[Acc]], TTLConfig.NONE)

    /** All window starts containing tsMs: one for tumbling; size/slide
      * many for sliding (Beam's multi-window assignment). Windows starting
      * before the epoch are clipped — they'd collide with the near-epoch
      * watermark clamp; irrelevant for real event times. */
    private def assignWindows(tsMs: Long): Seq[Long] = {
      val last = tsMs - Math.floorMod(tsMs, effectiveSlideMs)
      Iterator.iterate(last)(_ - effectiveSlideMs)
        .takeWhile(ws => ws > tsMs - windowSizeMs && ws >= 0)
        .toSeq
    }

    private def freshState(): WindowState[Acc] =
      WindowState(combine.createAccumulator(), combine.createAccumulator(),
        0L, 0L, firedOnTime = false, timersSet = false)

    /** `triggerPanes`: the evaluated trigger's own fired-pane count (early
      * vs late are independent streams for AfterEach's position). */
    private def ctxOf(st: WindowState[Acc], nowMs: Long,
                      triggerPanes: Long): FiringCtx =
      FiringCtx(st.sinceLastPane, st.paneFirstWallMs, nowMs, triggerPanes)

    private def paneValue(st: WindowState[Acc]): Out = mode match {
      case Accumulating => combine.extractOutput(st.acc)
      case Discarding   => combine.extractOutput(st.paneAcc)
    }

    private def afterPane(st: WindowState[Acc]): WindowState[Acc] =
      st.copy(paneAcc = combine.createAccumulator(), sinceLastPane = 0L,
        paneIndex = st.paneIndex + 1, paneFirstWallMs = 0L)

    private def emit(key: K, ws: Long, st: WindowState[Acc], timing: String,
                     isLast: Boolean): Pane[K, Out] =
      Pane(key, new Timestamp(ws), new Timestamp(ws + windowSizeMs),
        paneValue(st), timing, st.paneIndex, st.paneIndex == 0L, isLast)

    /** Spark watermark → true (undelayed) event-time watermark. */
    private def trueWm(sparkWm: Long): Long =
      if (sparkWm <= 0) 0L else sparkWm + allowedLatenessMs

    override def handleInputRows(key: K, rows: Iterator[(K, Timestamp, V)],
                                 timers: TimerValues): Iterator[Pane[K, Out]] = {
      val wm = trueWm(timers.getCurrentWatermarkInMs())
      val rowSeq = rows.toSeq
      val maxEventMs =
        if (rowSeq.isEmpty) 0L else rowSeq.iterator.map(_._2.getTime).max
      val nowMs = clock.nowMs(maxEventMs)
      val earlyFiring = effective(trigger.early)
      val lateFiring = effective(trigger.late)
      val out = scala.collection.mutable.ArrayBuffer.empty[Pane[K, Out]]
      val touched = scala.collection.mutable.Set.empty[Long]
      val assigned = rowSeq.flatMap(r => assignWindows(r._2.getTime).map(_ -> r))
      assigned.groupBy(_._1).view.mapValues(_.map(_._2)).toSeq.foreach { case (ws, vs) =>
        val wEnd = ws + windowSizeMs
        val windowClosed = wEnd <= wm
        val existing = if (windows.containsKey(ws)) Some(windows.getValue(ws)) else None
        val postOnTime = existing.exists(_.firedOnTime)
        if (wEnd + allowedLatenessMs <= wm) {
          // beyond allowed lateness → drop (LateDataDroppingDoFnRunner)
        } else if (postOnTime && !trigger.suppressOnTime &&
                   (trigger.late == NoFiring || existing.exists(_.lateFinished))) {
          // AfterWatermark without late firings (or a late trigger that has
          // finished): the trigger is done — post-on-time data is dropped,
          // not buffered into a surprise FINAL pane (Beam contract)
        } else {
          touched += ws
          var st = existing.getOrElse(freshState())
          vs.foreach { case (_, _, v) =>
            if (st.sinceLastPane == 0L) st = st.copy(paneFirstWallMs = nowMs)
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
          if (windowClosed && postOnTime) {
            // post-watermark arrival: LATE pane per the late trigger
            val ctx = ctxOf(st, nowMs, st.latePanes)
            if (!trigger.suppressOnTime && !st.lateFinished &&
                trigger.late != NoFiring && ready(lateFiring, ctx)) {
              out += emit(key, ws, st, "LATE", isLast = false)
              st = afterPane(st)
                .copy(lateFinished = finishesOnFire(lateFiring, ctx),
                  latePanes = st.latePanes + 1)
            }
          } else if (!windowClosed) {
            val ctx = ctxOf(st, nowMs, st.earlyPanes)
            if (!trigger.suppressOnTime && !st.earlyFinished && ready(earlyFiring, ctx)) {
              out += emit(key, ws, st, "EARLY", isLast = false)
              st = afterPane(st)
                .copy(earlyFinished = finishesOnFire(earlyFiring, ctx),
                  earlyPanes = st.earlyPanes + 1)
            }
          }
          windows.updateValue(ws, st)
        }
      }
      // wall-clock sweep: a pending AfterProcessingTime delay may have
      // elapsed for a window this batch did NOT touch — check the key's
      // other open windows (timer-less rendering of processing-time timers)
      if (usesWallClock(trigger.early) && !trigger.suppressOnTime) {
        windows.iterator().toSeq.foreach { case (ws, st0) =>
          val wEnd = ws + windowSizeMs
          if (!touched.contains(ws) && wEnd > wm && !st0.firedOnTime &&
              !st0.earlyFinished && st0.sinceLastPane > 0) {
            val ctx = ctxOf(st0, nowMs, st0.earlyPanes)
            if (ready(earlyFiring, ctx)) {
              out += emit(key, ws, st0, "EARLY", isLast = false)
              windows.updateValue(ws, afterPane(st0)
                .copy(earlyFinished = finishesOnFire(earlyFiring, ctx),
                  earlyPanes = st0.earlyPanes + 1))
            }
          }
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
          } else if (allowedLatenessMs == 0) {
            // Never trigger with zero lateness: on-time IS the GC moment —
            // the single FINAL pane must fire here, before state removal
            out += emit(key, ws, st, "FINAL", isLast = true)
          }
          st = st.copy(firedOnTime = true)
          windows.updateValue(ws, st)
          if (allowedLatenessMs == 0) windows.removeKey(ws)
        } else if (wEnd > wm && !st.firedOnTime &&
            wEnd - allowedLatenessMs <= 0) {
          // near-epoch clamp ONLY: the registration at
          // max(wEnd - lateness, 1) fired before the true watermark
          // reached wEnd — retry on the next advance. Unclamped windows
          // never hit this (their timer implies wm >= wEnd); without the
          // clamp guard, every OTHER open window visited during a key's
          // timer expiry would re-register sparkWm+1 and spin a
          // timer-per-watermark-advance loop in the state store hot path.
          getHandle.registerTimer(sparkWm + 1)
        }
        if (wEnd + allowedLatenessMs <= wm && windows.containsKey(ws)) {
          if (trigger.suppressOnTime || (st.sinceLastPane > 0 && !st.lateFinished)) {
            // Never-trigger final pane, or residual late data not yet fired
            out += emit(key, ws, st, "FINAL", isLast = true)
          }
          windows.removeKey(ws)
        }
      }
      out.iterator
    }
  }

  /** Per-key state for the processing-time pane engine. Kryo-encoded —
    * same fresh-checkpoint caveat as [[WindowState]]. */
  final case class GlobalPaneState[Acc](
      acc: Acc,            // accumulating-mode accumulator
      paneAcc: Acc,        // since-last-pane accumulator (discarding)
      sinceLastPane: Long,
      paneIndex: Long,
      timerPending: Boolean)

  /** GlobalWindows + Repeatedly(AfterProcessingTime.pastFirstElementInPane
    * .plusDelayOf(delay)) — the wall-clock half of the trigger algebra run
    * in its OWN TimeMode ([U] W/AfterProcessingTime.java semantics;
    * "emit a pane every d wall-ms while data is pending"). Unlike
    * [[AfterProcessingTimeDelay]] inside the event-time engine (best-effort:
    * checked when a batch touches the key), this engine runs in
    * TimeMode.ProcessingTime, so the pane's timer fires even for keys that
    * go completely quiet — Spark's no-data micro-batches run due timers
    * without new input. The trade is the TimeMode split itself: one
    * operator cannot run both clocks, so event-time windowing and
    * wall-clock panes compose as separate stages, not one trigger tree. */
  final class ProcessingTimePaneProcessor[K, V, Acc, Out](
      delayMs: Long,
      mode: AccumulationMode,
      combine: CombineFn[V, Acc, Out],
      stateTtl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[K, (K, V), Pane[K, Out]] {

    @transient private var state: ValueState[GlobalPaneState[Acc]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[GlobalPaneState[Acc]](
        "global", Encoders.kryo[GlobalPaneState[Acc]], stateTtl)

    private def fresh(): GlobalPaneState[Acc] =
      GlobalPaneState(combine.createAccumulator(), combine.createAccumulator(),
        0L, 0L, timerPending = false)

    override def handleInputRows(key: K, rows: Iterator[(K, V)],
                                 timers: TimerValues): Iterator[Pane[K, Out]] = {
      var st = Option(state.get()).getOrElse(fresh())
      rows.foreach { case (_, v) =>
        st = st.copy(
          // the global window never closes and this state has no GC, so in
          // Discarding mode the all-time accumulator must stay untouched —
          // feeding it would grow never-emitted state without bound
          acc = if (mode == Accumulating) combine.addInput(st.acc, v) else st.acc,
          paneAcc = combine.addInput(st.paneAcc, v),
          sinceLastPane = st.sinceLastPane + 1)
      }
      if (!st.timerPending && st.sinceLastPane > 0) {
        // pastFirstElementInPane: the clock starts at the pane's first
        // element, not at every element
        getHandle.registerTimer(timers.getCurrentProcessingTimeInMs() + delayMs)
        st = st.copy(timerPending = true)
      }
      state.update(st)
      Iterator.empty
    }

    override def handleExpiredTimer(key: K, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[Pane[K, Out]] = {
      val st = Option(state.get()).getOrElse(fresh())
      if (st.sinceLastPane > 0) {
        val value = mode match {
          case Accumulating => combine.extractOutput(st.acc)
          case Discarding   => combine.extractOutput(st.paneAcc)
        }
        // GlobalWindow bounds: epoch to a far-future sentinel (9999-12-31;
        // Long.MaxValue overflows Spark's millis→micros conversion) — the
        // window never closes, every pane is EARLY, none is last
        val pane = Pane(key, new Timestamp(0L),
          new Timestamp(TriggerEngine.GlobalWindowEndMs),
          value, "EARLY", st.paneIndex, st.paneIndex == 0L, isLast = false)
        state.update(st.copy(
          paneAcc = combine.createAccumulator(),
          sinceLastPane = 0L,
          paneIndex = st.paneIndex + 1,
          timerPending = false))
        Iterator.single(pane)
      } else {
        state.update(st.copy(timerPending = false))
        Iterator.empty
      }
    }
  }

  /** Wall-clock paned aggregation over a keyed unbounded stream: one pane
    * per key every `delay` of processing time while data is pending.
    *
    * `stateTtl` bounds per-key state retention: with the default
    * TTLConfig.NONE a key's state (including the Accumulating-mode
    * all-time accumulator) lives forever — correct for a genuine
    * GlobalWindows aggregation over a bounded key domain, UNBOUNDED if
    * the key domain itself grows (e.g. synthetic (key, window) keys; see
    * [[windowedAggregateWithWallClockNudge]], which passes a
    * window-derived TTL). With a TTL, state not updated within the
    * duration is evicted — a key quiet longer than the TTL restarts its
    * accumulator and pane numbering from scratch on the next arrival. */
  def processingTimeAggregate[K, V, Acc, Out](
      input: Dataset[(K, V)],
      delay: java.time.Duration,
      mode: AccumulationMode,
      combine: CombineFn[V, Acc, Out],
      stateTtl: TTLConfig = TTLConfig.NONE)(
      implicit ek: Encoder[K], ep: Encoder[Pane[K, Out]]): Dataset[Pane[K, Out]] = {
    val proc = new ProcessingTimePaneProcessor[K, V, Acc, Out](
      delay.toMillis, mode, combine, stateTtl)
    input.groupByKey(_._1)
      .transformWithState(proc, TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** Window.into-style fluent builder ([U] W/Window.java): collects the
    * WindowingStrategy pieces (trigger, lateness, accumulation) and runs
    * [[windowedAggregate]] / [[SessionEngine.sessionAggregate]]. Thin
    * config sugar — semantics live in the engines. */
  final case class WindowInto(
      windowSize: java.time.Duration,
      trigger: TriggerSpec = TriggerSpec.default,
      allowedLateness: java.time.Duration = java.time.Duration.ZERO,
      mode: AccumulationMode = Discarding) {
    def triggering(early: Firing = NoFiring, late: Firing = NoFiring): WindowInto =
      copy(trigger = TriggerSpec(early, late))
    def triggeringNever: WindowInto = copy(trigger = TriggerSpec.never)
    def withAllowedLateness(d: java.time.Duration): WindowInto = copy(allowedLateness = d)
    def accumulatingFiredPanes(): WindowInto = copy(mode = Accumulating)
    def discardingFiredPanes(): WindowInto = copy(mode = Discarding)

    def aggregate[K, V, Acc, Out](input: Dataset[(K, Timestamp, V)],
                                  combine: CombineFn[V, Acc, Out])(
        implicit ek: Encoder[K], ep: Encoder[Pane[K, Out]]): Dataset[Pane[K, Out]] =
      windowedAggregate(input, windowSize, allowedLateness, trigger, mode, combine)
  }

  object WindowInto {
    /** Window.into(FixedWindows.of(size)). */
    def fixedWindows(size: java.time.Duration): WindowInto = WindowInto(size)
  }

  /** Windowed aggregation with Beam trigger semantics over a raw
    * (key, eventTime, value) stream. The watermark delay is set to
    * `allowedLateness` here — that pairing is what makes Spark's upstream
    * late-row filter implement Beam's allowed-lateness drop (see the
    * processor's clock-translation note).
    *
    * Documented model divergence (surfaced by TriggerFuzzSpec): Beam
    * accepts a late row as long as its WINDOW has not expired (rowTs may
    * be arbitrarily old while trueWm < windowEnd + allowedLateness);
    * Spark's operator-level filter drops by ROW AGE — a row is accepted
    * iff rowTs ≥ trueWm − allowedLateness. A very old row into a
    * still-live window is dropped here where Beam would buffer it. The
    * two coincide for rows no older than the window end, which covers
    * the common straggler case. Panes stream out in append mode. */
  def windowedAggregate[K, V, Acc, Out](
      input: Dataset[(K, Timestamp, V)],
      windowSize: java.time.Duration,
      allowedLateness: java.time.Duration,
      trigger: TriggerSpec,
      mode: AccumulationMode,
      combine: CombineFn[V, Acc, Out],
      clock: EngineClock = SystemEngineClock)(
      implicit ek: Encoder[K], ep: Encoder[Pane[K, Out]]): Dataset[Pane[K, Out]] = {
    validateFiring(trigger.early)
    validateFiring(trigger.late)
    val proc = new WindowTriggerProcessor[K, V, Acc, Out](
      windowSize.toMillis, allowedLateness.toMillis, trigger, mode, combine,
      clock = clock)
    input.withWatermark("_2", s"${allowedLateness.toMillis} milliseconds")
      .groupByKey(_._1)
      .transformWithState(proc, TimeMode.EventTime(), OutputMode.Append())
  }

  /** Event-time windows with a wall-clock nudge for quiet keys — the
    * guaranteed-firing AfterProcessingTime form the single-TimeMode
    * event-time engine cannot provide on its own (see
    * [[AfterProcessingTimeDelay]]'s caveat): `transformWithState` runs
    * ONE TimeMode, so an event-time processor cannot register wall-clock
    * timers, and a key that goes completely silent fires only at
    * watermark close.
    *
    * Composition, not a new engine: the authoritative leg is
    * [[windowedAggregate]] (EARLY/ON_TIME/LATE/FINAL panes, exactly as
    * configured); the nudge leg re-keys the same input by
    * (key, fixed-window start) and runs [[processingTimeAggregate]] in
    * its own TimeMode.ProcessingTime operator, so every (key, window)
    * with pending data keeps emitting interim panes on the wall-clock
    * cadence even with NO further input. Nudge panes are tagged
    * timing = "EARLY_WALL" and carry their own pane numbering; they are
    * refreshable previews (Beam documents processing-time triggers as
    * best-effort), and the event-time leg remains the source of truth
    * for on-time/late/final semantics. Consumers that want at most one
    * live value per (key, window) de-duplicate on (key, windowStart,
    * timing == "EARLY_WALL") downstream.
    *
    * State retention: the nudge leg's key domain is (key, windowStart) —
    * one NEW key per elapsed window per user key, so on an unbounded
    * stream it grows forever if never GC'd. The leg therefore runs with
    * a state TTL of windowSize + allowedLateness + 2·nudgeDelay: once a
    * window can no longer receive data (and its last nudge pane has had
    * time to fire), its state is evicted and the store stays bounded by
    * the keys active inside one retention span. The TTL clock is
    * PROCESSING time since last update, so the one edge it shaves is a
    * stream that stalls longer than the retention span mid-window and
    * then delivers more rows for it — those restart the nudge
    * accumulator from empty, under-reporting that window's remaining
    * EARLY_WALL previews (acceptable for a best-effort preview leg; the
    * event-time leg's panes are unaffected). */
  def windowedAggregateWithWallClockNudge[K, V, Acc, Out](
      input: Dataset[(K, Timestamp, V)],
      windowSize: java.time.Duration,
      allowedLateness: java.time.Duration,
      trigger: TriggerSpec,
      mode: AccumulationMode,
      combine: CombineFn[V, Acc, Out],
      nudgeDelay: java.time.Duration)(
      implicit ek: Encoder[K], ep: Encoder[Pane[K, Out]],
      ekw: Encoder[((K, Long), V)], epw: Encoder[Pane[(K, Long), Out]])
      : Dataset[Pane[K, Out]] = {
    val eventPanes = windowedAggregate(
      input, windowSize, allowedLateness, trigger, mode, combine)
    val wMs = windowSize.toMillis
    val keyed = input.map { case (k, t, v) =>
      ((k, t.getTime - Math.floorMod(t.getTime, wMs)), v)
    }
    val nudgeTtl = TTLConfig(java.time.Duration.ofMillis(
      windowSize.toMillis + allowedLateness.toMillis + 2L * nudgeDelay.toMillis))
    val wallPanes = processingTimeAggregate(keyed, nudgeDelay, mode, combine, nudgeTtl)(
        org.apache.spark.sql.Encoders.tuple(ek, org.apache.spark.sql.Encoders.scalaLong),
        epw)
      .map { p =>
        Pane[K, Out](p.key._1, new Timestamp(p.key._2),
          new Timestamp(p.key._2 + wMs), p.value, "EARLY_WALL",
          p.paneIndex, p.isFirst, isLast = false)
      }
    eventPanes.union(wallPanes)
  }

  /** SlidingWindows with full trigger semantics: each element joins
    * size/slide windows (Beam multi-window assignment) and every window
    * runs the same trigger state machine independently. */
  def slidingWindowedAggregate[K, V, Acc, Out](
      input: Dataset[(K, Timestamp, V)],
      windowSize: java.time.Duration,
      slide: java.time.Duration,
      allowedLateness: java.time.Duration,
      trigger: TriggerSpec,
      mode: AccumulationMode,
      combine: CombineFn[V, Acc, Out],
      clock: EngineClock = SystemEngineClock)(
      implicit ek: Encoder[K], ep: Encoder[Pane[K, Out]]): Dataset[Pane[K, Out]] = {
    validateFiring(trigger.early)
    validateFiring(trigger.late)
    val proc = new WindowTriggerProcessor[K, V, Acc, Out](
      windowSize.toMillis, allowedLateness.toMillis, trigger, mode, combine,
      slideMs = slide.toMillis, clock = clock)
    input.withWatermark("_2", s"${allowedLateness.toMillis} milliseconds")
      .groupByKey(_._1)
      .transformWithState(proc, TimeMode.EventTime(), OutputMode.Append())
  }
}

