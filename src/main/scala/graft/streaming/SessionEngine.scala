package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

import graft.operators.Combine.CombineFn
import graft.streaming.TriggerEngine.{AccumulationMode, Accumulating, Discarding, Pane}

/** Custom MERGING WindowFn on `transformWithState` — sessions with early
  * firings (SURVEY.md §2.4 row 7 "merging custom", §7 hard part 4; the
  * reference's merging path is [U] W/Sessions.java + the ActiveWindowSet
  * merge machinery in [U] UT/ReduceFnRunner.java).
  *
  * Spark's `session_window` DSL covers merging sessions ONLY under the
  * default trigger (one pane per closed session). This engine keeps the
  * key's open sessions in ListState and merges them on every arrival, which
  * unlocks what the DSL cannot express: EARLY panes for still-open
  * sessions, pane metadata, and arbitrary interval extension — a row
  * bridging two open sessions merges them, combining their accumulators
  * (the defining behavior of a merging WindowFn).
  *
  * Clock translation is the same trick as [[TriggerEngine]]: the stream's
  * watermark delay is set to `allowedLateness`, so Spark's upstream filter
  * implements the late-data drop and the true event-time watermark is
  * sparkWatermark + lateness. A session fires ON_TIME once the true
  * watermark passes its end; with `allowedLateness > 0` the fired session
  * is RETAINED until end + lateness, so late arrivals merge into it
  * (extending the accumulator, per the merging contract) and fire LATE
  * panes (`latePerBatch`) — the merging-windows × late-firings
  * interaction, the companion of §7 hard part 4's early-firings half —
  * with state GC'd only at end + lateness.
  */
object SessionEngine {

  /** The ASSIGN half of a custom merging WindowFn: map each arriving
    * element to its initial interval [startMs, endMs). The engine supplies
    * the MERGE half — strictly overlapping intervals collapse and their
    * accumulators combine — so implementing this one method yields a full
    * user-defined merging window (Beam's WindowFn.assignWindows +
    * mergeWindows split; [U] W/WindowFn.java): per-key dynamic session
    * gaps, value-weighted gaps, bounded sessions, etc. */
  trait MergingWindowAssigner[K, V] extends Serializable {
    def assign(key: K, tsMs: Long, value: V): (Long, Long)
  }

  /** Standard sessions: [ts, ts + gap) — the fixed-gap assigner behind
    * [[sessionAggregate]]. */
  final case class FixedGapSessions[K, V](gapMs: Long)
      extends MergingWindowAssigner[K, V] {
    def assign(key: K, tsMs: Long, value: V): (Long, Long) = (tsMs, tsMs + gapMs)
  }

  /** One open session: [start, end) with end = last event ts + gap.
    * `fired` marks a session whose ON_TIME pane has been emitted but
    * whose state is retained for `allowedLateness` (late-firing mode) —
    * late arrivals merge into it and fire LATE panes instead of
    * resurrecting a fresh partial session. Kryo-encoded: adding the
    * field requires a fresh streaming checkpoint (the standard contract
    * for kryo state; every gate runs on one). */
  final case class SessionState[Acc](
      start: Long, end: Long,
      acc: Acc, paneAcc: Acc,
      sinceLastPane: Long, paneIndex: Long,
      fired: Boolean = false)

  final class SessionProcessor[K, V, Acc, Out](
      assigner: MergingWindowAssigner[K, V],
      allowedLatenessMs: Long,
      earlyPerBatch: Boolean,
      mode: AccumulationMode,
      combine: CombineFn[V, Acc, Out],
      latePerBatch: Boolean = false)
      extends StatefulProcessor[K, (K, Timestamp, V), Pane[K, Out]] {

    @transient private var sessions: ListState[SessionState[Acc]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sessions = getHandle.getListState[SessionState[Acc]](
        "sessions", Encoders.kryo[SessionState[Acc]], TTLConfig.NONE)

    private def paneValue(st: SessionState[Acc]): Out = mode match {
      case Accumulating => combine.extractOutput(st.acc)
      case Discarding   => combine.extractOutput(st.paneAcc)
    }

    private def emit(key: K, st: SessionState[Acc], timing: String,
                     isLast: Boolean): Pane[K, Out] =
      Pane(key, new Timestamp(st.start), new Timestamp(st.end),
        paneValue(st), timing, st.paneIndex, st.paneIndex == 0L, isLast)

    private def trueWm(sparkWm: Long): Long =
      if (sparkWm <= 0) 0L else sparkWm + allowedLatenessMs

    /** Merge the assigner's interval for a new event into the
      * open-session set: all STRICTLY overlapping sessions collapse into
      * one (accumulators merged) — the mergeWindows contract. Half-open
      * intervals that only touch (next event exactly `gap` after the
      * last) stay separate, matching Beam Sessions and Spark's
      * session_window. */
    private def absorb(key: K, open: List[SessionState[Acc]], ts: Long,
                       v: V): List[SessionState[Acc]] = {
      val (evStart, evEnd) = assigner.assign(key, ts, v)
      require(evStart < evEnd,
        s"MergingWindowAssigner produced an empty interval [$evStart, $evEnd)")
      SessionEngine.absorbInterval(open, evStart, evEnd, v, combine)
    }

    /** Next timer: an unfired session needs its ON_TIME moment (Spark
      * clock = end − lateness, i.e. trueWm reaching end); a fired one
      * its GC moment (Spark clock = end, i.e. trueWm reaching
      * end + lateness). */
    private def registerNextTimer(open: Seq[SessionState[Acc]]): Unit =
      if (open.nonEmpty) {
        val next = open.map(s =>
          if (s.fired) s.end else s.end - allowedLatenessMs).min
        getHandle.registerTimer(math.max(next, 1L))
      }

    override def handleInputRows(key: K, rows: Iterator[(K, Timestamp, V)],
                                 timers: TimerValues): Iterator[Pane[K, Out]] = {
      var open = sessions.get().toList
      // Every surviving row is absorbed. Fired sessions are retained for
      // `allowedLateness` (not GC'd at their on-time firing), so a late
      // row within lateness merges into its ORIGINAL session — extending
      // the accumulator for a LATE pane — rather than resurrecting a
      // fresh partial session. Beyond lateness the session is GC'd, but
      // then every row it could absorb (ts < end ≤ sparkWm) is already
      // dropped by Spark's upstream watermark filter: post-GC
      // resurrection is structurally impossible.
      rows.foreach { case (_, ts, v) => open = absorb(key, open, ts.getTime, v) }
      val out = scala.collection.mutable.ArrayBuffer.empty[Pane[K, Out]]
      if (earlyPerBatch) {
        open = open.map { s =>
          if (!s.fired && s.sinceLastPane > 0 &&
              s.end > trueWm(timers.getCurrentWatermarkInMs())) {
            out += emit(key, s, "EARLY", isLast = false)
            s.copy(paneAcc = combine.createAccumulator(), sinceLastPane = 0L,
              paneIndex = s.paneIndex + 1)
          } else s
        }
      }
      if (latePerBatch) {
        // a batch that fed an already-fired session fires its LATE pane
        // immediately (AfterWatermark.withLateFirings(PerBatch) — the
        // micro-batch rendering of Beam's per-late-arrival firing)
        open = open.map { s =>
          if (s.fired && s.sinceLastPane > 0) {
            out += emit(key, s, "LATE", isLast = false)
            s.copy(paneAcc = combine.createAccumulator(), sinceLastPane = 0L,
              paneIndex = s.paneIndex + 1)
          } else s
        }
      }
      sessions.clear()
      if (open.nonEmpty) sessions.put(open.toArray)
      registerNextTimer(open)
      out.iterator
    }

    override def handleExpiredTimer(key: K, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[Pane[K, Out]] = {
      val wm = trueWm(timers.getCurrentWatermarkInMs())
      val open = sessions.get().toList
      val out = scala.collection.mutable.ArrayBuffer.empty[Pane[K, Out]]
      val kept = scala.collection.mutable.ArrayBuffer.empty[SessionState[Acc]]
      open.sortBy(_.start).foreach { s =>
        if (!s.fired && s.end <= wm) {
          // ON_TIME; with zero lateness this is also the GC moment (the
          // pre-late-mode contract: single final pane, state dropped)
          out += emit(key, s, "ON_TIME", isLast = allowedLatenessMs == 0)
          if (allowedLatenessMs > 0)
            kept += s.copy(fired = true,
              paneAcc = combine.createAccumulator(), sinceLastPane = 0L,
              paneIndex = s.paneIndex + 1)
        } else if (s.fired && s.end + allowedLatenessMs <= wm) {
          // GC: residual late rows not yet fired (latePerBatch = false)
          // surface as one FINAL pane; with latePerBatch there is never a
          // residual (input precedes timers within a batch)
          if (s.sinceLastPane > 0) out += emit(key, s, "FINAL", isLast = true)
        } else kept += s
      }
      sessions.clear()
      if (kept.nonEmpty) sessions.put(kept.toArray)
      registerNextTimer(kept.toSeq)
      out.iterator
    }
  }

  /** Session aggregation with merging semantics and optional per-batch
    * early firings over a raw (key, eventTime, value) stream. */
  /** Merge one event interval into the open-session set: all STRICTLY
    * overlapping sessions collapse into one (accumulators merged) — the
    * mergeWindows contract. Half-open intervals that only touch stay
    * separate, matching Beam Sessions and Spark's session_window. Pure
    * function of (open set, interval, value) — the merge algebra the
    * session fuzz drives against a scalar interval model. */
  private[streaming] def absorbInterval[V, Acc](
      open: List[SessionState[Acc]], evStart: Long, evEnd: Long, v: V,
      combine: CombineFn[V, Acc, _]): List[SessionState[Acc]] = {
    val (hit, miss) = open.partition(s => s.start < evEnd && evStart < s.end)
    val merged = hit.foldLeft(
      SessionState(evStart, evEnd, combine.createAccumulator(),
        combine.createAccumulator(), 0L, 0L)) { (m, s) =>
      SessionState(
        math.min(m.start, s.start), math.max(m.end, s.end),
        combine.mergeAccumulators(m.acc, s.acc),
        combine.mergeAccumulators(m.paneAcc, s.paneAcc),
        m.sinceLastPane + s.sinceLastPane,
        math.max(m.paneIndex, s.paneIndex),
        // any fired constituent makes the merged session fired: its
        // on-time moment has passed, so subsequent panes are LATE
        fired = m.fired || s.fired)
    }
    merged.copy(
      acc = combine.addInput(merged.acc, v),
      paneAcc = combine.addInput(merged.paneAcc, v),
      sinceLastPane = merged.sinceLastPane + 1) :: miss
  }

  def sessionAggregate[K, V, Acc, Out](
      input: Dataset[(K, Timestamp, V)],
      gap: java.time.Duration,
      allowedLateness: java.time.Duration,
      earlyPerBatch: Boolean,
      mode: AccumulationMode,
      combine: CombineFn[V, Acc, Out])(
      implicit ek: Encoder[K], ep: Encoder[Pane[K, Out]]): Dataset[Pane[K, Out]] =
    sessionAggregateWith(input, FixedGapSessions[K, V](gap.toMillis),
      allowedLateness, earlyPerBatch, mode, combine)

  /** [[sessionAggregate]] with a USER-DEFINED merging window: the
    * assigner maps each element to its initial interval (per-key dynamic
    * gaps, value-dependent windows, …), the engine merges overlaps —
    * the custom-merging-WindowFn extension point without forking the
    * processor. */
  def sessionAggregateWith[K, V, Acc, Out](
      input: Dataset[(K, Timestamp, V)],
      assigner: MergingWindowAssigner[K, V],
      allowedLateness: java.time.Duration,
      earlyPerBatch: Boolean,
      mode: AccumulationMode,
      combine: CombineFn[V, Acc, Out],
      latePerBatch: Boolean = false)(
      implicit ek: Encoder[K], ep: Encoder[Pane[K, Out]]): Dataset[Pane[K, Out]] = {
    val proc = new SessionProcessor[K, V, Acc, Out](
      assigner, allowedLateness.toMillis, earlyPerBatch, mode, combine,
      latePerBatch = latePerBatch)
    input.withWatermark("_2", s"${allowedLateness.toMillis} milliseconds")
      .groupByKey(_._1)
      .transformWithState(proc, TimeMode.EventTime(), OutputMode.Append())
  }
}
