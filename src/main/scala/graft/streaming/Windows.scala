package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Event-time window assignment (SURVEY.md §2.4).
  *
  * Dataflow assigns windows per element via WindowFn
  * ([U] sdk/.../transforms/windowing/ — one file per WindowFn); in Spark the window is just a
  * grouping column, identical in batch and streaming — which is the whole
  * unified-model thesis. These helpers name the Dataflow WindowFns:
  *
  *  - [[fixed]]    ≡ FixedWindows (tumbling, size + offset)
  *  - [[sliding]]  ≡ SlidingWindows (size, period)
  *  - [[sessions]] ≡ Sessions (merging, gap)
  *  - [[calendar]] ≡ CalendarWindows (months/years aren't fixed-duration:
  *                   truncation is the correct idiom)
  *  - [[global]]   ≡ GlobalWindows (no window column; plain groupBy)
  *
  * All return grouping Columns; use inside groupBy in batch or with
  * `withWatermark` upstream in streaming.
  */
object Windows {

  /** FixedWindows.of(size) [+ offset]: tumbling window struct {start,end}. */
  def fixed(ts: Column, size: String, offset: String = null): Column =
    if (offset == null) window(ts, size) else window(ts, size, size, offset)

  /** SlidingWindows.of(size).every(period): each element lands in
    * size/period windows — same multi-assignment semantics as Dataflow. */
  def sliding(ts: Column, size: String, period: String): Column =
    window(ts, size, period)

  /** Sessions.withGapDuration(gap): merging windows, gap-separated. */
  def sessions(ts: Column, gap: String): Column = session_window(ts, gap)

  /** Sessions with a per-row dynamic gap (Spark superset: gap may be an
    * arbitrary expression, e.g. by event_type). */
  def sessionsDynamic(ts: Column, gap: Column): Column = session_window(ts, gap)

  /** CalendarWindows.{days,weeks,months,years}: truncate to the calendar
    * unit ("day"/"week"/"month"/"quarter"/"year"). */
  def calendar(ts: Column, unit: String): Column = date_trunc(unit, ts)
}
