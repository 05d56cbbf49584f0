package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  // -------------------------------------------------- OutputTimeFn helpers

  /** OutputTimeFn.outputAtEndOfWindow ([U] W/OutputTimeFn.java): the
    * window struct's `end`. */
  def outputTimeEndOfWindow(windowCol: Column): Column = windowCol.getField("end")

  /** OutputTimeFn.outputAtEarliestInputTimestamp: min event ts aggregate. */
  def outputTimeEarliest(ts: Column): Column = min(ts)

  /** OutputTimeFn.outputAtLatestInputTimestamp: max event ts aggregate. */
  def outputTimeLatest(ts: Column): Column = max(ts)

  // -------------------------------------------- custom merging WindowFn

  /** General merging WindowFn, batch path ([U] W/WindowFn.java
    * mergeWindows): each row claims the interval [ts, endTs]; overlapping
    * or touching intervals per key merge into maximal windows. Sessions is
    * the special case endTs = ts + gap. Relational implementation — running
    * max of interval end per key, new-window flag where a gap opens,
    * running sum as window id — so it shuffles once and stays in codegen;
    * no iterative merge loop. Adds a `window_id` column (dense per key,
    * ordered by time); aggregate with min(ts)/max(endTs) for the merged
    * window bounds. */
  def mergeIntervals(df: DataFrame, keys: Seq[String], ts: Column,
                     endTs: Column): DataFrame = {
    val ord = Window.partitionBy(keys.map(col): _*).orderBy(ts, endTs)
    val prevMaxEnd = max(endTs).over(ord.rowsBetween(Window.unboundedPreceding, -1))
    df.withColumn("__pme", prevMaxEnd)
      .withColumn("__nw", when(col("__pme").isNull || ts > col("__pme"), 1).otherwise(0))
      .withColumn("window_id", sum(col("__nw")).over(ord))
      .drop("__pme", "__nw")
  }
}
