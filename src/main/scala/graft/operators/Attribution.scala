package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Multi-touch conversion attribution — for every conversion event, the
  * first and last touchpoint by the same user inside a lookback window,
  * plus the touch count (the denominator for linear credit). This is the
  * marketing-analytics classic (first-touch / last-touch / linear
  * models) and, more generally, the "most recent qualifying event
  * before X" join that fraud scoring and support-escalation pipelines
  * reuse.
  *
  * Scale posture: ONE shuffle, zero joins. Touches and conversions ride
  * the same per-user partition, and each conversion reads its lookback
  * span as an event-time RANGE window frame — the plan is a single
  * hash-partitioned sort + WindowExec, the same shape as sessionization.
  * The join formulation (conversions × touches within the window) would
  * duplicate every touch once per nearby conversion; the window
  * formulation never materializes that blowup. Window partitions are
  * per-user event counts — bounded, never corpus-global.
  *
  * Determinism: "first"/"last" are min/max over STRUCT(ts, id, channel)
  * — an order-free aggregate with a total order, so simultaneous
  * touches tie-break by the unique event id instead of falling into
  * frame-order nondeterminism. The whole result is exactly replayable
  * (the DuckDB oracle re-derives it from the join formulation +
  * min/max(row(...)) — a genuinely different decomposition).
  *
  * @param events    one row per event
  * @param userCol   grouping identity (the attribution scope)
  * @param tsCol     event-time TIMESTAMP column
  * @param idCol     unique event id (LONG) — the deterministic tiebreak
  * @param typeCol   event channel/type column (STRING)
  * @param valueCol  conversion value (DOUBLE; carried through)
  * @param convType  the converting event type
  * @param touchTypes attributable channels (must not contain convType)
  * @param lookbackUs window size in MICROSECONDS: a touch qualifies iff
  *                   conv_us − lookbackUs ≤ touch_us < conv_us
  * @return one row per conversion: (user, conv_id, conv_us, conv_value,
  *         first_channel, first_us, last_channel, last_us, n_touches) —
  *         channels NULL and n_touches 0 for direct conversions
  */
object Attribution {

  def touchAttribution(events: DataFrame, userCol: String, tsCol: String,
                       idCol: String, typeCol: String, valueCol: String,
                       convType: String, touchTypes: Seq[String],
                       lookbackUs: Long): DataFrame = {
    require(lookbackUs > 0, s"lookback must be positive, got $lookbackUs")
    require(touchTypes.nonEmpty, "no touch channels to attribute to")
    require(!touchTypes.contains(convType),
      "convType cannot also be a touch channel")
    import org.apache.spark.sql.expressions.Window
    // only touch + conversion rows reach the shuffle (and the type
    // predicate pushes into the scan)
    val relevant = events
      .filter(col(typeCol).isin(convType +: touchTypes: _*))
      .select(col(userCol).as("user"), col(idCol).cast("long").as("id"),
        unix_micros(col(tsCol)).as("us"), col(typeCol).as("channel"),
        col(valueCol).cast("double").as("value"))
    val w = Window.partitionBy(col("user")).orderBy(col("us"))
      .rangeBetween(-lookbackUs, -1)
    val touch = when(col("channel") =!= convType,
      struct(col("us"), col("id"), col("channel")))
    relevant
      .withColumn("__first", min(touch).over(w))
      .withColumn("__last", max(touch).over(w))
      .withColumn("__n", count(touch).over(w))
      .filter(col("channel") === convType)
      .select(col("user"), col("id").as("conv_id"), col("us").as("conv_us"),
        col("value").as("conv_value"),
        col("__first.channel").as("first_channel"),
        col("__first.us").as("first_us"),
        col("__last.channel").as("last_channel"),
        col("__last.us").as("last_us"),
        col("__n").as("n_touches"))
  }
}
