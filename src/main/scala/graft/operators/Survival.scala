package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kaplan-Meier product-limit survival estimation (Kaplan & Meier, JASA
  * 1958) — time-to-event analysis with right censoring: churn curves,
  * time-to-conversion, hardware-failure lifetimes. The estimator is
  * S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) over the distinct event times tᵢ, with
  * dᵢ = events at tᵢ and nᵢ = subjects still at risk (duration ≥ tᵢ —
  * censored subjects count toward the risk set until they drop out,
  * which is the whole point of the estimator).
  *
  * Scale posture: subjects collapse to per-(group, duration) exact
  * counts FIRST (map-combinable hash aggregation — the only pass over
  * the full data), so everything downstream operates on the distinct
  * duration grid. The at-risk count is a descending-duration cumulative
  * sum over that collapsed frame (window partitioned by group, exact
  * longs), and only the running product is sequential — a typed per-key
  * fold over ≤ |distinct event times| rows per group, the same device as
  * TimeSeries.ewma. No joins, two shuffles (collapse, then group).
  *
  * Determinism: dᵢ/nᵢ are exact longs; each survival step is the fixed
  * IEEE tree s ← s · (1 − dᵢ/nᵢ) folded in ascending-tᵢ order
  * (left-associated, seeded s₀ = 1 whose first multiply is exact), so
  * the whole curve replays bit-for-bit — the DuckDB oracle re-derives it
  * as a recursive CTE over the identical tree.
  */
object Survival {

  /** Per-group Kaplan-Meier curve.
    *
    * @param subjects one row per subject
    * @param group    stratum column (one curve per value)
    * @param duration observed time (long; event time if observed,
    *                 censoring time otherwise)
    * @param observed 1 = the event happened at `duration`, 0 = censored
    * @return one row per (group, event time): (group, t, d, at_risk,
    *         surv) — censoring-only times carry no row, per the
    *         estimator's definition
    */
  def kaplanMeier(subjects: DataFrame, group: String, duration: String,
                  observed: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = subjects.sparkSession
    import spark.implicits._
    val collapsed = subjects
      .select(col(group).cast("string"), col(duration).cast("long"),
        col(observed).cast("long"))
      .toDF("g", "t", "obs")
      .groupBy(col("g"), col("t"))
      .agg(sum(col("obs")).as("d"), count(lit(1)).as("tot"))
    // at-risk at t = subjects with duration >= t: cumulative tot from the
    // largest duration down (rows frame is exact — (g, t) is distinct)
    val w = Window.partitionBy(col("g")).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRisk = collapsed
      .withColumn("at_risk", sum(col("tot")).over(w))
      .filter(col("d") > 0)
      .select(col("g"), col("t"), col("d"), col("at_risk"))
    withRisk.as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val rows = it.toArray.sortBy(_._2)
        var s = 1.0
        rows.iterator.map { case (_, t, d, n) =>
          s = s * (1.0 - d.toDouble / n.toDouble)
          (g, t, d, n, s)
        }
      }
      .toDF("g", "t", "d", "at_risk", "surv")
      .withColumnRenamed("g", group)
  }
}
