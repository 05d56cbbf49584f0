package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Per-key two-group log-rank test (Mantel-Cox): do the survival
    * curves of groups `a` and `b` differ? The hypothesis-test
    * companion to [[kaplanMeier]].
    *
    * At each distinct event time: O₁ = observed events in group a,
    * E₁ = d·n₁/n (expected under H₀), V = E₁·(n₂/n)·((n−d)/(n−1)).
    * χ² = (ΣO₁ − ΣE₁)²/ΣV. E and V are RATIONALS with per-time
    * denominators, so a float Σ would be partial-sum-order-dependent;
    * instead each term quantizes to a 6-dp integer with STAGED integer
    * divisions (every product routed through DECIMAL(38,0) — a BIGINT
    * product overflows once n·n₂ passes 2⁶³):
    *
    *   E₁₆ = (d·n₁·10⁶) div n
    *   V₆  = ((E₁₆·n₂) div n · (n−d)) div (n−1)      (0 when n = 1)
    *
    * — order-free exact sums, spelled identically in the oracle; χ²
    * and z are then one IEEE tree each over the exact totals. The
    * staged quantization (≤ 3·10⁻⁶ per term) is the operator's
    * documented convention, exactly as in Hypothesis.chiSquareIndependence.
    *
    * Scale posture: one collapse to the per-(key, time) grid (the only
    * full-data pass, map-combinable), one descending-time window for
    * both risk sets, one final hash aggregation. No joins.
    *
    * @return one row per key: n_a, n_b (subjects), o_a (observed
    *         events in a), e_a (expected, 6 dp), chi2, z (6 dp; NULL
    *         when ΣV = 0 or a side is empty)
    */
  def logRank(subjects: DataFrame, keys: Seq[String], groupCol: Column,
              a: String, b: String, duration: Column,
              observed: Column): DataFrame = {
    require(keys.nonEmpty, "logRank needs at least one key column")
    import org.apache.spark.sql.expressions.Window
    val base = subjects
      .filter(groupCol.isin(a, b) && duration.isNotNull)
      .select(keys.map(col) ++ Seq((groupCol === a).as("__isa"),
        duration.cast("long").as("__t"),
        observed.cast("long").as("__obs")): _*)
    val collapsed = base.groupBy(keys.map(col) :+ col("__t"): _*).agg(
      sum(when(col("__isa"), 1L).otherwise(0L)).as("__ca"),
      sum(when(!col("__isa"), 1L).otherwise(0L)).as("__cb"),
      sum(when(col("__isa"), col("__obs")).otherwise(0L)).as("__da"),
      sum(when(!col("__isa"), col("__obs")).otherwise(0L)).as("__db"))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val terms = collapsed
      .withColumn("__na", sum(col("__ca")).over(w))
      .withColumn("__nb", sum(col("__cb")).over(w))
      .filter(col("__da") + col("__db") > 0)
      .withColumn("__d", col("__da") + col("__db"))
      .withColumn("__n", col("__na") + col("__nb"))
      .withColumn("__e16",
        expr("(CAST(__d AS DECIMAL(38,0)) * __na * 1000000) DIV __n"))
      .withColumn("__v6", expr(
        """CASE WHEN __n > 1
             THEN (CAST((CAST(__e16 AS DECIMAL(38,0)) * __nb) DIV __n
                     AS DECIMAL(38,0)) * (__n - __d)) DIV (__n - 1)
             ELSE 0 END"""))
    val totals = base.groupBy(keys.map(col): _*).agg(
      sum(when(col("__isa"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("__isa"), 1L).otherwise(0L)).as("n_b"))
    val agg = terms.groupBy(keys.map(col): _*).agg(
      sum(col("__da")).as("o_a"),
      sum(col("__e16").cast("decimal(38,0)")).as("__e16s"),
      sum(col("__v6").cast("decimal(38,0)")).as("__v6s"))
      .join(totals, keys)
    // operator at LINE END — a leading `-` on the continuation line
    // parses as a discarded unary-minus statement in Scala
    val diff = col("o_a").cast("double") * lit(1000000.0d) -
      col("__e16s").cast("double")
    val v = lit(1000000.0d) * col("__v6s").cast("double")
    val ok = col("n_a") > 0 && col("n_b") > 0 && v > 0
    agg.select(keys.map(col) ++ Seq(
      col("n_a"), col("n_b"), col("o_a"),
      round(col("__e16s").cast("double") / lit(1000000.0d), 6).as("e_a"),
      round(when(ok, diff * diff / v), 6).as("chi2"),
      round(when(ok, diff / sqrt(v)), 6).as("z")): _*)
  }
}
