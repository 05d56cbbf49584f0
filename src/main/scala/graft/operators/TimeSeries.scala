package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid resampling over irregular per-key observations — the
  * missing-data companion to the as-of join ([U] contrib join / our
  * Grouping.asOfJoin): where as-of aligns two streams at query points,
  * gap-fill materializes the dense grid a downstream model or chart
  * expects, with the two standard imputations (last-observation-
  * carried-forward and linear interpolation) side by side.
  *
  * Scale posture: the grid is generated per key from that key's own
  * span (`sequence` — no driver-side materialization, no global grid),
  * the observation join is an equi-join on (key, slot), and both fill
  * windows are partitioned by key and ordered by slot — partition-local
  * after one hash exchange, never a global sort. Grid size is
  * span/step per key; a key's grid rides in one partition, which is
  * the right unit as long as a single key's span stays in the
  * millions of slots (hour grids: centuries) — shard the key space
  * upstream if a key legitimately needs more.
  *
  * Arithmetic contract (hash parity with the DuckDB oracle): the
  * interpolation is a fixed IEEE expression tree
  * `pv + (nv - pv) * ((t - pt) / (nt - pt))` over already-exact
  * inputs, so results are bit-identical on any engine that evaluates
  * the same tree — no tolerance needed.
  */
object TimeSeries {

  /** Dense grid + LOCF + linear interpolation.
    *
    * @param obs   observations, one row per (keys, slot) at most
    *              (pre-aggregate duplicates upstream)
    * @param keys  series identity columns
    * @param slot  integer grid coordinate column (e.g. epoch-hours) —
    *              LONG; the grid is every value in [min, max] per key
    * @param value observed DOUBLE column
    * @return one row per (keys, grid slot): value (observed, null in
    *         gaps), `ffill` (last observation carried forward), and
    *         `interp` (linear between the bracketing observations;
    *         null before the first / after the last observation)
    */
  /** Per-key EWMA scan: `y₁ = x₁`, `yₜ = α·xₜ + (1−α)·yₜ₋₁` over the
    * key's observations in slot order — the sequential recurrence
    * Column algebra can't express (no scan HOF), run as ONE typed
    * flatMapGroups per key: a single hash shuffle, then a sort + fold
    * inside each group. A key's full series must fit one task (the same
    * per-key-span contract as [[gapFillLinear]]).
    *
    * Arithmetic contract: each step is two multiplies and an add in a
    * fixed order, so with an α whose complement is IEEE-exact (0.25,
    * 0.5) the whole trajectory is bit-reproducible — the DuckDB oracle
    * replays it as a recursive CTE over the same slot order.
    *
    * @param obs one row per (key, slot); key is a single STRING column
    *            (concat composite keys upstream)
    * @return (key, slot, x, ewma), one row per input observation
    */
  def ewma(obs: DataFrame, key: String, slot: String, value: String,
           alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    val spark = obs.sparkSession
    import spark.implicits._
    val out = obs
      .select(col(key).cast("string"), col(slot).cast("long"),
        col(value).cast("double"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val rows = it.toArray.sortBy(_._2)
        var y = 0.0
        rows.iterator.zipWithIndex.map { case ((_, t, x), i) =>
          y = if (i == 0) x else alpha * x + (1 - alpha) * y
          (k, t, x, y)
        }
      }
      .toDF(key, slot, value, "ewma")
    out
  }

  /** Holt's linear-trend double exponential smoothing (Holt 1957) —
    * the level+trend companion to [[ewma]] for series that drift:
    *   l₁ = x₁, b₁ = 0
    *   lₜ = α·xₜ + (1−α)·(lₜ₋₁ + bₜ₋₁)
    *   bₜ = β·(lₜ − lₜ₋₁) + (1−β)·bₜ₋₁
    * emitted with the one-step-ahead forecast lₜ + bₜ. Same typed
    * per-key scan device as [[ewma]] (a TWO-variable recurrence is even
    * further from Column algebra), same per-key-series-fits-one-task
    * contract.
    *
    * Arithmetic contract: with α and β whose complements are IEEE-exact
    * (0.5, 0.25) every step is a fixed tree of multiplies/adds; the
    * oracle's recursive CTE re-derives lₜ inside bₜ's expression — the
    * identical expression over identical inputs yields the identical
    * double, so both trajectories replay bit-for-bit.
    *
    * @return (key, slot, x, level, trend, forecast) per observation
    */
  def holtLinear(obs: DataFrame, key: String, slot: String, value: String,
                 alpha: Double, beta: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(beta >= 0 && beta <= 1, s"beta must be in [0,1], got $beta")
    val spark = obs.sparkSession
    import spark.implicits._
    obs
      .select(col(key).cast("string"), col(slot).cast("long"),
        col(value).cast("double"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val rows = it.toArray.sortBy(_._2)
        var l = 0.0
        var b = 0.0
        rows.iterator.zipWithIndex.map { case ((_, t, x), i) =>
          if (i == 0) { l = x; b = 0.0 }
          else {
            val lp = l
            l = alpha * x + (1 - alpha) * (lp + b)
            b = beta * (l - lp) + (1 - beta) * b
          }
          (k, t, x, l, b, l + b)
        }
      }
      .toDF(key, slot, value, "level", "trend", "forecast")
  }

  /** Mean Absolute Scaled Error (Hyndman & Koehler 2006) — the
    * scale-free forecast-accuracy score that makes models comparable
    * across series: MASE = mean|a − f| over the in-sample mean absolute
    * error of the seasonal-naive forecast (a_t − a_{t−m}); < 1 beats
    * naive. Determinism: absolute errors round to 9 dp and sum as
    * DECIMAL (the perplexity device); the final ratio is one IEEE tree.
    *
    * Scale posture: one per-key lag window (one shuffle on the keys)
    * plus a map-combinable aggregation. The slot grid must be gapless
    * per key (ROWS-positional lag — the decomposeAdditive contract).
    *
    * @param forecast forecast column; NULL rows are excluded from the
    *                 numerator (e.g. warm-up rows)
    * @return one row per key: n_forecast, n_naive, mae, naive_mae,
    *         mase (6 dp; NULL when either side is empty or the naive
    *         error is 0) */
  def mase(obs: DataFrame, key: String, slot: String, actual: String,
           forecast: String, m: Int): DataFrame = {
    require(m >= 1, s"seasonal lag m must be >= 1, got $m")
    val w = Window.partitionBy(col(key)).orderBy(col(slot))
    val base = obs.select(col(key), col(slot),
        col(actual).cast("double").as("__a"),
        col(forecast).cast("double").as("__f"))
      .withColumn("__prev", lag(col("__a"), m).over(w))
    val aerr = round(abs(col("__a") - col("__f")), 9).cast("decimal(28,12)")
    val nerr = round(abs(col("__a") - col("__prev")), 9).cast("decimal(28,12)")
    val agg = base.groupBy(col(key)).agg(
      sum(when(col("__f").isNotNull, 1L).otherwise(0L)).as("n_forecast"),
      sum(when(col("__prev").isNotNull, 1L).otherwise(0L)).as("n_naive"),
      sum(when(col("__f").isNotNull, aerr)).as("__sae"),
      sum(when(col("__prev").isNotNull, nerr)).as("__sne"))
    val mae = col("__sae").cast("double") / col("n_forecast").cast("double")
    val nmae = col("__sne").cast("double") / col("n_naive").cast("double")
    val defined = col("n_forecast") > 0 && col("n_naive") > 0 && nmae > 0
    agg.select(col(key), col("n_forecast"), col("n_naive"),
      round(when(col("n_forecast") > 0, mae), 6).as("mae"),
      round(when(col("n_naive") > 0, nmae), 6).as("naive_mae"),
      round(when(defined, mae / nmae), 6).as("mase"))
  }

  /** Holt-Winters triple exponential smoothing, ADDITIVE seasonality —
    * the seasonal extension of [[holtLinear]] (level + trend + m
    * seasonal indices):
    *
    *   f_t = (l + b) + s_{t−m}                      (one-step forecast)
    *   l' = α·(y − s_{t−m}) + (1−α)·(l + b)
    *   b' = β·(l' − l) + (1−β)·b
    *   s_t = γ·(y − l') + (1−γ)·s_{t−m}
    *
    * Init (simple convention, replayable): l₀ = left-fold mean of the
    * first m observations, b₀ = 0, s_p = y_p − l₀; the first m rows
    * emit (l₀, 0, y−l₀, NULL-forecast). Same typed per-key scan device
    * as [[holtLinear]]; every step is a fixed left-associated tree, so
    * the whole trajectory replays bit-for-bit in a recursive-CTE oracle
    * carrying the seasonal vector as a LIST. Pick α/β/γ with
    * exactly-representable complements (0.25, 0.125, 0.5…) so the
    * oracle's (1−α) literals are the identical doubles.
    *
    * Contract: per-key series sorted by slot fits one task (the
    * holtLinear/ewma contract); keys with fewer than m rows emit
    * nothing.
    *
    * @return (key, slot, y, level, trend, seasonal, forecast) */
  def holtWinters(obs: DataFrame, key: String, slot: String, value: String,
                  period: Int, alpha: Double, beta: Double,
                  gamma: Double): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(beta >= 0 && beta <= 1, s"beta must be in [0,1], got $beta")
    require(gamma >= 0 && gamma <= 1, s"gamma must be in [0,1], got $gamma")
    val spark = obs.sparkSession
    import spark.implicits._
    val m = period
    val oneA = 1 - alpha; val oneB = 1 - beta; val oneG = 1 - gamma
    obs
      .select(col(key).cast("string"), col(slot).cast("long"),
        col(value).cast("double"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val rows = it.toArray.sortBy(_._2)
        if (rows.length < m) Iterator.empty
        else {
          var acc = 0.0
          var i = 0
          while (i < m) { acc = acc + rows(i)._3; i += 1 }
          val l0 = acc / m
          val s = Array.tabulate(m)(p => rows(p)._3 - l0)
          var l = l0
          var b = 0.0
          rows.iterator.zipWithIndex.map { case ((_, t, y), idx) =>
            if (idx < m) (k, t, y, l0, 0.0, s(idx), Option.empty[Double])
            else {
              val p = idx % m
              val sOld = s(p)
              val fc = (l + b) + sOld
              val lp = l
              l = alpha * (y - sOld) + oneA * (l + b)
              b = beta * (l - lp) + oneB * b
              s(p) = gamma * (y - l) + oneG * sOld
              (k, t, y, l, b, s(p), Some(fc))
            }
          }
        }
      }
      .toDF(key, slot, value, "level", "trend", "seasonal", "forecast")
  }

  /** One-sided (upper) CUSUM change detection — Page 1954, the
    * classic drift detector: s₀ = 0, sₜ = max(0, sₜ₋₁ + xₜ − target −
    * slack), alarm when sₜ > threshold. Same typed per-key scan device
    * as [[ewma]] (the recurrence has no Column rendering), same
    * per-key-series-fits-one-task contract.
    *
    * Arithmetic contract: each step is three left-associated additions
    * and a max in a fixed order — `((s + x) − target) − slack` — so the
    * whole trajectory replays bit-for-bit in a recursive-CTE oracle
    * spelling the same tree (`greatest(0, s + x − target − slack)`
    * parses left-associated in SQL). The alarm boolean compares exact
    * doubles, so it is as reproducible as the trajectory.
    *
    * @param obs    one row per (key, slot): the monitored series plus a
    *               per-key `target` column (pre-join the in-control
    *               mean; keeping it a column keeps the scan pure)
    * @param target column name in `obs` holding the in-control level
    * @param slack  the CUSUM allowance k (tune ≈ half the shift to
    *               detect; too small and the statistic random-walks up)
    * @return (key, slot, x, cusum, alarm) per input observation
    */
  def cusum(obs: DataFrame, key: String, slot: String, value: String,
            target: String, slack: Double, threshold: Double): DataFrame = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs
      .select(col(key).cast("string"), col(slot).cast("long"),
        col(value).cast("double"), col(target).cast("double"))
      .as[(String, Long, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val rows = it.toArray.sortBy(_._2)
        var s = 0.0
        rows.iterator.map { case (_, t, x, tg) =>
          s = math.max(0.0, s + x - tg - slack)
          (k, t, x, s, s > threshold)
        }
      }
      .toDF(key, slot, value, "cusum", "alarm")
  }

  /** Peak concurrency per key — the sweep-line classic: explode each
    * interval into a +1 start / −1 end event, running-sum in
    * (time, starts-before-ends) order, take the max. Intervals are
    * CLOSED on both ends: an interval ending at t and one starting at
    * t overlap (the +1 sorts first via `d DESC`). Ties beyond (t, d)
    * need no order: equal deltas reach the same partial sums in any
    * permutation, so the max is deterministic.
    *
    * Scale posture: one explode (2 rows per interval), one
    * key-partitioned running-sum window, one aggregation. A key's
    * endpoints ride one task (the [[gapFillLinear]] per-key contract) —
    * shard the key space upstream if a single key legitimately owns
    * hundreds of millions of intervals.
    *
    * @return (keys…, n_intervals, max_concurrent)
    */
  def maxConcurrent(intervals: DataFrame, keys: Seq[String],
                    start: Column, end: Column): DataFrame = {
    val kc = keys.map(col)
    val ev = intervals
      .select(kc :+ explode(array(
        struct(start.cast("long").as("t"), lit(1L).as("d")),
        struct(end.cast("long").as("t"), lit(-1L).as("d")))).as("__ev"): _*)
      .select(kc :+ col("__ev.t").as("__t") :+ col("__ev.d").as("__d"): _*)
    val w = Window.partitionBy(kc: _*).orderBy(col("__t"), col("__d").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("__run", sum(col("__d")).over(w))
      .groupBy(kc: _*)
      .agg((count(lit(1)) / 2).cast("long").as("n_intervals"),
        max(col("__run")).as("max_concurrent"))
  }

  def gapFillLinear(obs: DataFrame, keys: Seq[String], slot: String,
                    value: String): DataFrame = {
    val kc = keys.map(col)
    val spans = obs.groupBy(kc: _*)
      .agg(min(col(slot)).as("__lo"), max(col(slot)).as("__hi"))
    val grid = spans.select(kc :+
      explode(sequence(col("__lo"), col("__hi"))).as(slot): _*)
    val joined = grid.join(obs, keys :+ slot, "left")

    val w = Window.partitionBy(kc: _*).orderBy(col(slot))
    val back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obSlot = when(col(value).isNotNull, col(slot))
    val t = col(slot)
    val pv = col("__pv"); val nv = col("__nv")
    val pt = col("__pt"); val nt = col("__nt")
    joined
      .withColumn("__pv", last(col(value), ignoreNulls = true).over(back))
      .withColumn("__pt", last(obSlot, ignoreNulls = true).over(back))
      .withColumn("__nv", first(col(value), ignoreNulls = true).over(fwd))
      .withColumn("__nt", first(obSlot, ignoreNulls = true).over(fwd))
      .withColumn("ffill", pv)
      .withColumn("interp",
        when(pv.isNull || nv.isNull, lit(null).cast("double"))
          .when(pt === nt, pv)
          .otherwise(pv + (nv - pv) *
            ((t - pt).cast("double") / (nt - pt).cast("double"))))
      .drop("__pv", "__pt", "__nv", "__nt")
  }

  /** Classical additive seasonal decomposition (the decompose() of
    * Kendall & Stuart / the pre-loess half of STL): y = trend +
    * seasonal + residual for an EVEN period m.
    *
    *  - trend: the standard centered 2×m moving average, carried as the
    *    DOUBLED exact sum D_t = y_{t−h} + 2·Σ_{|i|<h} y_{t+i} + y_{t+h}
    *    (h = m/2) = full-window sum + inner-window sum — two ROWS-frame
    *    window sums over EXACT decimals; trend = D/(2m), one division.
    *  - seasonal: the per-phase (slot mod m) mean of the detrended
    *    series, DEFINED over exact sums — (Σ_p y − Σ_p D/(2m))/n_p —
    *    then centered by the UNWEIGHTED mean of the m per-phase means
    *    (the classical/R `decompose()` convention: the indices sum to
    *    zero over one cycle even when edge-trimming leaves the phases
    *    with unequal row counts). The centering term is one fixed
    *    left-to-right IEEE tree over the m phase means — no
    *    order-dependent float accumulation ever happens.
    *  - residual: y − trend − seasonal per row (fixed tree).
    *
    * Contract: the per-key slot grid must be GAPLESS and unique (ROWS
    * frames align neighbors positionally — feed `gapFillLinear` output
    * or a dense aggregation grid); rows whose centered window is
    * incomplete (the first/last h) carry no trend and are dropped.
    * Every phase 0..m−1 must be populated among the surviving rows
    * (guaranteed whenever ≥ 2m rows survive — i.e. ≥ 3m input rows).
    *
    * @return (key, o, y, trend, seasonal, resid) for trend-defined
    *         rows; y exact-decimal-cast to double, components 6 dp
    */
  def decomposeAdditive(obs: DataFrame, key: String, slot: String,
                        value: String, period: Int): DataFrame = {
    require(period >= 2 && period % 2 == 0,
      s"period must be even and >= 2, got $period")
    val h = period / 2
    val base = obs.select(col(key), col(slot).cast("long").as("o"),
      col(value).cast("decimal(18,4)").as("__y"))
    val w = Window.partitionBy(col(key)).orderBy(col("o"))
    val wFull = w.rowsBetween(-h, h)
    val wInner = w.rowsBetween(-h + 1, h - 1)
    val t = base
      .withColumn("__s1", sum(col("__y")).over(wFull))
      .withColumn("__s0", sum(col("__y")).over(wInner))
      .withColumn("__cnt", count(lit(1)).over(wFull))
      .filter(col("__cnt") === period + 1)
      .withColumn("__d", col("__s1") + col("__s0"))
      .withColumn("__p", pmod(col("o"), lit(period)))
      .localCheckpoint() // feeds phase sums, the global sum, and the rows
    val m2 = lit((2 * period).toDouble)
    val phases = t.groupBy(col(key), col("__p")).agg(
      count(lit(1)).as("__np"),
      sum(col("__y")).as("__spy"), sum(col("__d")).as("__spd"))
    val sRaw = (col("__spy").cast("double")
      - col("__spd").cast("double") / m2) / col("__np").cast("double")
    // Unweighted mean of the m per-phase means: the phase sums pivot
    // into ONE row per key (conditional exact-decimal sums), and the
    // centering term evaluates as a fixed left-to-right tree over the
    // m phase-mean expressions — order-free, oracle-identical.
    val phaseAggs = (0 until period).flatMap { p =>
      Seq(sum(when(col("__p") === p, col("__y"))).as(s"__spy$p"),
        sum(when(col("__p") === p, col("__d"))).as(s"__spd$p"),
        count(when(col("__p") === p, lit(1))).as(s"__np$p"))
    }
    val phaseMean = (0 until period).map { p =>
      (col(s"__spy$p").cast("double")
        - col(s"__spd$p").cast("double") / m2) / col(s"__np$p").cast("double")
    }
    val glob = t.groupBy(col(key)).agg(phaseAggs.head, phaseAggs.tail: _*)
      .select(col(key),
        (phaseMean.reduceLeft(_ + _) / lit(period.toDouble)).as("__g"))
    val withSeasonal = t
      .join(broadcast(phases), Seq(key, "__p"))
      .join(broadcast(glob), Seq(key))
      .withColumn("__trend", col("__d").cast("double") / m2)
      .withColumn("__seasonal", sRaw - col("__g"))
    withSeasonal.select(
      col(key), col("o"), col("__y").cast("double").as("y"),
      round(col("__trend"), 6).as("trend"),
      round(col("__seasonal"), 6).as("seasonal"),
      round(col("__y").cast("double") - col("__trend") - col("__seasonal"), 6)
        .as("resid"))
  }
}
