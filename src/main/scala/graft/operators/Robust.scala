package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust (outlier-resistant) per-key statistics — the Tukey-fence IQR
  * family: exact interpolated quartiles, the 1.5·IQR outlier fences,
  * the outlier census, and the winsorized (fence-clamped) mean.
  *
  * Arithmetic contract: `percentile(v, 0.25/0.75)` is
  * percentile_cont-interpolated, and at quarter fractions over values
  * that are exact at coarse binary scales every interpolation step —
  * p·(n−1), the fractional split, lower + frac·(upper−lower) — is
  * IEEE-exact and matches DuckDB's quantile_cont bit for bit (the
  * q_percentile_exact device). The fences q1 − 1.5·iqr / q3 + 1.5·iqr
  * are then exact multiples of 0.125, the clamp greatest(lo, least(hi,
  * v)) is exact at 4 dp, and the winsorized mean is a DECIMAL-exact
  * sum with one final division.
  *
  * Scale posture: two passes — a hash aggregation for the quartiles
  * (Spark's percentile is a single-shuffle typed aggregate), then the
  * group-count-sized quartile frame broadcasts back onto the scan for
  * the census/winsorize aggregation. No windows, no sort of the full
  * data, no self-join.
  */
object Robust {

  /** @return one row per key group: n, q1, q3, iqr, lo, hi (the Tukey
    *         fences), n_out (count beyond the fences), winsor_mean
    *         (fence-clamped mean, 6 dp)
    */
  def iqrStats(df: DataFrame, keys: Seq[String], value: Column): DataFrame = {
    require(keys.nonEmpty, "iqrStats needs at least one key column")
    val base = df.filter(value.isNotNull)
      .select(keys.map(col) :+ value.cast("double").as("__v"): _*)
    val quartiles = base.groupBy(keys.map(col): _*).agg(
      percentile(col("__v"), lit(0.25)).as("q1"),
      percentile(col("__v"), lit(0.75)).as("q3"))
    val fenced = base.join(broadcast(quartiles), keys)
      .withColumn("lo", col("q1") - (col("q3") - col("q1")) * lit(1.5d))
      .withColumn("hi", col("q3") + (col("q3") - col("q1")) * lit(1.5d))
    fenced
      .groupBy(keys.map(col) ++ Seq(col("q1"), col("q3"),
        col("lo"), col("hi")): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("__v") < col("lo") || col("__v") > col("hi"), 1L)
          .otherwise(0L)).as("n_out"),
        round(sum(greatest(col("lo"), least(col("hi"), col("__v")))
            .cast("decimal(18,4)")).cast("double") / count(lit(1)), 6)
          .as("winsor_mean"))
      .select(keys.map(col) ++ Seq(col("n"), col("q1"), col("q3"),
        (col("q3") - col("q1")).as("iqr"), col("lo"), col("hi"),
        col("n_out"), col("winsor_mean")): _*)
  }

  /** Hampel-filter MAD constant 1/Φ⁻¹(¾) as a shared hardcoded literal
    * (the Benford device — no erf/quantile call on either engine). */
  val MadToSigma: Double = 1.482602218505602

  /** Per-key median / MAD (median absolute deviation) robust location-
    * scale statistics with a Hampel outlier census.
    *
    * Same exactness posture as [[iqrStats]]: `percentile(·, 0.5)` at
    * the half fraction interpolates IEEE-exactly over values exact at
    * coarse binary scales and matches quantile_cont bit-for-bit; the
    * absolute deviations |x − median| inherit that exactness, so the
    * MAD is a second exact interpolated median. sigma_hat = MAD·1.4826
    * (consistency constant as a shared literal) and the census counts
    * |x − median| > 3·sigma_hat — one fixed tree, exact comparisons.
    *
    * Scale posture: two percentile aggregations with a broadcast-back
    * between them (group-count-sized frames), plus one census pass. No
    * sorts of the full data.
    *
    * @return one row per key: n, median, mad, sigma_hat (6 dp),
    *         n_out (|x − median| > 3·sigma_hat)
    */
  def madStats(df: DataFrame, keys: Seq[String], value: Column): DataFrame = {
    require(keys.nonEmpty, "madStats needs at least one key column")
    val base = df.filter(value.isNotNull)
      .select(keys.map(col) :+ value.cast("double").as("__v"): _*)
    val med = base.groupBy(keys.map(col): _*)
      .agg(percentile(col("__v"), lit(0.5)).as("median"))
    val dev = base.join(broadcast(med), keys)
      .withColumn("__ad", abs(col("__v") - col("median")))
    val mad = dev.groupBy(keys.map(col) :+ col("median"): _*)
      .agg(percentile(col("__ad"), lit(0.5)).as("mad"))
    val sigma = col("mad") * lit(MadToSigma)
    val censored = dev.join(broadcast(mad.select(keys.map(col) :+
        col("mad"): _*)), keys)
      .groupBy(keys.map(col) ++ Seq(col("median"), col("mad")): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(col("__ad") > lit(3.0d) * (col("mad") * lit(MadToSigma)),
          1L).otherwise(0L)).as("n_out"))
    censored.select(keys.map(col) ++ Seq(
      col("n"), col("median"), col("mad"),
      round(sigma, 6).as("sigma_hat"), col("n_out")): _*)
  }

  /** Trimmed and Winsorized means per key — the classical robust
    * location estimators next to [[madStats]]' scale: drop (trimmed)
    * or clamp (Winsorized) the lowest/highest k = ⌊n·trimNum/trimDen⌋
    * values by rank. Exactness: ranks are row_number over the value
    * sort (boundary ties drop an arbitrary DUPLICATE — the kept
    * MULTISET is deterministic), k is one integer division, kept sums
    * are exact DECIMAL(18,4), and the Winsorized sum needs no clamp
    * scan: exactly k values clamp to each boundary, so it is
    * keptSum + k·lo + k·hi in exact decimal arithmetic. One rank
    * window (one shuffle on the keys) + one hash aggregation.
    *
    * @param trimNum/trimDen trim fraction per tail (default 1/10)
    * @return one row per key: n, n_trimmed (= n − 2k), trimmed_mean,
    *         winsorized_mean (6 dp; NULL when the trim empties the key) */
  def trimmedStats(df: DataFrame, keys: Seq[String], value: Column,
                   trimNum: Int = 1, trimDen: Int = 10): DataFrame = {
    require(keys.nonEmpty, "trimmedStats needs at least one key column")
    require(trimNum >= 0 && trimDen > 0 && 2 * trimNum < trimDen,
      s"trim fraction $trimNum/$trimDen must be in [0, 1/2)")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__x"))
    val wAll = Window.partitionBy(keys.map(col): _*)
    // try_cast + filter on the CAST column (the Moments discipline,
    // Moments.scala:43): an out-of-contract value must DROP consistently
    // — a plain cast would null it (non-ANSI) or throw (ANSI), and a
    // nulled row would still count in __n/n_trimmed and rank while being
    // excluded from the sums (half-counting)
    val ranked = df
      .select(keys.map(col) :+ value.try_cast("decimal(18,4)").as("__x"): _*)
      .filter(col("__x").isNotNull)
      .withColumn("__r", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__k", expr(s"__n * $trimNum DIV $trimDen"))
    val kept = col("__r") > col("__k") && col("__r") <= col("__n") - col("__k")
    val agg = ranked.groupBy(keys.map(col): _*).agg(
      max(col("__n")).as("n"), max(col("__k")).as("__kk"),
      sum(when(kept, col("__x"))).as("__skept"),
      sum(when(kept, 1L).otherwise(0L)).as("n_trimmed"),
      min(when(kept, col("__x"))).as("__lo"),
      max(when(kept, col("__x"))).as("__hi"))
    val trimmedMean = col("__skept").cast("double") /
      col("n_trimmed").cast("double")
    val winsorized = (col("__skept") + col("__kk") * col("__lo")
      + col("__kk") * col("__hi")).cast("double") / col("n").cast("double")
    agg.select(keys.map(col) ++ Seq(
      col("n"), col("n_trimmed"),
      round(when(col("n_trimmed") > 0, trimmedMean), 6).as("trimmed_mean"),
      round(when(col("n_trimmed") > 0, winsorized), 6).as("winsorized_mean")): _*)
  }
}
