package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Theil-Sen robust trend estimation — the median of all pairwise
  * slopes (y_k − y_j)/(o_k − o_j), the standard outlier-resistant
  * alternative to OLS for per-key trend lines (up to ~29% contamination
  * breakdown vs OLS's zero).
  *
  * Determinism contract: the median is the LOWER median — the element
  * at rank (m+1) div 2 of the slope order — selected by rank, NEVER
  * interpolated: an even-count midpoint average (a+b)/2 vs
  * a + 0.5·(b−a) can differ in the last ulp between engines, while
  * rank selection of an existing value is exact everywhere (ties in
  * the slope order select the same VALUE whichever tied row wins).
  * Each slope is one double division of an exact DECIMAL(18,4) y-delta
  * by an exact integer o-delta. The intercept is the lower median of
  * y_i − slope·o_i over the rows (one further fixed tree each).
  *
  * Scale contract: all C(n,2) pairs materialize per key — the
  * bounded-series contract (per-key slot grids / calibration curves,
  * thousands of points), where the pair join is a per-key equi-join
  * (never a global cartesian: PlanSpec-visible as a join on the keys).
  * Parallelism comes from the key shuffle; an unbounded per-key series
  * belongs in olsPerKey instead.
  *
  * @return one row per key: n (points), n_pairs, slope, intercept
  *         (lower medians, 6 dp). Keys with fewer than 2 points have
  *         no pairs and are ABSENT from the output.
  */
object TheilSen {

  def fit(df: DataFrame, keys: Seq[String], order: Column,
          value: Column): DataFrame = {
    require(keys.nonEmpty, "TheilSen.fit needs at least one key column")
    val pts = df.filter(order.isNotNull && value.isNotNull)
      .select(keys.map(col) ++ Seq(order.cast("long").as("__o"),
        value.cast("decimal(18,4)").as("__y")): _*)
    val l = pts.select(keys.map(col) ++
      Seq(col("__o").as("__oj"), col("__y").as("__yj")): _*)
    val r = pts.select(keys.map(col) ++
      Seq(col("__o").as("__ok"), col("__y").as("__yk")): _*)
    val pairs = l.join(r, keys).filter(col("__ok") > col("__oj"))
      .withColumn("__slope",
        (col("__yk") - col("__yj")).cast("double") /
          (col("__ok") - col("__oj")).cast("double"))
    val wS = Window.partitionBy(keys.map(col): _*).orderBy(col("__slope"))
    val slope = pairs
      .withColumn("__rnk", row_number().over(wS))
      .withColumn("__m", count(lit(1)).over(
        Window.partitionBy(keys.map(col): _*)))
      .filter(col("__rnk") === expr("(__m + 1) div 2"))
      .select(keys.map(col) ++ Seq(col("__m").as("n_pairs"),
        col("__slope").as("slope")): _*)
    // intercept: lower median of the per-point residual y − slope·o
    val withS = pts.join(slope, keys)
      .withColumn("__res",
        col("__y").cast("double") - col("slope") * col("__o").cast("double"))
    val wR = Window.partitionBy(keys.map(col): _*).orderBy(col("__res"))
    val fitted = withS
      .withColumn("__rnk", row_number().over(wR))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(keys.map(col): _*)))
      .filter(col("__rnk") === expr("(__n + 1) div 2"))
      .select(keys.map(col) ++ Seq(col("__n").as("n"), col("n_pairs"),
        round(col("slope"), 6).as("slope"),
        round(col("__res"), 6).as("intercept")): _*)
    fitted
  }

  /** [[fit]] with the scale hole closed (the one measured superlinear
    * tail in the sf1 sweep): when a key's series exceeds `maxPoints`,
    * fit the Theil-Sen line on a DETERMINISTIC md5-selected subsample of
    * `maxPoints` rows instead of materializing all C(n,2) pairs — pair
    * count is then bounded by C(maxPoints, 2) per key regardless of
    * series length, so the operator is linear in the input (one hash
    * pass + a per-key top-maxPoints + a constant-size pair join).
    *
    * Sampling is the repo's engine-portable hash device (Combine
    * .samplePerKeyByHash): rank rows per key by md5 of (keys..., order)
    * joined with '|' (null-coalesced), keep the `maxPoints` smallest —
    * a pure function of the data, identical in the DuckDB oracle,
    * stable under repartitioning. Hash selection (vs stride-by-rank)
    * trades the even x-spread for alias-freedom on periodic series.
    * Contract: (keys, order) must uniquely identify rows, or which
    * duplicate survives the rank tie is engine-dependent.
    *
    * Estimator note: Theil-Sen on a uniform point subsample is itself a
    * consistent robust trend estimate (the pairwise-slope median of an
    * iid subsample); for n ≤ maxPoints the result is EXACTLY [[fit]].
    *
    * @return same shape as [[fit]]: n here is the SAMPLED point count
    *         (min(n, maxPoints)), n_pairs the sampled pair count.
    */
  def fitSampled(df: DataFrame, keys: Seq[String], order: Column,
                 value: Column, maxPoints: Int = 64): DataFrame = {
    require(keys.nonEmpty, "fitSampled needs at least one key column")
    require(maxPoints >= 2, "maxPoints must be at least 2")
    // filter AFTER the casts: a null row (raw null, or — on non-ANSI
    // deployments where casts null instead of throwing — a cast-produced
    // null) must not consume a sample slot: pre-cast filtering would let
    // it into the hash sample only for fit() to drop it, quietly
    // shrinking the effective sample below maxPoints (and null __o would
    // make the surviving-duplicate choice engine-dependent)
    val pts = df
      .select(keys.map(col) ++ Seq(order.cast("long").as("__o"),
        value.cast("decimal(18,4)").as("__y")): _*)
      .filter(col("__o").isNotNull && col("__y").isNotNull)
    val sampled = Combine.samplePerKeyByHash(pts, keys, maxPoints,
      idCols = keys :+ "__o")
    fit(sampled, keys, col("__o"), col("__y"))
  }

  /** Per-key Mann-Kendall trend test — the nonparametric significance
    * companion to [[fit]] (they share the pairwise machinery; report
    * the Theil-Sen slope WITH the Mann-Kendall z in practice):
    *
    *   S = Σ_{j<k} sign(y_k − y_j)             (exact integer)
    *   σ² = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18   (exact tie-corrected
    *        integer numerator; t = tie-group sizes)
    *   z = (S − sign(S)) / σ  (continuity-corrected; 0 when S = 0)
    *   tau = S / (n(n−1)/2)   (Kendall's tau-a, one division)
    *
    * Every input to the final IEEE trees is an exact integer (DECIMAL
    * sums — the cubic tie terms would overflow BIGINT past ~2M-row tie
    * groups), so the whole test replays bit-for-bit in the oracle.
    * Same bounded-series contract as [[fit]]: C(n,2) pairs per key.
    *
    * @return one row per key: n, s, tau (6 dp), z (6 dp; NULL when
    *         σ = 0 — n < 2 or all values tied). Keys with n < 2 have
    *         no pairs and are ABSENT.
    */
  def mannKendall(df: DataFrame, keys: Seq[String], order: Column,
                  value: Column): DataFrame = {
    require(keys.nonEmpty, "mannKendall needs at least one key column")
    val pts = df.filter(order.isNotNull && value.isNotNull)
      .select(keys.map(col) ++ Seq(order.cast("long").as("__o"),
        value.cast("decimal(18,4)").as("__y")): _*)
    val l = pts.select(keys.map(col) ++
      Seq(col("__o").as("__oj"), col("__y").as("__yj")): _*)
    val r = pts.select(keys.map(col) ++
      Seq(col("__o").as("__ok"), col("__y").as("__yk")): _*)
    val sAgg = l.join(r, keys).filter(col("__ok") > col("__oj"))
      .groupBy(keys.map(col): _*)
      .agg(sum(signum(col("__yk") - col("__yj")).cast("long")).as("s"))
    // tie correction: Σ t(t−1)(2t+5) over per-value tie groups, exact
    val ties = pts.groupBy(keys.map(col) :+ col("__y"): _*)
      .agg(count(lit(1)).cast("decimal(12,0)").as("__t"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__t") * (col("__t") - 1)
        * (col("__t") * 2 + 5)).as("__tcorr"),
        count(lit(1)).as("__groups"),
        sum(col("__t")).as("__nd"))
    val joined = sAgg.join(ties, keys)
    val n = col("__nd").cast("double")
    val sD = col("s").cast("double")
    val var18 = (n * (n - lit(1.0d)) * (lit(2.0d) * n + lit(5.0d))
      - col("__tcorr").cast("double")) / lit(18.0d)
    val z = when(col("s") > 0, (sD - lit(1.0d)) / sqrt(var18))
      .when(col("s") < 0, (sD + lit(1.0d)) / sqrt(var18))
      .otherwise(lit(0.0d))
    joined.select(keys.map(col) ++ Seq(
      col("__nd").cast("long").as("n"), col("s"),
      round(sD / (n * (n - lit(1.0d)) / lit(2.0d)), 6).as("tau"),
      round(when(var18 > 0, z), 6).as("z")): _*)
  }
}
