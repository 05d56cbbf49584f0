package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form per-key ordinary least squares — the `regr_slope` /
  * `regr_intercept` / `regr_r2` family (SQL:2003 linear-regression
  * aggregates) as ONE hash aggregation: y = slope·x + intercept fitted
  * per group from the five classic sufficient statistics
  * (n, Σx, Σy, Σxy, Σx²[, Σy² for r²]).
  *
  * Scale posture: this is the textbook map-side-combinable aggregate —
  * the sufficient statistics are sums, so partial aggregation happens
  * before the single shuffle on the group keys and the reducer sees one
  * partial per map task, not per row. No window, no second pass, no
  * join. At 100 TB this runs at scan speed.
  *
  * Arithmetic contract (the repo's hash-parity discipline): the inputs
  * route through DECIMAL(18,4), so every sufficient statistic is an
  * EXACT decimal sum — order- and partition-invariant, reproducible on
  * any engine. Only then does each coefficient evaluate as one fixed
  * IEEE double tree over those exact sums (spelled identically in the
  * DuckDB oracle), so slope/intercept/r² are bit-identical across
  * engines — unlike the built-in float `regr_*` aggregates, whose
  * partial-sum order drifts the last ulps.
  *
  * Degenerate groups are NULL, not NaN: slope/intercept/r² need x
  * variance (n·Σx² − (Σx)² > 0), and r² additionally needs y variance;
  * a constant-x or constant-y group reports NULL coefficients rather
  * than a 0/0 division.
  */
object Regress {

  /** Per-key OLS of `y` on `x`.
    *
    * @return one row per key group: n, sum_x, sum_y (exact decimal sums
    *         as doubles), slope, intercept, r2 (rounded to 6 dp — one
    *         fixed double tree over the exact sums)
    */
  def olsPerKey(df: DataFrame, keys: Seq[String],
                x: Column, y: Column): DataFrame = {
    require(keys.nonEmpty, "olsPerKey needs at least one key column")
    val xd = x.cast("decimal(18,4)")
    val yd = y.cast("decimal(18,4)")
    val agg = df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(xd).as("__sx"),
      sum(yd).as("__sy"),
      sum(xd * yd).as("__sxy"),
      sum(xd * xd).as("__sxx"),
      sum(yd * yd).as("__syy"))
    // one fixed IEEE tree per coefficient over the exact decimal sums;
    // the oracle spells the identical expressions
    val n = col("n").cast("double")
    val sx = col("__sx").cast("double")
    val sy = col("__sy").cast("double")
    val sxy = col("__sxy").cast("double")
    val sxx = col("__sxx").cast("double")
    val syy = col("__syy").cast("double")
    val covN = n * sxy - sx * sy   // n²·cov(x,y)
    val varXN = n * sxx - sx * sx  // n²·var(x)
    val varYN = n * syy - sy * sy  // n²·var(y)
    val slope = when(varXN > 0, covN / varXN)
    agg.select(
      keys.map(col) ++ Seq(
        col("n"),
        sx.as("sum_x"),
        sy.as("sum_y"),
        round(slope, 6).as("slope"),
        round(when(varXN > 0, (sy - (covN / varXN) * sx) / n), 6)
          .as("intercept"),
        round(when(varXN > 0 && varYN > 0, (covN * covN) / (varXN * varYN)), 6)
          .as("r2")): _*)
  }

  /** Per-key sample autocorrelation at each requested lag — the ACF
    * diagnostic (Box-Jenkins) as Pearson correlation between the series
    * and its L-step lead.
    *
    * ONE window pass materializes every lead column (same window spec →
    * a single sort + WindowExec over per-key partitions), an inline
    * explode stacks them into (lag, x, y) pairs, and one hash
    * aggregation per (key, lag) reduces the DECIMAL-exact sufficient
    * statistics — map-combinable, so at scale this is a scan plus one
    * shuffle after the (narrow) per-key window.
    *
    * Same arithmetic contract as olsPerKey: exact decimal sums, then
    * each rₗ evaluates as one fixed IEEE tree (two multiplies-subtracts,
    * one sqrt, one division — sqrt is correctly rounded by IEEE 754, so
    * the tree is portable). Groups with zero x- or y-variance at a lag
    * report NULL, not NaN.
    *
    * @param order per-key ordering column — must be UNIQUE per key (the
    *              caller aggregates to a slot grid first, as with ewma)
    * @return one row per (key…, lag): n pairs, r (rounded to 6 dp)
    *
    * Cross-engine parity caveat: inputs re-quantize through
    * DECIMAL(18,4). A double landing EXACTLY on a 4-dp midpoint
    * (e.g. the result of a mean's division) can round differently
    * across engines (shortest-repr HALF_UP vs exact-binary nearest) —
    * feed values already exact at 4 dp (sums of 4-dp data, integers)
    * when bit parity matters.
    */
  /** Per-key cross-correlation function (CCF): Pearson r between
    * series `x` at time t and series `y` at time t+l, for each
    * requested lag l (negative l = y LEADS x). The lead-lag diagnostic
    * — "does ad activity precede purchases, and by how many slots?"
    *
    * Same machinery and arithmetic contract as [[autocorr]]: every
    * shifted column rides ONE window pass (lead for l ≥ 0, lag for
    * l < 0 — spelled with the same two functions in the oracle), an
    * inline explode stacks the (lag, x, y) pairs, and one hash
    * aggregation reduces DECIMAL-exact sufficient statistics into a
    * fixed IEEE tree per lag. NULL on zero variance.
    *
    * @param order per-key ordering column — must be UNIQUE per key
    * @return one row per (key…, lag): n pairs, r (6 dp)
    */
  def crosscorr(df: DataFrame, keys: Seq[String], order: String,
                x: String, y: String, lags: Seq[Int]): DataFrame = {
    require(keys.nonEmpty, "crosscorr needs at least one key column")
    require(lags.nonEmpty, "crosscorr needs at least one lag")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(order))
    val xd = col(x).cast("double")
    val yd = col(y).cast("double")
    val withShift = df.select(keys.map(col) ++ (xd.as("__x") +:
      lags.map { l =>
        val shifted = if (l >= 0) lead(yd, l).over(w) else lag(yd, -l).over(w)
        shifted.as(s"__y$l")
      }): _*)
    val stacked = withShift
      .select(keys.map(col) :+ explode(array(lags.map { l =>
        struct(lit(l).as("lag"), col("__x").as("x"), col(s"__y$l").as("y"))
      }: _*)).as("pair"): _*)
      .select(keys.map(col) ++ Seq(col("pair.lag").as("lag"),
        col("pair.x").as("x"), col("pair.y").as("y")): _*)
      .filter(col("x").isNotNull && col("y").isNotNull)
    val xc = col("x").cast("decimal(18,4)")
    val yc = col("y").cast("decimal(18,4)")
    val agg = stacked.groupBy(keys.map(col) :+ col("lag"): _*).agg(
      count(lit(1)).as("n"),
      sum(xc).as("__sx"), sum(yc).as("__sy"),
      sum(xc * yc).as("__sxy"),
      sum(xc * xc).as("__sxx"), sum(yc * yc).as("__syy"))
    val n = col("n").cast("double")
    val sx = col("__sx").cast("double")
    val sy = col("__sy").cast("double")
    val sxy = col("__sxy").cast("double")
    val sxx = col("__sxx").cast("double")
    val syy = col("__syy").cast("double")
    val varXN = n * sxx - sx * sx
    val varYN = n * syy - sy * sy
    agg.select(keys.map(col) ++ Seq(
      col("lag"), col("n"),
      round(when(varXN > 0 && varYN > 0,
        (n * sxy - sx * sy) / sqrt(varXN * varYN)), 6).as("r")): _*)
  }

  def autocorr(df: DataFrame, keys: Seq[String], order: String,
               value: String, lags: Seq[Int]): DataFrame = {
    require(keys.nonEmpty, "autocorr needs at least one key column")
    require(lags.nonEmpty && lags.forall(_ >= 1),
      s"lags must be >= 1, got $lags")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(order))
    val x = col(value).cast("double")
    // window exprs can't ride inside a generator: materialize every lead
    // column first (same window spec → ONE WindowExec), then explode
    val withLeads = df.select(keys.map(col) ++ (x.as("x") +:
      lags.map(l => lead(x, l).over(w).as(s"__y$l"))): _*)
    val stacked = withLeads
      .select(keys.map(col) :+ explode(array(lags.map { l =>
        struct(lit(l).as("lag"), col("x"), col(s"__y$l").as("y"))
      }: _*)).as("pair"): _*)
      .select(keys.map(col) ++ Seq(col("pair.lag").as("lag"),
        col("pair.x").as("x"), col("pair.y").as("y")): _*)
      .filter(col("y").isNotNull)
    val xd = col("x").cast("decimal(18,4)")
    val yd = col("y").cast("decimal(18,4)")
    val agg = stacked.groupBy(keys.map(col) :+ col("lag"): _*).agg(
      count(lit(1)).as("n"),
      sum(xd).as("__sx"), sum(yd).as("__sy"),
      sum(xd * yd).as("__sxy"),
      sum(xd * xd).as("__sxx"), sum(yd * yd).as("__syy"))
    val n = col("n").cast("double")
    val sx = col("__sx").cast("double")
    val sy = col("__sy").cast("double")
    val sxy = col("__sxy").cast("double")
    val sxx = col("__sxx").cast("double")
    val syy = col("__syy").cast("double")
    val varXN = n * sxx - sx * sx
    val varYN = n * syy - sy * sy
    agg.select(keys.map(col) ++ Seq(
      col("lag"), col("n"),
      round(when(varXN > 0 && varYN > 0,
        (n * sxy - sx * sy) / sqrt(varXN * varYN)), 6).as("r")): _*)
  }

  /** Pearson correlation MATRIX over an explicit column list — the
    * feature-audit one-pass companion to [[olsPerKey]]: every pairwise
    * sufficient statistic (Σxᵢ, Σxᵢ², Σxᵢxⱼ) accumulates as an exact
    * DECIMAL(18,4)-routed sum in ONE map-combinable aggregation, then
    * each unordered pair emits r as the olsPerKey IEEE tree. Rows with
    * a NULL in ANY listed column are excluded (complete-case, the
    * textbook convention — pairwise-deletion would make each r see a
    * different n).
    *
    * @return one row per unordered pair: col_a, col_b, n, r (6 dp;
    *         NULL when either variance is 0) */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    require(cols.distinct.size == cols.size, "corrMatrix columns must be distinct")
    // try_cast + complete-case filter on the CAST columns (the Moments
    // discipline, Moments.scala:43): an out-of-contract value must drop
    // the whole row consistently — a plain cast would null it (non-ANSI)
    // or throw (ANSI), and a nulled row would still count in n while
    // being excluded from the sums (half-counting)
    val complete = df
      .select(cols.map(c => col(c).try_cast("decimal(18,4)").as(s"__c_$c")): _*)
      .filter(cols.map(c => col(s"__c_$c").isNotNull).reduce(_ && _))
    val dec = cols.map(c => c -> col(s"__c_$c")).toMap
    val sumAggs = cols.map(c => sum(dec(c)).as(s"__s_$c")) ++
      (for { i <- cols.indices; j <- i until cols.length } yield
        sum(dec(cols(i)) * dec(cols(j))).as(s"__p_${cols(i)}_${cols(j)}"))
    // ONE pass over the data; the 1-row sufficient-statistics frame
    // materializes once (localCheckpoint) so the per-pair union below
    // cannot re-execute the scan k(k−1)/2 times
    val agg = complete.agg(count(lit(1)).as("n"), sumAggs: _*).localCheckpoint()
    val pairRows = for { i <- cols.indices; j <- (i + 1) until cols.length }
      yield {
        val (a, b) = (cols(i), cols(j))
        val n = col("n").cast("double")
        val sa = col(s"__s_$a").cast("double")
        val sb = col(s"__s_$b").cast("double")
        val sab = col(s"__p_${a}_$b").cast("double")
        val saa = col(s"__p_${a}_$a").cast("double")
        val sbb = col(s"__p_${b}_$b").cast("double")
        val varA = n * saa - sa * sa
        val varB = n * sbb - sb * sb
        agg.select(lit(a).as("col_a"), lit(b).as("col_b"), col("n"),
          round(when(varA > 0 && varB > 0,
            (n * sab - sa * sb) / sqrt(varA * varB)), 6).as("r"))
      }
    pairRows.reduceLeft(_ unionByName _)
  }
}
