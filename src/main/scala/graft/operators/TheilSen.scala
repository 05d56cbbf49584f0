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
}
