package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Higher-moment shape statistics — per-key skewness, kurtosis, and the
  * Jarque-Bera normality statistic — from exact DECIMAL power sums.
  *
  * Input contract: |value| < 10⁴ with ≤ 4 decimal places (the value
  * routes through DECIMAL(8,4), so x⁴ stays inside DECIMAL(35,16) and
  * every power sum is EXACT — a wider input type would push x³/x⁴ past
  * precision 38 where Spark silently reduces scale and DuckDB errors
  * out; callers with larger measures rescale first, which changes
  * neither skewness, kurtosis, nor JB — all three are scale-invariant).
  * Values outside the contract (|x| ≥ 10⁴) are excluded CONSISTENTLY
  * — from n and from every power sum, via try_cast, under every ansi
  * setting — never half-counted.
  *
  * From the exact sums (n, Σx, Σx², Σx³, Σx⁴) the central moments and
  * the statistics evaluate as one fixed IEEE tree each, spelled
  * identically in the DuckDB oracle:
  *
  *   m1 = Σx/n,  r2 = Σx²/n,  r3 = Σx³/n,  r4 = Σx⁴/n
  *   m2 = r2 − m1²
  *   m3 = r3 − 3·m1·r2 + 2·m1³
  *   m4 = r4 − 4·m1·r3 + 6·m1²·r2 − 3·m1⁴
  *   skew = m3 / (m2·√m2)          (√ is IEEE-correctly-rounded; no pow)
  *   kurt = m4 / m2²               (raw kurtosis; normal = 3)
  *   jb   = n/6 · (skew² + ¼·(kurt−3)²)
  *
  * Zero-variance groups report NULL (not NaN/∞).
  *
  * Scale posture: ONE map-combinable hash aggregation — the textbook
  * moment-sketch shape; at 100 TB this runs at scan speed.
  */
object Moments {

  /** @return one row per key group: n, mean, variance (population m2),
    *         skewness, kurtosis (raw), jb — all 6 dp, NULL on zero
    *         variance */
  def skewKurt(df: DataFrame, keys: Seq[String], value: Column): DataFrame = {
    require(keys.nonEmpty, "skewKurt needs at least one key column")
    // try_cast + filter on the CAST column, not a plain cast + raw-
    // column filter: an out-of-contract value (|x| ≥ 10⁴) try_casts to
    // NULL under EVERY ansi setting (a plain cast throws under ANSI and
    // nulls silently otherwise), and filtering on the raw column would
    // count such a row in n while excluding it from every power sum —
    // silently wrong mean/variance/skew.
    val x = value.try_cast("decimal(8,4)")
    val agg = df.filter(x.isNotNull)
      .groupBy(keys.map(col): _*).agg(
        count(lit(1)).as("n"),
        sum(x).as("__s1"),
        sum(x * x).as("__s2"),
        sum(x * x * x).as("__s3"),
        sum(x * x * x * x).as("__s4"))
    val nd = col("n").cast("double")
    val m1 = col("__s1").cast("double") / nd
    val r2 = col("__s2").cast("double") / nd
    val r3 = col("__s3").cast("double") / nd
    val r4 = col("__s4").cast("double") / nd
    val staged = agg
      .withColumn("__m1", m1)
      .withColumn("__m2", r2 - m1 * m1)
      .withColumn("__m3", r3 - lit(3.0d) * m1 * r2
        + lit(2.0d) * m1 * m1 * m1)
      .withColumn("__m4", r4 - lit(4.0d) * m1 * r3
        + lit(6.0d) * m1 * m1 * r2 - lit(3.0d) * m1 * m1 * m1 * m1)
    val m2c = col("__m2")
    val skew = col("__m3") / (m2c * sqrt(m2c))
    val kurt = col("__m4") / (m2c * m2c)
    staged.select(keys.map(col) ++ Seq(
      col("n"),
      round(col("__m1"), 6).as("mean"),
      round(m2c, 6).as("variance"),
      round(when(m2c > 0, skew), 6).as("skewness"),
      round(when(m2c > 0, kurt), 6).as("kurtosis"),
      round(when(m2c > 0,
        nd / lit(6.0d) * (skew * skew
          + lit(0.25d) * (kurt - lit(3.0d)) * (kurt - lit(3.0d)))), 6)
        .as("jb")): _*)
  }
}
