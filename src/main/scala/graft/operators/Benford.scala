package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benford's-law first-digit audit — the classic fraud / data-quality
  * screen: how far does the leading-digit distribution of a positive
  * measure sit from log10(1 + 1/d)?
  *
  * Portability choices (both are the point of the design, not
  * shortcuts):
  *  - The leading digit comes from the DECIMAL STRING of floor(value)
  *    (one substring), not from log10/pow — libm transcendentals are
  *    not correctly-rounded and may differ across engines in the last
  *    ulp, but integer-to-string is exact everywhere. Values < 1 are
  *    excluded (their leading digit lives below the integer part;
  *    documenting the domain beats a cross-engine divergence in
  *    scale-hunting arithmetic), as are NULLs and non-positives.
  *  - The expected shares are HARDCODED double literals (17
  *    significant digits, the shortest round-trip representation) —
  *    the identical constants appear in the DuckDB oracle, so the
  *    deviation column is one IEEE tree over exact counts and shared
  *    literals with no transcendental call on either side.
  *
  * Scale posture: one hash aggregation to ≤ 9 rows per key group, a
  * margin re-aggregation, one (key)-equi-join of two category-sized
  * frames. Digits with zero observations still emit a row (expected
  * share is a statement about the law, not the data) via a per-key
  * digit scaffold built from the ≤-9-row aggregate itself.
  */
object Benford {

  /** Expected Benford share log10(1 + 1/d) for d = 1..9, as shortest
    * round-trip double literals (mirrored verbatim in oracles). */
  val Expected: Seq[(Int, Double)] = Seq(
    1 -> 0.3010299956639812,
    2 -> 0.17609125905568124,
    3 -> 0.12493873660829992,
    4 -> 0.09691001300805642,
    5 -> 0.07918124604762482,
    6 -> 0.06694678963061322,
    7 -> 0.05799194697768673,
    8 -> 0.05115252244738129,
    9 -> 0.04575749056067514)

  /** Per-key leading-digit distribution of `value` vs Benford.
    *
    * @return 9 rows per key group (digit 1..9): n_d (exact count,
    *         0 for unobserved digits), n (group total over the
    *         admitted domain value ≥ 1), obs_share, exp_share,
    *         abs_dev = |obs − exp| (6 dp)
    */
  def firstDigitAudit(df: DataFrame, keys: Seq[String],
                      value: Column): DataFrame = {
    require(keys.nonEmpty, "firstDigitAudit needs at least one key column")
    val counted = df
      .filter(value.isNotNull && value >= 1)
      .select(keys.map(col) :+
        substring(floor(value).cast("long").cast("string"), 1, 1)
          .cast("int").as("digit"): _*)
      .groupBy(keys.map(col) :+ col("digit"): _*)
      .agg(count(lit(1)).as("n_d"))
    val totals = counted.groupBy(keys.map(col): _*)
      .agg(sum(col("n_d")).as("n"))
    val expected = Expected.map { case (d, e) =>
      struct(lit(d).as("digit"), lit(e).as("exp_share"))
    }
    val scaffold = totals.select(keys.map(col) ++ Seq(col("n"),
      explode(array(expected: _*)).as("de")): _*)
      .select(keys.map(col) ++ Seq(col("n"), col("de.digit").as("digit"),
        col("de.exp_share").as("exp_share")): _*)
    val obs = scaffold.join(counted, keys :+ "digit", "left")
      .withColumn("n_d", coalesce(col("n_d"), lit(0L)))
    val share = col("n_d").cast("double") / col("n").cast("double")
    obs.select(keys.map(col) ++ Seq(
      col("digit"), col("n_d"), col("n"),
      round(share, 6).as("obs_share"),
      col("exp_share"),
      round(abs(share - col("exp_share")), 6).as("abs_dev")): _*)
  }
}
