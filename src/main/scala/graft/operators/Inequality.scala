package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concentration / inequality measures over a per-entity mass column —
  * the Gini coefficient (Lorenz-curve area) and the Herfindahl-
  * Hirschman index (sum of squared shares), the standard answers to
  * "how concentrated is revenue / traffic / token mass within a
  * group?" for skew audits and mixture design.
  *
  * Arithmetic contract: masses route through DECIMAL(18,4), so every
  * sufficient statistic (Σx, Σi·x over rank-ordered rows, Σx², max x)
  * is an EXACT decimal — order- and partition-invariant. Each index
  * then evaluates as ONE fixed IEEE double tree over those exact sums,
  * spelled identically in the DuckDB oracle. The Gini rank sum Σi·x is
  * tie-order-invariant (equal masses contribute identically whichever
  * of the tied ranks they take), so row_number's nondeterminism among
  * ties cannot change the result.
  *
  * Scale posture: Gini is one per-key sort (WindowExec over the key
  * shuffle) + a map-combinable hash aggregation; HHI is a pure hash
  * aggregation (no sort at all). No joins, no O(n²).
  */
object Inequality {

  /** Per-key Gini coefficient of non-negative masses, by the sorted
    * rank formula G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) over ascending
    * masses (i = 1..n). 0 = perfect equality, → 1 − 1/n = one entity
    * holds everything.
    *
    * The Lorenz construction is undefined over negative masses, so a
    * group containing one reports NULL (as do zero-total groups);
    * NULL masses are excluded before ranking.
    *
    * @return one row per key group: n, total (exact decimal sum as
    *         double), gini (rounded to 6 dp)
    */
  def giniPerKey(df: DataFrame, keys: Seq[String], mass: Column): DataFrame = {
    require(keys.nonEmpty, "giniPerKey needs at least one key column")
    val x = mass.cast("decimal(18,4)")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__x"))
    val ranked = df
      .filter(mass.isNotNull)
      .select(keys.map(col) :+ x.as("__x"): _*)
      // DECIMAL(12,0) rank keeps the i·x product inside DECIMAL(31,4)
      // (a long rank would push the static product type past precision
      // 38, where Spark's cap kicks in)
      .withColumn("__i", row_number().over(w).cast("decimal(12,0)"))
    val agg = ranked.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(col("__x")).as("__sx"),
      sum(col("__x") * col("__i")).as("__si"),
      min(col("__x")).as("__minx"))
    val n = col("n").cast("double")
    val sx = col("__sx").cast("double")
    val si = col("__si").cast("double")
    agg.select(keys.map(col) ++ Seq(
      col("n"),
      sx.as("total"),
      round(when(col("__minx") >= 0 && sx > 0,
        (lit(2.0d) * si - (n + lit(1.0d)) * sx) / (n * sx)), 6)
        .as("gini")): _*)
  }

  /** Per-key Herfindahl-Hirschman index of shares — HHI = Σ(xᵢ/Σx)² =
    * Σxᵢ²/(Σx)² — plus the top-entity share. 1/n = perfectly even,
    * 1 = single entity. Accepts any non-negative mass column (shares
    * need not be pre-normalized); NULLs are excluded; zero-total
    * groups report NULL indices.
    *
    * @return one row per key group: n, total, hhi, top_share
    *         (indices rounded to 6 dp)
    */
  def hhiPerKey(df: DataFrame, keys: Seq[String], mass: Column): DataFrame = {
    require(keys.nonEmpty, "hhiPerKey needs at least one key column")
    val x = mass.cast("decimal(18,4)")
    val agg = df
      .filter(mass.isNotNull)
      .select(keys.map(col) :+ x.as("__x"): _*)
      .groupBy(keys.map(col): _*).agg(
        count(lit(1)).as("n"),
        sum(col("__x")).as("__sx"),
        sum(col("__x") * col("__x")).as("__sxx"),
        max(col("__x")).as("__mx"))
    val sx = col("__sx").cast("double")
    val sxx = col("__sxx").cast("double")
    val mx = col("__mx").cast("double")
    agg.select(keys.map(col) ++ Seq(
      col("n"),
      sx.as("total"),
      round(when(sx > 0, sxx / (sx * sx)), 6).as("hhi"),
      round(when(sx > 0, mx / sx), 6).as("top_share")): _*)
  }
}
