package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-based statistics — Spearman rank correlation and the
  * Mann-Whitney U test (Wilcoxon rank-sum), the two workhorse
  * distribution-free diagnostics, re-expressed relationally with the
  * repo's exact-arithmetic discipline.
  *
  * The device that makes both bit-portable: the tie-averaged rank of a
  * row is (minRank + maxRank) / 2, which is a half-integer — so both
  * operators work throughout with the DOUBLED rank
  *
  *   r2 = minRank + maxRank = rank() + count(*) over (… RANGE UNBOUNDED
  *        PRECEDING..CURRENT ROW)
  *
  * an exact BIGINT (the RANGE frame's upper edge includes all peers, so
  * the running count at a row IS its max rank). Pearson correlation is
  * invariant under the affine map r ↦ 2r, and every Mann-Whitney
  * quantity is spelled in doubled form, so no halving ever happens
  * before the final IEEE tree. Sufficient statistics are exact
  * DECIMAL(38,0) sums of BIGINTs — order- and partition-invariant —
  * and each output coefficient is ONE fixed double tree over them,
  * spelled identically in the DuckDB oracle.
  *
  * Scale posture: ranking is per-key WindowExecs over the SAME
  * partitioning (one shuffle on the keys, sorts reuse the exchange);
  * the reduction is a map-combinable hash aggregation. No self-joins,
  * no O(n²) pair enumeration (Kendall's tau is deliberately absent:
  * its concordant-pair count is inherently quadratic relationally).
  */
object RankStats {

  /** Doubled tie-averaged rank of `v` within each key partition:
    * rank() + running peer-inclusive count = minRank + maxRank. */
  private def doubledRank(keys: Seq[String], v: Column): Column = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(v)
    val wr = w.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    rank().over(w) + count(lit(1)).over(wr)
  }

  /** Per-key Spearman rank correlation ρ of `y` vs `x`, with the
    * standard tie-averaged (fractional) ranks.
    *
    * @return one row per key group: n, rho (rounded to 6 dp; NULL when
    *         either variable is constant within the group — zero rank
    *         variance is a 0/0, reported as NULL not NaN)
    */
  def spearmanPerKey(df: DataFrame, keys: Seq[String],
                     x: Column, y: Column): DataFrame = {
    require(keys.nonEmpty, "spearmanPerKey needs at least one key column")
    val ranked = df
      .filter(x.isNotNull && y.isNotNull)
      .select(keys.map(col) ++ Seq(
        doubledRank(keys, x).as("__rx"),
        doubledRank(keys, y).as("__ry")): _*)
    val rx = col("__rx").cast("decimal(38,0)")
    val ry = col("__ry").cast("decimal(38,0)")
    val agg = ranked.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(rx).as("__sx"), sum(ry).as("__sy"),
      sum(rx * ry).as("__sxy"),
      sum(rx * rx).as("__sxx"), sum(ry * ry).as("__syy"))
    val n = col("n").cast("double")
    val sx = col("__sx").cast("double")
    val sy = col("__sy").cast("double")
    val sxy = col("__sxy").cast("double")
    val sxx = col("__sxx").cast("double")
    val syy = col("__syy").cast("double")
    val varXN = n * sxx - sx * sx
    val varYN = n * syy - sy * sy
    agg.select(keys.map(col) ++ Seq(
      col("n"),
      round(when(varXN > 0 && varYN > 0,
        (n * sxy - sx * sy) / sqrt(varXN * varYN)), 6).as("rho")): _*)
  }

  /** Per-key two-sample Mann-Whitney U test: group `a` vs group `b`
    * of `groupCol`, ranking `value` over BOTH groups combined.
    *
    * Exact quantities (doubled-rank arithmetic, so each is a BIGINT or
    * an exact half-integer):
    *  - u_a, u_b: the U statistics (u_a + u_b = n_a·n_b)
    *  - z: the tie-corrected normal approximation (NO continuity
    *    correction — the convention is pinned in the oracle), i.e.
    *      z = (U_a − n_a·n_b/2) / σ,
    *      σ² = n_a·n_b/12 · (N+1 − Σ(t³−t)/(N·(N−1)))
    *    with Σ(t³−t) the exact tie-group correction, evaluated as one
    *    fixed IEEE tree over the exact sums. NULL (not NaN/∞) when a
    *    group is empty, N < 2, or all values tie (σ = 0).
    *
    * Rows whose group is neither `a` nor `b` and NULL values are
    * excluded before ranking.
    *
    * @return one row per key group: n_a, n_b, u_a, u_b (exact, as
    *         doubles), z (rounded to 6 dp)
    */
  def mannWhitney(df: DataFrame, keys: Seq[String], groupCol: Column,
                  a: String, b: String, value: Column): DataFrame = {
    require(keys.nonEmpty, "mannWhitney needs at least one key column")
    val base = df
      .filter(groupCol.isin(a, b) && value.isNotNull)
      .select(keys.map(col) ++ Seq(
        (groupCol === a).as("__isa"), value.as("__v")): _*)
    val ranked = base.select(keys.map(col) ++ Seq(
      col("__isa"), col("__v"),
      doubledRank(keys, col("__v")).cast("decimal(38,0)").as("__r2")): _*)
    // tie correction: Σ(t³ − t) over the per-(key, value) tie groups.
    // The cube is computed in DECIMAL(12,0)³ → DECIMAL(38,0) — NOT in
    // BIGINT, which would silently overflow once a tie group passes
    // ~2.1M rows (cube root of 2⁶³) at large scale factors.
    val ties = ranked.groupBy(keys.map(col) :+ col("__v"): _*)
      .agg(count(lit(1)).cast("decimal(12,0)").as("__t"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__t") * col("__t") * col("__t") - col("__t"))
        .as("__tcorr"))
    val agg = ranked.groupBy(keys.map(col): _*).agg(
      sum(when(col("__isa"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("__isa"), 1L).otherwise(0L)).as("n_b"),
      sum(when(col("__isa"), col("__r2")).otherwise(lit(0).cast("decimal(38,0)"))).as("__r2a"))
      .join(ties, keys)
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val nT = col("n_a") + col("n_b")
    val nd = nT.cast("double")
    // doubled U_a: 2·U_a = 2·R_a − n_a(n_a+1) = Σr2_a − n_a(n_a+1)
    val du = col("__r2a").cast("double") - na * (na + lit(1.0d))
    val ua = du / lit(2.0d) // exact: du is an even-or-odd integer, /2 halves exactly
    val tcorr = col("__tcorr").cast("double")
    // 4σ² = n_a·n_b/3 · (N+1 − T/(N(N−1))) ⇒ z = (2U_a − n_a·n_b)/√(4σ²)
    val var4 = na * nb / lit(3.0d) *
      (nd + lit(1.0d) - tcorr / (nd * (nd - lit(1.0d))))
    val z = when(col("n_a") > 0 && col("n_b") > 0 && var4 > 0,
      (du - na * nb) / sqrt(var4))
    agg.select(keys.map(col) ++ Seq(
      col("n_a"), col("n_b"),
      ua.as("u_a"),
      (na * nb - ua).as("u_b"),
      round(z, 6).as("z")): _*)
  }

  /** Per-key Kruskal-Wallis H test — the k-sample generalization of
    * Mann-Whitney: does `value`'s distribution differ across the
    * dynamic groups of `groupCol`?
    *
    * Exactness: with doubled ranks, H = 3/(N(N+1))·Σ_g S2_g²/n_g −
    * 3(N+1) (S2_g = Σ doubled ranks in group g). The Σ over groups has
    * per-group denominators, so each term quantizes to a 9-dp integer
    * with one integer division — the chi-square/RBO device, order-free:
    *
    *   term_g = (S2_g² · 10⁹) div (n_g · N · (N+1))
    *
    * then H = 3·Σterm/10⁹ − 3(N+1) as one IEEE tree, and the tie
    * correction H_c = H / (1 − Σ(t³−t)/(N³−N)) in doubles. Contract:
    * per-key N ≤ 10⁷ (keeps S2²·10⁹ inside DECIMAL(38,0) and every
    * quotient inside BIGINT; quantization error ≤ 3k·10⁻⁹, invisible at
    * the 6-dp output).
    *
    * @return one row per key: n, n_groups, h, h_corrected (6 dp; NULL
    *         when n < 2, fewer than 2 groups, or all values tie) */
  def kruskalWallis(df: DataFrame, keys: Seq[String], groupCol: Column,
                    value: Column): DataFrame = {
    require(keys.nonEmpty, "kruskalWallis needs at least one key column")
    val base = df.filter(groupCol.isNotNull && value.isNotNull)
      .select(keys.map(col) ++ Seq(groupCol.as("__g"), value.as("__v")): _*)
    val ranked = base.select(keys.map(col) ++ Seq(col("__g"), col("__v"),
      doubledRank(keys, col("__v")).cast("decimal(38,0)").as("__r2")): _*)
    val ties = ranked.groupBy(keys.map(col) :+ col("__v"): _*)
      .agg(count(lit(1)).cast("decimal(12,0)").as("__t"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__t") * col("__t") * col("__t") - col("__t"))
        .as("__tcorr"))
    val perGroup = ranked.groupBy(keys.map(col) :+ col("__g"): _*)
      .agg(count(lit(1)).as("__ng"), sum(col("__r2")).as("__s2"))
    val perKey = perGroup.groupBy(keys.map(col): _*)
      .agg(sum(col("__ng")).as("__n"), count(lit(1)).as("n_groups"))
    val terms = perGroup.join(perKey, keys)
      .withColumn("__term", expr(
        """(__s2 * __s2 * 1000000000) DIV
           (CAST(__ng AS DECIMAL(38,0)) * __n * (__n + 1))"""))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__term").cast("decimal(38,0)")).as("__tsum"),
        max(col("__n")).as("n"), max(col("n_groups")).as("n_groups"))
      .join(ties, keys)
    val nd = col("n").cast("double")
    val h = lit(3.0d) * col("__tsum").cast("double") / lit(1.0e9d) -
      lit(3.0d) * (nd + lit(1.0d))
    val c = lit(1.0d) - col("__tcorr").cast("double") /
      (nd * nd * nd - nd)
    val defined = col("n") >= 2 && col("n_groups") >= 2 && c > 0
    terms.select(keys.map(col) ++ Seq(
      col("n"), col("n_groups"),
      round(when(defined, h), 6).as("h"),
      round(when(defined, h / c), 6).as("h_corrected")): _*)
  }
}
