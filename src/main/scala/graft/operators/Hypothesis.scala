package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Contingency-table hypothesis tests — Pearson's chi-square test of
  * independence and the two-proportion z-test — as pure hash
  * aggregations over exact counts.
  *
  * The portability problem chi-square poses is unique in this repo: the
  * statistic is a SUM of per-cell ratios (O−E)²/E, and a float sum's
  * value depends on partial-sum order — Spark's partition order is
  * nondeterministic, so a naive double sum cannot hash-match any
  * oracle. The fix: quantize each cell's term to a fixed 6-dp integer
  * with explicit integer division,
  *
  *   E6     = (Ra·Cb·10⁶) div N          (expected count, 6-dp units)
  *   D6     = O·10⁶ − E6                 (observed − expected, 6-dp)
  *   term   = D6² div E6                 (= (O−E)²/E in 6-dp units)
  *
  * — all exact DECIMAL(38,0) arithmetic, so the cell terms are
  * order-free integers, their sum is exact, and χ² = Σterm/10⁶
  * reproduces bit-for-bit on any engine that spells the same integer
  * divisions (the DuckDB oracle does). The deliberate 1e-6 quantization
  * of E is part of the operator's contract (documented here), not
  * noise: |χ²_quantized − χ²_float| < cells·1e-5 for realistic tables.
  * Overflow headroom: D6² ≤ (N·10⁶)² needs N ≲ 10¹² rows per key group
  * — DECIMAL(38,0) holds to 10³⁸.
  *
  * Scale posture: one hash aggregation to cells, two re-aggregations to
  * margins (rows bounded by |A| and |B| category counts, not corpus
  * size), two margin joins on (key, category) — every frame after the
  * first aggregation is category-sized. No windows, no sorts.
  */
object Hypothesis {

  private val M = "1000000" // 10^6: the fixed quantization scale

  /** Per-key Pearson chi-square test of independence between the
    * categorical columns `a` and `b`.
    *
    * @return one row per key group: n (total count), r (distinct a),
    *         c (distinct b), dof = (r−1)(c−1), chi2 (6-dp-quantized
    *         statistic as a double), cramers_v (effect size
    *         √(χ²/(n·min(r−1,c−1))), NULL when dof = 0)
    */
  def chiSquareIndependence(df: DataFrame, keys: Seq[String],
                            a: Column, b: Column): DataFrame = {
    require(keys.nonEmpty, "chiSquareIndependence needs at least one key column")
    val cells = df
      .filter(a.isNotNull && b.isNotNull)
      .groupBy(keys.map(col) ++ Seq(a.as("__a"), b.as("__b")): _*)
      .agg(count(lit(1)).as("__o"))
      .localCheckpoint() // feeds both margins and the cell join once
    val rowM = cells.groupBy(keys.map(col) :+ col("__a"): _*)
      .agg(sum(col("__o")).as("__ra"))
    val colM = cells.groupBy(keys.map(col) :+ col("__b"): _*)
      .agg(sum(col("__o")).as("__cb"))
    val tot = cells.groupBy(keys.map(col): _*)
      .agg(sum(col("__o")).as("n"),
        countDistinct(col("__a")).as("r"),
        countDistinct(col("__b")).as("c"))
    // The full r×c grid, NOT just observed cells: an empty cell still
    // contributes (0−E)²/E = E to the statistic. The grid is the per-key
    // cross of the two margin frames — category-sized, never corpus-sized.
    val grid = rowM.join(colM, keys)
    val joined = grid
      .join(cells, keys ++ Seq("__a", "__b"), "left")
      .withColumn("__o", coalesce(col("__o"), lit(0L)))
      .join(tot, keys)
    // DIV is exact integer division (BIGINT result — in range because
    // e6 ≤ N·10⁶ and term ≤ N·10⁶, both < 2⁶³ at the documented N
    // bound); GREATEST(…, 1) pins the convention for the pathological
    // E < 10⁻⁶ cell (possible when N > 10⁶·Ra·Cb) instead of a NULL/
    // error divergence between engines.
    val staged = joined
      .withColumn("__e6",
        expr(s"GREATEST((CAST(__ra AS DECIMAL(38,0)) * __cb * $M) DIV n, 1)"))
      .withColumn("__d6",
        expr(s"CAST(__o AS DECIMAL(38,0)) * $M - __e6"))
      .withColumn("__term", expr("(__d6 * __d6) DIV __e6"))
    val agg = staged
      .groupBy(keys.map(col) ++ Seq(col("n"), col("r"), col("c")): _*)
      .agg(sum(col("__term").cast("decimal(38,0)")).as("__chi6"))
    val nD = col("n").cast("double")
    val chi2 = col("__chi6").cast("double") / lit(1000000.0d)
    val minDim = least(col("r"), col("c")).cast("double") - lit(1.0d)
    agg.select(keys.map(col) ++ Seq(
      col("n"), col("r"), col("c"),
      ((col("r") - 1) * (col("c") - 1)).as("dof"),
      round(chi2, 6).as("chi2"),
      round(when(minDim > 0, sqrt(chi2 / (nD * minDim))), 6)
        .as("cramers_v")): _*)
  }

  /** Per-key Cochran-Armitage trend test: is the success proportion
    * monotonically associated with an ORDERED category score? (The
    * dose-response screen — "does the high-value-order rate trend with
    * priority rank?")
    *
    * With integer category scores w, counts nᵢ and successes xᵢ per
    * category, X = Σx, N = Σn, the statistic multiplies through by N
    * so every sufficient quantity is an EXACT integer (DECIMAL sums —
    * no quantization needed, unlike chi-square's per-cell rationals):
    *
    *   z = (N·Σwx − X·Σwn) / √( X·(N−X)·(N·Σw²n − (Σwn)²) / N )
    *
    * — one fixed IEEE tree over six exact totals, spelled identically
    * in the oracle. NULL when the variance factor is 0 (all successes,
    * none, or a single category). z > 0 = proportion rises with score.
    *
    * Scale posture: ONE map-combinable hash aggregation (the w-moments
    * are sums); nothing downstream exceeds one row per key.
    */
  def trendTest(df: DataFrame, keys: Seq[String], score: Column,
                success: Column): DataFrame = {
    require(keys.nonEmpty, "trendTest needs at least one key column")
    val w = score.cast("decimal(12,0)")
    val s = success.cast("boolean")
    val base = df.filter(score.isNotNull && success.isNotNull)
      .select(keys.map(col) ++ Seq(w.as("__w"), s.as("__s")): _*)
    val agg = base.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(when(col("__s"), 1L).otherwise(0L)).as("x"),
      sum(col("__w")).as("__swn"),
      sum(when(col("__s"), col("__w"))
        .otherwise(lit(0).cast("decimal(12,0)"))).as("__swx"),
      sum(col("__w") * col("__w")).as("__sw2n"))
    val nD = col("n").cast("double"); val xD = col("x").cast("double")
    val swn = col("__swn").cast("double")
    val swx = col("__swx").cast("double")
    val sw2n = col("__sw2n").cast("double")
    val num = nD * swx - xD * swn
    val varf = xD * (nD - xD) * (nD * sw2n - swn * swn) / nD
    agg.select(keys.map(col) ++ Seq(
      col("n"), col("x"),
      round(when(col("n") > 0, xD / nD), 6).as("p"),
      round(when(varf > 0, num / sqrt(varf)), 6).as("z")): _*)
  }

  /** Per-key Cohen's kappa — chance-corrected agreement between two
    * categorical labelings of the same rows (annotator agreement,
    * classifier-vs-heuristic drift, duplicate-labeler QA):
    *
    *   κ = (p_o − p_e)/(1 − p_e)  with  p_o = D/N,  p_e = P/N²
    *
    * (D = agreeing rows, P = Σ_label rowMargin·colMargin), which
    * clears denominators to ONE exact-integer expression
    *
    *   κ = (D·N − P) / (N² − P)
    *
    * — every input an exact count, products in DECIMAL(38,0) (BIGINT
    * N² overflows past ~3·10⁹ rows per key), one IEEE division. NULL
    * when N² = P (both raters constant — chance agreement is 1 and κ
    * is undefined).
    *
    * Scale posture: one hash aggregation to label-pair cells; margins
    * and the product join are label-cardinality-sized.
    */
  def cohensKappa(df: DataFrame, keys: Seq[String], raterA: Column,
                  raterB: Column): DataFrame = {
    require(keys.nonEmpty, "cohensKappa needs at least one key column")
    val cells = df.filter(raterA.isNotNull && raterB.isNotNull)
      .groupBy(keys.map(col) ++ Seq(raterA.as("__a"), raterB.as("__b")): _*)
      .agg(count(lit(1)).as("__o"))
      .localCheckpoint() // margins + diagonal + total all read it
    val tot = cells.groupBy(keys.map(col): _*).agg(
      sum(col("__o")).as("n"),
      sum(when(col("__a") === col("__b"), col("__o")).otherwise(0L))
        .as("__d"))
    val rowM = cells.groupBy(keys.map(col) :+ col("__a"): _*)
      .agg(sum(col("__o")).as("__ra"))
    val colM = cells.groupBy(keys.map(col) :+ col("__b"): _*)
      .agg(sum(col("__o")).as("__cb"))
    // P = Σ over labels of rowMargin·colMargin — labels missing from a
    // side contribute 0, so the inner join on the label is exact
    val pSum = rowM
      .withColumnRenamed("__a", "__l")
      .join(colM.withColumnRenamed("__b", "__l"), keys :+ "__l")
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__ra").cast("decimal(38,0)") * col("__cb")).as("__p"))
    val joined = tot.join(pSum, keys)
    val nD = col("n").cast("double")
    val num = col("__d").cast("decimal(38,0)") * col("n") - col("__p")
    val den = col("n").cast("decimal(38,0)") * col("n") - col("__p")
    joined.select(keys.map(col) ++ Seq(
      col("n"), col("__d").as("agree"),
      round(col("__d").cast("double") / nD, 6).as("p_o"),
      round(col("__p").cast("double") / (nD * nD), 6).as("p_e"),
      round(when(den =!= 0, num.cast("double") / den.cast("double")), 6)
        .as("kappa")): _*)
  }

  /** Per-key two-sample Kolmogorov-Smirnov statistic: the max vertical
    * distance between the empirical CDFs of groups `a` and `b` of
    * `groupCol` over `value`.
    *
    * Exactness device: D = max |F_a − F_b| evaluates as
    * max |cum_a·n_b − cum_b·n_a| over the combined value order — an
    * EXACT integer per row (peer-inclusive RANGE cumulative counts, so
    * ties resolve to the same CDF step on both engines) — followed by
    * ONE division by n_a·n_b. The scaled statistic
    * √(n_a·n_b/(n_a+n_b))·D is one further IEEE tree. (The asymptotic
    * p-value is deliberately absent: the Kolmogorov series needs exp(),
    * which is not correctly-rounded across engines — callers compare
    * ks_stat against the standard critical values.)
    *
    * Scale posture: one shuffle on the keys, two running-count window
    * frames over the same sort, a map-combinable max. The products ride
    * DECIMAL(38,0) — BIGINT would overflow at n ≳ 3M per group.
    *
    * @return one row per key: n_a, n_b, d (6 dp), ks_stat (6 dp); keys
    *         with an empty side report NULL d/ks_stat
    */
  def ksTest(df: DataFrame, keys: Seq[String], groupCol: Column,
             a: String, b: String, value: Column): DataFrame = {
    require(keys.nonEmpty, "ksTest needs at least one key column")
    import org.apache.spark.sql.expressions.Window
    val base = df
      .filter(groupCol.isin(a, b) && value.isNotNull)
      .select(keys.map(col) ++ Seq(
        (groupCol === a).as("__isa"), value.as("__v")): _*)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__v"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = base.select(keys.map(col) ++ Seq(
      sum(when(col("__isa"), 1L).otherwise(0L)).over(w)
        .cast("decimal(38,0)").as("__ca"),
      sum(when(!col("__isa"), 1L).otherwise(0L)).over(w)
        .cast("decimal(38,0)").as("__cb")): _*)
    val totals = base.groupBy(keys.map(col): _*).agg(
      sum(when(col("__isa"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("__isa"), 1L).otherwise(0L)).as("n_b"))
    val dmax = cum.join(totals, keys)
      .groupBy(keys.map(col) ++ Seq(col("n_a"), col("n_b")): _*)
      .agg(max(abs(col("__ca") * col("n_b") - col("__cb") * col("n_a")))
        .as("__dmax"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val d = col("__dmax").cast("double") / (na * nb)
    dmax.select(keys.map(col) ++ Seq(
      col("n_a"), col("n_b"),
      round(when(col("n_a") > 0 && col("n_b") > 0, d), 6).as("d"),
      round(when(col("n_a") > 0 && col("n_b") > 0,
        sqrt(na * nb / (na + nb)) * d), 6).as("ks_stat")): _*)
  }

  /** Per-key Welch's t-test (unequal variances): does the mean of
    * `value` differ between groups `a` and `b`?
    *
    * Sufficient statistics (n, Σx, Σx² per side) are exact
    * DECIMAL(18,4)-routed sums in one hash aggregation; t and the
    * Welch-Satterthwaite degrees of freedom are each ONE fixed IEEE
    * tree over them (sample variances, n−1 denominators). Groups with
    * n < 2 on either side, or zero pooled standard error, report NULL.
    *
    * @return one row per key: n_a, n_b, mean_a, mean_b, t, df
    *         (Welch-Satterthwaite, fractional), all stats 6 dp
    */
  def welchT(df: DataFrame, keys: Seq[String], groupCol: Column,
             a: String, b: String, value: Column): DataFrame = {
    require(keys.nonEmpty, "welchT needs at least one key column")
    val x = value.cast("decimal(18,4)")
    val base = df.filter(groupCol.isin(a, b) && value.isNotNull)
      .select(keys.map(col) ++ Seq((groupCol === a).as("__isa"),
        x.as("__x")): _*)
    def side(isA: Boolean, suffix: String) = Seq(
      sum(when(col("__isa") === isA, 1L).otherwise(0L)).as(s"n_$suffix"),
      sum(when(col("__isa") === isA, col("__x"))).as(s"__s_$suffix"),
      sum(when(col("__isa") === isA, col("__x") * col("__x")))
        .as(s"__q_$suffix"))
    val aggs = side(isA = true, "a") ++ side(isA = false, "b")
    val agg = base.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val sa = col("__s_a").cast("double"); val sb = col("__s_b").cast("double")
    val qa = col("__q_a").cast("double"); val qb = col("__q_b").cast("double")
    val ma = sa / na; val mb = sb / nb
    // sample variance: (Σx² − (Σx)²/n) / (n−1)
    val va = (qa - sa * sa / na) / (na - lit(1.0d))
    val vb = (qb - sb * sb / nb) / (nb - lit(1.0d))
    val sea = va / na; val seb = vb / nb
    val se2 = sea + seb
    val ok = col("n_a") > 1 && col("n_b") > 1 && se2 > 0
    val t = (ma - mb) / sqrt(se2)
    val dfW = se2 * se2 /
      (sea * sea / (na - lit(1.0d)) + seb * seb / (nb - lit(1.0d)))
    agg.select(keys.map(col) ++ Seq(
      col("n_a"), col("n_b"),
      round(when(col("n_a") > 0, ma), 6).as("mean_a"),
      round(when(col("n_b") > 0, mb), 6).as("mean_b"),
      round(when(ok, t), 6).as("t"),
      round(when(ok, dfW), 6).as("df")): _*)
  }

  /** Per-key two-proportion z-test (pooled): does P(success | group a)
    * differ from P(success | group b)? Counts are exact; p̂-hats and z
    * are each one fixed IEEE tree over them.
    *
    * @return one row per key group: n_a, n_b, x_a, x_b (successes),
    *         p_a, p_b (one division each), z (pooled-variance z score,
    *         rounded 6 dp; NULL when a group is empty or the pooled
    *         proportion is degenerate 0 or 1)
    */
  def proportionsZTest(df: DataFrame, keys: Seq[String], groupCol: Column,
                       a: String, b: String, success: Column): DataFrame = {
    require(keys.nonEmpty, "proportionsZTest needs at least one key column")
    val base = df.filter(groupCol.isin(a, b))
      .select(keys.map(col) ++ Seq((groupCol === a).as("__isa"),
        success.cast("boolean").as("__s")): _*)
    val agg = base.groupBy(keys.map(col): _*).agg(
      sum(when(col("__isa"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("__isa"), 1L).otherwise(0L)).as("n_b"),
      sum(when(col("__isa") && col("__s"), 1L).otherwise(0L)).as("x_a"),
      sum(when(!col("__isa") && col("__s"), 1L).otherwise(0L)).as("x_b"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val xa = col("x_a").cast("double"); val xb = col("x_b").cast("double")
    val pa = xa / na; val pb = xb / nb
    val pp = (xa + xb) / (na + nb)
    val denom = sqrt(pp * (lit(1.0d) - pp) * (lit(1.0d) / na + lit(1.0d) / nb))
    agg.select(keys.map(col) ++ Seq(
      col("n_a"), col("n_b"), col("x_a"), col("x_b"),
      round(when(col("n_a") > 0, pa), 6).as("p_a"),
      round(when(col("n_b") > 0, pb), 6).as("p_b"),
      round(when(col("n_a") > 0 && col("n_b") > 0 &&
        pp > 0 && pp < 1, (pa - pb) / denom), 6).as("z")): _*)
  }

  /** Cohen's d effect size between two groups, per key — the magnitude
    * companion to the Welch t-test (a significant t with a tiny d is
    * the classic big-data false alarm; report both):
    *
    *   d = (m_a − m_b) / s_pooled,
    *   s²_pooled = ((Q_a − S_a²/n_a) + (Q_b − S_b²/n_b)) / (n_a + n_b − 2)
    *
    * from exact DECIMAL(8,4)-routed sums (the Moments try_cast
    * contract), one fixed IEEE tree — full oracle parity.
    *
    * @return one row per key: n_a, n_b, mean_a, mean_b, d (6 dp; NULL
    *         when a group has < 2 rows or the pooled variance is 0) */
  def cohensD(df: DataFrame, keys: Seq[String], groupCol: Column,
              a: String, b: String, value: Column): DataFrame = {
    require(keys.nonEmpty, "cohensD needs at least one key column")
    val x = value.try_cast("decimal(8,4)")
    val base = df.filter(groupCol.isin(a, b) && x.isNotNull)
      .select(keys.map(col) ++ Seq((groupCol === a).as("__isa"),
        x.as("__x")): _*)
    val agg = base.groupBy(keys.map(col): _*).agg(
      sum(when(col("__isa"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("__isa"), 1L).otherwise(0L)).as("n_b"),
      sum(when(col("__isa"), col("__x"))).as("__sa"),
      sum(when(!col("__isa"), col("__x"))).as("__sb"),
      sum(when(col("__isa"), col("__x") * col("__x"))).as("__qa"),
      sum(when(!col("__isa"), col("__x") * col("__x"))).as("__qb"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val sa = col("__sa").cast("double"); val sb = col("__sb").cast("double")
    val qa = col("__qa").cast("double"); val qb = col("__qb").cast("double")
    val sp2 = ((qa - sa * sa / na) + (qb - sb * sb / nb)) /
      (na + nb - lit(2.0d))
    val d = (sa / na - sb / nb) / sqrt(sp2)
    agg.select(keys.map(col) ++ Seq(
      col("n_a"), col("n_b"),
      round(when(col("n_a") > 0, sa / na), 6).as("mean_a"),
      round(when(col("n_b") > 0, sb / nb), 6).as("mean_b"),
      round(when(col("n_a") >= 2 && col("n_b") >= 2 && sp2 > 0, d), 6)
        .as("d")): _*)
  }

  /** Mutual information between two categorical columns, per key —
    * the information-theoretic dependence companion to
    * [[chiSquareIndependence]] (feature/label leakage audits, drift
    * diagnosis):
    *
    *   MI = Σ_xy (n_xy/N) · ln(N·n_xy / (n_x·n_y))      [nats]
    *
    * Every count is exact; each cell term is ONE fixed IEEE tree over
    * four exact integers, rounded to 9 dp and summed as DECIMAL (the
    * perplexity device — order-free, oracle-replayable). Empty cells
    * contribute 0 and never materialize (unlike chi-square's expected
    * grid, MI needs only the OBSERVED cells).
    *
    * Scale posture: one (key, x, y) hash aggregation; margins join back
    * label-cardinality-sized frames.
    *
    * @return one row per key: n, n_cells (observed), mi (6 dp nats,
    *         NULL when n = 0) */
  def mutualInfo(df: DataFrame, keys: Seq[String], x: Column,
                 y: Column): DataFrame = {
    require(keys.nonEmpty, "mutualInfo needs at least one key column")
    val base = df.filter(x.isNotNull && y.isNotNull)
      .select(keys.map(col) ++ Seq(x.cast("string").as("__x"),
        y.cast("string").as("__y")): _*)
    val cells = base.groupBy(keys.map(col) ++ Seq(col("__x"), col("__y")): _*)
      .agg(count(lit(1)).as("__nxy"))
    val xm = cells.groupBy(keys.map(col) :+ col("__x"): _*)
      .agg(sum(col("__nxy")).as("__nx"))
    val ym = cells.groupBy(keys.map(col) :+ col("__y"): _*)
      .agg(sum(col("__nxy")).as("__ny"))
    val tot = cells.groupBy(keys.map(col): _*)
      .agg(sum(col("__nxy")).as("__n"))
    val nd = col("__n").cast("double")
    val term = col("__nxy").cast("double") / nd *
      log(nd * col("__nxy").cast("double") /
        (col("__nx").cast("double") * col("__ny").cast("double")))
    cells
      .join(xm, keys :+ "__x").join(ym, keys :+ "__y").join(tot, keys)
      .groupBy(keys.map(col): _*)
      .agg(max(col("__n")).as("n"), count(lit(1)).as("n_cells"),
        sum(round(term, 9).cast("decimal(28,12)")).cast("double").as("__mi"))
      .select(keys.map(col) ++ Seq(col("n"), col("n_cells"),
        round(when(col("n") > 0, col("__mi")), 6).as("mi")): _*)
  }
}
