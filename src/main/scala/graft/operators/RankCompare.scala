package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-biased overlap (Webber, Moffat & Zobel, "A Similarity Measure
  * for Indefinite Rankings", TOIS 2010) — the standard top-weighted
  * agreement score between two rankings of the same items (ranker A/B
  * comparison, regression-testing a reranker, search-eval dashboards):
  *
  *   RBO@D = (1 − p) · Σ_{d=1..D} p^{d−1} · X_d / d
  *
  * with X_d = |top-d(A) ∩ top-d(B)| and persistence p.
  *
  * Exactness: X_d is an exact integer (an item is inside both top-d
  * prefixes iff max(rank_A, rank_B) ≤ d — one cumulative count, no
  * per-depth set intersection), and p is a RATIONAL pn/pd, so each
  * term quantizes to a 12-dp integer with one integer division over
  * PRECOMPUTED BigInt power literals:
  *
  *   term₁₂(d) = (X_d · pnᵈ⁻¹ · 10¹²) div (pdᵈ⁻¹ · d)
  *
  * — an order-free exact sum (the repo's chi-square device), then
  * RBO = (1−p)·Σterm/10¹² as one IEEE tree. No float pow() on either
  * engine: the per-depth power literals ride a VALUES scaffold spelled
  * identically in the oracle.
  *
  * Ranks are row_number over (score, id) — the id tiebreak is REQUIRED
  * (a tie straddling the depth-d boundary would otherwise make X_d
  * nondeterministic). Both rankings must cover the same item set per
  * key (the operator inner-joins on the id; asymmetric universes are a
  * different estimator — the paper's extrapolated RBO — out of scope).
  *
  * Scale posture: two per-key sort windows over the same key shuffle,
  * one id equi-join, one (key, depth)-grid aggregation (grid =
  * |keys|·D rows). Depth is bounded (≤ 30) so the power literals stay
  * inside DECIMAL(38,0).
  */
object RankCompare {

  /** @param scoreA ranking A's sort key (ascending = rank 1 best)
    * @param pNum/pDen persistence p = pNum/pDen (0 < p < 1), default 9/10
    * @return one row per key — EVERY key in the input, including keys
    *         whose top-depth prefixes are fully disjoint (rbo = 0) —
    *         with rbo (6 dp), x_final = X_D, and depth
    */
  def rbo(df: DataFrame, keys: Seq[String], id: Column,
          scoreA: Column, scoreB: Column, depth: Int,
          pNum: Int = 9, pDen: Int = 10): DataFrame = {
    require(keys.nonEmpty, "rbo needs at least one key column")
    require(depth >= 1 && depth <= 30, s"depth must be in [1, 30], got $depth")
    require(pNum > 0 && pDen > pNum, s"need 0 < p < 1, got $pNum/$pDen")
    val wA = Window.partitionBy(keys.map(col): _*).orderBy(scoreA, id)
    val wB = Window.partitionBy(keys.map(col): _*).orderBy(scoreB, id)
    val rankedAll = df.select(keys.map(col) ++ Seq(id.as("__id"),
        row_number().over(wA).as("__ra"),
        row_number().over(wB).as("__rb")): _*)
      .withColumn("__m", greatest(col("__ra"), col("__rb")))
    // the key universe comes from BEFORE the depth filter: a key whose
    // top-depth prefixes are fully disjoint (no item with
    // max(ra, rb) <= depth) must still emit an rbo = 0 row, not vanish
    val keyUniverse = rankedAll.select(keys.map(col): _*).distinct()
    val ranked = rankedAll.filter(col("__m") <= depth)
    // X_d = # items with max(ra, rb) <= d: per-key counts by __m,
    // summed over the (key, d) scaffold
    val counts = ranked.groupBy(keys.map(col) :+ col("__m"): _*)
      .agg(count(lit(1)).as("__c"))
    // literal per-depth scaffold: (d, pn^(d-1)*10^12, pd^(d-1)*d) as
    // exact DECIMAL strings — no pow() at query time
    val scaffold = (1 to depth).map { d =>
      val num = BigInt(pNum).pow(d - 1) * BigInt(10).pow(12)
      val den = BigInt(pDen).pow(d - 1) * d
      struct(lit(d).as("d"),
        lit(num.toString).cast("decimal(38,0)").as("__num"),
        lit(den.toString).cast("decimal(38,0)").as("__den"))
    }
    val grid = keyUniverse
      .select(keys.map(col) :+ explode(array(scaffold: _*)).as("__s"): _*)
      .select(keys.map(col) ++ Seq(col("__s.d").as("__d"),
        col("__s.__num").as("__num"), col("__s.__den").as("__den")): _*)
    // conditional sum, not a join filter: a key with ZERO in-depth
    // items keeps its grid rows and scores X_d = 0 at every depth
    val xd = grid.join(counts, keys, "left")
      .groupBy(keys.map(col) ++ Seq(col("__d"), col("__num"),
        col("__den")): _*)
      .agg(coalesce(sum(when(col("__m") <= col("__d"), col("__c"))),
        lit(0L)).as("__x"))
      .withColumn("__term",
        expr("(CAST(__x AS DECIMAL(38,0)) * __num) DIV __den"))
    val agg = xd.groupBy(keys.map(col): _*).agg(
      sum(col("__term").cast("decimal(38,0)")).as("__t12"),
      max(when(col("__d") === depth, col("__x"))).as("x_final"))
    val p = pNum.toDouble / pDen.toDouble
    agg.select(keys.map(col) ++ Seq(
      round(col("__t12").cast("double") * lit(1.0d - p) / lit(1.0e12d), 6)
        .as("rbo"),
      coalesce(col("x_final"), lit(0L)).as("x_final"),
      lit(depth).cast("long").as("depth")): _*)
  }
}
