package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-way analysis of variance and its robust variance-equality
  * companion (Brown-Forsythe/Levene), with the repo's exact-arithmetic
  * discipline.
  *
  * Both take an EXPLICIT group list (like Hypothesis.welchT takes two
  * group names): the per-group sufficient statistics pivot into ONE row
  * per key as conditional exact-DECIMAL sums, and every derived value
  * is a fixed left-to-right IEEE tree over the k group terms — the
  * decomposeAdditive centering device, so no order-dependent float
  * accumulation and no quantization are ever needed.
  *
  *   SSB = Σ_g S_g²/n_g − S²/N,  SSW = Q − Σ_g S_g²/n_g
  *   F = (SSB/(k−1)) / (SSW/(N−k))
  *
  * from exact per-group (n_g, S_g = Σx, Q_g = Σx²). Input contract as
  * Moments.skewKurt: |x| < 10⁴ with ≤ 4 decimal places (x routes
  * through DECIMAL(8,4) via try_cast, so x² is exact in DECIMAL(16,8)
  * and out-of-contract rows drop consistently under every ansi
  * setting).
  *
  * Brown-Forsythe is EXACTLY the same F applied to z = |x − med_g|
  * with med_g the per-group LOWER median by rank selection (the repo's
  * median convention — Theil-Sen, weighted median; the classical
  * Brown-Forsythe uses the interpolated median, a documented
  * half-unit-of-measurement deviation for even groups). z is exact in
  * DECIMAL(9,4).
  *
  * Scale posture: one map-combinable hash aggregation for F; the
  * Brown-Forsythe median adds one per-(key, group) rank window over a
  * single shuffle of the keys. Never a self-join.
  */
object Anova {

  /** Internal: pivot-style one-way F over a pre-projected frame with
    * columns keys ++ (__g, __x) where __x is an exact decimal. */
  private def fFrom(base: DataFrame, keys: Seq[String],
                    groups: Seq[String]): DataFrame = {
    val k = groups.length
    val aggs = groups.zipWithIndex.flatMap { case (g, i) =>
      Seq(count(when(col("__g") === g, lit(1))).as(s"__n$i"),
        sum(when(col("__g") === g, col("__x"))).as(s"__s$i"),
        sum(when(col("__g") === g, col("__x") * col("__x"))).as(s"__q$i"))
    }
    val agg = base.filter(col("__g").isin(groups.map(lit): _*))
      .groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    // exact decimal totals (decimal addition is exact), then doubles
    val nTot = (0 until k).map(i => col(s"__n$i")).reduceLeft(_ + _)
    val sTot = (0 until k).map(i => col(s"__s$i")).reduceLeft(_ + _)
    val qTot = (0 until k).map(i => col(s"__q$i")).reduceLeft(_ + _)
    val nd = nTot.cast("double")
    // Σ_g S_g²/n_g as a FIXED left-to-right double tree
    val sumSq = (0 until k).map { i =>
      col(s"__s$i").cast("double") * col(s"__s$i").cast("double") /
        col(s"__n$i").cast("double")
    }.reduceLeft(_ + _)
    val ssb = sumSq - sTot.cast("double") * sTot.cast("double") / nd
    val ssw = qTot.cast("double") - sumSq
    val kd = lit(k.toDouble)
    val f = (ssb / (kd - lit(1.0d))) / (ssw / (nd - kd))
    val allPresent = (0 until k).map(i => col(s"__n$i") > 0).reduce(_ && _)
    val defined = allPresent && nTot > k && ssw > 0
    agg.select(keys.map(col) ++ Seq(
      nTot.as("n"), lit(k.toLong).as("n_groups"),
      round(when(defined, ssb), 6).as("ssb"),
      round(when(defined, ssw), 6).as("ssw"),
      round(when(defined, f), 6).as("f")): _*)
  }

  /** One-way ANOVA F across the listed groups of `groupCol`.
    * @return one row per key: n, n_groups, ssb, ssw, f (6 dp; NULL when
    *         a listed group is empty, N ≤ k, or SSW = 0) */
  def oneWayF(df: DataFrame, keys: Seq[String], groupCol: Column,
              groups: Seq[String], value: Column): DataFrame = {
    require(keys.nonEmpty, "oneWayF needs at least one key column")
    require(groups.size >= 2, "oneWayF needs at least two groups")
    val x = value.try_cast("decimal(8,4)")
    fFrom(df.filter(x.isNotNull)
      .select(keys.map(col) ++ Seq(groupCol.as("__g"), x.as("__x")): _*),
      keys, groups)
  }

  /** Brown-Forsythe (median-centered Levene) variance-equality test:
    * the one-way F of z = |x − lower-median_g|.
    * @return one row per key: n, n_groups, ssb, ssw, f (as [[oneWayF]],
    *         computed over the absolute deviations) */
  def brownForsythe(df: DataFrame, keys: Seq[String], groupCol: Column,
                    groups: Seq[String], value: Column): DataFrame = {
    require(keys.nonEmpty, "brownForsythe needs at least one key column")
    require(groups.size >= 2, "brownForsythe needs at least two groups")
    val x = value.try_cast("decimal(8,4)")
    val base = df.filter(x.isNotNull && groupCol.isin(groups.map(lit): _*))
      .select(keys.map(col) ++ Seq(groupCol.as("__g"), x.as("__x0")): _*)
    // lower median by rank selection: the value at row (n+1) div 2 of
    // the per-(key, group) sort — exact, no interpolation
    val w = Window.partitionBy((keys.map(col) :+ col("__g")): _*)
      .orderBy(col("__x0"))
    val wAll = Window.partitionBy((keys.map(col) :+ col("__g")): _*)
    val meds = base
      .withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(wAll))
      .filter(col("__rn") === expr("(__cnt + 1) DIV 2"))
      .select(keys.map(col) ++ Seq(col("__g"), col("__x0").as("__med")): _*)
    val z = base.join(meds, keys :+ "__g")
      .select(keys.map(col) ++ Seq(col("__g"),
        abs(col("__x0") - col("__med")).cast("decimal(9,4)").as("__x")): _*)
    fFrom(z, keys, groups)
  }
}
