package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TheilSen.fit: exact recovery of a clean line, robustness to a wild
  * outlier (the point of the estimator), the lower-median convention
  * pinned on a hand case, and the scalar pairwise-slope model. */
class TheilSenSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Double)]) =
    TheilSen.fit(rows.toDF("k", "o", "v"), Seq("k"), col("o"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap

  test("clean line y = 2o + 3 is recovered exactly") {
    val rows = (0L to 10L).map(o => ("g", o, 2.0 * o + 3.0))
    val (n, nPairs, slope, intercept) = run(rows)("g")
    assert((n, nPairs) === ((11L, 55L)))
    assert((slope, intercept) === ((2.0, 3.0)))
  }

  test("one wild outlier does not move the slope (OLS would)") {
    val rows = (0L to 9L).map(o => ("g", o, o.toDouble)) :+ ("g", 10L, 1000.0)
    val (_, _, slope, intercept) = run(rows)("g")
    assert(slope === 1.0)
    assert(intercept === 0.0)
  }

  test("lower-median convention on the 3-point hand case") {
    // slopes {2, 1.5, 1} → lower median (rank 2 of 3) = 1.5;
    // residuals y − 1.5o = {0, 0.5, 0} → lower median = 0
    val out = run(Seq(("g", 0L, 0.0), ("g", 1L, 2.0), ("g", 2L, 3.0)))
    assert(out("g") === ((3L, 3L, 1.5, 0.0)))
  }

  test("matches the scalar pairwise-slope model; sub-2-point keys absent") {
    val ys = (0 until 40).map(i => (i * 48271 % 17).toDouble / 4.0 + i * 0.5)
    val rows = ys.zipWithIndex.map { case (y, i) => ("g", i.toLong, y) } :+
      ("single", 1L, 9.0)
    val slopes = (for {
      j <- ys.indices; k <- ys.indices if k > j
    } yield (ys(k) - ys(j)) / (k - j)).sorted
    val slopeExp = slopes((slopes.size + 1) / 2 - 1)
    val res = ys.indices.map(i => ys(i) - slopeExp * i).sorted
    val interceptExp = res((res.size + 1) / 2 - 1)
    val out = run(rows)
    assert(!out.contains("single"))
    val (n, nPairs, slope, intercept) = out("g")
    assert((n, nPairs) === ((40L, 780L)))
    assert(math.abs(slope - slopeExp) < 2e-6)
    assert(math.abs(intercept - interceptExp) < 2e-6)
  }

  private def mk(rows: Seq[(String, Long, Double)]) =
    TheilSen.mannKendall(rows.toDF("k", "o", "v"), Seq("k"),
        col("o"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toMap

  test("fitSampled: exact fit below maxPoints; bounded pairs above; cast-nulls don't eat slots") {
    // n ≤ maxPoints → exactly fit()
    val small = (0L to 10L).map(o => ("g", o, 2.0 * o + 3.0))
    val viaSampled = TheilSen.fitSampled(small.toDF("k", "o", "v"),
      Seq("k"), col("o"), col("v"), maxPoints = 64).collect().head
    assert((viaSampled.getLong(1), viaSampled.getLong(2),
      viaSampled.getDouble(3), viaSampled.getDouble(4)) === ((11L, 55L, 2.0, 3.0)))
    // n > maxPoints → n pinned at maxPoints, pairs at C(maxPoints, 2),
    // and a clean line survives sampling exactly
    val big = (0L until 500L).map(o => ("g", o, 2.0 * o + 3.0))
    val s8 = TheilSen.fitSampled(big.toDF("k", "o", "v"),
      Seq("k"), col("o"), col("v"), maxPoints = 8).collect().head
    assert((s8.getLong(1), s8.getLong(2)) === ((8L, 28L)))
    assert((s8.getDouble(3), s8.getDouble(4)) === ((2.0, 3.0)))
    // a null-valued row must NOT consume a sample slot (the filter runs
    // after the casts, before sampling): 20 valid points + 30 null-value
    // rows, maxPoints = 20 → all 20 valid points sampled (exact fit).
    // (Under ANSI a cast that cannot represent the value THROWS rather
    // than nulling, so raw nulls are the only slot-eating shape.)
    val nulls = (0L until 30L).map(o => ("g", 1000L + o, Option.empty[Double]))
    val mixed = (0L until 20L).map(o => ("g", o, Option(2.0 * o + 3.0))) ++ nulls
    val sv = TheilSen.fitSampled(mixed.toDF("k", "o", "v"),
      Seq("k"), col("o"), col("v"), maxPoints = 20).collect().head
    assert((sv.getLong(1), sv.getLong(2)) === ((20L, 190L)))
    assert((sv.getDouble(3), sv.getDouble(4)) === ((2.0, 3.0)))
  }

  test("mann-kendall: strictly increasing series has tau = 1 and the textbook z") {
    val rows = (1L to 10L).map(o => ("g", o, o.toDouble))
    val (n, s, tau, z) = mk(rows)("g")
    assert((n, s, tau) === ((10L, 45L, 1.0)))
    // no ties: sigma^2 = 10*9*25/18 = 125; z = 44/sqrt(125)
    assert(math.abs(z.get - 44.0 / math.sqrt(125.0)) < 2e-6)
  }

  test("mann-kendall: matches the scalar model under ties; all-tied is NULL") {
    val ys = (1 to 25).map(i => (i * 48271 % 6).toDouble)
    val rows = ys.zipWithIndex.map { case (y, i) => ("g", i.toLong, y) } ++
      Seq.tabulate(4)(i => ("tied", i.toLong, 7.0))
    val sExp = (for {
      j <- ys.indices; k <- ys.indices if k > j
    } yield math.signum(ys(k) - ys(j)).toLong).sum
    val n = ys.size.toDouble
    val tcorr = ys.groupBy(identity).values
      .map { g => val t = g.size.toDouble; t * (t - 1) * (2 * t + 5) }.sum
    val var18 = (n * (n - 1) * (2 * n + 5) - tcorr) / 18.0
    val zExp = if (sExp > 0) (sExp - 1.0) / math.sqrt(var18)
      else if (sExp < 0) (sExp + 1.0) / math.sqrt(var18) else 0.0
    val out = mk(rows)
    val (gotN, gotS, tau, z) = out("g")
    assert((gotN, gotS) === ((25L, sExp)))
    assert(math.abs(tau - sExp / (n * (n - 1) / 2.0)) < 2e-6)
    assert(math.abs(z.get - zExp) < 2e-6)
    assert(out("tied")._4 === None) // variance 0: tcorr equals the n-term
    assert(out("tied")._2 === 0L)
  }
}
