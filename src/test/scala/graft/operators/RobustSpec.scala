package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Robust.iqrStats: hand-computed quartiles/fences on 1..8, the
  * outlier census and winsorized mean with an injected outlier,
  * NULL exclusion, and the constant-group degenerate case. */
class RobustSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, java.lang.Double)]) =
    Robust.iqrStats(rows.toDF("k", "v"), Seq("k"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6), r.getLong(7), r.getDouble(8)))
      .toMap

  test("1..8: exact interpolated quartiles, wide fences, no outliers") {
    val rows = (1 to 8).map(i => ("g", java.lang.Double.valueOf(i.toDouble)))
    val (n, q1, q3, iqr, lo, hi, nOut, wm) = run(rows)("g")
    assert((n, q1, q3, iqr) === ((8L, 2.75, 6.25, 3.5)))
    assert((lo, hi) === ((-2.5, 11.5)))
    assert((nOut, wm) === ((0L, 4.5)))
  }

  test("an injected outlier is fenced and winsorized") {
    // 1..8 plus 100: q1=3, q3=7, fences [-3, 13]; 100 clamps to 13
    val rows = ((1 to 8).map(_.toDouble) :+ 100.0)
      .map(v => ("g", java.lang.Double.valueOf(v)))
    val (n, q1, q3, iqr, lo, hi, nOut, wm) = run(rows)("g")
    assert((n, q1, q3, iqr, lo, hi) === ((9L, 3.0, 7.0, 4.0, -3.0, 13.0)))
    assert(nOut === 1L)
    assert(wm === BigDecimal(49.0 / 9).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("NULLs are excluded; a constant group degenerates cleanly") {
    val rows: Seq[(String, java.lang.Double)] =
      Seq(("c", 5.0), ("c", 5.0), ("c", null), ("c", 5.0))
    val (n, q1, q3, iqr, lo, hi, nOut, wm) = run(rows)("c")
    assert((n, q1, q3, iqr, lo, hi, nOut, wm)
      === ((3L, 5.0, 5.0, 0.0, 5.0, 5.0, 0L, 5.0)))
  }

  private def mad(rows: Seq[(String, Double)]) =
    Robust.madStats(rows.toDF("k", "v"), Seq("k"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5)))
      .toMap

  test("madStats: 1..9 has median 5, MAD 2; no Hampel outliers") {
    val out = mad((1 to 9).map(i => ("g", i.toDouble)))("g")
    assert(out === ((9L, 5.0, 2.0,
      BigDecimal(2.0 * Robust.MadToSigma).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble, 0L)))
  }

  test("madStats: one wild outlier barely moves MAD and is censored") {
    val (n, median, madV, sigma, nOut) =
      mad(((1 to 9).map(_.toDouble) :+ 100.0).map(("g", _)))("g")
    assert((n, median, madV) === ((10L, 5.5, 2.5)))
    assert(math.abs(sigma - 2.5 * Robust.MadToSigma) < 1e-6)
    assert(nOut === 1L)
  }

  test("madStats: constant group has MAD 0 and no outliers") {
    assert(mad(Seq(("c", 4.0), ("c", 4.0), ("c", 4.0)))("c")
      === ((3L, 4.0, 0.0, 0.0, 0L)))
  }
}
