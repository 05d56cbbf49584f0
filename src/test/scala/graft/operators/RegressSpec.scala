package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** olsPerKey: exact fits on hand-computable lines, NULL (never NaN) on
  * degenerate groups, and agreement with the scalar closed form on a
  * pseudo-random set. */
class RegressSpec extends SparkSpec {
  import spark.implicits._

  private def fit(rows: Seq[(String, Double, Double)]) =
    Regress.olsPerKey(rows.toDF("g", "x", "y"), Seq("g"), col("x"), col("y"))
      .select("g", "n", "slope", "intercept", "r2")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toMap

  test("perfect line y = 2x + 1 fits exactly with r2 = 1") {
    val rows = Seq.tabulate(5)(i => ("a", i.toDouble, 2.0 * i + 1.0))
    val out = fit(rows)
    assert(out("a") === ((5L, Some(2.0), Some(1.0), Some(1.0))))
  }

  test("constant x gives NULL coefficients; constant y gives slope 0 and NULL r2") {
    val rows = Seq(
      ("cx", 3.0, 1.0), ("cx", 3.0, 2.0), ("cx", 3.0, 5.0),
      ("cy", 1.0, 7.0), ("cy", 2.0, 7.0), ("cy", 4.0, 7.0))
    val out = fit(rows)
    assert(out("cx") === ((3L, None, None, None)))
    assert(out("cy") === ((3L, Some(0.0), Some(7.0), None)))
  }

  test("matches the scalar closed form on a pseudo-random noisy set") {
    val rows = (1 to 200).map { i =>
      val x = (i * 48271 % 97).toDouble / 4.0
      val y = 1.5 * x - 3.0 + ((i * 16807 % 11) - 5).toDouble / 8.0
      ("g", x, y)
    }
    val n = rows.size.toDouble
    val sx = rows.map(_._2).sum; val sy = rows.map(_._3).sum
    val sxy = rows.map(r => r._2 * r._3).sum
    val sxx = rows.map(r => r._2 * r._2).sum
    val syy = rows.map(r => r._3 * r._3).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = (sy - slope * sx) / n
    val r2 = math.pow(n * sxy - sx * sy, 2) /
      ((n * sxx - sx * sx) * (n * syy - sy * sy))
    val out = fit(rows)("g")
    assert(out._1 === 200L)
    assert(math.abs(out._2.get - slope) < 2e-6)
    assert(math.abs(out._3.get - intercept) < 2e-6)
    assert(math.abs(out._4.get - r2) < 2e-6)
    assert(out._4.get > 0.9, "fixture should be strongly linear")
  }

  test("single-point group is degenerate (no variance): all NULL") {
    val out = fit(Seq(("solo", 2.0, 9.0)))
    assert(out("solo") === ((1L, None, None, None)))
  }

  private def acf(rows: Seq[(String, Long, Double)], lags: Seq[Int]) =
    Regress.autocorr(rows.toDF("g", "t", "v"), Seq("g"), "t", "v", lags)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap

  test("autocorr: strictly increasing series has r = 1 at every lag") {
    val rows = (1L to 20L).map(t => ("g", t, t.toDouble))
    val out = acf(rows, Seq(1, 2, 3))
    assert(out(("g", 1)) === ((19L, Some(1.0))))
    assert(out(("g", 2)) === ((18L, Some(1.0))))
    assert(out(("g", 3)) === ((17L, Some(1.0))))
  }

  test("autocorr: period-2 alternating series has r = -1 at lag 1, +1 at lag 2") {
    val rows = (1L to 21L).map(t => ("g", t, if (t % 2 == 0) 5.0 else 1.0))
    val out = acf(rows, Seq(1, 2))
    assert(out(("g", 1)) === ((20L, Some(-1.0))))
    assert(out(("g", 2)) === ((19L, Some(1.0))))
  }

  test("autocorr: constant series is NULL (zero variance), not NaN") {
    val rows = (1L to 10L).map(t => ("g", t, 4.25))
    val out = acf(rows, Seq(1))
    assert(out(("g", 1)) === ((9L, None)))
  }

  test("autocorr matches the scalar Pearson of lagged pairs per key") {
    val rows = for {
      g <- Seq("a", "b"); t <- 1L to 60L
    } yield (g, t, ((t * 48271 + g.hashCode) % 23).toDouble / 4.0)
    val out = acf(rows, Seq(1, 4))
    for (g <- Seq("a", "b"); l <- Seq(1, 4)) {
      val series = rows.filter(_._1 == g).sortBy(_._2).map(_._3)
      val pairs = series.dropRight(l).zip(series.drop(l))
      val n = pairs.size.toDouble
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val r = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      val got = out((g, l))
      assert(got._1 === pairs.size.toLong)
      assert(math.abs(got._2.get - r) < 2e-6, s"($g, lag $l)")
    }
  }

  test("crosscorr: a shifted copy peaks at exactly its shift") {
    // y_t = x_{t-2} (y lags x by 2): the (x_t, y_{t+l}) pairing is
    // perfect at l = +2, so r = 1 there and < 1 elsewhere
    val xs = (1L to 40L).map(t => (t, ((t * 48271) % 19).toDouble))
    val rows = xs.map { case (t, x) =>
      val y = ((( (t - 2) * 48271) % 19)).toDouble
      ("g", t, x, y)
    }
    import spark.implicits._
    val out = Regress.crosscorr(rows.toDF("g", "t", "x", "y"),
        Seq("g"), "t", "x", "y", Seq(-2, -1, 0, 1, 2))
      .collect().map(r => r.getInt(1) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(2) === Some(1.0))
    assert(out(-2).get < 1.0 && out(0).get < 1.0 && out(1).get < 1.0)
  }

  test("crosscorr matches the scalar Pearson of shifted pairs incl. negative lags") {
    import spark.implicits._
    val n = 50
    val xs = (1 to n).map(i => (i * 48271 % 23).toDouble / 4.0)
    val ys = (1 to n).map(i => (i * 16807 % 17).toDouble / 2.0)
    val rows = (0 until n).map(i => ("g", i.toLong, xs(i), ys(i)))
    val out = Regress.crosscorr(rows.toDF("g", "t", "x", "y"),
        Seq("g"), "t", "x", "y", Seq(-3, 1))
      .collect().map(r => r.getInt(1) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    for (l <- Seq(-3, 1)) {
      val pairs =
        if (l >= 0) (0 until n - l).map(i => (xs(i), ys(i + l)))
        else (-l until n).map(i => (xs(i), ys(i + l)))
      val np = pairs.size.toDouble
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val r = (np * sxy - sx * sy) /
        math.sqrt((np * sxx - sx * sx) * (np * syy - sy * sy))
      val got = out(l)
      assert(got._1 === pairs.size.toLong)
      assert(math.abs(got._2.get - r) < 2e-6, s"lag $l")
    }
  }
}
