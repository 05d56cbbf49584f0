package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

/** gapFillLinear: the grid must be dense per key, LOCF must carry the
  * last observation, and the linear interpolation must hit the exact
  * IEEE values of `pv + (nv-pv)·((t-pt)/(nt-pt))` — that expression
  * tree is the operator's oracle-parity contract. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def run(obs: Seq[(String, Long, java.lang.Double)]): Map[(String, Long), Row] =
    TimeSeries.gapFillLinear(
        obs.toDF("k", "slot", "v"), Seq("k"), "slot", "v")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r)
      .toMap

  test("dense grid, LOCF, and exact linear interpolation across a gap") {
    val out = run(Seq(("a", 10L, 1.0), ("a", 13L, 4.0), ("a", 15L, 2.0)))
    assert(out.keySet == Set(10L, 11L, 12L, 13L, 14L, 15L).map("a" -> _))
    // observed slots: value, ffill, interp all equal the observation
    assert(out(("a", 10L)).getDouble(3) == 1.0 && out(("a", 10L)).getDouble(4) == 1.0)
    // gap 11,12: ffill carries 1.0; interp walks the line 1.0 -> 4.0
    assert(out(("a", 11L)).isNullAt(2))
    assert(out(("a", 11L)).getDouble(3) == 1.0)
    assert(out(("a", 11L)).getDouble(4) == 1.0 + (4.0 - 1.0) * (1.0 / 3.0))
    assert(out(("a", 12L)).getDouble(4) == 1.0 + (4.0 - 1.0) * (2.0 / 3.0))
    // gap 14: between 4.0 and 2.0
    assert(out(("a", 14L)).getDouble(3) == 4.0)
    assert(out(("a", 14L)).getDouble(4) == 4.0 + (2.0 - 4.0) * (1.0 / 2.0))
  }

  test("null observations inside the span fill like absent rows") {
    val out = run(Seq(("a", 1L, 5.0), ("a", 2L, null), ("a", 3L, 7.0)))
    assert(out(("a", 2L)).isNullAt(2))
    assert(out(("a", 2L)).getDouble(3) == 5.0)
    assert(out(("a", 2L)).getDouble(4) == 5.0 + (7.0 - 5.0) * (1.0 / 2.0))
  }

  test("keys are independent; a single-observation key yields one row") {
    val out = run(Seq(("a", 5L, 1.0), ("a", 7L, 3.0), ("b", 100L, 9.0)))
    assert(out.size == 4)
    val b = out(("b", 100L))
    assert(b.getDouble(2) == 9.0 && b.getDouble(3) == 9.0 && b.getDouble(4) == 9.0)
  }

  test("interp is null before the first observation would bracket it") {
    // leading edge inside a key's span can't happen (span starts at the
    // first observation), but a null FIRST observation row can create one
    val out = run(Seq(("a", 1L, null), ("a", 2L, 4.0), ("a", 3L, null)))
    val lead = out(("a", 1L))
    assert(lead.isNullAt(3) && lead.isNullAt(4)) // no prior obs: ffill+interp null
    val trail = out(("a", 3L))
    assert(trail.getDouble(3) == 4.0 && trail.isNullAt(4)) // no next obs: LOCF only
  }

  test("ewma matches the scalar fold bit-for-bit on a seeded series") {
    val rnd = new scala.util.Random(5)
    val obs = for (k <- Seq("a", "b"); t <- 0 until 300 if rnd.nextDouble() < 0.5)
      yield (k, t.toLong, rnd.nextDouble() * 100)
    val got = TimeSeries.ewma(obs.toDF("k", "slot", "v"), "k", "slot", "v", 0.25)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.size == obs.size)
    for ((k, series) <- obs.groupBy(_._1)) {
      var y = 0.0
      series.sortBy(_._2).zipWithIndex.foreach { case ((_, t, x), i) =>
        y = if (i == 0) x else 0.25 * x + 0.75 * y
        assert(got((k, t)) == (x, y), s"($k,$t)")
      }
    }
  }

  test("ewma: single observation is its own smoothed value; alpha=1 is identity") {
    val df = Seq(("a", 1L, 5.0), ("b", 3L, 2.0), ("b", 9L, 8.0)).toDF("k", "slot", "v")
    val one = TimeSeries.ewma(df, "k", "slot", "v", 0.25).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(one(("a", 1L)) == 5.0 && one(("b", 3L)) == 2.0)
    assert(one(("b", 9L)) == 0.25 * 8.0 + 0.75 * 2.0)
    val ident = TimeSeries.ewma(df, "k", "slot", "v", 1.0).collect()
      .map(r => r.getDouble(3)).toSet
    assert(ident == Set(5.0, 2.0, 8.0))
    intercept[IllegalArgumentException](TimeSeries.ewma(df, "k", "slot", "v", 0.0))
  }

  test("holtLinear matches the scalar double-recurrence bit-for-bit on a seeded series") {
    val rnd = new scala.util.Random(19)
    val obs = for (k <- Seq("a", "b"); t <- 0 until 250 if rnd.nextDouble() < 0.5)
      yield (k, t.toLong, rnd.nextDouble() * 100 + t * 0.3) // drifting series
    val got = TimeSeries.holtLinear(obs.toDF("k", "slot", "v"),
        "k", "slot", "v", alpha = 0.5, beta = 0.25)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(got.size == obs.size)
    for ((k, series) <- obs.groupBy(_._1)) {
      var l = 0.0; var b = 0.0
      series.sortBy(_._2).zipWithIndex.foreach { case ((_, t, x), i) =>
        if (i == 0) { l = x; b = 0.0 }
        else {
          val lp = l
          l = 0.5 * x + 0.5 * (lp + b)
          b = 0.25 * (l - lp) + 0.75 * b
        }
        assert(got((k, t)) == (l, b, l + b), s"($k,$t)")
      }
    }
  }

  test("holtLinear: first point is level=x trend=0; a linear series locks onto its slope") {
    val lin = (0 until 60).map(t => ("a", t.toLong, 10.0 + 2.0 * t))
    val out = TimeSeries.holtLinear(lin.toDF("k", "slot", "v"),
        "k", "slot", "v", alpha = 0.5, beta = 0.25)
      .collect().map(r => r.getLong(1) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(out(0L) == ((10.0, 0.0)))
    // by the end of an exactly-linear series the trend estimate is ~the slope
    // and the level tracks the line
    val (lEnd, bEnd) = out(59L)
    assert(math.abs(bEnd - 2.0) < 1e-6, s"trend $bEnd")
    assert(math.abs(lEnd - (10.0 + 2.0 * 59)) < 1e-6, s"level $lEnd")
    intercept[IllegalArgumentException](
      TimeSeries.holtLinear(lin.toDF("k", "slot", "v"), "k", "slot", "v", 0.0, 0.5))
  }

  test("cusum matches the scalar fold bit-for-bit, resets at zero, alarms above threshold") {
    val rnd = new scala.util.Random(7)
    val obs = for (k <- Seq("a", "b"); t <- 0 until 200 if rnd.nextDouble() < 0.6)
      yield (k, t.toLong, rnd.nextDouble() * 10, 5.0)
    val got = TimeSeries.cusum(obs.toDF("k", "slot", "v", "tg"),
        "k", "slot", "v", "tg", slack = 0.5, threshold = 3.0)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getDouble(3), r.getBoolean(4)))
      .toMap
    assert(got.size == obs.size)
    for ((k, series) <- obs.groupBy(_._1)) {
      var s = 0.0
      var sawReset = false; var sawAlarm = false
      series.sortBy(_._2).foreach { case (_, t, x, tg) =>
        s = math.max(0.0, s + x - tg - 0.5)
        if (s == 0.0) sawReset = true
        if (s > 3.0) sawAlarm = true
        assert(got((k, t)) == (s, s > 3.0), s"($k,$t)")
      }
      // the seeded series must actually exercise both regimes
      assert(sawReset && sawAlarm, s"$k: degenerate test series")
    }
  }

  test("maxConcurrent: closed intervals overlap at a shared endpoint; counts are exact") {
    val iv = Seq(
      // key a: [1,3] [3,5] touch at 3 -> 2 concurrent; [10,11] isolated
      ("a", 1L, 3L), ("a", 3L, 5L), ("a", 10L, 11L),
      // key b: three nested intervals -> 3 concurrent
      ("b", 1L, 10L), ("b", 2L, 9L), ("b", 3L, 8L),
      // key c: disjoint -> 1
      ("c", 1L, 2L), ("c", 5L, 6L))
      .toDF("k", "s", "e")
    val out = TimeSeries.maxConcurrent(iv, Seq("k"), col("s"), col("e"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map("a" -> (3L, 2L), "b" -> (3L, 3L), "c" -> (2L, 1L)))
  }

  test("maxConcurrent matches a scalar sweep on a seeded interval set") {
    val rnd = new scala.util.Random(13)
    val iv = (0 until 400).map { i =>
      val s = rnd.nextInt(100).toLong
      (s"k${i % 4}", s, s + 1 + rnd.nextInt(20))
    }
    val got = TimeSeries.maxConcurrent(iv.toDF("k", "s", "e"), Seq("k"),
        col("s"), col("e"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((k, rows) <- iv.groupBy(_._1)) {
      // closed-interval scalar sweep: at each time t, count spanning intervals
      val maxC = (0L to 125L).map(t =>
        rows.count(r => r._2 <= t && t <= r._3).toLong).max
      assert(got(k) == (rows.size.toLong, maxC), k)
    }
  }

  test("matches a scalar reference on a seeded irregular series") {
    val rnd = new scala.util.Random(42)
    val obs = (0 until 200).flatMap { i =>
      val k = s"k${i % 3}"
      if (rnd.nextDouble() < 0.4) Some((k, i.toLong / 3, java.lang.Double.valueOf(rnd.nextDouble() * 10)))
      else None
    }
    // one row per (k, slot): keep first
    val uniq = obs.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
    val out = run(uniq)
    val byKey = uniq.groupBy(_._1)
    for ((k, rows) <- byKey) {
      val m = rows.map(t => t._2 -> t._3.doubleValue()).toMap
      val lo = m.keys.min; val hi = m.keys.max
      for (t <- lo to hi) {
        val row = out((k, t))
        val prev = (lo to t).reverse.find(m.contains)
        val next = (t to hi).find(m.contains)
        assert(row.getDouble(3) == m(prev.get)) // ffill: prev always exists in-span
        val expectInterp = (prev, next) match {
          case (Some(p), Some(n)) if p == n => m(p)
          case (Some(p), Some(n)) =>
            m(p) + (m(n) - m(p)) * ((t - p).toDouble / (n - p).toDouble)
          case _ => Double.NaN
        }
        if (next.isEmpty) assert(row.isNullAt(4))
        else assert(row.getDouble(4) == expectInterp)
      }
    }
  }

  test("decomposeAdditive: recovers a linear trend + balanced seasonal exactly") {
    import spark.implicits._
    // y = 0.5 t + s(t mod 4), s = (2, -1, -2, 1): sums to 0, all halves
    val sPat = Map(0L -> 2.0, 1L -> -1.0, 2L -> -2.0, 3L -> 1.0)
    val rows = (1L to 20L).map(t => ("g", t, 0.5 * t + sPat(t % 4)))
    val out = TimeSeries.decomposeAdditive(rows.toDF("k", "slot", "v"),
        "k", "slot", "v", period = 4)
      .collect().map(r => r.getLong(1) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    // centered windows need t-2..t+2: rows 3..18 survive (16 rows, 4/phase)
    assert(out.size === 16)
    assert(!out.contains(1L) && !out.contains(2L) &&
      !out.contains(19L) && !out.contains(20L))
    for (t <- 3L to 18L) {
      val (y, trend, seasonal, resid) = out(t)
      assert(y === 0.5 * t + sPat(t % 4))
      assert(trend === 0.5 * t, s"t=$t")
      assert(seasonal === sPat(t % 4), s"t=$t")
      assert(resid === 0.0, s"t=$t")
    }
  }

  test("decomposeAdditive matches the exact-sums scalar model (unequal phase counts)") {
    import spark.implicits._
    // n = 31 -> 25 surviving rows: one phase has 5 rows, five have 4 —
    // the centering must be the UNWEIGHTED mean of the 6 per-phase
    // means (R's decompose), not the count-weighted grand mean.
    val n = 31; val m = 6; val h = m / 2
    val ys = (1 to n).map(i => (i * 48271 % 37).toDouble / 4.0)
    val rows = (0 until n).map(i => ("g", i.toLong, ys(i)))
    val out = TimeSeries.decomposeAdditive(rows.toDF("k", "slot", "v"),
        "k", "slot", "v", period = m)
      .collect().map(r => r.getLong(1) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    // scalar replay of the exact-sums definition
    val d = (h until n - h).map { t =>
      t -> (ys(t - h) + ys(t + h) + 2.0 * (t - h + 1 until t + h).map(ys).sum)
    }.toMap
    val defined = (h until n - h)
    def phaseMean(p: Int): Double = {
      val phase = defined.filter(_ % m == p)
      (phase.map(ys).sum - phase.map(d).sum / (2 * m)) / phase.size
    }
    val g = (0 until m).map(phaseMean).sum / m
    // the indices must (weighted-free) sum to ~zero over one cycle
    assert(math.abs((0 until m).map(p => phaseMean(p) - g).sum) < 1e-9)
    for (t <- defined) {
      val sRaw = phaseMean(t % m)
      val (trend, seasonal, resid) = out(t.toLong)
      assert(math.abs(trend - d(t) / (2 * m)) < 2e-6, s"t=$t")
      assert(math.abs(seasonal - (sRaw - g)) < 2e-6, s"t=$t")
      assert(math.abs(resid - (ys(t) - d(t) / (2 * m) - (sRaw - g))) < 4e-6,
        s"t=$t")
    }
  }
}
