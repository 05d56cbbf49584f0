package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hypothesis.mutualInfo, Regress.corrMatrix, TimeSeries.mase —
  * hand-worked and scalar-model checks. */
class MiscStatsSpec extends SparkSpec {
  import spark.implicits._

  test("mutualInfo: independence 0, determinism ln k, hand-worked middle") {
    def run(rows: Seq[(String, String, String)]) =
      Hypothesis.mutualInfo(rows.toDF("k", "x", "y"), Seq("k"),
          col("x"), col("y"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // independent uniform 2x2 -> MI = 0
    val ind = for (x <- Seq("a", "b"); y <- Seq("u", "v")) yield ("k", x, y)
    assert(run(ind)("k")._3 === 0.0)
    // y determined by x, uniform over 3 classes -> MI = ln 3
    val det = Seq("a", "b", "c").flatMap(x => Seq.fill(4)(("k", x, x.toUpperCase)))
    assert(math.abs(run(det)("k")._3 - math.log(3.0)) < 1e-6)
    // hand-worked 2x2: cells (a,u)=2 (a,v)=1 (b,u)=1 (b,v)=2, N=6
    val rows = Seq.fill(2)(("k", "a", "u")) ++ Seq(("k", "a", "v")) ++
      Seq(("k", "b", "u")) ++ Seq.fill(2)(("k", "b", "v"))
    val exp = 2.0 / 6 * math.log(6.0 * 2 / (3 * 3)) +
      1.0 / 6 * math.log(6.0 * 1 / (3 * 3)) +
      1.0 / 6 * math.log(6.0 * 1 / (3 * 3)) +
      2.0 / 6 * math.log(6.0 * 2 / (3 * 3))
    assert(math.abs(run(rows)("k")._3 - exp) < 1e-6)
  }

  test("corrMatrix: perfect linear 1, anti-linear -1, constant NULL, scalar check") {
    val rows = (1 to 50).map { i =>
      val x = i.toDouble
      (x, 2 * x + 3, -x + 10, 5.0, (i * 48271 % 23).toDouble)
    }
    val out = Regress.corrMatrix(rows.toDF("a", "b", "c", "d", "e"),
        Seq("a", "b", "c", "d", "e"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out.size === 10)
    assert(out(("a", "b")).get === 1.0)
    assert(out(("a", "c")).get === -1.0)
    assert(out(("a", "d")) === None) // constant column: zero variance
    // scalar Pearson for the noisy pair
    val xs = rows.map(_._1); val es = rows.map(_._5)
    val n = xs.size.toDouble
    val r = (n * xs.zip(es).map(p => p._1 * p._2).sum - xs.sum * es.sum) /
      math.sqrt((n * xs.map(x => x * x).sum - xs.sum * xs.sum) *
        (n * es.map(e => e * e).sum - es.sum * es.sum))
    assert(math.abs(out(("a", "e")).get - r) < 1e-5)
  }

  test("cohensD: hand-worked two-group case; equal groups 0; tiny groups NULL") {
    def run(rows: Seq[(String, String, Double)]) =
      Hypothesis.cohensD(rows.toDF("k", "g", "v"), Seq("k"),
        col("g"), "a", "b", col("v")).collect().head
    // a = (2,4,6): mean 4, ss 8; b = (1,2,3): mean 2, ss 2
    // sp2 = (8 + 2)/4 = 2.5; d = 2/sqrt(2.5)
    val rows = Seq(("x", "a", 2.0), ("x", "a", 4.0), ("x", "a", 6.0),
      ("x", "b", 1.0), ("x", "b", 2.0), ("x", "b", 3.0))
    val r = run(rows)
    assert((r.getLong(1), r.getLong(2)) === ((3L, 3L)))
    assert(math.abs(r.getDouble(5) - 2.0 / math.sqrt(2.5)) < 1e-6)
    // identical groups -> d = 0
    val same = Seq(("x", "a", 1.0), ("x", "a", 3.0),
      ("x", "b", 1.0), ("x", "b", 3.0))
    assert(run(same).getDouble(5) === 0.0)
    // a single-row group -> NULL d
    val tiny = Seq(("x", "a", 1.0), ("x", "b", 2.0), ("x", "b", 3.0))
    assert(run(tiny).isNullAt(5))
  }

  test("trimmedStats: hand-worked trim/winsorize; outlier-immune; empty-trim NULL") {
    def run(vs: Seq[Double], num: Int, den: Int) =
      Robust.trimmedStats(vs.map(("g", _)).toDF("k", "v"), Seq("k"),
        col("v"), trimNum = num, trimDen = den).collect().head
    // 1..10, trim 1/10 -> k=1, kept 2..9: trimmed 5.5;
    // winsorized = (44 + 2 + 9)/10 = 5.5
    val r1 = run((1 to 10).map(_.toDouble), 1, 10)
    assert((r1.getLong(1), r1.getLong(2)) === ((10L, 8L)))
    assert(r1.getDouble(3) === 5.5 && r1.getDouble(4) === 5.5)
    // (0,1,2,3,100), trim 1/5 -> k=1, kept (1,2,3): trimmed 2;
    // winsorized = (6 + 1 + 3)/5 = 2 — the outlier is fully neutralized
    val r2 = run(Seq(0.0, 1.0, 2.0, 3.0, 100.0), 1, 5)
    assert(r2.getDouble(3) === 2.0 && r2.getDouble(4) === 2.0)
    // trim that empties the key -> NULLs
    val r3 = run(Seq(1.0, 2.0), 2, 5) // k = floor(2*2/5) = 0 -> kept 2
    assert(r3.getLong(2) === 2L)
    val r4 = run(Seq(1.0, 2.0, 3.0, 4.0, 5.0), 2, 5) // k=2, kept 1
    assert(r4.getLong(2) === 1L && r4.getDouble(3) === 3.0)
  }

  test("mase: perfect forecast 0; naive forecast scores exactly 1") {
    val ys = (0 until 20).map(i => ((i * 48271 % 31) / 2.0) + i)
    // forecast = actual -> mae 0 -> mase 0
    val perfect = ys.zipWithIndex.map { case (y, i) => ("g", i.toLong, y, y) }
    val p = TimeSeries.mase(perfect.toDF("k", "t", "a", "f"),
      "k", "t", "a", "f", m = 4).collect().head
    assert(p.getDouble(5) === 0.0)
    // forecast = seasonal naive itself (lag m) -> mase exactly 1
    val naive = ys.zipWithIndex.map { case (y, i) =>
      ("g", i.toLong, y, if (i >= 4) Some(ys(i - 4)) else None)
    }
    val nv = TimeSeries.mase(naive.toDF("k", "t", "a", "f"),
      "k", "t", "a", "f", m = 4).collect().head
    assert(nv.getLong(1) === 16L && nv.getLong(2) === 16L)
    assert(nv.getDouble(5) === 1.0)
  }
}
