package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hypothesis tests: chi-square pinned to a hand-worked 2×2 (including
  * the documented 6-dp quantization), exact zero on a proportional
  * table, empty-cell contribution (the grid scaffold), and Cramér's V;
  * the two-proportion z pinned to a hand case and its degenerate
  * NULLs. */
class HypothesisSpec extends SparkSpec {
  import spark.implicits._

  private def chi(rows: Seq[(String, String, String)]) =
    Hypothesis.chiSquareIndependence(rows.toDF("k", "a", "b"), Seq("k"),
        col("a"), col("b"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5),
          if (r.isNullAt(6)) None else Some(r.getDouble(6))))
      .toMap

  private def expand(o: Seq[((String, String), Int)], k: String) =
    o.flatMap { case ((a, b), n) => Seq.fill(n)((k, a, b)) }

  test("chi-square: hand-worked 2x2 [[10,20],[30,40]] = 0.793650 quantized") {
    // E = [[12,18],[28,42]]; float chi2 = 0.79365079...; every cell term
    // truncates at 6 dp: 333333+222222+142857+95238 = 793650
    val rows = expand(Seq(("x", "p") -> 10, ("x", "q") -> 20,
      ("y", "p") -> 30, ("y", "q") -> 40), "g")
    val (n, r, c, dof, chi2, v) = chi(rows)("g")
    assert((n, r, c, dof) === ((100L, 2L, 2L, 1L)))
    assert(chi2 === 0.79365)
    assert(math.abs(chi2 - (4.0 / 12 + 4.0 / 18 + 4.0 / 28 + 4.0 / 42)) < 2e-6)
    assert(math.abs(v.get - math.sqrt(0.79365 / 100.0)) < 1e-6)
  }

  test("chi-square: proportional table is exactly 0") {
    val rows = expand(Seq(("x", "p") -> 10, ("x", "q") -> 20,
      ("y", "p") -> 20, ("y", "q") -> 40), "g")
    val (n, _, _, dof, chi2, _) = chi(rows)("g")
    assert((n, dof, chi2) === ((90L, 1L, 0.0)))
  }

  test("chi-square: empty cells still contribute (perfect association = n)") {
    // [[50,0],[0,50]]: the (x,q)/(y,p) cells have O=0 but E=25 — without
    // the grid scaffold chi2 would read n/2 instead of n
    val rows = expand(Seq(("x", "p") -> 50, ("y", "q") -> 50), "g")
    val (n, r, c, dof, chi2, v) = chi(rows)("g")
    assert((n, r, c, dof) === ((100L, 2L, 2L, 1L)))
    assert(chi2 === 100.0)
    assert(v === Some(1.0))
  }

  test("chi-square: single-category dimension has dof 0 and NULL cramers_v") {
    val rows = expand(Seq(("x", "p") -> 5, ("x", "q") -> 7), "g")
    val (_, r, c, dof, chi2, v) = chi(rows)("g")
    assert((r, c, dof, chi2, v) === ((1L, 2L, 0L, 0.0, None)))
  }

  private def prop(rows: Seq[(String, String, Boolean)]) =
    Hypothesis.proportionsZTest(rows.toDF("k", "grp", "s"), Seq("k"),
        col("grp"), a = "A", b = "B", success = col("s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)),
          if (r.isNullAt(6)) None else Some(r.getDouble(6)),
          if (r.isNullAt(7)) None else Some(r.getDouble(7))))
      .toMap

  test("two-proportion z: hand case 10/50 vs 20/50") {
    val rows = (1 to 50).map(i => ("g", "A", i <= 10)) ++
      (1 to 50).map(i => ("g", "B", i <= 20))
    val (na, nb, xa, xb, pa, pb, z) = prop(rows)("g")
    assert((na, nb, xa, xb) === ((50L, 50L, 10L, 20L)))
    assert((pa, pb) === ((Some(0.2), Some(0.4))))
    val zExp = (0.2 - 0.4) / math.sqrt(0.3 * 0.7 * (1.0 / 50 + 1.0 / 50))
    assert(math.abs(z.get - zExp) < 2e-6)
  }

  private def ks(rows: Seq[(String, String, Double)]) =
    Hypothesis.ksTest(rows.toDF("k", "grp", "v"), Seq("k"),
        col("grp"), a = "A", b = "B", value = col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toMap

  test("ks: identical samples give D = 0; full separation gives D = 1") {
    val same = Seq(1.0, 2.0, 5.0).flatMap(v => Seq(("same", "A", v), ("same", "B", v)))
    val sep = Seq(("sep", "A", 1.0), ("sep", "A", 2.0),
      ("sep", "B", 3.0), ("sep", "B", 4.0))
    val out = ks(same ++ sep)
    assert(out("same") === ((3L, 3L, Some(0.0), Some(0.0))))
    assert(out("sep")._3 === Some(1.0))
    assert(out("sep")._4 === Some(1.0)) // sqrt(4/4) * 1
  }

  test("ks: interleaved hand case and cross-group ties") {
    // A={1,3}, B={2,4}: D = 0.5. A={1,2}, B={2,3}: the tie at 2 is one
    // CDF step on both sides (peer-inclusive), D = 0.5.
    val out = ks(Seq(("i", "A", 1.0), ("i", "A", 3.0),
      ("i", "B", 2.0), ("i", "B", 4.0),
      ("t", "A", 1.0), ("t", "A", 2.0),
      ("t", "B", 2.0), ("t", "B", 3.0)))
    assert(out("i")._3 === Some(0.5))
    assert(out("t")._3 === Some(0.5))
  }

  test("ks: matches the scalar ECDF model under ties; empty side is NULL") {
    val rows = (1 to 200).map { i =>
      val grp = if (i * 16807 % 3 == 0) "A" else "B"
      ("g", grp, (i * 48271 % 11).toDouble)
    }
    val as = rows.filter(_._2 == "A").map(_._3)
    val bs = rows.filter(_._2 == "B").map(_._3)
    val dExp = rows.map(_._3).distinct.map { v =>
      math.abs(as.count(_ <= v).toDouble / as.size -
        bs.count(_ <= v).toDouble / bs.size)
    }.max
    val out = ks(rows ++ Seq(("empty", "A", 1.0)))
    assert(math.abs(out("g")._3.get - dExp) < 2e-6)
    val ksExp = math.sqrt(as.size.toDouble * bs.size / (as.size + bs.size)) * dExp
    assert(math.abs(out("g")._4.get - ksExp) < 2e-6)
    assert(out("empty") === ((1L, 0L, None, None)))
  }

  private def welch(rows: Seq[(String, String, Double)]) =
    Hypothesis.welchT(rows.toDF("k", "grp", "v"), Seq("k"),
        col("grp"), a = "A", b = "B", value = col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)),
          if (r.isNullAt(6)) None else Some(r.getDouble(6))))
      .toMap

  test("welch: hand case A={1,2,3} B={7,9} — t=-5.196152, df=32/19") {
    val rows = Seq(("k", "A", 1.0), ("k", "A", 2.0), ("k", "A", 3.0),
      ("k", "B", 7.0), ("k", "B", 9.0))
    val (na, nb, ma, mb, t, dfW) = welch(rows)("k")
    assert((na, nb, ma, mb) === ((3L, 2L, Some(2.0), Some(8.0))))
    assert(math.abs(t.get - -6.0 / math.sqrt(4.0 / 3.0)) < 2e-6)
    assert(math.abs(dfW.get - 32.0 / 19.0) < 2e-6)
  }

  test("welch: identical groups give t = 0; singleton side is NULL") {
    val rows = Seq(("eq", "A", 1.0), ("eq", "A", 5.0),
      ("eq", "B", 1.0), ("eq", "B", 5.0),
      ("solo", "A", 2.0), ("solo", "B", 3.0), ("solo", "B", 4.0))
    val out = welch(rows)
    assert(out("eq")._5 === Some(0.0))
    assert(out("solo")._5 === None)
    assert(out("solo")._6 === None)
  }

  private def trend(rows: Seq[(String, Int, Boolean)]) =
    Hypothesis.trendTest(rows.toDF("k", "w", "s"), Seq("k"),
        score = col("w"), success = col("s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toMap

  test("trend test: hand case 0/5/10 successes over scores 1/2/3 — z = 300/sqrt(4500)") {
    val rows = for {
      w <- 1 to 3; i <- 1 to 10
    } yield ("g", w, i <= (w - 1) * 5)
    val (n, x, p, z) = trend(rows)("g")
    assert((n, x, p) === ((30L, 15L, Some(0.5))))
    assert(math.abs(z.get - 300.0 / math.sqrt(4500.0)) < 2e-6)
  }

  test("trend test: flat proportions give z = 0; downward trend is negative; all-success is NULL") {
    val flat = for { w <- 1 to 3; i <- 1 to 10 } yield ("flat", w, i <= 5)
    val down = for { w <- 1 to 3; i <- 1 to 10 } yield ("down", w, i <= (3 - w) * 5)
    val allS = for { w <- 1 to 3; i <- 1 to 4 } yield ("all", w, true)
    val out = trend(flat ++ down ++ allS)
    assert(out("flat")._4 === Some(0.0))
    assert(out("down")._4.get < -4.0)
    assert(out("all")._4 === None)
    assert(out("all")._3 === Some(1.0))
  }

  private def kappa(rows: Seq[(String, String, String)]) =
    Hypothesis.cohensKappa(rows.toDF("k", "a", "b"), Seq("k"),
        raterA = col("a"), raterB = col("b"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))))
      .toMap

  test("kappa: textbook 2x2 [[20,5],[10,15]] gives kappa = 0.4") {
    // D = 35, N = 50, P = rowM·colM = 25*30 + 25*20 = 1250
    // kappa = (35*50 - 1250)/(2500 - 1250) = 500/1250 = 0.4
    val rows = expand(Seq(("y", "y") -> 20, ("y", "n") -> 5,
      ("n", "y") -> 10, ("n", "n") -> 15), "g")
      .map { case (k, a, b) => (k, a, b) }
    val (n, agree, po, pe, kp) = kappa(rows)("g")
    assert((n, agree, po, pe) === ((50L, 35L, 0.7, 0.5)))
    assert(kp === Some(0.4))
  }

  test("kappa: perfect agreement is 1, independence is ~0, constant raters are NULL") {
    val perfect = Seq.fill(6)(("p", "x", "x")) ++ Seq.fill(4)(("p", "y", "y"))
    // exact independence: joint = product of margins
    val indep = expand(Seq(("x", "x") -> 6, ("x", "y") -> 6,
      ("y", "x") -> 4, ("y", "y") -> 4), "i")
      .map { case (k, a, b) => (k, a, b) }
    val const = Seq.fill(5)(("c", "same", "same"))
    val out = kappa(perfect ++ indep ++ const)
    assert(out("p")._5 === Some(1.0))
    assert(out("i")._5 === Some(0.0))
    assert(out("c")._5 === None)
    assert(out("c")._3 === 1.0)
  }

  test("two-proportion z: degenerate pooled proportion or empty group is NULL") {
    val allTrue = (1 to 10).map(i => ("all", if (i <= 5) "A" else "B", true))
    val oneSided = (1 to 10).map(i => ("onesided", "A", i <= 3))
    val out = prop(allTrue ++ oneSided)
    assert(out("all")._7 === None)      // pooled p = 1
    assert(out("all")._5 === Some(1.0))
    assert(out("onesided")._6 === None) // empty B: p_b NULL
    assert(out("onesided")._7 === None)
  }
}
