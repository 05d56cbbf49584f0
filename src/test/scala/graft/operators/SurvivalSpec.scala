package graft.operators

import graft.SparkSpec

/** kaplanMeier: the textbook worked example, censoring semantics (risk
  * set membership, no curve rows at censor-only times), tie handling,
  * and agreement with a scalar fold on a pseudo-random cohort. */
class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)]) =
    Survival.kaplanMeier(rows.toDF("g", "dur", "obs"), "g", "dur", "obs")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap

  /** Scalar reference: the same left-associated fold. */
  private def scalarKm(subjects: Seq[(Long, Long)]): Seq[(Long, Long, Long, Double)] = {
    val eventTimes = subjects.filter(_._2 == 1).map(_._1).distinct.sorted
    var s = 1.0
    eventTimes.map { t =>
      val d = subjects.count(x => x._1 == t && x._2 == 1)
      val n = subjects.count(_._1 >= t)
      s = s * (1.0 - d.toDouble / n.toDouble)
      (t, d.toLong, n.toLong, s)
    }
  }

  test("textbook worked example (6 subjects, one censored)") {
    // durations: 1(ev) 2(ev) 3(cens) 4(ev) 4(ev) 5(cens)
    val rows = Seq[(String, Long, Long)](
      ("a", 1, 1), ("a", 2, 1), ("a", 3, 0), ("a", 4, 1), ("a", 4, 1), ("a", 5, 0))
    val out = run(rows)
    // t=1: d=1 n=6 → 5/6; t=2: d=1 n=5 → 5/6·4/5; t=4: d=2 n=3 → ·1/3
    assert(out(("a", 1L)) === ((1L, 6L, 1.0 - 1.0 / 6.0)))
    assert(out(("a", 2L)) === ((1L, 5L, (1.0 - 1.0 / 6.0) * (1.0 - 1.0 / 5.0))))
    assert(out(("a", 4L)) === ((2L, 3L,
      (1.0 - 1.0 / 6.0) * (1.0 - 1.0 / 5.0) * (1.0 - 2.0 / 3.0))))
    // censor-only times emit no row
    assert(!out.contains(("a", 3L)) && !out.contains(("a", 5L)))
  }

  test("censored subjects stay in the risk set until they drop out") {
    // censor at 10 must count toward n at event time 5
    val out = run(Seq(("a", 5L, 1L), ("a", 10L, 0L)))
    assert(out(("a", 5L)) === ((1L, 2L, 0.5)))
  }

  test("all-censored group produces an empty curve") {
    assert(run(Seq(("a", 1L, 0L), ("a", 2L, 0L))).isEmpty)
  }

  test("event and censor at the SAME time: censored subject is at risk") {
    // standard KM convention: risk set is duration >= t, so the subject
    // censored at 5 counts toward n at the t=5 event
    val out = run(Seq(("a", 5L, 1L), ("a", 5L, 0L)))
    assert(out(("a", 5L)) === ((1L, 2L, 0.5)))
  }

  test("groups are independent curves") {
    val out = run(Seq(("a", 1L, 1L), ("b", 1L, 1L), ("b", 2L, 1L)))
    assert(out(("a", 1L))._3 === 0.0)
    assert(out(("b", 1L)) === ((1L, 2L, 0.5)))
    assert(out(("b", 2L)) === ((1L, 1L, 0.0)))
  }

  test("matches the scalar fold bit-for-bit on a pseudo-random cohort") {
    val subjects = (1 to 300).map { i =>
      ((i * 48271 % 37).toLong, if (i * 16807 % 3 == 0) 1L else 0L)
    }
    val expected = scalarKm(subjects)
      .map { case (t, d, n, s) => ("g", t) -> ((d, n, s)) }.toMap
    val out = run(subjects.map { case (t, o) => ("g", t, o) })
    assert(out === expected)
  }

  private def runLogRank(rows: Seq[(String, String, Long, Long)]) = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    Survival.logRank(rows.toDF("k", "grp", "t", "obs"), Seq("k"),
        col("grp"), a = "A", b = "B", duration = col("t"),
        observed = col("obs"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)),
          if (r.isNullAt(6)) None else Some(r.getDouble(6))))
      .toMap
  }

  test("logRank: hand-worked 3-vs-3 case (quantized sums)") {
    // A: 5(event) 7(cens) 9(event); B: 4(event) 8(event) 9(cens)
    // E₁₆ terms: 500000+600000+333333+500000 = 1933333
    // V₆  terms: 250000+240000+222222+250000 = 962222
    val rows = Seq(("g", "A", 5L, 1L), ("g", "A", 7L, 0L), ("g", "A", 9L, 1L),
      ("g", "B", 4L, 1L), ("g", "B", 8L, 1L), ("g", "B", 9L, 0L))
    val (na, nb, oa, ea, chi2, z) = runLogRank(rows)("g")
    assert((na, nb, oa, ea) === ((3L, 3L, 2L, 1.933333)))
    val zExp = 66667.0 / math.sqrt(1.0e6 * 962222.0)
    assert(math.abs(z.get - zExp) < 2e-6)
    assert(math.abs(chi2.get - zExp * zExp) < 2e-6)
  }

  test("logRank: identical groups give z ~ 0; early-event group gets z > 0") {
    val same = (1L to 10L).flatMap(t =>
      Seq(("same", "A", t, t % 2), ("same", "B", t, t % 2)))
    val sep = (1L to 5L).map(t => ("sep", "A", t, 1L)) ++
      (11L to 15L).map(t => ("sep", "B", t, 1L))
    val out = runLogRank(same ++ sep)
    assert(math.abs(out("same")._6.get) < 1e-5)
    // all of A's events happen while B's full risk set is present:
    // observed A-events exceed expectation → positive z
    assert(out("sep")._6.get > 1.5)
  }

  test("logRank: an empty side reports NULL chi2/z") {
    val out = runLogRank(Seq(("g", "A", 3L, 1L), ("g", "A", 5L, 0L)))
    assert(out("g")._2 === 0L)
    assert(out("g")._5 === None)
    assert(out("g")._6 === None)
  }
}
