package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Inequality: Gini pinned to hand values (equality → 0, single holder
  * → 1 − 1/n, textbook 0.25 case), input-order invariance under ties,
  * NULL on negative/zero-total groups; HHI pinned to exact share
  * fractions and a scalar model. */
class InequalitySpec extends SparkSpec {
  import spark.implicits._

  private def gini(rows: Seq[(String, Double)]) =
    Inequality.giniPerKey(rows.toDF("g", "x"), Seq("g"), col("x"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap

  private def hhi(rows: Seq[(String, Double)]) =
    Inequality.hhiPerKey(rows.toDF("g", "x"), Seq("g"), col("x"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toMap

  test("gini: perfect equality is exactly 0; single holder is 1 - 1/n") {
    val rows = Seq.fill(7)(("eq", 3.5)) ++
      Seq(("one", 0.0), ("one", 0.0), ("one", 0.0), ("one", 42.0))
    val out = gini(rows)
    assert(out("eq") === ((7L, 24.5, Some(0.0))))
    assert(out("one") === ((4L, 42.0, Some(0.75))))
  }

  test("gini: textbook 1,2,3,4 case is 0.25; tie order cannot change it") {
    assert(gini(Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0)))("g")
      === ((4L, 10.0, Some(0.25))))
    // many ties, two input orders → identical result
    val masses = (1 to 60).map(i => (i * 48271 % 5).toDouble + 1.0)
    val fwd = gini(masses.map(("t", _)))("t")
    val rev = gini(masses.reverse.map(("t", _)))("t")
    assert(fwd === rev)
  }

  test("gini: negative mass and zero-total groups report NULL") {
    val out = gini(Seq(("neg", -1.0), ("neg", 5.0),
      ("zero", 0.0), ("zero", 0.0)))
    assert(out("neg")._3 === None)
    assert(out("zero") === ((2L, 0.0, None)))
  }

  test("gini: matches the scalar rank formula on a pseudo-random set") {
    val masses = (1 to 200).map(i => (i * 16807 % 997).toDouble / 4.0)
    val sorted = masses.sorted
    val n = masses.size.toDouble
    val sx = sorted.sum
    val si = sorted.zipWithIndex.map { case (x, i) => x * (i + 1) }.sum
    val expected = (2.0 * si - (n + 1.0) * sx) / (n * sx)
    val got = gini(masses.map(("g", _)))("g")
    assert(got._1 === 200L)
    assert(math.abs(got._3.get - expected) < 2e-6)
  }

  test("hhi: even shares are 1/n; a single entity is 1; 1-vs-3 split is 0.625") {
    val out = hhi(Seq(("even", 2.0), ("even", 2.0), ("even", 2.0), ("even", 2.0),
      ("solo", 9.0),
      ("split", 1.0), ("split", 3.0)))
    assert(out("even") === ((4L, 8.0, Some(0.25), Some(0.25))))
    assert(out("solo") === ((1L, 9.0, Some(1.0), Some(1.0))))
    assert(out("split") === ((2L, 4.0, Some(0.625), Some(0.75))))
  }

  test("hhi: zero-total group reports NULL indices; scalar model agreement") {
    val out = hhi(Seq(("z", 0.0), ("z", 0.0)))
    assert(out("z") === ((2L, 0.0, None, None)))
    val masses = (1 to 80).map(i => (i * 48271 % 13).toDouble + 0.25)
    val sx = masses.sum
    val expected = masses.map(x => x * x).sum / (sx * sx)
    val got = hhi(masses.map(("g", _)))("g")
    assert(math.abs(got._3.get - expected) < 2e-6)
    assert(math.abs(got._4.get - masses.max / sx) < 2e-6)
  }
}
