package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RankStats: Spearman pinned to hand values and to a scalar
  * doubled-rank model (bit-for-bit — the same exact sums feed the same
  * IEEE tree); Mann-Whitney pinned to a no-ties textbook case and to
  * the tie-corrected scalar model; invariants (u_a + u_b = n_a·n_b,
  * NULL on degenerate groups) on pseudo-random data. */
class RankStatsSpec extends SparkSpec {
  import spark.implicits._

  // scalar doubled tie-averaged rank: minRank + maxRank
  private def doubledRanks(vs: Seq[Double]): Seq[Long] =
    vs.map(v => (vs.count(_ < v) + 1 + vs.count(_ <= v)).toLong)

  private def scalarSpearman(xs: Seq[Double], ys: Seq[Double]): Option[Double] = {
    val rx = doubledRanks(xs).map(BigInt(_))
    val ry = doubledRanks(ys).map(BigInt(_))
    val n = xs.size.toDouble
    val sx = rx.sum.toDouble; val sy = ry.sum.toDouble
    val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum.toDouble
    val sxx = rx.map(a => a * a).sum.toDouble
    val syy = ry.map(a => a * a).sum.toDouble
    val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
    if (vx > 0 && vy > 0) Some((n * sxy - sx * sy) / math.sqrt(vx * vy))
    else None
  }

  private def runSpearman(rows: Seq[(String, Double, Double)]) =
    RankStats.spearmanPerKey(rows.toDF("g", "x", "y"), Seq("g"),
        col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap

  test("spearman: any monotone map is rho = 1; reversal is rho = -1") {
    val rows = (1 to 9).map(i => ("up", i.toDouble, math.pow(i, 3))) ++
      (1 to 9).map(i => ("down", i.toDouble, -math.exp(i / 3.0)))
    val out = runSpearman(rows)
    assert(out("up") === ((9L, Some(1.0))))
    assert(out("down") === ((9L, Some(-1.0))))
  }

  test("spearman: constant variable reports NULL, not NaN") {
    val rows = Seq(("c", 1.0, 5.0), ("c", 2.0, 5.0), ("c", 3.0, 5.0))
    assert(runSpearman(rows)("c") === ((3L, None)))
  }

  test("spearman: matches the scalar doubled-rank model under heavy ties") {
    val xs = (1 to 120).map(i => (i * 48271 % 7).toDouble)
    val ys = (1 to 120).map(i => (i * 48271 % 7 + i * 16807 % 5).toDouble)
    val rows = xs.zip(ys).map { case (x, y) => ("g", x, y) }
    val (n, rho) = runSpearman(rows)("g")
    assert(n === 120L)
    assert(math.abs(rho.get - scalarSpearman(xs, ys).get) < 2e-6)
  }

  private def runMw(rows: Seq[(String, String, Double)]) =
    RankStats.mannWhitney(rows.toDF("k", "grp", "v"), Seq("k"),
        col("grp"), a = "A", b = "B", value = col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))))
      .toMap

  test("mann-whitney: fully separated groups, no ties (hand-computed)") {
    // A = {1,2,3}, B = {4,5,6}: U_A = 0, U_B = 9,
    // z = -4.5 / sqrt(9*7/12) = -1.963961 at 6 dp
    val rows = Seq(("k", "A", 1.0), ("k", "A", 2.0), ("k", "A", 3.0),
      ("k", "B", 4.0), ("k", "B", 5.0), ("k", "B", 6.0))
    val (na, nb, ua, ub, z) = runMw(rows)("k")
    assert((na, nb, ua, ub) === ((3L, 3L, 0.0, 9.0)))
    assert(math.abs(z.get - -4.5 / math.sqrt(9.0 * 7.0 / 12.0)) < 2e-6)
    assert(z === Some(-1.963961))
  }

  test("mann-whitney: matches the tie-corrected scalar model; u_a+u_b = n_a*n_b") {
    val rows = (1 to 150).map { i =>
      val grp = if (i * 16807 % 3 == 0) "A" else "B"
      ("k", grp, (i * 48271 % 9).toDouble)
    }
    val all = rows.map(_._3)
    val r2 = doubledRanks(all)
    val isA = rows.map(_._2 == "A")
    val naL = isA.count(identity); val nbL = rows.size - naL
    val na = naL.toDouble; val nb = nbL.toDouble; val nd = rows.size.toDouble
    val r2a = r2.zip(isA).filter(_._2).map(_._1).sum.toDouble
    val tcorr = all.groupBy(identity).values
      .map { g => val t = g.size.toLong; (t * t * t - t).toDouble }.sum
    val du = r2a - na * (na + 1.0)
    val var4 = na * nb / 3.0 * (nd + 1.0 - tcorr / (nd * (nd - 1.0)))
    val zExp = (du - na * nb) / math.sqrt(var4)
    val (gotNa, gotNb, ua, ub, z) = runMw(rows)("k")
    assert((gotNa, gotNb) === ((naL.toLong, nbL.toLong)))
    assert(ua === du / 2.0)
    assert(ua + ub === na * nb)
    assert(math.abs(z.get - zExp) < 2e-6)
  }

  test("mann-whitney: one-sided or all-tied groups report NULL z") {
    val rows = Seq(("only_a", "A", 1.0), ("only_a", "A", 2.0),
      ("tied", "A", 3.0), ("tied", "A", 3.0),
      ("tied", "B", 3.0), ("tied", "B", 3.0))
    val out = runMw(rows)
    assert(out("only_a")._5 === None)
    assert(out("tied")._5 === None)
    // all-tied: both U statistics sit exactly at the midpoint n_a*n_b/2
    assert(out("tied")._3 === 2.0)
    assert(out("tied")._4 === 2.0)
  }
}
