package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RankStats.kruskalWallis vs the scalar quantized model (doubled
  * ranks, 9-dp integer-quantized group terms), plus the textbook
  * no-ties case and the degenerate NULLs. */
class KruskalWallisSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, String, Double)]) =
    RankStats.kruskalWallis(rows.toDF("k", "g", "v"), Seq("k"),
        col("g"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toMap

  /** Scalar replay of the exact quantized definition. */
  private def scalarH(groups: Map[String, Seq[Double]]): (Double, Double) = {
    val all = groups.toSeq.flatMap { case (g, vs) => vs.map(g -> _) }
    val n = all.size
    // doubled tie-averaged rank of value v
    def r2(v: Double): Long = {
      val below = all.count(_._2 < v)
      val eq = all.count(_._2 == v)
      (below + 1).toLong + (below + eq).toLong
    }
    val tsum = groups.values.map { vs =>
      val s2 = vs.map(r2).sum
      (BigInt(s2) * BigInt(s2) * BigInt(1000000000) /
        (BigInt(vs.size) * n * (n + 1))).toLong
    }.sum
    val h = 3.0 * tsum.toDouble / 1.0e9 - 3.0 * (n + 1.0)
    val tcorr = all.groupBy(_._2).values
      .map(g => { val t = g.size.toLong; t * t * t - t }).sum
    val c = 1.0 - tcorr.toDouble / (n.toDouble * n * n - n)
    (h, h / c)
  }

  test("no-ties textbook case matches the classical formula") {
    // three groups, all distinct values: H = 12/(N(N+1)) Σ R²/n − 3(N+1)
    val gs = Map("a" -> Seq(1.0, 4.0, 7.0), "b" -> Seq(2.0, 5.0, 8.0),
      "c" -> Seq(3.0, 6.0, 9.0))
    val rows = gs.toSeq.flatMap { case (g, vs) => vs.map(v => ("x", g, v)) }
    val (n, k, h, hc) = run(rows)("x")
    assert((n, k) === ((9L, 3L)))
    // classical: ranks a=(1,4,7) R=12, b=(2,5,8) R=15, c=(3,6,9) R=18
    val hExp = 12.0 / (9 * 10) * (144.0 / 3 + 225.0 / 3 + 324.0 / 3) - 3 * 10
    assert(math.abs(h.get - hExp) < 1e-6)
    assert(hc.get === h.get) // no ties: correction is identity
  }

  test("matches the scalar quantized model with heavy ties") {
    val gs = Map(
      "a" -> (1 to 40).map(i => (i * 7 % 5).toDouble),
      "b" -> (1 to 30).map(i => (i * 11 % 5).toDouble + 1),
      "c" -> (1 to 50).map(i => (i * 13 % 4).toDouble))
    val rows = gs.toSeq.flatMap { case (g, vs) => vs.map(v => ("x", g, v)) }
    val (h, hc) = scalarH(gs.map { case (k, v) => k -> v.toSeq })
    val got = run(rows)("x")
    assert(math.abs(got._3.get - h) < 1e-6)
    assert(math.abs(got._4.get - hc) < 1e-6)
  }

  test("single group or all-ties reports NULL") {
    assert(run(Seq(("x", "a", 1.0), ("x", "a", 2.0)))("x")._3 === None)
    val ties = Seq(("x", "a", 5.0), ("x", "a", 5.0), ("x", "b", 5.0))
    assert(run(ties)("x")._4 === None)
  }
}
