package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RankCompare.rbo: identical rankings give 1 − p^D exactly (the
  * geometric sum stays exact under the 12-dp quantization for D ≤ 13),
  * reversed rankings match the hand-worked X_d table, fully disjoint
  * prefixes score rbo = 0 (never vanish), and a pseudo-random case
  * matches the scalar quantized model bit-for-bit. */
class RankCompareSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Double, Double)], depth: Int) =
    RankCompare.rbo(rows.toDF("k", "id", "sa", "sb"), Seq("k"),
        id = col("id"), scoreA = col("sa"), scoreB = col("sb"),
        depth = depth)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getLong(3)))
      .toMap

  private def scalarRbo(ms: Seq[Int], depth: Int): Double = {
    val t12 = (1 to depth).map { d =>
      val x = ms.count(_ <= d)
      (BigInt(x) * BigInt(9).pow(d - 1) * BigInt(10).pow(12)
        / (BigInt(10).pow(d - 1) * d)).toLong
    }.sum
    BigDecimal(t12.toDouble * (1.0 - 0.9) / 1.0e12)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("identical rankings: rbo = 1 - 0.9^10 = 0.651322; X_D = D") {
    val rows = (1L to 20L).map(i => ("g", i, i.toDouble, i * 2.0))
    val (rbo, xFinal, depth) = run(rows, 10)("g")
    assert((rbo, xFinal, depth) === ((0.651322, 10L, 10L)))
  }

  test("reversed rankings at depth 4: hand-worked X = (0,0,2,4)") {
    val rows = (1L to 4L).map(i => ("g", i, i.toDouble, -i.toDouble))
    val (rbo, xFinal, _) = run(rows, 4)("g")
    // terms: d=3: (2*81e12) div 300 = 54e10; d=4: (4*729e12) div 4000 = 72.9e10
    assert(xFinal === 4L)
    assert(rbo === scalarRbo(Seq(4, 3, 3, 4), 4))
  }

  test("fully disjoint prefixes within depth: the key reports rbo = 0, not absence") {
    // with depth 1 the two top-1 prefixes are {1} vs {4}: zero overlap
    // at every graded depth — the key must still emit a row scoring 0
    // (dropping it would silently shrink the comparison universe)
    val rows = (1L to 4L).map(i => ("g", i, i.toDouble, -i.toDouble))
    val out = run(rows, 1)
    assert(out("g") === ((0.0, 0L, 1L)))
    // and it coexists with a normal key in the same frame
    val both = run(rows ++ (1L to 4L).map(i => ("h", i, i.toDouble, i.toDouble)), 1)
    assert(both("g") === ((0.0, 0L, 1L)))
    assert(both("h")._2 === 1L)
  }

  test("matches the scalar quantized model; boundary ties break by id") {
    val rows = (1L to 30L).map { i =>
      ("g", i, (i * 48271 % 13).toDouble, (i * 16807 % 11).toDouble)
    }
    // scalar ranks with (score, id) tiebreak
    def ranks(score: Long => Double) =
      (1L to 30L).sortBy(i => (score(i), i)).zipWithIndex
        .map { case (i, r) => i -> (r + 1) }.toMap
    val ra = ranks(i => (i * 48271 % 13).toDouble)
    val rb = ranks(i => (i * 16807 % 11).toDouble)
    val ms = (1L to 30L).map(i => math.max(ra(i), rb(i)))
    val depth = 10
    val (rbo, xFinal, _) = run(rows, depth)("g")
    assert(xFinal === ms.count(_ <= depth).toLong)
    assert(rbo === scalarRbo(ms, depth))
  }
}
