package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TimeSeries.holtWinters: recovers a pure level+season signal exactly,
  * matches the scalar recursion bit-for-bit, and drops short keys. */
class HoltWintersSpec extends SparkSpec {
  import spark.implicits._

  private val (a, bq, g) = (0.25, 0.125, 0.25)

  private def run(rows: Seq[(String, Long, Double)], m: Int) =
    TimeSeries.holtWinters(rows.toDF("k", "t", "v"), "k", "t", "v",
      period = m, alpha = a, beta = bq, gamma = g)

  test("a stationary seasonal signal forecasts itself exactly") {
    // y_t = 10 + s(t mod 4), s = (2, -1, -2, 1): zero trend — the init
    // seasonals are exact, so every one-step forecast equals y
    val sPat = Map(0 -> 2.0, 1 -> -1.0, 2 -> -2.0, 3 -> 1.0)
    val rows = (0L until 24L).map(t => ("g", t, 10.0 + sPat((t % 4).toInt)))
    val out = run(rows, 4).collect()
      .map(r => r.getLong(1) -> (r.getDouble(3), r.getDouble(4),
        r.getDouble(5), if (r.isNullAt(6)) None else Some(r.getDouble(6))))
      .toMap
    for (t <- 0L until 4L) assert(out(t)._4 === None) // init rows
    for (t <- 4L until 24L) {
      val y = 10.0 + sPat((t % 4).toInt)
      assert(math.abs(out(t)._4.get - y) < 1e-9, s"t=$t")
      assert(math.abs(out(t)._1 - 10.0) < 1e-9) // level stays at 10
      assert(math.abs(out(t)._2) < 1e-9)        // trend stays 0
    }
  }

  test("matches the scalar recursion bit-for-bit on a noisy series") {
    val m = 3
    val ys = (0 until 20).map(i => ((i * 48271 % 89) / 4.0) + i * 0.5)
    val rows = ys.zipWithIndex.map { case (y, i) => ("g", i.toLong, y) }
    val out = run(rows, m).collect()
      .map(r => r.getLong(1) -> (r.getDouble(3), r.getDouble(4),
        r.getDouble(5), if (r.isNullAt(6)) None else Some(r.getDouble(6))))
      .toMap
    // scalar replay with the identical trees
    var acc = 0.0
    for (i <- 0 until m) acc = acc + ys(i)
    val l0 = acc / m
    val s = Array.tabulate(m)(p => ys(p) - l0)
    var l = l0; var b = 0.0
    for (t <- 0 until 20) {
      if (t < m) {
        assert(out(t.toLong) === ((l0, 0.0, s(t), None)))
      } else {
        val p = t % m
        val sOld = s(p)
        val fc = (l + b) + sOld
        val lp = l
        l = a * (ys(t) - sOld) + (1 - a) * (l + b)
        b = bq * (l - lp) + (1 - bq) * b
        s(p) = g * (ys(t) - l) + (1 - g) * sOld
        assert(out(t.toLong) === ((l, b, s(p), Some(fc))), s"t=$t")
      }
    }
  }

  test("keys shorter than one period emit nothing") {
    val rows = Seq(("short", 0L, 1.0), ("short", 1L, 2.0)) ++
      (0L until 8L).map(t => ("long", t, t.toDouble))
    val out = run(rows, 4).collect()
    assert(!out.exists(_.getString(0) == "short"))
    assert(out.count(_.getString(0) == "long") === 8)
  }
}
