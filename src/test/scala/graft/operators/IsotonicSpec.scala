package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Isotonic.fit: textbook PAVA cases, weighted pooling, invariants
  * (monotone output, weighted-mean preservation), agreement with the
  * max-min characterization on a pseudo-random series, and the
  * duplicate-order guard. */
class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Double)]) =
    Isotonic.fit(rows.toDF("k", "o", "v"), Seq("k"), col("o"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3)))
      .toMap

  test("monotone input is unchanged; decreasing input pools to the mean") {
    val rows = (1L to 5L).map(o => ("up", o, o.toDouble)) ++
      (1L to 4L).map(o => ("down", o, (5 - o).toDouble))
    val out = run(rows)
    for (o <- 1L to 5L) assert(out(("up", o))._2 === o.toDouble)
    for (o <- 1L to 4L) assert(out(("down", o))._2 === 2.5)
  }

  test("textbook 1,3,2 pools the tail to 2.5") {
    val out = run(Seq(("g", 1L, 1.0), ("g", 2L, 3.0), ("g", 3L, 2.0)))
    assert(out(("g", 1L))._2 === 1.0)
    assert(out(("g", 2L))._2 === 2.5)
    assert(out(("g", 3L))._2 === 2.5)
  }

  test("weights pool to the weighted mean") {
    // y=3 (w=1) then y=1 (w=3): violator pools to (3 + 3)/4 = 1.5
    val df = Seq(("g", 1L, 3.0, 1L), ("g", 2L, 1.0, 3L)).toDF("k", "o", "v", "w")
    val out = Isotonic.fit(df, Seq("k"), col("o"), col("v"), col("w"))
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(out(1L) === 1.5)
    assert(out(2L) === 1.5)
  }

  test("invariants + max-min characterization on a pseudo-random series") {
    val ys = (1 to 80).map(i => ((i * 48271 % 23) + i / 10).toDouble / 4.0)
    val out = Isotonic.fit(ys.zipWithIndex.map { case (y, i) =>
        ("g", i.toLong, y) }.toDF("k", "o", "v"),
        Seq("k"), col("o"), col("v"))
      .orderBy("o").collect().map(r => (r.getDouble(2), r.getDouble(3)))
    // monotone non-decreasing
    out.sliding(2).foreach { case Array((_, f1), (_, f2)) =>
      assert(f1 <= f2, s"fitted not monotone: $f1 > $f2")
    }
    // mean preservation (PAVA projects onto the monotone cone without
    // moving the total)
    assert(math.abs(out.map(_._1).sum - out.map(_._2).sum) < 1e-6)
    // max-min characterization: fitted[i] = max_{j<=i} min_{k>=i} mean(j..k)
    val n = ys.length
    for (i <- 0 until n) {
      val mm = (0 to i).map { j =>
        (i until n).map { k => ys.slice(j, k + 1).sum / (k - j + 1) }.min
      }.max
      assert(math.abs(out(i)._2 - mm) < 2e-6, s"row $i")
    }
  }

  test("duplicate order values within a key throw") {
    val ex = intercept[org.apache.spark.SparkException] {
      run(Seq(("g", 1L, 1.0), ("g", 1L, 2.0)))
    }
    assert(ex.getMessage.contains("duplicate order") ||
      Option(ex.getCause).exists(_.getMessage.contains("duplicate order")))
  }
}
