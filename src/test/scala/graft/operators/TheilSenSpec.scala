package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TheilSen.fit: exact recovery of a clean line, robustness to a wild
  * outlier (the point of the estimator), the lower-median convention
  * pinned on a hand case, and the scalar pairwise-slope model. */
class TheilSenSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Double)]) =
    TheilSen.fit(rows.toDF("k", "o", "v"), Seq("k"), col("o"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap

  test("clean line y = 2o + 3 is recovered exactly") {
    val rows = (0L to 10L).map(o => ("g", o, 2.0 * o + 3.0))
    val (n, nPairs, slope, intercept) = run(rows)("g")
    assert((n, nPairs) === ((11L, 55L)))
    assert((slope, intercept) === ((2.0, 3.0)))
  }

  test("one wild outlier does not move the slope (OLS would)") {
    val rows = (0L to 9L).map(o => ("g", o, o.toDouble)) :+ ("g", 10L, 1000.0)
    val (_, _, slope, intercept) = run(rows)("g")
    assert(slope === 1.0)
    assert(intercept === 0.0)
  }

  test("lower-median convention on the 3-point hand case") {
    // slopes {2, 1.5, 1} → lower median (rank 2 of 3) = 1.5;
    // residuals y − 1.5o = {0, 0.5, 0} → lower median = 0
    val out = run(Seq(("g", 0L, 0.0), ("g", 1L, 2.0), ("g", 2L, 3.0)))
    assert(out("g") === ((3L, 3L, 1.5, 0.0)))
  }

  test("matches the scalar pairwise-slope model; sub-2-point keys absent") {
    val ys = (0 until 40).map(i => (i * 48271 % 17).toDouble / 4.0 + i * 0.5)
    val rows = ys.zipWithIndex.map { case (y, i) => ("g", i.toLong, y) } :+
      ("single", 1L, 9.0)
    val slopes = (for {
      j <- ys.indices; k <- ys.indices if k > j
    } yield (ys(k) - ys(j)) / (k - j)).sorted
    val slopeExp = slopes((slopes.size + 1) / 2 - 1)
    val res = ys.indices.map(i => ys(i) - slopeExp * i).sorted
    val interceptExp = res((res.size + 1) / 2 - 1)
    val out = run(rows)
    assert(!out.contains("single"))
    val (n, nPairs, slope, intercept) = out("g")
    assert((n, nPairs) === ((40L, 780L)))
    assert(math.abs(slope - slopeExp) < 2e-6)
    assert(math.abs(intercept - interceptExp) < 2e-6)
  }
}
