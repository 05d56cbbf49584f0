package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Benford audit: digit extraction from the integer part, the full
  * 9-digit scaffold (zero-count digits emit rows), domain exclusions
  * (< 1, NULL), and the hardcoded expected shares summing to 1. */
class BenfordSpec extends SparkSpec {
  import spark.implicits._

  private def audit(rows: Seq[(String, java.lang.Double)]) =
    Benford.firstDigitAudit(rows.toDF("k", "v"), Seq("k"), col("v"))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6)))
      .toMap

  test("digits come from the integer part; all 9 rows emit per key") {
    val rows: Seq[(String, java.lang.Double)] = Seq(
      ("g", 1.0), ("g", 1.5), ("g", 19.99), ("g", 150.0), // digit 1 x4
      ("g", 2.0), ("g", 25.0),                            // digit 2 x2
      ("g", 999.9),                                       // digit 9
      ("g", 0.9), ("g", 0.0), ("g", -15.0), ("g", null))  // excluded
    val out = audit(rows)
    assert(out.size === 9)
    assert(out(("g", 1))._1 === 4L)
    assert(out(("g", 2))._1 === 2L)
    assert(out(("g", 9))._1 === 1L)
    // zero-count digits still emit with the expected share attached
    for (d <- Seq(3, 4, 5, 6, 7, 8)) {
      val (nd, n, obs, exp, dev) = out(("g", d))
      assert((nd, n, obs) === ((0L, 7L, 0.0)))
      assert(exp === Benford.Expected.toMap.apply(d))
      assert(dev === BigDecimal(exp).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(out(("g", 1))._2 === 7L) // n counts only the admitted domain
  }

  test("obs_share is the exact count ratio; expected shares sum to ~1") {
    val rows: Seq[(String, java.lang.Double)] =
      (1 to 8).map(i => ("g", java.lang.Double.valueOf(i * 111.0)))
    val out = audit(rows)
    assert(out(("g", 1))._3 === 0.125) // 111 -> digit 1, 1/8
    assert(math.abs(Benford.Expected.map(_._2).sum - 1.0) < 1e-12)
  }
}
