package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Moments.skewKurt: hand-worked symmetric case (skew 0, kurtosis 1.5,
  * JB 0.28125), sign checks, zero-variance NULLs, and the scalar
  * central-moment model on a pseudo-random set. */
class MomentsSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Double)]) =
    Moments.skewKurt(rows.toDF("k", "v"), Seq("k"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)),
          if (r.isNullAt(6)) None else Some(r.getDouble(6))))
      .toMap

  test("symmetric 1,2,3: skew 0, kurtosis 1.5, jb 0.28125 (hand-worked)") {
    val (n, mean, variance, skew, kurt, jb) =
      run(Seq(("g", 1.0), ("g", 2.0), ("g", 3.0)))("g")
    assert((n, mean) === ((3L, 2.0)))
    assert(math.abs(variance - 2.0 / 3) < 1e-6)
    // == not Option equality: round-6 of the ~1e-15 float residue can
    // land on -0.0, and boxed Double.equals(-0.0, 0.0) is false
    assert(skew.get == 0.0)
    assert(kurt === Some(1.5))
    assert(jb === Some(0.28125))
  }

  test("right-skewed data has positive skewness; constant group is NULL") {
    val out = run(Seq(("sk", 0.0), ("sk", 0.0), ("sk", 0.0), ("sk", 9.0),
      ("c", 4.0), ("c", 4.0)))
    assert(out("sk")._4.get > 1.0)
    assert(out("c")._3 === 0.0)
    assert(out("c")._4 === None)
    assert(out("c")._5 === None)
    assert(out("c")._6 === None)
  }

  test("out-of-contract values (|x| >= 10^4) drop from n AND the sums — never half-counted") {
    // 12345.0 overflows DECIMAL(8,4) -> NULL cast; a raw-column null
    // filter would count it in n while excluding it from every power
    // sum, silently corrupting mean/variance/skew. The group must
    // compute EXACTLY as if the row were absent.
    val clean = run(Seq(("g", 1.0), ("g", 2.0), ("g", 3.0)))("g")
    val dirty = run(Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 12345.0)))("g")
    assert(dirty === clean)
    assert(dirty._1 === 3L)
  }

  test("matches the scalar central-moment model on a pseudo-random set") {
    val vs = (1 to 300).map(i => (i * 48271 % 89).toDouble / 8.0)
    val n = vs.size.toDouble
    val m1 = vs.sum / n
    val m2 = vs.map(v => (v - m1) * (v - m1)).sum / n
    val m3 = vs.map(v => math.pow(v - m1, 3)).sum / n
    val m4 = vs.map(v => math.pow(v - m1, 4)).sum / n
    val skew = m3 / (m2 * math.sqrt(m2))
    val kurt = m4 / (m2 * m2)
    val jb = n / 6.0 * (skew * skew + 0.25 * (kurt - 3.0) * (kurt - 3.0))
    val got = run(vs.map(("g", _)))("g")
    assert(got._1 === 300L)
    assert(math.abs(got._4.get - skew) < 2e-6)
    assert(math.abs(got._5.get - kurt) < 2e-6)
    assert(math.abs(got._6.get - jb) < 1e-4)
  }
}
