package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Divergence.jsDivergenceMatrix: identity 0, disjoint ln 2, symmetry
  * via the pair ordering, hand-computed middle case. */
class DivergenceSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, String)]) =
    Divergence.jsDivergenceMatrix(rows.toDF("src", "text"),
        col("src"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap

  test("identical distributions score 0; disjoint vocabularies score ln 2") {
    val out = run(Seq(
      ("a", "cat dog cat"), ("b", "cat dog cat"),
      ("c", "fish bird fish")))
    assert(out(("a", "b"))._2 === 0.0)
    assert(math.abs(out(("a", "c"))._2 - math.log(2.0)) < 1e-6)
    assert(math.abs(out(("b", "c"))._2 - math.log(2.0)) < 1e-6)
    assert(out.size === 3) // unordered pairs only
  }

  test("hand-computed two-word case") {
    // P = (x: 1/2, y: 1/2), Q = (x: 1, y: 0)
    // JS = 1/2[1/2 ln(2·½/(½+1)) + 1/2 ln(2·½/(½+0))]
    //    + 1/2[1 ln(2·1/(½+1))]
    val p = 0.5; val q1 = 1.0
    val expected =
      0.5 * (p * math.log(2 * p / (p + q1)) + p * math.log(2 * p / (p + 0))) +
        0.5 * (q1 * math.log(2 * q1 / (p + q1)))
    val out = run(Seq(("a", "x y"), ("b", "x x")))
    assert(out(("a", "b"))._1 === 2L)
    assert(math.abs(out(("a", "b"))._2 - expected) < 1e-6)
  }
}
