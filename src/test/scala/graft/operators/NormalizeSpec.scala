package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Normalize.quantileNormalize: identity on equal distributions, pure
  * rank mapping onto a shifted reference, the ceil target-rank
  * convention across different sizes, deterministic tie handling via
  * the id tiebreak, and key independence. */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def run(src: Seq[(String, Long, Double)],
                  ref: Seq[(String, Long, Double)]) =
    Normalize.quantileNormalize(
        src.toDF("k", "cid", "spend"),
        ref.toDF("k", "cid", "spend"),
        Seq("k"), col("spend"), col("cid"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getLong(3), r.getDouble(4)))
      .toMap

  test("equal-size mapping is pure rank order; identity when src = ref") {
    val src = Seq(("g", 1L, 3.0), ("g", 2L, 1.0), ("g", 3L, 2.0))
    val ref = Seq(("g", 9L, 30.0), ("g", 8L, 10.0), ("g", 7L, 20.0))
    val out = run(src, ref)
    assert(out(("g", 2L)) === ((1.0, 1L, 10.0)))
    assert(out(("g", 3L)) === ((2.0, 2L, 20.0)))
    assert(out(("g", 1L)) === ((3.0, 3L, 30.0)))
    val ident = run(src, src)
    for ((_, (v, _, norm)) <- ident) assert(v === norm)
  }

  test("ceil target ranks across different sizes: n=2 onto m=4") {
    // ranks 1,2 of 2 map to ceil(1*4/2)=2, ceil(2*4/2)=4
    val out = run(Seq(("g", 1L, 5.0), ("g", 2L, 6.0)),
      Seq(("g", 1L, 10.0), ("g", 2L, 20.0), ("g", 3L, 30.0), ("g", 4L, 40.0)))
    assert(out(("g", 1L))._3 === 20.0)
    assert(out(("g", 2L))._3 === 40.0)
  }

  test("source ties map deterministically by id; keys are independent") {
    val src = Seq(("a", 5L, 7.0), ("a", 3L, 7.0), ("b", 1L, 1.0))
    val ref = Seq(("a", 1L, 100.0), ("a", 2L, 200.0), ("b", 1L, 9.0))
    val out = run(src, ref)
    // tie broken by id: id 3 gets rank 1 -> 100, id 5 rank 2 -> 200
    assert(out(("a", 3L)) === ((7.0, 1L, 100.0)))
    assert(out(("a", 5L)) === ((7.0, 2L, 200.0)))
    assert(out(("b", 1L)) === ((1.0, 1L, 9.0)))
  }
}
