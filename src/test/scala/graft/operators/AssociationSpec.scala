package graft.operators

import graft.SparkSpec

/** frequentPairs: supports count baskets (duplicates collapse), the
  * threshold is exact ceil integer arithmetic, the apriori prune never
  * drops a frequent pair, and confidence/lift are the documented
  * single-division doubles. */
class AssociationSpec extends SparkSpec {
  import spark.implicits._

  test("hand case: supports, ceil threshold, confidence and lift") {
    // 4 baskets; min support 1/2 -> threshold ceil(4/2) = 2
    val baskets = Seq(
      (1L, "x"), (1L, "y"),
      (2L, "x"), (2L, "y"), (2L, "y"), // duplicate y collapses
      (3L, "x"), (3L, "z"),
      (4L, "z"))
      .toDF("b", "i")
      // items as longs for the operator contract
      .selectExpr("b", "CASE i WHEN 'x' THEN 10 WHEN 'y' THEN 20 ELSE 30 END AS i")
    val out = Association.frequentPairs(baskets, "b", "i", 1L, 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7), r.getDouble(8))).toMap
    // frequent items: x(3), y(2), z(2); frequent pairs: only (x,y) n=2
    // ((x,z) appears once < 2)
    assert(out.keySet == Set((10L, 20L)))
    val (nb, na, nbi, nab, cab, cba, lift) = out((10L, 20L))
    assert((nb, na, nbi, nab) == (4L, 3L, 2L, 2L))
    assert(cab == math.rint(2.0 / 3.0 * 1e6) / 1e6) // round(2/3, 6)
    assert(cba == 1.0)
    assert(lift == math.rint(2.0 * 4.0 / (3.0 * 2.0) * 1e6) / 1e6)
  }

  test("apriori prune is lossless: matches the unpruned all-pairs count on seeded baskets") {
    val rnd = new scala.util.Random(41)
    val rows = for {
      b <- 1L to 120L
      _ <- 0 until (2 + rnd.nextInt(4))
    } yield (b, rnd.nextInt(12).toLong)
    val out = Association.frequentPairs(rows.toDF("b", "i"), "b", "i", 1L, 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(5)).toMap
    // scalar reference: distinct incidence, threshold ceil(nB/10)
    val bi = rows.distinct
    val nB = bi.map(_._1).distinct.size
    val thr = (nB + 9) / 10
    val itemN = bi.groupBy(_._2).view.mapValues(_.size).toMap
    val want = bi.groupBy(_._1).values.flatMap { items =>
      val is = items.map(_._2).distinct.sorted
      for (a <- is; b <- is if a < b && itemN(a) >= thr && itemN(b) >= thr)
        yield (a, b)
    }.groupBy(identity).view.mapValues(_.size.toLong).filter(_._2 >= thr).toMap
    assert(out == want)
  }

  test("an item frequent only via duplicates inside one basket stays infrequent") {
    // item 7 occurs 3 times but only in basket 1 -> support 1
    val rows = Seq((1L, 7L), (1L, 7L), (1L, 7L), (1L, 1L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L))
      .toDF("b", "i")
    val out = Association.frequentPairs(rows, "b", "i", 2L, 3L) // thr = 2
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L))) // items 1 (3 baskets), 2 (2 baskets)
  }
}
