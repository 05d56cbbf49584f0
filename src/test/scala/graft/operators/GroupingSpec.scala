package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class GroupingSpec extends SparkSpec {
  import spark.implicits._

  test("groupByKey collects values per key") {
    val out = Grouping.groupByKey(Seq(("a", 1), ("b", 2), ("a", 3)).toDS())
      .collect().map { case (k, vs) => (k, vs.sorted) }.toSeq
    assertInAnyOrder(out, Seq(("a", Seq(1, 3)), ("b", Seq(2))))
  }

  test("groupByKeySorted streams each group's values in sort order") {
    import org.apache.spark.sql.functions.col
    // values arrive shuffled; the group fn must see them ordered, and a
    // running-difference output proves the ORDER, not just the multiset
    val ds = Seq(("a", 30), ("b", 5), ("a", 10), ("a", 20), ("b", 1))
      .toDS().repartition(4)
    val out = Grouping.groupByKeySorted(ds, Seq(col("_2"))) {
      (k: String, it: Iterator[Int]) =>
        var prev = 0
        it.map { v => val d = v - prev; prev = v; (k, v, d) }
    }.collect().toSeq.sorted
    assert(out == Seq(("a", 10, 10), ("a", 20, 10), ("a", 30, 10),
      ("b", 1, 1), ("b", 5, 4)))
  }

  test("groupByKeySorted honors descending and multi-column sorts") {
    import org.apache.spark.sql.functions.col
    val ds = Seq((1, (2, "x")), (1, (1, "z")), (1, (1, "a"))).toDS()
    val out = Grouping.groupByKeySorted(ds,
      Seq(col("_2._1").desc, col("_2._2"))) {
      (_: Int, it: Iterator[(Int, String)]) => it.map(_._2)
    }.collect().toSeq
    assert(out == Seq("x", "a", "z"))
  }

  test("coGroupByKeySorted streams both sides in their own sort orders") {
    import org.apache.spark.sql.functions.col
    val a = Seq((1, 20), (1, 10), (2, 5)).toDS().repartition(3)
    val b = Seq((1, "c"), (1, "a"), (1, "b")).toDS().repartition(2)
    val out = Grouping.coGroupByKeySorted(a, b, Seq(col("_2").desc), Seq(col("_2"))) {
      (k: Int, as: Iterator[Int], bs: Iterator[String]) =>
        Iterator((k, as.mkString(","), bs.mkString(",")))
    }.collect().toSeq.sortBy(_._1)
    assert(out == Seq((1, "20,10", "a,b,c"), (2, "5", "")))
  }

  test("coGroupByKey tags values per side, including key-only-on-one-side") {
    val a = Seq(("k1", 1), ("k1", 2), ("k2", 3)).toDS()
    val b = Seq(("k1", "x"), ("k3", "y")).toDS()
    val out = Grouping.coGroupByKey(a, b)
      .collect().map { case (k, as, bs) => (k, as.sorted, bs.sorted) }.toSeq
    assertInAnyOrder(out, Seq(
      ("k1", Seq(1, 2), Seq("x")),
      ("k2", Seq(3), Seq.empty[String]),
      ("k3", Seq.empty[Int], Seq("y"))))
  }

  test("join wrappers: inner/left/semi/anti") {
    val l = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "lv")
    val r = Seq((1, "x"), (3, "y"), (4, "z")).toDF("k", "rv")
    assert(Grouping.innerJoin(l, r, Seq("k")).count() == 2)
    assert(Grouping.leftOuterJoin(l, r, Seq("k")).count() == 3)
    assert(Grouping.fullOuterJoin(l, r, Seq("k")).count() == 4)
    assertInAnyOrder(Grouping.semiJoin(l, r, Seq("k")).select("k").as[Int].collect().toSeq, Seq(1, 3))
    assertInAnyOrder(Grouping.antiJoin(l, r, Seq("k")).select("k").as[Int].collect().toSeq, Seq(2))
  }

  test("distinct and distinctByKey (representative values)") {
    assertInAnyOrder(Grouping.distinct(Seq(1, 1, 2, 3, 3).toDS()).collect().toSeq, Seq(1, 2, 3))
    // keep the smallest element per parity class
    val out = Grouping.distinctByKey(Seq(5, 2, 9, 4, 7).toDS())(_ % 2)((a, b) => math.min(a, b))
    assertInAnyOrder(out.collect().toSeq, Seq(2, 5))
  }

  test("set-op superset: intersect / except") {
    val a = Seq(1, 2, 3).toDS(); val b = Seq(2, 3, 4).toDS()
    assertInAnyOrder(Grouping.intersect(a, b).collect().toSeq, Seq(2, 3))
    assertInAnyOrder(Grouping.except(a, b).collect().toSeq, Seq(1))
  }

  test("asofJoin picks the latest right row at-or-before each left ts") {
    val trades = Seq((1, "k", 100L), (2, "k", 205L), (3, "k", 50L), (4, "z", 10L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(("k", 90L, 1.0), ("k", 100L, 2.0), ("k", 200L, 3.0))
      .toDF("sym", "t", "px")
    val out = Grouping.asofJoin(trades, quotes, Seq("sym"), "t", "t", Seq("px"))
      .select(col("trade_id"), col("asof_px"))
      .as[(Int, Option[Double])].collect().toMap
    assert(out == Map(
      1 -> Some(2.0), // inclusive: quote AT t=100 wins over t=90
      2 -> Some(3.0), // latest ≤ 205
      3 -> None,      // no quote at or before 50
      4 -> None))     // other key entirely
  }

  test("saltedJoin ≡ plain join on skewed data") {
    // 90% of rows share one hot key
    val skewed = spark.range(1000)
      .selectExpr("CASE WHEN id % 10 = 0 THEN id ELSE 0 END AS k", "id AS v")
    val dim = Seq((0L, "hot"), (10L, "a"), (20L, "b")).toDF("k", "name")
    val salted = Grouping.saltedJoin(skewed, dim, Seq("k"), salt = 8)
      .select("k", "v", "name").as[(Long, Long, String)].collect().toSet
    val plain = skewed.join(dim, Seq("k"))
      .select("k", "v", "name").as[(Long, Long, String)].collect().toSet
    assert(salted == plain && salted.nonEmpty)
  }

  test("rangeJoinBinned ≡ inequality join, equi-join plan") {
    val points = Seq(5L, 10L, 15L, 23L, 42L).toDF("pt")
    val intervals = Seq((100, 8L, 16L), (200, 20L, 30L), (300, 14L, 15L))
      .toDF("iid", "s", "e")
    val out = Grouping.rangeJoinBinned(points, intervals,
      col("pt"), col("s"), col("e"), binSize = 4)
    assertNoCartesian(out)
    val got = out.select("pt", "iid").as[(Long, Int)].collect().toSet
    val truth = (for {
      p <- Seq(5L, 10L, 15L, 23L, 42L)
      (iid, s, e) <- Seq((100, 8L, 16L), (200, 20L, 30L), (300, 14L, 15L))
      if p >= s && p <= e
    } yield (p, iid)).toSet
    assert(got == truth)
  }

  test("coGroupByKeyDF renders CoGbkResult relationally") {
    val a = Seq((1, 10), (1, 11), (2, 20)).toDF("k", "av")
    val b = Seq((1, "p"), (3, "q")).toDF("k", "bv")
    val out = Grouping.coGroupByKeyDF(a, b, Seq("k"), $"av", $"bv")
      .collect().map(r => (r.getInt(0),
        Option(r.getSeq[Int](1)).getOrElse(Seq()),
        Option(r.getSeq[String](2)).getOrElse(Seq()))).toSeq
    assertInAnyOrder(out, Seq(
      (1, Seq(10, 11), Seq("p")),
      (2, Seq(20), Seq()),
      (3, Seq(), Seq("q"))))
  }
}
