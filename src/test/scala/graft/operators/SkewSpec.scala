package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("keySkewReport: exact counts, shares, and integer salt for a planted hot key") {
    // 600 'hot' + 4×100 others = 1000 rows
    val df = (Seq.fill(600)("hot") ++
      (1 to 4).flatMap(i => Seq.fill(100)(s"k$i"))).toDF("k").repartition(8)
    val out = Skew.keySkewReport(df, col("k"), minShare = 0.05, parallelism = 10)
      .as[(String, Long, Double, Long)].collect()
    assert(out.head == (("hot", 600L, 0.6, 6L))) // ceil(600/(1000/10)) = 6
    assert(out.length == 5)
    out.tail.foreach { case (_, n, share, salt) =>
      assert(n == 100L && share == 0.1 && salt == 1L)
    }
    // heaviest first
    assert(out.map(_._2).toSeq == out.map(_._2).sortBy(-_).toSeq)
  }

  test("keySkewReport: keys below minShare are excluded; nulls ignored") {
    val df = (Seq.fill(90)(Some("big")) ++ Seq.fill(9)(Some("small")) ++
      Seq(None)).toDF("k")
    val out = Skew.keySkewReport(df, col("k"), minShare = 0.1, parallelism = 4)
      .as[(String, Long, Double, Long)].collect()
    // total = 99 non-null; small = 9 < ceil(0.1·99) = 10 → excluded
    assert(out.map(_._1).toSeq == Seq("big"))
    assert(out.head._2 == 90L)
  }

  test("keySkewReport: uniform keys all get salt 1 (no false alarms)") {
    val df = (1 to 10).flatMap(i => Seq.fill(50)(s"u$i")).toDF("k")
    val out = Skew.keySkewReport(df, col("k"), minShare = 0.05, parallelism = 10)
      .as[(String, Long, Double, Long)].collect()
    assert(out.length == 10 && out.forall(_._4 == 1L))
  }
}
