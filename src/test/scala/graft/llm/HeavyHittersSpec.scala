package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Misra-Gries heavy hitters: the sketch's completeness guarantee (any
  * item with count > N/(k+1) survives), the undercount bound, and the
  * end-to-end exactness of frequentValues (sketch prunes, recount is
  * exact — output must EQUAL the plain groupBy answer). */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // Adversarial mix: 3 genuinely heavy tokens inside a big distinct tail,
  // spread over many partitions so partial summaries actually merge.
  private def skewed = {
    val heavy = Seq.fill(400)("alpha") ++ Seq.fill(250)("beta") ++ Seq.fill(120)("gamma")
    val tail = (0 until 1000).map(i => s"tail$i")
    spark.createDataset(new scala.util.Random(42).shuffle(heavy ++ tail))(
        org.apache.spark.sql.Encoders.STRING)
      .repartition(16).toDF("token")
  }

  test("MG summary is complete for items above N/(k+1) and never overcounts") {
    val n = skewed.count() // 1770
    val k = 20
    val got = HeavyHitters.candidates(skewed, col("token"), k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = skewed.groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // completeness: every token with true count > N/(k+1) is present
    exact.filter(_._2 > n.toDouble / (k + 1)).keys.foreach { t =>
      assert(got.contains(t), s"heavy token $t missing from MG summary")
    }
    // summary size bound and the lower-bound property
    assert(got.size <= k)
    got.foreach { case (t, est) =>
      assert(est <= exact(t), s"$t overcounted: est=$est exact=${exact(t)}")
      assert(est >= exact(t) - n / (k + 1) - 1,
        s"$t undercounted beyond the bound: est=$est exact=${exact(t)}")
    }
  }

  test("frequentValues equals the exact groupBy answer (sketch only prunes)") {
    val got = HeavyHitters.frequentValues(skewed, col("token"), minFrac = 0.05)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    val n = skewed.count()
    val thresh = math.ceil(0.05 * n).toLong
    val expected = skewed.groupBy("token").count()
      .filter(col("count") >= thresh)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    assert(got == expected, s"\ngot:      $got\nexpected: $expected")
    assert(got.nonEmpty, "fixture should produce at least one heavy hitter")
  }

  test("property: frequentValues ≡ exact answer on random skewed streams") {
    // the completeness invariant must hold under arbitrary data layout —
    // random zipf-ish streams, random partitioning, several thresholds
    val rng = new scala.util.Random(7)
    (1 to 5).foreach { trial =>
      val n = 300 + rng.nextInt(700)
      val vals = (0 until n).map { _ =>
        val r = rng.nextDouble()
        if (r < 0.3) "hot0"
        else if (r < 0.45) "hot1"
        else s"cold${rng.nextInt(200)}"
      }
      val df = spark.createDataset(vals)(org.apache.spark.sql.Encoders.STRING)
        .repartition(1 + rng.nextInt(12)).toDF("v")
      val frac = Seq(0.02, 0.05, 0.1)(rng.nextInt(3))
      val got = HeavyHitters.frequentValues(df, col("v"), frac)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
      val thresh = math.ceil(frac * n).toLong
      val expected = df.groupBy("v").count().filter(col("count") >= thresh)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
      assert(got == expected, s"trial $trial (n=$n, frac=$frac)")
    }
  }

  test("frequentValues with a generous capacity returns every value exactly") {
    val tiny = Seq("a", "a", "b", "c", "c", "c").toDF("t")
    val got = HeavyHitters.frequentValues(tiny, col("t"), minFrac = 0.15)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    // ceil(0.15*6)=1: every value qualifies, counts exact
    assert(got == Set("a" -> 2L, "b" -> 1L, "c" -> 3L))
  }

  test("the MG sketch rides the streaming trigger engine with its guarantee per pane") {
    import java.sql.Timestamp
    import java.time.Duration
    import graft.streaming.TriggerEngine
    import graft.streaming.TriggerEngine._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    def ts(minute: Int) = new Timestamp(minute * 60000L)
    // minutes 1..8 in window [0,10): "hot" x5 among 3 distinct others
    val toks = Seq("hot", "t1", "hot", "t2", "hot", "hot", "t3", "hot")
    val input = MemoryStream[(String, Timestamp, String)](5151, spark, None)
    val panes = TriggerEngine.windowedAggregate(
      input.toDS(), Duration.ofMinutes(10), Duration.ZERO,
      TriggerSpec.default, Accumulating, HeavyHitters.combineFn(capacity = 2))
    val dir = java.nio.file.Files.createTempDirectory("graft-mg-stream").toString
    val q = panes.writeStream.format("memory").queryName("mg_stream")
      .outputMode("append").option("checkpointLocation", dir).start()
    try {
      input.addData(toks.zipWithIndex.map { case (t, i) => ("k", ts(i + 1), t) })
      q.processAllAvailable()
      input.addData(Seq(("k", ts(12), "late")))
      q.processAllAvailable()
    } finally q.stop()
    val pane = spark.table("mg_stream")
      .as[Pane[String, Map[String, Long]]].collect()
      .filter(p => p.windowStart == ts(0) && p.timing == "ON_TIME")
    assert(pane.length == 1)
    val summary = pane.head.value
    // MG guarantee on the pane: N=8, k=2 → any value with count > 8/3 is
    // present, and its kept count undercounts by at most ⌊8/3⌋
    assert(summary.contains("hot"), summary.toString)
    assert(summary("hot") >= 5L - 8L / 3L && summary("hot") <= 5L, summary.toString)
    assert(summary.size <= 2)
  }
}
