package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 4
  private val width = 64

  test("scalar bucket and SQL bucketCol agree (the relational-probe contract)") {
    val vals = Seq("alpha", "beta", "", "π∆", "the", "a'b")
    val sql = vals.toDF("v")
      .select(col("v"), array((0 until depth).map(i =>
        CountMin.bucketCol(col("v"), i, width)): _*).as("b"))
      .as[(String, Seq[Int])].collect().toMap
    vals.foreach { v =>
      assert(sql(v) == (0 until depth).map(i => CountMin.bucket(v, i, width)),
        s"bucket mismatch for '$v'")
    }
  }

  test("estimate never undercounts, and is exact for a value with an uncontended row") {
    val data = Seq.fill(100)("hot") ++ (1 to 200).map(i => s"tail$i")
    val df = data.toDF("v")
    val sk = CountMin.sketch(df, col("v"), depth, width)
    val exact = df.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val probed = exact.crossJoin(broadcast(sk))
      .select(col("v"), col("cnt"),
        CountMin.estimate(col("sketch"), col("v"), depth, width).as("est"))
      .as[(String, Long, Long)].collect()
    probed.foreach { case (v, cnt, est) =>
      assert(est >= cnt, s"CMS undercounted '$v': est=$est true=$cnt")
    }
    // a solo stream is exact: only one distinct value, no collisions possible
    val solo = CountMin.sketch(Seq.fill(37)("x").toDF("v"), col("v"), depth, width)
      .select(CountMin.estimate(col("sketch"), lit("x"), depth, width))
      .as[Long].collect().head
    assert(solo == 37L)
  }

  test("sketch is partitioning-invariant (mergeable-summary contract)") {
    val data = (1 to 500).map(i => s"w${i % 40}")
    val one = CountMin.sketch(data.toDF("v").repartition(1), col("v"), depth, width)
      .select("sketch").as[Seq[Long]].collect().head
    val many = CountMin.sketch(data.toDF("v").repartition(7), col("v"), depth, width)
      .select("sketch").as[Seq[Long]].collect().head
    assert(one == many)
    // row sums are each exactly N (every item lands once per row)
    (0 until depth).foreach { i =>
      assert(one.slice(i * width, (i + 1) * width).sum == 500L)
    }
  }

  test("the sketch rides the streaming trigger engine: windowed panes equal batch sketches") {
    import java.sql.Timestamp
    import java.time.Duration
    import graft.streaming.TriggerEngine
    import graft.streaming.TriggerEngine._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    def ts(minute: Int) = new Timestamp(minute * 60000L)
    // minutes 1..5: ts(0) would sit exactly on the epoch, the engine's
    // documented near-epoch watermark-clamp edge (see TriggerEngine
    // scaladoc; every trigger spec starts at minute 1 for the same reason)
    val w0Tokens = Seq("x", "x", "y", "x", "z")
    val input = MemoryStream[(String, Timestamp, String)](4242, spark, None)
    val panes = TriggerEngine.windowedAggregate(
      input.toDS(), Duration.ofMinutes(10), Duration.ZERO,
      TriggerSpec.default, Accumulating, CountMin.combineFn(depth, width))
    val dir = java.nio.file.Files.createTempDirectory("graft-cms-stream").toString
    val q = panes.writeStream.format("memory").queryName("cms_stream")
      .outputMode("append").option("checkpointLocation", dir).start()
    try {
      input.addData(w0Tokens.zipWithIndex.map { case (t, i) => ("k", ts(i + 1), t) })
      q.processAllAvailable()
      input.addData(Seq(("k", ts(12), "late"))) // advance watermark, close [0,10)
      q.processAllAvailable()
    } finally q.stop()
    val pane = spark.table("cms_stream").as[Pane[String, Seq[Long]]].collect()
      .filter(p => p.windowStart == ts(0) && p.timing == "ON_TIME")
    assert(pane.length == 1)
    val batchSketch = CountMin.sketch(w0Tokens.toDF("v"), col("v"), depth, width)
      .select("sketch").as[Seq[Long]].collect().head
    assert(pane.head.value == batchSketch,
      "streamed window sketch differs from the batch sketch of the same slice")
    // and the pane's sketch answers point queries with the CMS guarantee
    val est = (0 until depth).map(i =>
      pane.head.value(i * width + CountMin.bucket("x", i, width))).min
    assert(est >= 3L)
  }

  test("unqueried values estimate at most the collision mass, never negative") {
    val df = (1 to 300).map(i => s"v$i").toDF("v")
    val sk = CountMin.sketch(df, col("v"), depth, width)
    val ghost = sk.select(
      CountMin.estimate(col("sketch"), lit("never-seen"), depth, width))
      .as[Long].collect().head
    assert(ghost >= 0L && ghost <= 300L)
  }
}
