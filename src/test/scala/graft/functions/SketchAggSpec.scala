package graft.functions

import graft.SparkSpec
import graft.llm.CountMin
import org.apache.spark.sql.functions._

/** The native TypedImperativeAggregate CMS must equal the Aggregator
  * bridge element-for-element, survive partial/final aggregation across
  * partitions, round-trip its serialized buffer, work from SQL, and
  * roll up per-group sketches into the global one exactly. */
class SketchAggSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 3
  private val width = 64

  private def tokens = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("source"), explode(
      graft.functions.TextFunctions.tokens(col("text"))).as("token"))

  test("native aggregate equals the Aggregator bridge element-for-element") {
    val native = tokens.repartition(7)
      .agg(SketchAgg.cmsSketch(col("token"), depth, width).as("sk"))
      .head().getSeq[Long](0)
    val bridged = tokens
      .select(col("token")).as[String]
      .select(CountMin.CmsAggregator(depth, width).toColumn)
      .head().toSeq
    assert(native == bridged, "native and bridge sketches diverged")
    assert(native.sum == tokens.count() * depth, "each token increments one counter per row")
  }

  test("partition count cannot change the sketch (counters are sums)") {
    val a = tokens.repartition(1)
      .agg(SketchAgg.cmsSketch(col("token"), depth, width)).head().getSeq[Long](0)
    val b = tokens.repartition(13)
      .agg(SketchAgg.cmsSketch(col("token"), depth, width)).head().getSeq[Long](0)
    assert(a == b)
  }

  test("serialize/deserialize round-trips the buffer") {
    val agg = CmsSketchAgg(org.apache.spark.sql.catalyst.expressions.Literal("x"), depth, width)
    val buf = agg.createAggregationBuffer()
    buf(0) = 42L; buf(depth * width - 1) = Long.MaxValue; buf(17) = -3L
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.toSeq == buf.toSeq)
  }

  test("SQL-registered: GROUP BY sketches roll up to the global sketch") {
    graft.GraftExtensions.register(spark)
    tokens.createOrReplaceTempView("sketch_tokens")
    val perSource = spark.sql(
      s"SELECT source, cms_sketch(token, $depth, $width) AS sk " +
        "FROM sketch_tokens GROUP BY source")
    val merged = perSource
      .agg(SketchAgg.mergeSketches(col("sk"), depth, width).as("sk"))
      .head().getSeq[Long](0)
    val global = spark.sql(
      s"SELECT cms_sketch(token, $depth, $width) FROM sketch_tokens")
      .head().getSeq[Long](0)
    assert(merged == global, "per-group sketches must merge to the global sketch")
  }

  test("cms_merge: constant-buffer rollup equals fold; SQL path; size mismatch rejected") {
    graft.GraftExtensions.register(spark)
    val sketches = Seq(
      Seq(1L, 0L, 2L), Seq(0L, 5L, 1L), Seq(3L, 3L, 3L))
    val rolled = sketches.toDF("sk").repartition(3)
      .agg(SketchAgg.mergeSketches(col("sk"), 1, 3)).head().getSeq[Long](0)
    assert(rolled == Seq(4L, 8L, 6L))
    sketches.toDF("sk").createOrReplaceTempView("cms_merge_in")
    assert(spark.sql("SELECT cms_merge(sk) FROM cms_merge_in")
      .head().getSeq[Long](0) == Seq(4L, 8L, 6L))
    val e = intercept[Exception] {
      Seq(Seq(1L), Seq(1L, 2L)).toDF("sk").coalesce(1)
        .agg(SketchAgg.mergeSketches(col("sk"), 1, 1)).head()
    }
    assert(e.getMessage.contains("mixed sketch sizes") ||
      e.getCause != null && e.getCause.getMessage.contains("mixed sketch sizes"))
  }

  test("KLL: rank errors within bound; merged per-group sketches answer like the direct one") {
    val n = 100000
    val vals = spark.range(n).select((col("id") * 7919 % n).cast("double").as("v"),
      pmod(col("id"), lit(4)).as("g"))
    // direct sketch over everything
    val direct = vals.agg(SketchAgg.kllSketch(col("v")).as("sk"))
    // per-group sketches merged relationally
    val merged = vals.groupBy(col("g"))
      .agg(SketchAgg.kllSketch(col("v")).as("sk"))
      .agg(SketchAgg.kllMerge(col("sk")).as("sk"))
    for (skDf <- Seq(direct, merged); q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = skDf.select(SketchAgg.kllQuantile(col("sk"), q)).head().getDouble(0)
      // (id*7919)%n is a permutation of 0..n-1, so exact rank of value x is (x+1)/n
      val rank = (est + 1.0) / n
      assert(math.abs(rank - q) <= 0.03, s"rank error at q=$q: est=$est rank=$rank")
    }
  }

  test("KLL: SQL registry, serde round-trip, empty sketch yields null quantile") {
    graft.GraftExtensions.register(spark)
    spark.range(1000).select(col("id").cast("double").as("v"))
      .createOrReplaceTempView("kll_in")
    val viaSql = spark.sql(
      "SELECT kll_quantile(kll_merge(sk), CAST(0.5 AS DOUBLE)) FROM " +
        "(SELECT kll_sketch(v, 200) AS sk FROM kll_in GROUP BY CAST(v AS INT) % 8)")
      .head().getDouble(0)
    assert(math.abs(viaSql - 500.0) <= 50.0, s"SQL-path median drifted: $viaSql")
    // serde: heapify(toByteArray) round-trips through an agg exchange
    val bytes = spark.range(100).select(col("id").cast("double").as("v"))
      .repartition(5)
      .agg(SketchAgg.kllSketch(col("v")).as("sk")).head().getAs[Array[Byte]](0)
    val sk = org.apache.datasketches.kll.KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(bytes))
    assert(sk.getN == 100)
    // empty input -> empty sketch -> null estimate
    val row = spark.range(0).select(col("id").cast("double").as("v"))
      .agg(SketchAgg.kllSketch(col("v")).as("sk"))
      .select(SketchAgg.kllQuantile(col("sk"), 0.5)).head()
    assert(row.isNullAt(0))
  }

  test("KLL rides the streaming trigger engine: pane quantiles equal the batch slice") {
    import java.sql.Timestamp
    import java.time.Duration
    import graft.streaming.TriggerEngine
    import graft.streaming.TriggerEngine._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    def ts(minute: Int) = new Timestamp(minute * 60000L)
    val values = Seq(10.0, 50.0, 20.0, 40.0, 30.0)
    val input = MemoryStream[(String, Timestamp, Double)](4243, spark, None)
    val panes = TriggerEngine.windowedAggregate(
      input.toDS(), Duration.ofMinutes(10), Duration.ZERO,
      TriggerSpec.default, Accumulating, SketchAgg.kllCombineFn(200))
    val dir = java.nio.file.Files.createTempDirectory("graft-kll-stream").toString
    val q = panes.writeStream.format("memory").queryName("kll_stream")
      .outputMode("append").option("checkpointLocation", dir).start()
    try {
      input.addData(values.zipWithIndex.map { case (v, i) => ("k", ts(i + 1), v) })
      q.processAllAvailable()
      input.addData(Seq(("k", ts(12), 99.0))) // advance watermark, close [0,10)
      q.processAllAvailable()
    } finally q.stop()
    val pane = spark.table("kll_stream").as[Pane[String, Array[Byte]]].collect()
      .filter(p => p.windowStart == ts(0) && p.timing == "ON_TIME")
    assert(pane.length == 1)
    val sk = org.apache.datasketches.kll.KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(pane.head.value))
    // 5 values, k=200: no compaction, quantiles are EXACT
    assert(sk.getN == 5 && sk.getQuantile(0.5) == 30.0)
    assert(sk.getMinItem == 10.0 && sk.getMaxItem == 50.0)
  }

  test("HLL rides the streaming trigger engine: pane distinct-counts are exact at small n") {
    import java.sql.Timestamp
    import java.time.Duration
    import graft.streaming.TriggerEngine
    import graft.streaming.TriggerEngine._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    def ts(minute: Int) = new Timestamp(minute * 60000L)
    // 5 arrivals, 3 distinct values: lgK=12 is exact at this scale
    val tokens = Seq("a", "b", "a", "c", "b")
    val input = MemoryStream[(String, Timestamp, String)](4244, spark, None)
    val panes = TriggerEngine.windowedAggregate(
      input.toDS(), Duration.ofMinutes(10), Duration.ZERO,
      TriggerSpec.default, Accumulating, SketchAgg.hllCombineFn(12))
    val dir = java.nio.file.Files.createTempDirectory("graft-hll-stream").toString
    val q = panes.writeStream.format("memory").queryName("hll_stream")
      .outputMode("append").option("checkpointLocation", dir).start()
    try {
      input.addData(tokens.zipWithIndex.map { case (t, i) => ("k", ts(i + 1), t) })
      q.processAllAvailable()
      input.addData(Seq(("k", ts(12), "late")))
      q.processAllAvailable()
    } finally q.stop()
    val pane = spark.table("hll_stream").as[Pane[String, Long]].collect()
      .filter(p => p.windowStart == ts(0) && p.timing == "ON_TIME")
    assert(pane.length == 1 && pane.head.value == 3L,
      s"expected 3 distinct, got ${pane.map(_.value).mkString(",")}")
  }

  test("theta: below-k sets are EXACT through sketch, merge, intersect, and a-not-b") {
    // two overlapping sets well below k = 2^12 — theta keeps every hash,
    // so every estimate (including set ops) must be exactly right
    val a = (0 until 500).map(i => ("a", s"tok$i"))
    val b = (300 until 900).map(i => ("b", s"tok$i"))
    val df = spark.createDataset(a ++ b).toDF("side", "token")
    val sks = df.groupBy("side").agg(SketchAgg.thetaSketch(col("token"), 12).as("sk"))
    val row = sks.agg(
      SketchAgg.thetaMerge(col("sk"), 12).as("u"),
      min(when(col("side") === "a", col("sk"))).as("ska"),
      min(when(col("side") === "b", col("sk"))).as("skb"))
      .select(
        SketchAgg.thetaEstimate(col("u")).as("un"),
        SketchAgg.thetaEstimate(col("ska")).as("ea"),
        SketchAgg.thetaEstimate(col("skb")).as("eb"),
        SketchAgg.thetaEstimate(
          SketchAgg.thetaIntersect(col("ska"), col("skb"))).as("inter"),
        SketchAgg.thetaEstimate(
          SketchAgg.thetaANotB(col("ska"), col("skb"))).as("diff"))
      .head()
    assert(row.getDouble(0) == 900.0) // |A ∪ B|
    assert(row.getDouble(1) == 500.0 && row.getDouble(2) == 600.0)
    assert(row.getDouble(3) == 200.0) // |A ∩ B| = {300..499}
    assert(row.getDouble(4) == 300.0) // |A \ B| = {0..299}
  }

  test("theta: estimation-mode bounds contain the truth; SQL path; partition-invariant") {
    graft.GraftExtensions.register(spark)
    val n = 200000
    val df = spark.range(n).select(concat(lit("u"), col("id")).as("token"))
    val est = df.repartition(7)
      .agg(SketchAgg.thetaSketch(col("token"), 12).as("sk"))
      .select(
        SketchAgg.thetaEstimate(col("sk")).as("est"),
        SketchAgg.thetaLowerBound(col("sk"), 3).as("lb"),
        SketchAgg.thetaUpperBound(col("sk"), 3).as("ub"))
      .head()
    assert(est.getDouble(1) <= n && n <= est.getDouble(2),
      s"3σ bounds [${est.getDouble(1)}, ${est.getDouble(2)}] miss $n")
    assert(math.abs(est.getDouble(0) - n) < 0.1 * n)
    // the same sketch through SQL functions, different partitioning —
    // the union result must be identical (theta unions are order-safe)
    df.repartition(3).createOrReplaceTempView("theta_toks")
    val sqlEst = spark.sql(
      """SELECT theta_estimate(theta_sketch(token, 12)) AS e FROM theta_toks""")
      .head().getDouble(0)
    assert(sqlEst == est.getDouble(0), s"SQL $sqlEst != column API ${est.getDouble(0)}")
  }

  test("theta: per-group sketches merged relationally answer like the direct sketch") {
    graft.GraftExtensions.register(spark)
    val df = spark.range(50000)
      .select((col("id") % 10).as("g"), concat(lit("t"), col("id") % 3000).as("token"))
    df.createOrReplaceTempView("theta_groups")
    val direct = spark.sql(
      "SELECT theta_estimate(theta_sketch(token, 12)) AS e FROM theta_groups")
      .head().getDouble(0)
    val rolled = spark.sql(
      """SELECT theta_estimate(theta_merge(sk, 12)) AS e FROM (
           SELECT g, theta_sketch(token, 12) AS sk FROM theta_groups GROUP BY g)""")
      .head().getDouble(0)
    // 3000 distinct < k = 2^12 → exact mode both directly and rolled up
    assert(direct == 3000.0 && rolled == 3000.0)
  }

  test("point estimates from the native sketch respect CMS bounds") {
    val sk = tokens.agg(SketchAgg.cmsSketch(col("token"), depth, width).as("sketch"))
    val n = tokens.count()
    val exact = tokens.groupBy("token").count()
      .orderBy(col("count").desc).limit(20)
      .as[(String, Long)].collect()
    val arr = sk.head().getSeq[Long](0)
    exact.foreach { case (tok, cnt) =>
      val est = (0 until depth)
        .map(i => arr(i * width + CountMin.bucket(tok, i, width))).min
      assert(est >= cnt, s"CMS must never undercount ($tok)")
      assert(est <= cnt + math.ceil(math.E * n / width).toLong,
        s"CMS bound violated for $tok: est=$est cnt=$cnt")
    }
  }
}
