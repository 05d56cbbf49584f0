package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream joins: batch ≡ stream equality over the REAL events
  * fixture. Both operators run the IDENTICAL code path on batch frames
  * (withWatermark is a batch no-op), so the batch execution of the same
  * call is the strongest available oracle — any divergence is a
  * state/watermark bug, not a query-shape difference.
  */
/** Tagged-union CoGroupByKey as a CombineFn — the bridge that gives CoGBK
  * the FULL trigger algebra (early/late firings, accumulation modes,
  * PaneInfo) through TriggerEngine.windowedAggregate. Top-level so the
  * serialized processor does not drag the suite along. */
object CoGbkFn extends graft.operators.Combine.CombineFn[
    (Option[Double], Option[Double]),
    (List[Double], List[Double]),
    (Seq[Double], Seq[Double])] {
  def createAccumulator(): (List[Double], List[Double]) = (Nil, Nil)
  def addInput(acc: (List[Double], List[Double]),
               in: (Option[Double], Option[Double])): (List[Double], List[Double]) =
    (in._1.toList ::: acc._1, in._2.toList ::: acc._2)
  def mergeAccumulators(a: (List[Double], List[Double]),
                        b: (List[Double], List[Double])): (List[Double], List[Double]) =
    (a._1 ::: b._1, a._2 ::: b._2)
  def extractOutput(acc: (List[Double], List[Double])): (Seq[Double], Seq[Double]) =
    (acc._1.sorted, acc._2.sorted)
}

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val events =
    graft.Tables(spark, dir).events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"),
        col("event_type"), col("value").cast("double").as("value"))

  /** Split the fixture into two disjoint "streams" by event_type hash so
    * both sides are non-trivial and some (user, window) cells miss a side. */
  private lazy val (sideA, sideB) = {
    val tagged = events.withColumn("__side", abs(xxhash64(col("event_type"))) % 2)
    (tagged.filter(col("__side") === 0).drop("__side"),
      tagged.filter(col("__side") === 1).drop("__side"))
  }

  private def collected(rows: DataFrame): Set[(Long, Timestamp, Seq[Double], Seq[Double])] =
    rows.select(col("window.start").as("ws"), col("user_id"),
        col("a_values"), col("b_values"))
      .as[(Timestamp, Long, Seq[Double], Seq[Double])]
      .collect().map { case (ws, u, as_, bs) => (u, ws, as_, bs) }.toSet

  test("batch ≡ stream: windowed CoGroupByKey over two streams (1h fixed windows)") {
    val batch = collected(StreamOps.streamCoGroupByKey(
      sideA, sideB, Seq("user_id"), "ts", "1 hour", "10 minutes",
      col("value"), col("value")))
    assert(batch.nonEmpty)
    // both-empty cells are impossible (a row created the cell); one-empty
    // cells must exist or the split was degenerate
    assert(batch.exists(r => r._3.isEmpty || r._4.isEmpty))
    assert(batch.forall(r => r._3.nonEmpty || r._4.nonEmpty))

    val aRows = sideA.select(col("user_id"), col("ts"), col("value"))
      .as[(Long, Timestamp, Double)].collect().toSeq
    val bRows = sideB.select(col("user_id"), col("ts"), col("value"))
      .as[(Long, Timestamp, Double)].collect().toSeq
    val maxTsMs = (aRows ++ bRows).map(_._2.getTime).max

    val inA = MemoryStream[(Long, Timestamp, Double)](921, spark, None)
    val inB = MemoryStream[(Long, Timestamp, Double)](922, spark, None)
    def named(ms: MemoryStream[(Long, Timestamp, Double)]): DataFrame =
      ms.toDS().toDF("user_id", "ts", "value")
    val out = StreamOps.streamCoGroupByKey(
      named(inA), named(inB), Seq("user_id"), "ts", "1 hour", "10 minutes",
      col("value"), col("value"))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sjs-cogbk").toString
    val q = out.writeStream.format("memory").queryName("sjs_cogbk")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      // one micro-batch per side with arrival order REVERSED vs event time
      // (a second batch would advance the watermark and drop the older
      // half as late — batch mode drops nothing, breaking equality)
      inA.addData(aRows.reverse); inB.addData(bRows.reverse)
      q.processAllAvailable()
      // sentinels far past every window to advance the watermark and
      // flush final panes (two batches: watermark updates at batch END).
      // BOTH sources need one — per-source watermarks combine as MIN, so
      // a sentinel on one side alone holds everything back (that hold is
      // itself proven in PerSourceWatermarkSpec).
      val flush = Seq((-1L, new Timestamp(maxTsMs + 6L * 3600 * 1000), 0.0))
      inA.addData(flush); inB.addData(flush)
      q.processAllAvailable()
      val flush2 = Seq((-1L, new Timestamp(maxTsMs + 7L * 3600 * 1000), 0.0))
      inA.addData(flush2); inB.addData(flush2)
      q.processAllAvailable()
    } finally q.stop()

    val got = collected(spark.table("sjs_cogbk")).filter(_._1 != -1L)
    assert(got == batch)
  }

  test("batch ≡ stream: watermarked interval join (right within [-30m, +30m] of left)") {
    def run(l: DataFrame, r: DataFrame): DataFrame =
      StreamOps.streamIntervalJoin(l, r, Seq("user_id"), "ts", "ts",
        "10 minutes", "30 minutes", "30 minutes")
        .select(col("user_id"), col("ts"), col("value"),
          col("r_ts"), col("r_value"))

    val batch = run(
      sideA.select(col("user_id"), col("ts"), col("value")),
      sideB.select(col("user_id"), col("ts"), col("value")))
      .as[(Long, Timestamp, Double, Timestamp, Double)].collect().toSeq
    assert(batch.nonEmpty)
    // every emitted pair respects the band — the condition actually binds
    assert(batch.forall { case (_, lts, _, rts, _) =>
      math.abs(lts.getTime - rts.getTime) <= 30L * 60 * 1000 })

    val aRows = sideA.select(col("user_id"), col("ts"), col("value"))
      .as[(Long, Timestamp, Double)].collect().toSeq
    val bRows = sideB.select(col("user_id"), col("ts"), col("value"))
      .as[(Long, Timestamp, Double)].collect().toSeq

    val inA = MemoryStream[(Long, Timestamp, Double)](923, spark, None)
    val inB = MemoryStream[(Long, Timestamp, Double)](924, spark, None)
    def named(ms: MemoryStream[(Long, Timestamp, Double)]): DataFrame =
      ms.toDS().toDF("user_id", "ts", "value")
    val out = run(named(inA), named(inB))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sjs-ivj").toString
    val q = out.writeStream.format("memory").queryName("sjs_ivj")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      // single micro-batch per side, reversed arrival (see cogbk test)
      inA.addData(aRows.reverse); inB.addData(bRows.reverse)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sjs_ivj")
      .as[(Long, Timestamp, Double, Timestamp, Double)].collect().toSeq
    assertInAnyOrder(got, batch)
  }

  test("batch ≡ stream: N-way (3) windowed CoGroupByKey with per-source watermarks") {
    // three disjoint sides by event_type hash mod 3; same dual-mode
    // equality contract as the 2-way test
    val tagged3 = events.withColumn("__side", abs(xxhash64(col("event_type"))) % 3)
    val sides = (0 to 2).map(i => tagged3.filter(col("__side") === i).drop("__side"))
    def run3(frames: Seq[DataFrame]): DataFrame =
      StreamOps.streamCoGroupByKeyN(
        Seq(("x", frames(0), col("value"), "10 minutes"),
          ("y", frames(1), col("value"), "5 minutes"),
          ("z", frames(2), col("value"), "20 minutes")),
        Seq("user_id"), "ts", "1 hour")
    def shape(df: DataFrame): Set[(Long, Timestamp, Seq[Double], Seq[Double], Seq[Double])] =
      df.select(col("user_id"), col("window.start").as("ws"),
          col("x_values"), col("y_values"), col("z_values"))
        .as[(Long, Timestamp, Seq[Double], Seq[Double], Seq[Double])]
        .collect().toSet

    val batch = shape(run3(sides))
    assert(batch.nonEmpty)
    assert(batch.forall(r => r._3.nonEmpty || r._4.nonEmpty || r._5.nonEmpty))

    val rowsBySide = sides.map(
      _.select(col("user_id"), col("ts"), col("value"))
        .as[(Long, Timestamp, Double)].collect().toSeq)
    val maxTsMs = rowsBySide.flatten.map(_._2.getTime).max
    val ins = Seq(951, 952, 953).map(id =>
      MemoryStream[(Long, Timestamp, Double)](id, spark, None))
    val out = run3(ins.map(_.toDS().toDF("user_id", "ts", "value")))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sjs-cogbk3").toString
    val q = out.writeStream.format("memory").queryName("sjs_cogbk3")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      ins.zip(rowsBySide).foreach { case (in, rows) => in.addData(rows.reverse) }
      q.processAllAvailable()
      // ALL sources need flushing sentinels (min-combined watermarks)
      Seq(6L, 7L).foreach { h =>
        val flush = Seq((-1L, new Timestamp(maxTsMs + h * 3600 * 1000), 0.0))
        ins.foreach(_.addData(flush))
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = shape(spark.table("sjs_cogbk3")).filter(_._1 != -1L)
    assert(got == batch)
  }

  test("CoGroupByKey composes with the trigger algebra: EARLY pane then accumulated ON_TIME") {
    // Beam's CoGBK is windowed GBK of a tagged union — which means the
    // whole trigger algebra applies to it for free through the engine:
    // the tagged-union CombineFn above IS CoGroupByKey, and early
    // firings/accumulation/PaneInfo come from windowedAggregate.
    import java.time.Duration
    import graft.streaming.TriggerEngine._
    val input = MemoryStream[(String, Timestamp, (Option[Double], Option[Double]))](
      941, spark, None)
    val panes = TriggerEngine.windowedAggregate(
      input.toDS(), Duration.ofMinutes(10), Duration.ZERO,
      TriggerSpec(early = AfterCount(2)), Accumulating, CoGbkFn)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sjs-tcgbk").toString
    val q = panes.writeStream.format("memory").queryName("sjs_tcgbk")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)
    try {
      // two tagged rows (one per side) → AfterCount(2) EARLY pane
      input.addData(Seq(
        ("u", ts(1), (Some(1.0), Option.empty[Double])),
        ("u", ts(2), (Option.empty[Double], Some(10.0)))))
      q.processAllAvailable()
      // one more left row: no new pane (count 1 < 2)
      input.addData(Seq(("u", ts(3), (Some(2.0), Option.empty[Double]))))
      q.processAllAvailable()
      // watermark passes the window → accumulated ON_TIME final pane
      input.addData(Seq(("z", ts(12), (Some(0.0), Option.empty[Double]))))
      q.processAllAvailable()
      input.addData(Seq(("z", ts(13), (Some(0.0), Option.empty[Double]))))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sjs_tcgbk")
      .as[Pane[String, (Seq[Double], Seq[Double])]].collect().toSeq
      .filter(p => p.key == "u")
      .sortBy(_.paneIndex)
      .map(p => (p.timing, p.value))
    assert(got == Seq(
      ("EARLY", (Seq(1.0), Seq(10.0))),
      ("ON_TIME", (Seq(1.0, 2.0), Seq(10.0)))))
  }
}
