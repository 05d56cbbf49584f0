package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming Holt: sealed points must equal the batch q_holt_trend rows
  * BIT FOR BIT on the real events fixture across multi-batch
  * out-of-order delivery — the TWO-variable chain makes sealing
  * mistakes compound through both level and trend, so exact equality
  * is the sharpest available test. */
class HoltStreamSpec extends SparkSpec {
  import spark.implicits._

  private type Pt = (String, Timestamp, Double, Double, Double, Double)

  test("sealed stream points equal batch TimeSeries.holtLinear on the sf0.001 fixture") {
    val dir = "/root/testdata/sf0.001"
    val batch = graft.SparkEntry.queries("q_holt_trend")(spark, dir)
      .select(col("event_type"), to_timestamp(col("slot") * 3600).as("slot_ts"),
        col("v"), col("level"), col("trend"), col("forecast"))
      .as[Pt].collect().toSet

    val events = graft.Tables(spark, dir).events
      .filter(pmod(col("event_id"), lit(13)) === 0)
      .select(col("event_type"), col("ts"), col("value"))
      .as[(String, Timestamp, Double)].collect().toSeq.sortBy(_._2.getTime)
    assert(events.nonEmpty)
    // deliberate out-of-order delivery: the middle third arrives LAST
    val third = events.length / 3
    val batches = Seq(events.take(third),
      events.slice(2 * third, events.length),
      events.slice(third, 2 * third))

    val input = MemoryStream[(String, Timestamp, Double)](4717, spark, None)
    val pts = HoltStream.trending(
      input.toDS().toDF("event_type", "ts", "value"),
      "event_type", "ts", "value",
      lateness = "800 hours") // exceeds the fixture-wide reorder above
    val ckpt = java.nio.file.Files.createTempDirectory("graft-holt").toString
    val q = pts.writeStream.format("memory").queryName("holt_pts")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val last = events.map(_._2.getTime).max
      Seq(1L, 2L).foreach { k =>
        input.addData(Seq(("view", new Timestamp(last + k * 900L * 3600000L), 0.0)))
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("holt_pts")
      .filter(col("slot_ts") <= new Timestamp(events.map(_._2.getTime).max))
      .select(col("key"), col("slot_ts"), col("v"), col("level"),
        col("trend"), col("forecast"))
      .as[Pt].collect().toSet
    assert(got === batch,
      s"missing=${(batch -- got).take(3)} extra=${(got -- batch).take(3)}")
    assert(got.nonEmpty, "fixture produced no sealed points — vacuous")
  }

  test("checkpoint restart resumes level AND trend without re-emitting sealed points") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-holt-rs").toString
    val out = java.nio.file.Files.createTempDirectory("graft-holt-rs-out").toString
    val t0 = 1700000000000L
    def ts(h: Long) = new Timestamp(t0 + h * 3600000L)

    val input = MemoryStream[(String, Timestamp, Double)](4718, spark, None)
    def start() = HoltStream.trending(
        input.toDS().toDF("k", "ts", "v"), "k", "ts", "v", lateness = "1 hour")
      .writeStream.format("parquet").option("path", out)
      .outputMode("append").option("checkpointLocation", ckpt).start()

    val q1 = start()
    try {
      input.addData(Seq(("a", ts(0), 8.0), ("a", ts(0), 4.0), ("a", ts(5), 1.0)))
      q1.processAllAvailable()
    } finally q1.stop()
    val first = spark.read.parquet(out)
      .select("key", "v", "level", "trend", "forecast")
      .as[(String, Double, Double, Double, Double)].collect()
    // slot 0 sealed with mean 6.0: seed point l=6, b=0, forecast 6
    assert(first.toSet == Set(("a", 6.0, 6.0, 0.0, 6.0)))

    val q2 = start()
    try {
      input.addData(Seq(("a", ts(9), 3.0)))
      q2.processAllAvailable()
    } finally q2.stop()
    val second = spark.read.parquet(out)
      .select("key", "v", "level", "trend", "forecast")
      .as[(String, Double, Double, Double, Double)].collect()
    // slot 5 seals after restart from the state-store (l=6, b=0):
    // l = 0.5*1 + 0.5*6 = 3.5, b = 0.25*(3.5-6) + 0.75*0 = -0.625
    assert(second.toSet == Set(
      ("a", 6.0, 6.0, 0.0, 6.0),
      ("a", 1.0, 3.5, -0.625, 3.5 + -0.625)))
  }
}
