package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming rate anomaly: sealed-hour flags equal the batch
  * q_anomaly_rate rows on the real events fixture, across multi-batch
  * out-of-order delivery; partial-hour counts merge across batches. */
class RateAnomalyStreamSpec extends SparkSpec {
  import spark.implicits._

  private type Row5 = (String, Timestamp, Long, Long, Long, Boolean, Boolean)

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[Row5] =
    df.select(col("event_type"), col("hour"), col("n").cast("long"),
        col("trail_sum").cast("long"), col("trail_cnt").cast("long"),
        col("spike_hi"), col("dip_lo"))
      .as[Row5].collect().toSet

  test("stream flags equal batch q_anomaly_rate on the sf0.001 fixture") {
    val dir = "/root/testdata/sf0.001"
    val batch = asSet(graft.SparkEntry.queries("q_anomaly_rate")(spark, dir))

    val events = graft.Tables(spark, dir).events
      .select(col("event_type"), col("ts"))
      .as[(String, Timestamp)].collect().toSeq.sortBy(_._2.getTime)
    // three batches with a deliberate out-of-order split: the middle
    // third is delivered LAST (still within the 1-hour lateness at the
    // point its hours seal, because sealing needs wm past hour end)
    val third = events.length / 3
    val b1 = events.take(third)
    val b2 = events.slice(2 * third, events.length)
    val b3 = events.slice(third, 2 * third)

    val input = MemoryStream[(String, Timestamp)](4711, spark, None)
    val flags = RateAnomalyStream.hourlyFlags(
      input.toDS().toDF("event_type", "ts"), "event_type", "ts",
      lateness = "600 hours") // must exceed the ~20-day reorder below
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ra").toString
    val q = flags.writeStream.format("memory").queryName("ra_flags")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      Seq(b1, b2, b3).foreach { b => input.addData(b); q.processAllAvailable() }
      // flush: push the watermark past every buffered hour (same-type
      // events far in the future; they stay unsealed themselves)
      val last = events.map(_._2.getTime).max
      Seq(1L, 2L, 3L).foreach { k =>
        input.addData(Seq(("view", new Timestamp(last + k * 400L * 3600000L))))
        q.processAllAvailable()
      }
    } finally q.stop()
    // flush events are outside the fixture and seal into scored rows of
    // their own — compare only the fixture's time range (they cannot
    // affect earlier rows' trailing windows)
    val got = asSet(spark.table("ra_flags")
      .filter(col("hour") <= new Timestamp(events.map(_._2.getTime).max)))
    assert(got === batch,
      s"missing=${(batch -- got).take(3)} extra=${(got -- batch).take(3)}")
    assert(got.nonEmpty, "fixture produced no scored hours — vacuous")
  }
}
