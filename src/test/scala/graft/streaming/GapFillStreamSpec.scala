package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming gap-fill: the sealed dense grid equals the batch q_gapfill
  * rows BIT FOR BIT on the real events fixture under out-of-order
  * delivery — every imputation (LOCF + exact linear interpolation) and
  * every gap row must land exactly once. */
class GapFillStreamSpec extends SparkSpec {
  import spark.implicits._

  private type Row4 = (String, Timestamp, Option[Double], Double, Double)

  test("sealed grid equals batch gapFillLinear on the sf0.001 fixture") {
    val dir = "/root/testdata/sf0.001"
    val batch = graft.SparkEntry.queries("q_gapfill")(spark, dir)
      .select(col("event_type"), col("slot_ts"), col("v"),
        col("ffill"), col("interp"))
      .as[Row4].collect().toSet

    val events = graft.Tables(spark, dir).events
      .filter(pmod(col("event_id"), lit(13)) === 0)
      .select(col("event_type"), col("ts"), col("value"))
      .as[(String, Timestamp, Double)].collect().toSeq.sortBy(_._2.getTime)
    assert(events.nonEmpty)
    val third = events.length / 3
    val batches = Seq(events.take(third),
      events.slice(2 * third, events.length),
      events.slice(third, 2 * third))

    val input = MemoryStream[(String, Timestamp, Double)](4715, spark, None)
    val grid = GapFillStream.filled(
      input.toDS().toDF("event_type", "ts", "value"),
      "event_type", "ts", "value",
      lateness = "800 hours")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-gf").toString
    val q = grid.writeStream.format("memory").queryName("gf_grid")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      // flush on a key OUTSIDE the fixture: a fixture key would extend
      // its own grid into the flush range and emit rows batch never has
      val last = events.map(_._2.getTime).max
      Seq(1L, 2L).foreach { k =>
        input.addData(Seq(("zzz_flush", new Timestamp(last + k * 900L * 3600000L), 0.0)))
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("gf_grid")
      .filter(col("key") =!= "zzz_flush")
      .select(col("key"), col("slot_ts"), col("v"), col("ffill"), col("interp"))
      .as[Row4].collect().toSet
    // batch rows past a key's last SEALED slot don't exist in either
    // engine here (everything sealed via the flush), so sets must match
    assert(got === batch,
      s"missing=${(batch -- got).take(3)} extra=${(got -- batch).take(3)}")
    assert(got.exists(_._3.isEmpty), "no gap row in the fixture — vacuous")
  }
}
