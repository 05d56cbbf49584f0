package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Per-source watermark propagation (Beam: each UnboundedSource reports
  * its own watermark; a multi-input transform's watermark is the MIN over
  * its inputs, so one slow source holds back everyone's window
  * finalization). streamCoGroupByKey stamps each side with its own
  * withWatermark before the union; Spark's multipleWatermarkPolicy=min
  * (the default) is exactly the Beam propagation rule. This spec proves
  * the hold behaviorally: a window whose end has long passed on the fast
  * source must NOT finalize while the slow source's watermark still sits
  * inside it — and must emit as soon as the slow source advances.
  */
class PerSourceWatermarkSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  test("slow source holds the union watermark; advancing it releases the pane") {
    val inA = MemoryStream[(Long, Timestamp, Double)](931, spark, None)
    val inB = MemoryStream[(Long, Timestamp, Double)](932, spark, None)
    def named(ms: MemoryStream[(Long, Timestamp, Double)]): DataFrame =
      ms.toDS().toDF("user_id", "ts", "value")
    val out = StreamOps.streamCoGroupByKey(
      named(inA), named(inB), Seq("user_id"), "ts", "10 minutes", "5 minutes",
      col("value"), col("value"))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-pswm").toString
    val q = out.writeStream.format("memory").queryName("pswm")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      // window [0, 10): one row from each side
      inA.addData(Seq((1L, ts(2), 1.0)))
      inB.addData(Seq((1L, ts(3), 2.0)))
      q.processAllAvailable()
      // fast source sprints far ahead: its own watermark passes the
      // window end by hours. Beam rule: the transform's watermark is
      // min(sources) = B's, still near t=3m, so the pane must NOT emit.
      inA.addData(Seq((9L, ts(600), 0.0)))
      q.processAllAvailable()
      inA.addData(Seq((9L, ts(601), 0.0))) // second batch so A's wm updates
      q.processAllAvailable()
      assert(spark.table("pswm").filter(col("user_id") === 1L).count() == 0,
        "window finalized while the slow source's watermark was inside it")
      // the slow source catches up → min watermark passes 10m → pane emits
      inB.addData(Seq((9L, ts(600), 0.0)))
      q.processAllAvailable()
      inB.addData(Seq((9L, ts(601), 0.0)))
      q.processAllAvailable()
      val rows = spark.table("pswm").filter(col("user_id") === 1L)
        .select(col("a_values"), col("b_values"))
        .as[(Seq[Double], Seq[Double])].collect()
      assert(rows.toSeq == Seq((Seq(1.0), Seq(2.0))))
    } finally q.stop()
  }
}
