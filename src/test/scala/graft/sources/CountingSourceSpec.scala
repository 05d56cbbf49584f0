package graft.sources

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The DSv2 rendering of the reference's Source framework
  * ([U] IO/CountingInput.java, Source.java): bounded splits, size
  * statistics, and the unbounded offset/checkpoint loop with a
  * max-records drain. */
class CountingSourceSpec extends SparkSpec {
  import spark.implicits._

  test("bounded read: exact range, split into the requested partitions") {
    val df = spark.read.format("graft-counting")
      .option("n", 1000).option("splits", 7).load()
    assert(df.rdd.getNumPartitions == 7)
    val r = df.agg(count(lit(1)), min(col("id")), max(col("id")), sum(col("id"))).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((1000L, 0L, 999L, 499500L)))
  }

  test("timestamp fn: ts = startMs + id * periodMs") {
    val rows = spark.read.format("graft-counting")
      .option("n", 3).option("startMs", 60000).option("periodMs", 1000)
      .load().orderBy("id").as[(Long, Timestamp)].collect().toSeq
    assert(rows == Seq(
      (0L, new Timestamp(60000L)), (1L, new Timestamp(61000L)),
      (2L, new Timestamp(62000L))))
  }

  test("splits never exceed rows; empty range plans zero partitions") {
    assert(CountingSource.ranges(0, 3, 8).map { case (s, e) => e - s } == Seq(1, 1, 1))
    assert(CountingSource.ranges(5, 5, 4).isEmpty)
    assert(CountingSource.ranges(0, 10, 3).map { case (s, e) => e - s }.sum == 10)
  }

  test("scan reports row-count and byte-size statistics (getEstimatedSizeBytes)") {
    val scan = new CountingScan(CountingSource.Config(Map("n" -> "500")))
    val st = scan.estimateStatistics()
    assert(st.numRows().getAsLong == 500L)
    assert(st.sizeInBytes().getAsLong == 500L * 16)
  }

  test("restart resumes from the committed offset without re-emitting") {
    // file sink (memory sink cannot recover from a checkpoint): after the
    // second run the output must hold each id exactly once — a fresh
    // stream instance that re-planned below the committed offset would
    // append duplicates of [0, 60)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cnt-ck-").toString
    val out = java.nio.file.Files.createTempDirectory("graft-cnt-out-").toString
    def runStream(maxRows: Int): Unit = {
      val q = spark.readStream.format("graft-counting")
        .option("rowsPerBatch", 30).option("splits", 2).option("maxRows", maxRows)
        .load()
        .writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    runStream(60)
    assert(spark.read.parquet(out).select("id").as[Long].collect().sorted.toSeq
      == (0L until 60L))
    runStream(100)
    assert(spark.read.parquet(out).select("id").as[Long].collect().sorted.toSeq
      == (0L until 100L))
  }

  test("unbounded read: rowsPerBatch steps, drains at maxRows") {
    val stream = spark.readStream.format("graft-counting")
      .option("rowsPerBatch", 40).option("splits", 3).option("maxRows", 100)
      .load()
    val dir = java.nio.file.Files.createTempDirectory("graft-cnt-").toString
    val q = stream.writeStream.format("memory").queryName("cnt")
      .outputMode("append").option("checkpointLocation", dir).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("cnt").select("id").as[Long].collect().sorted.toSeq
    assert(got == (0L until 100L))          // exactly maxRows, no dupes
    assert(q.recentProgress.length >= 3)    // 40 + 40 + 20 stepping
  }
}
