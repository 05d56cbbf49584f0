package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** MemoryStream-driven streaming tests — the reference's RunnableOnService/
  * ReduceFnTester pattern (SURVEY.md §5): inject elements, step the
  * watermark batch by batch, assert emitted results. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp = new Timestamp(minute * 60000L)

  test("streaming fixed-window count with watermark, append mode") {
    val input = MemoryStream[(Long, Timestamp)](1, spark, None)
    val agg = input.toDF().toDF("user_id", "ts")
      .transform(StreamOps.withEventTime(_, "ts", "5 minutes"))
      .groupBy(Windows.fixed(col("ts"), "10 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("w_start"), col("n"))
    val dir = java.nio.file.Files.createTempDirectory("graft-fw-").toString
    val q = agg.writeStream.format("memory").queryName("fw")
      .outputMode("append").option("checkpointLocation", dir).start()
    try {
      input.addData(Seq((1L, ts(1)), (1L, ts(2)), (2L, ts(3))))
      q.processAllAvailable()
      // window [0,10) still open: nothing emitted in append mode
      assert(spark.table("fw").isEmpty)
      // advance watermark past 10:00 + 5min lateness
      input.addData(Seq((1L, ts(16))))
      q.processAllAvailable()
      input.addData(Seq((1L, ts(17)))) // extra batch so timers run post-watermark-update
      q.processAllAvailable()
      val rows = spark.table("fw").as[(Long, Timestamp, Long)].collect().toSet
      assert(rows == Set((1L, ts(0), 2L), (2L, ts(0), 1L)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups by record id") {
    val input = MemoryStream[(Long, Timestamp, String)](2, spark, None)
    val deduped = StreamOps.dedupWithinWatermark(
      StreamOps.withEventTime(input.toDF().toDF("event_id", "ts", "payload"), "ts", "10 minutes"),
      Seq("event_id"))
    val dir = java.nio.file.Files.createTempDirectory("graft-dd-").toString
    val q = deduped.writeStream.format("memory").queryName("dd")
      .outputMode("append").option("checkpointLocation", dir).start()
    try {
      input.addData(Seq((1L, ts(1), "a"), (2L, ts(2), "b"), (1L, ts(1), "a-dup")))
      q.processAllAvailable()
      input.addData(Seq((2L, ts(3), "b-dup"), (3L, ts(4), "c")))
      q.processAllAvailable()
      val ids = spark.table("dd").select("event_id").as[Long].collect().toSeq
      assert(ids.sorted == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("streaming fingerprint dedup drops re-arriving near-identical text") {
    val input = MemoryStream[(Long, Timestamp, String)](98, spark, None)
    val deduped = StreamOps.dedupByFingerprint(
      input.toDF().toDF("doc_id", "ts", "text"), "text", "ts", "10 minutes")
    val dir = java.nio.file.Files.createTempDirectory("graft-fpd-").toString
    val q = deduped.writeStream.format("memory").queryName("fpd")
      .outputMode("append").option("checkpointLocation", dir).start()
    try {
      input.addData(Seq(
        (1L, ts(1), "Hello  World"),
        (2L, ts(2), "hello world"),   // same fingerprint (case/whitespace)
        (3L, ts(3), "different doc")))
      q.processAllAvailable()
      input.addData(Seq((4L, ts(4), "HELLO   world"))) // still a dup
      q.processAllAvailable()
      val ids = spark.table("fpd").select("doc_id").as[Long].collect().toSeq.sorted
      assert(ids == Seq(1L, 3L))
    } finally q.stop()
  }

  test("streaming session window merges gap-close events, append mode") {
    val input = MemoryStream[(Long, Timestamp)](3, spark, None)
    val agg = StreamOps.withEventTime(input.toDF().toDF("user_id", "ts"), "ts", "5 minutes")
      .groupBy(Windows.sessions(col("ts"), "10 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n"))
    val dir = java.nio.file.Files.createTempDirectory("graft-sw-").toString
    val q = agg.writeStream.format("memory").queryName("sw")
      .outputMode("append").option("checkpointLocation", dir).start()
    try {
      // session A: events at 1 and 5 (merge); session B: lone event at 40
      input.addData(Seq((1L, ts(1)), (1L, ts(5)), (1L, ts(40))))
      q.processAllAvailable()
      // watermark 35 after batch 1 closes session A; push it past B's end
      input.addData(Seq((1L, ts(60))))
      q.processAllAvailable()
      input.addData(Seq((1L, ts(61)))) // extra batch so the closed session flushes
      q.processAllAvailable()
      val rows = spark.table("sw").as[(Long, Long)].collect().toSeq
      assert(rows.contains((1L, 2L)) && rows.contains((1L, 1L)))
    } finally q.stop()
  }

  test("file-stream E2E: streaming windowed agg over events ≡ batch result") {
    // PubsubIO-capability row (SURVEY §2.5): an unbounded file source over
    // the real events fixture, running the same windowed-agg shape as
    // q_fixed_window, must converge to the batch answer — the unified-model
    // claim, end to end.
    val dir = "/root/testdata/sf0.001"
    val batchEvents = graft.Tables(spark, dir).events
    // raw on-disk schema, NOT the converted one — the stream applies the
    // same physical-encoding normalization Tables.events does (ts has
    // shipped as both nanos-long and TIMESTAMP_NTZ micros across fixture
    // generations)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val normalizeTs: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampType => df
        case _ => df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      }

    def windowedCount(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(Windows.fixed(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("w_start"), col("event_type"), col("n"))

    val expected = windowedCount(batchEvents)
      .as[(Timestamp, String, Long)].collect().toSet

    // the file-stream source monitors a DIRECTORY; expose the fixture file
    // through a scratch dir via symlink (testdata itself is read-only)
    val srcDir = java.nio.file.Files.createTempDirectory("graft-e2e-src-")
    java.nio.file.Files.createSymbolicLink(
      srcDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val stream = normalizeTs(spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.toString))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-e2e-").toString
    // complete mode: emit everything once the (finite) stream drains —
    // no watermark needed to compare against batch
    val q = windowedCount(stream)
      .writeStream.format("memory").queryName("e2e")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      val got = spark.table("e2e").as[(Timestamp, String, Long)].collect().toSet
      assert(got == expected)
    } finally q.stop()
  }

  test("streaming curation ≡ batch: deterministic sampling + quality filter are stream-safe") {
    // The LLM-curation scan-side operators (md5-threshold mixture
    // sampling, quality scoring) are pure row predicates, so the SAME
    // code curates an unbounded stream in append mode with no state and
    // no watermark — and must produce exactly the batch answer. This is
    // the unified-model claim for the curation family.
    val dir = "/root/testdata/sf0.001"
    def curate(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      graft.llm.Mixture.sampleByRates(df, "doc_id", "lang",
          Map("en" -> 0.5, "de" -> 0.25), defaultRate = 1.0)
        .withColumn("quality", graft.functions.TextFunctions.qualityScore(col("text")))
        .filter(col("quality") >= 0.5)
        .select(col("doc_id"), col("lang"), col("quality"))
    val batchDocs = spark.read.parquet(s"$dir/documents.parquet")
    val expected = curate(batchDocs).as[(Long, String, Double)].collect().toSet
    assert(expected.nonEmpty)

    val srcDir = java.nio.file.Files.createTempDirectory("graft-cur-src-")
    java.nio.file.Files.createSymbolicLink(
      srcDir.resolve("documents.parquet"),
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val stream = spark.readStream.schema(batchDocs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.toString)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cur-").toString
    val q = curate(stream).writeStream.format("memory").queryName("cur")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      val got = spark.table("cur").as[(Long, String, Double)].collect().toSet
      assert(got == expected)
    } finally q.stop()
  }

  test("streaming decontamination scrub ≡ batch: the native projection is stream-safe") {
    // Contamination.scrubOverlapsStreaming collects the probe-gram set
    // once (bounded) and evaluates as a single stateless projection —
    // the SAME call must scrub an unbounded stream in append mode with
    // no state store and produce exactly the batch answer.
    val dir = "/root/testdata/sf0.001"
    val batchDocs = spark.read.parquet(s"$dir/documents.parquet")
    val probes = batchDocs.filter(col("doc_id") < 3)
      .select(substring(col("text"), 1, 120).as("ptext"))
    def scrub(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      graft.llm.Contamination.scrubOverlapsStreaming(df, "doc_id", "text",
        probes, "ptext", n = 5)
    val expected = scrub(batchDocs)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(expected.exists(_._3 > 0), "fixture produced no scrubbed spans")

    val srcDir = java.nio.file.Files.createTempDirectory("graft-scrub-src-")
    java.nio.file.Files.createSymbolicLink(
      srcDir.resolve("documents.parquet"),
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val stream = spark.readStream.schema(batchDocs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.toString)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-scrub-").toString
    val q = scrub(stream).writeStream.format("memory").queryName("scrub")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      val got = spark.table("scrub")
        .as[(Long, Long, Long, String)].collect().toSet
      assert(got == expected)
    } finally q.stop()
  }

  test("streaming parquet file sink commits atomically (Write 3-phase contract)") {
    // [U] IO/Write.java's init/write/finalize maps to the streaming file
    // sink's transaction log: output appears with a _spark_metadata commit,
    // and re-reading yields exactly the emitted rows.
    val input = MemoryStream[(Long, Timestamp)](97, spark, None)
    val agg = StreamOps.withEventTime(input.toDF().toDF("user_id", "ts"), "ts", "5 minutes")
      .groupBy(Windows.fixed(col("ts"), "10 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("w_start"), col("n"))
    val out = java.nio.file.Files.createTempDirectory("graft-fsink-out-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-fsink-ck-").toString
    val q = agg.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      input.addData(Seq((1L, ts(1)), (1L, ts(2)), (2L, ts(3))))
      q.processAllAvailable()
      input.addData(Seq((1L, ts(16))))
      q.processAllAvailable()
      input.addData(Seq((1L, ts(17))))
      q.processAllAvailable()
    } finally q.stop()
    assert(new java.io.File(out, "_spark_metadata").exists(), "commit log missing")
    val rows = spark.read.parquet(out).as[(Long, Timestamp, Long)].collect().toSet
    assert(rows == Set((1L, ts(0), 2L), (2L, ts(0), 1L)))
  }

  test("stream-stream interval join (superset: reference had no joins at all)") {
    val clicks = MemoryStream[(Long, Timestamp)](51, spark, None)
    val views = MemoryStream[(Long, Timestamp)](52, spark, None)
    val c = StreamOps.withEventTime(clicks.toDF().toDF("user_id", "c_ts"), "c_ts", "10 minutes")
    val v = StreamOps.withEventTime(views.toDF().toDF("v_user", "v_ts"), "v_ts", "10 minutes")
    // click attributed to a view within the preceding 15 minutes
    val joined = c.join(v,
      expr("""user_id = v_user AND c_ts >= v_ts AND c_ts <= v_ts + interval 15 minutes"""))
      .select(col("user_id"), col("c_ts"), col("v_ts"))
    val dir = java.nio.file.Files.createTempDirectory("graft-ssj-").toString
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").option("checkpointLocation", dir).start()
    try {
      views.addData(Seq((1L, ts(1)), (2L, ts(2))))
      clicks.addData(Seq((1L, ts(10)), (2L, ts(30)))) // 2's click outside window
      q.processAllAvailable()
      views.addData(Seq((1L, ts(60))))   // advance both watermarks
      clicks.addData(Seq((1L, ts(61))))
      q.processAllAvailable()
      val rows = spark.table("ssj").as[(Long, Timestamp, Timestamp)].collect().toSet
      assert(rows.contains((1L, ts(10), ts(1))))
      assert(!rows.exists(r => r._1 == 2L && r._2 == ts(30)))
    } finally q.stop()
  }

  test("stream-static broadcast enrich") {
    val input = MemoryStream[(Long, Timestamp)](4, spark, None)
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val joined = StreamOps.enrichWithStatic(
      input.toDF().toDF("user_id", "ts"), dim, Seq("user_id"))
      .select("user_id", "tier")
    val dir = java.nio.file.Files.createTempDirectory("graft-js-").toString
    val q = joined.writeStream.format("memory").queryName("js")
      .outputMode("append").option("checkpointLocation", dir).start()
    try {
      input.addData(Seq((1L, ts(0)), (3L, ts(1))))
      q.processAllAvailable()
      val rows = spark.table("js").as[(Long, Option[String])].collect().toSet
      assert(rows == Set((1L, Some("gold")), (3L, None)))
    } finally q.stop()
  }

  test("exactSurvivorsViaBloom on an unbounded stream: ingest front door ≡ batch") {
    // the lake's front door: drop arriving docs whose fingerprint already
    // exists ON DISK — same operator as batch, streaming-legal because the
    // Bloom build + LEFT ANTI confirm are both against the static side.
    // fpp=0.5 with a 64-bit floor forces false positives through the
    // confirm join, so the exactness guarantee is exercised, not assumed.
    val ref = Seq((10L, "alpha doc text"), (11L, "beta doc text"),
      (12L, "gamma doc text")).toDF("doc_id", "text")
    val arriving = Seq(
      (1L, "alpha doc text"),     // exact dup of ref 10 → dropped
      (2L, "fresh document one"), // new → kept
      (3L, "Beta  Doc   Text"),   // normalization dup of ref 11 → dropped
      (4L, "fresh document two")) // new → kept
    val expected = graft.llm.Dedup.exactSurvivorsViaBloom(
        arriving.toDF("doc_id", "text"), ref, "text", fpp = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(expected == Set(2L, 4L), "batch truth must drop the two dups")
    val input = MemoryStream[(Long, String)](7, spark, None)
    val out = graft.llm.Dedup.exactSurvivorsViaBloom(
      input.toDF().toDF("doc_id", "text"), ref, "text", fpp = 0.5)
    val dir = java.nio.file.Files.createTempDirectory("graft-bfd-").toString
    val q = out.writeStream.format("memory").queryName("bloom_front_door")
      .outputMode("append").option("checkpointLocation", dir).start()
    try {
      input.addData(arriving.take(2))
      q.processAllAvailable()
      input.addData(arriving.drop(2))
      q.processAllAvailable()
      val got = spark.table("bloom_front_door")
        .select("doc_id").as[Long].collect().toSet
      assert(got == expected, s"stream must equal batch: got $got")
    } finally {
      q.stop()
      graft.llm.Dedup.releasePersistedState()
    }
  }
}
