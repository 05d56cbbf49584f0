package graft.sources

import java.io.{ByteArrayInputStream, DataInputStream, IOException}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import java.util.zip.CRC32C

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TfRecordSpec extends SparkSpec {
  import spark.implicits._

  private def scratch(): Path = {
    val d = Files.createTempDirectory("graft-tfrec-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      try Files.walk(d).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      catch { case _: Throwable => () }
    }))
    d
  }

  private def parse(bytes: Array[Byte]): Seq[Array[Byte]] =
    TfRecord.records(
      new DataInputStream(new ByteArrayInputStream(bytes)), "mem").toSeq

  test("JDK CRC32C is real CRC32C (standard check value for '123456789')") {
    val c = new CRC32C()
    c.update("123456789".getBytes(UTF_8))
    assert(c.getValue == 0xE3069283L)
  }

  test("frame layout: LE length header, payload, both CRCs verify on parse") {
    val payload = "abc".getBytes(UTF_8)
    val framed = TfRecord.frame(payload)
    assert(framed.length == 8 + 4 + 3 + 4)
    // little-endian uint64 length
    assert(framed.take(8).toSeq == Seq[Byte](3, 0, 0, 0, 0, 0, 0, 0))
    val back = parse(framed)
    assert(back.map(_.toSeq) == Seq(payload.toSeq))
  }

  test("empty and multi-record streams parse in order") {
    val recs = Seq(Array.empty[Byte], "x".getBytes(UTF_8), ("y" * 100000).getBytes(UTF_8))
    val stream = recs.flatMap(r => TfRecord.frame(r).toSeq).toArray
    assert(parse(stream).map(_.toSeq) == recs.map(_.toSeq))
    assert(parse(Array.empty[Byte]).isEmpty)
  }

  test("a flipped payload byte fails the data CRC; a flipped length byte fails the length CRC") {
    val framed = TfRecord.frame("hello world".getBytes(UTF_8))
    val badData = framed.clone(); badData(14) = (badData(14) ^ 0x01).toByte
    val e1 = intercept[IOException](parse(badData))
    assert(e1.getMessage.contains("data CRC"))
    val badLen = framed.clone(); badLen(2) = (badLen(2) ^ 0x01).toByte
    val e2 = intercept[IOException](parse(badLen))
    assert(e2.getMessage.contains("length CRC"))
    val truncated = framed.dropRight(2)
    val e3 = intercept[IOException](parse(truncated))
    assert(e3.getMessage.contains("truncated"))
  }

  test("write → read round-trips records byte-exact, sharded, with _SUCCESS") {
    val dir = scratch().resolve("rt").toString
    val texts = Seq("", "plain", "unicode π∆🎈", "tab\tand\nnewline", "z" * 50000)
    val df = texts.toDF("t")
    TfRecordIO.write(df, encode(col("t"), "UTF-8"), dir, shards = 4)
    val files = Files.list(Paths.get(dir)).iterator().asScala.map(_.getFileName.toString).toSeq
    assert(files.contains("_SUCCESS"))
    assert(files.count(_.matches("part-\\d{5}\\.tfrecord")) == 4)
    assert(!files.exists(_.startsWith("_temporary")))
    val back = TfRecordIO.read(spark, dir)
      .select(decode(col("record"), "UTF-8")).as[String].collect()
    assertInAnyOrder(back.toSeq, texts)
  }

  test("overwrite truncates previous shard layout (3-phase commit end state)") {
    val dir = scratch().resolve("ow").toString
    TfRecordIO.write(Seq("a", "b", "c").toDF("t"), encode(col("t"), "UTF-8"), dir, shards = 3)
    TfRecordIO.write(Seq("x", "y").toDF("t"), encode(col("t"), "UTF-8"), dir, shards = 1)
    val back = TfRecordIO.read(spark, dir)
      .select(decode(col("record"), "UTF-8")).as[String].collect()
    assertInAnyOrder(back.toSeq, Seq("x", "y"))
    val parts = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".tfrecord")).toSeq
    assert(parts.size == 1)
  }

  test("gzip compression round-trips, extension-detected on read") {
    val dir = scratch().resolve("gz").toString
    val texts = Seq("alpha", "beta", "z" * 10000)
    TfRecordIO.write(texts.toDF("t"), encode(col("t"), "UTF-8"), dir,
      shards = 2, compression = "gzip")
    val files = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(files.count(_.matches("part-\\d{5}\\.tfrecord\\.gz")) == 2)
    val back = TfRecordIO.read(spark, dir)
      .select(decode(col("record"), "UTF-8")).as[String].collect()
    assertInAnyOrder(back.toSeq, texts)
    // the compressible payload actually compressed
    val onDisk = Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".gz"))
      .map(Files.size(_)).sum
    assert(onDisk < 10000, s"gzip shards unexpectedly large: $onDisk")
  }

  test("a corrupted shard raises on read instead of yielding torn bytes") {
    val dir = scratch().resolve("corrupt").toString
    TfRecordIO.write(Seq("payload-one", "payload-two").toDF("t"),
      encode(col("t"), "UTF-8"), dir, shards = 1)
    val part = Files.list(Paths.get(dir)).iterator().asScala
      .find(_.getFileName.toString.endsWith(".tfrecord")).get
    val bytes = Files.readAllBytes(part)
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x40).toByte
    Files.write(part, bytes)
    // drop Hadoop LocalFileSystem's .crc sidecar so the corruption reaches
    // the TFRecord framing CRC (on HDFS/S3 there is no sidecar shadowing it)
    Files.deleteIfExists(part.getParent.resolve("." + part.getFileName + ".crc"))
    val e = intercept[Exception] {
      TfRecordIO.read(spark, dir).count()
    }
    val messages = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).mkString(" | ")
    assert(messages.contains("CRC") || messages.contains("truncated") ||
      messages.contains("implausible"), messages)
  }

  test("streaming read tails the landing directory: new shards arrive as new batches") {
    val dir = scratch().resolve("tail").toString
    java.nio.file.Files.createDirectories(Paths.get(dir))
    def land(name: String, recs: Seq[String]): Unit = {
      val f = Paths.get(dir, name)
      Files.write(f, recs.toArray.flatMap(r => TfRecord.frame(r.getBytes(UTF_8))))
      // distinct mtimes so the high-watermark offset separates arrivals
      Files.setLastModifiedTime(f,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    }
    land("shard-a.tfrecord", Seq("a1", "a2"))
    val ckpt = scratch().resolve("ckpt").toString
    val q = spark.readStream.format("graft-tfrecord").load(dir)
      .select(decode(col("record"), "UTF-8").as("v"))
      .writeStream.format("memory").queryName("tfrec_tail")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assertInAnyOrder(
        spark.table("tfrec_tail").as[String].collect().toSeq, Seq("a1", "a2"))
      Thread.sleep(5) // strictly later mtime than shard-a
      land("shard-b.tfrecord", Seq("b1"))
      q.processAllAvailable()
      assertInAnyOrder(spark.table("tfrec_tail").as[String].collect().toSeq,
        Seq("a1", "a2", "b1"))
    } finally q.stop()
  }

  test("streaming write commits one immutable shard set per epoch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = scratch().resolve("stream-out").toString
    val input = MemoryStream[String](9001, spark, None)
    val q = input.toDS().select(encode(col("value"), "UTF-8").as("record"))
      .writeStream.format("graft-tfrecord")
      .option("checkpointLocation", scratch().resolve("wckpt").toString)
      .option("path", dir).outputMode("append").start()
    try {
      input.addData("e0-r1", "e0-r2"); q.processAllAvailable()
      input.addData("e1-r1"); q.processAllAvailable()
    } finally q.stop()
    val parts = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".tfrecord")).toSeq
    // shard names carry the epoch
    assert(parts.forall(_.matches("part-\\d+-\\d{5}\\.tfrecord")), parts.toString)
    assert(parts.map(_.split("-")(1)).distinct.size >= 2, s"epochs: $parts")
    val back = TfRecordIO.read(spark, dir)
      .select(decode(col("record"), "UTF-8")).as[String].collect()
    assertInAnyOrder(back.toSeq, Seq("e0-r1", "e0-r2", "e1-r1"))
  }

  test("read plans one partition per shard file (the format's split contract)") {
    val dir = scratch().resolve("parts").toString
    TfRecordIO.write((1 to 100).map(_.toString).toDF("t"),
      encode(col("t"), "UTF-8"), dir, shards = 5)
    val df = TfRecordIO.read(spark, dir)
    assert(df.rdd.getNumPartitions == 5)
    assert(df.count() == 100)
  }
}
