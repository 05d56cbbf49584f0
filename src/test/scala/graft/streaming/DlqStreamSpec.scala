package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Dead-letter routing on an unbounded stream: one query, two sinks,
  * nothing lost, nothing duplicated, batch ≡ stream on the same tag
  * logic. */
class DlqStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Column-side payload builder (a udf would drag the spec class into
    * the task closure): ids divisible by 3 get a truncated, corrupt
    * payload. */
  private def payloadCol(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(pmod(id, lit(3)) === 0, concat(lit("{\"k\": "), id))
      .otherwise(concat(lit("{\"k\": "), id, lit("}")))

  test("foreachBatch DLQ split: valid rows parse to main, corrupt land in the DLQ") {
    val base = java.nio.file.Files.createTempDirectory("graft-dlq-").toString
    val input = MemoryStream[Long](spark)
    val tagged = StreamOps.tagDeadLetters(
      input.toDF().select(col("value").as("id"),
        payloadCol(col("value")).as("payload")),
      "payload", "k BIGINT")

    val q = StreamOps.writeWithDeadLetterQueue(
      tagged, s"$base/main", s"$base/dlq", s"$base/ckpt")
    try {
      input.addData(0L until 30L: _*)
      q.processAllAvailable()
      input.addData(30L until 45L: _*)
      q.processAllAvailable()
    } finally q.stop()

    val main = spark.read.parquet(s"$base/main")
    val dlq = spark.read.parquet(s"$base/dlq")

    val expectedBad = (0L until 45L).filter(_ % 3 == 0)
    val expectedGood = (0L until 45L).filterNot(_ % 3 == 0)

    assert(main.count() == expectedGood.length && dlq.count() == expectedBad.length)
    // parsed values survived on the main branch
    assert(main.select(col("parsed.k")).as[Long].collect().sorted.toSeq == expectedGood)
    // the DLQ keeps the RAW payload for forensics
    assert(dlq.select("id").as[Long].collect().sorted.toSeq == expectedBad)
    assert(dlq.columns.toSet == Set("id", "payload", "epoch"))
    dlq.select("payload").as[String].collect()
      .foreach(p => assert(!p.endsWith("}"), s"valid payload leaked to DLQ: $p"))
  }

  test("crash replay of the last micro-batch is idempotent (epoch overwrite)") {
    val base = java.nio.file.Files.createTempDirectory("graft-dlq-replay-").toString
    val input = MemoryStream[Long](spark)
    def tagged = StreamOps.tagDeadLetters(
      input.toDF().select(col("value").as("id"),
        payloadCol(col("value")).as("payload")),
      "payload", "k BIGINT")

    val q1 = StreamOps.writeWithDeadLetterQueue(
      tagged, s"$base/main", s"$base/dlq", s"$base/ckpt")
    try {
      input.addData(0L until 12L: _*)
      q1.processAllAvailable()
      input.addData(12L until 21L: _*)
      q1.processAllAvailable()
    } finally { q1.stop(); q1.awaitTermination() }

    val before = spark.read.parquet(s"$base/main").count() +
      spark.read.parquet(s"$base/dlq").count()
    assert(before == 21, s"setup wrote $before rows")

    // simulate a crash AFTER the sink write but BEFORE the epoch commit:
    // delete the newest commit marker — on restart the engine re-runs
    // that micro-batch with the SAME batchId against the same sink
    val commits = new java.io.File(s"$base/ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.nonEmpty)
    val last = commits.last
    // the local FS keeps a checksum sidecar; leaving it behind makes the
    // replayed commit's rename fail as a phantom concurrent query
    val crc = new java.io.File(last.getParentFile, s".${last.getName}.crc")
    assert(last.delete(), "could not remove the last commit marker")
    if (crc.exists()) assert(crc.delete())

    val q2 = StreamOps.writeWithDeadLetterQueue(
      tagged, s"$base/main", s"$base/dlq", s"$base/ckpt")
    try q2.processAllAvailable() finally q2.stop()

    val main = spark.read.parquet(s"$base/main")
    val dlq = spark.read.parquet(s"$base/dlq")
    assert(main.count() + dlq.count() == 21,
      s"replay duplicated or dropped rows: ${main.count()} + ${dlq.count()}")
    assert(main.select("id").as[Long].collect().sorted.toSeq ==
      (0L until 21L).filterNot(_ % 3 == 0))
  }

  test("the tag projection is identical in batch (the oracle-checked twin)") {
    val ids = (0L until 45L)
    val batch = StreamOps.tagDeadLetters(
      ids.toDF("id").select(col("id"), payloadCol(col("id")).as("payload")),
      "payload", "k BIGINT")
    val got = batch.select(col("id"), col("ok")).as[(Long, Boolean)].collect().toMap
    ids.foreach(i => assert(got(i) == (i % 3 != 0), s"id $i"))
  }

  test("a NULL payload dead-letters (a null struct is not 'no corruption')") {
    val rows = StreamOps.tagDeadLetters(
      Seq((1L, Some("""{"k": 7}""")), (2L, None)).toDF("id", "payload"),
      "payload", "k BIGINT")
      .select(col("id"), col("ok")).as[(Long, Boolean)].collect().toMap
    assert(rows(1L) && !rows(2L))
  }
}
