package graft.streaming

import graft.SparkSpec
import graft.operators.Upsert
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Continuous CDC-apply: a stream of keyed corrections maintains a
  * partitioned snapshot via per-micro-batch partition-scoped MERGE. */
class MergeStreamSpec extends SparkSpec {
  import spark.implicits._

  private def snapshot(root: String): Unit =
    Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0), (4L, "c", 40.0))
      .toDF("k", "part", "v")
      .write.partitionBy("part").mode("overwrite").parquet(root)

  private def readBack(root: String): Map[Long, (String, Double)] =
    spark.read.parquet(root).select("k", "part", "v")
      .as[(Long, String, Double)].collect()
      .map { case (k, p, v) => k -> (p, v) }.toMap

  test("stream of changes merges batch-by-batch; cold partitions never rewritten") {
    val base = java.nio.file.Files.createTempDirectory("graft-merge-stream-").toString
    val root = s"$base/snap"
    snapshot(root)
    val coldSig = Upsert.partitionFileSignature(spark, root, "part=c")

    val input = MemoryStream[(Long, String, Double, String, Long)](spark)
    val changes = input.toDF().toDF("k", "part", "v", "op", "seq")
    val q = StreamOps.writeStreamMerge(
      changes, root, Seq("k"), "part", "seq", s"$base/ckpt")
    try {
      // batch 1: update k=1, insert k=5; batch 2: delete k=2, update k=5
      input.addData((1L, "a", 11.0, "U", 1L), (5L, "b", 50.0, "U", 2L))
      q.processAllAvailable()
      assert(readBack(root) == Map(
        1L -> ("a", 11.0), 2L -> ("a", 20.0), 3L -> ("b", 30.0),
        4L -> ("c", 40.0), 5L -> ("b", 50.0)))
      input.addData((2L, "a", 0.0, "D", 3L), (5L, "b", 55.0, "U", 4L))
      q.processAllAvailable()
    } finally q.stop()
    assert(readBack(root) == Map(
      1L -> ("a", 11.0), 3L -> ("b", 30.0), 4L -> ("c", 40.0), 5L -> ("b", 55.0)))
    // partition c saw no change in either batch — bytes untouched
    assert(Upsert.partitionFileSignature(spark, root, "part=c") == coldSig)
  }

  test("same-key changes within one batch collapse to the max-seq row") {
    val base = java.nio.file.Files.createTempDirectory("graft-merge-stream-").toString
    val root = s"$base/snap"
    snapshot(root)
    val input = MemoryStream[(Long, String, Double, String, Long)](spark)
    val q = StreamOps.writeStreamMerge(
      input.toDF().toDF("k", "part", "v", "op", "seq"),
      root, Seq("k"), "part", "seq", s"$base/ckpt")
    try {
      // three changes to k=1 in ONE batch: U(12) then D then U(14) by seq;
      // the last (seq=6, U v=14) must win — and exactly once (no dup key)
      input.addData((1L, "a", 12.0, "U", 4L), (1L, "a", 0.0, "D", 5L),
        (1L, "a", 14.0, "U", 6L))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(root).filter(col("k") === 1L)
      .select("v").as[Double].collect()
    assert(rows.toSeq == Seq(14.0), s"expected single v=14 row, got ${rows.toSeq}")
  }

  test("delete wins a seq tie (conservative collapse)") {
    val base = java.nio.file.Files.createTempDirectory("graft-merge-stream-").toString
    val root = s"$base/snap"
    snapshot(root)
    val input = MemoryStream[(Long, String, Double, String, Long)](spark)
    val q = StreamOps.writeStreamMerge(
      input.toDF().toDF("k", "part", "v", "op", "seq"),
      root, Seq("k"), "part", "seq", s"$base/ckpt")
    try {
      input.addData((3L, "b", 99.0, "U", 7L), (3L, "b", 0.0, "D", 7L))
      q.processAllAvailable()
    } finally q.stop()
    assert(!readBack(root).contains(3L))
  }

  test("restart from checkpoint resumes the merge stream without replay damage") {
    val base = java.nio.file.Files.createTempDirectory("graft-merge-stream-").toString
    val root = s"$base/snap"
    snapshot(root)
    val input = MemoryStream[(Long, String, Double, String, Long)](spark)
    def start() = StreamOps.writeStreamMerge(
      input.toDF().toDF("k", "part", "v", "op", "seq"),
      root, Seq("k"), "part", "seq", s"$base/ckpt")
    val q1 = start()
    try {
      input.addData((1L, "a", 100.0, "U", 1L))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(readBack(root)(1L) == (("a", 100.0)))
    // second incarnation, same checkpoint: the committed batch must not
    // re-apply, and new data must merge on top of the restored state
    val q2 = start()
    try {
      input.addData((2L, "a", 0.0, "D", 2L), (6L, "d", 60.0, "U", 3L))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(readBack(root) == Map(
      1L -> ("a", 100.0), 3L -> ("b", 30.0), 4L -> ("c", 40.0), 6L -> ("d", 60.0)))
  }

  test("replaying an identical delta is idempotent (the foreachBatch contract)") {
    val base = java.nio.file.Files.createTempDirectory("graft-merge-stream-").toString
    val root = s"$base/snap"
    snapshot(root)
    val delta = Seq((1L, "a", 77.0, "U"), (2L, "a", 0.0, "D"))
      .toDF("k", "part", "v", "op")
    Upsert.mergeIntoPartitioned(spark, root, delta, Seq("k"), "part")
    val once = readBack(root)
    Upsert.mergeIntoPartitioned(spark, root, delta, Seq("k"), "part")
    assert(readBack(root) == once)
  }
}
