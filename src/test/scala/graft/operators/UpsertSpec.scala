package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String = {
    val d = Files.createTempDirectory("graft_upsert_spec_").toString
    // mergeIntoPartitioned requires an existing snapshot root
    d
  }

  private def writeSnapshot(root: String): Unit =
    Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0),
      (4L, "b", 40.0), (5L, "b", 50.0),
      (6L, "c", 60.0))
      .toDF("k", "part", "v")
      .write.partitionBy("part").mode("overwrite").parquet(root)

  test("merge applies upserts, inserts, and deletes with exact row accounting") {
    val root = freshRoot()
    writeSnapshot(root)
    val delta = Seq(
      (2L, "a", 99.0, "U"),  // update
      (7L, "a", 70.0, "U"),  // insert
      (4L, "b", 0.0, "D"))   // delete
      .toDF("k", "part", "v", "op")
    val stats = Upsert.mergeIntoPartitioned(spark, root, delta, Seq("k"), "part")
    assert(stats.touchedPartitions.sorted == Seq("part=a", "part=b"))
    assert(stats.untouchedPartitions == Seq("part=c"))
    assert(stats.upsertRows == 2L)
    assert(stats.survivorRows == 3L) // a:{1,3}, b:{5}
    val out = spark.read.parquet(root).select("k", "part", "v")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "a", 10.0), (2L, "a", 99.0), (3L, "a", 30.0),
      (5L, "b", 50.0), (6L, "c", 60.0), (7L, "a", 70.0)).sortBy(_._1))
  }

  test("untouched partitions keep byte-identical files; touched ones are replaced") {
    val root = freshRoot()
    writeSnapshot(root)
    val beforeC = Upsert.partitionFileSignature(spark, root, "part=c")
    val beforeA = Upsert.partitionFileSignature(spark, root, "part=a")
    assert(beforeC.nonEmpty && beforeA.nonEmpty)
    val delta = Seq((1L, "a", -1.0, "U")).toDF("k", "part", "v", "op")
    Upsert.mergeIntoPartitioned(spark, root, delta, Seq("k"), "part")
    assert(Upsert.partitionFileSignature(spark, root, "part=c") == beforeC)
    assert(Upsert.partitionFileSignature(spark, root, "part=a") != beforeA)
  }

  test("a fully-deleted partition's directory is removed") {
    val root = freshRoot()
    writeSnapshot(root)
    val delta = Seq((6L, "c", 0.0, "D")).toDF("k", "part", "v", "op")
    val stats = Upsert.mergeIntoPartitioned(spark, root, delta, Seq("k"), "part")
    assert(stats.touchedPartitions == Seq("part=c"))
    assert(Upsert.partitionFileSignature(spark, root, "part=c").isEmpty)
    assert(spark.read.parquet(root).count() == 5L)
  }

  test("delta rows targeting new partitions create them") {
    val root = freshRoot()
    writeSnapshot(root)
    val delta = Seq((8L, "d", 80.0, "U")).toDF("k", "part", "v", "op")
    Upsert.mergeIntoPartitioned(spark, root, delta, Seq("k"), "part")
    val d = spark.read.parquet(root).filter(col("part") === "d")
      .select("k", "v").as[(Long, Double)].collect()
    assert(d.toSeq == Seq((8L, 80.0)))
  }

  test("same-partition duplicate delta keys are rejected (no silent key duplication)") {
    val root = freshRoot()
    writeSnapshot(root)
    val delta = Seq((2L, "a", 1.0, "U"), (2L, "a", 2.0, "U"))
      .toDF("k", "part", "v", "op")
    val e = intercept[IllegalArgumentException] {
      Upsert.mergeIntoPartitioned(spark, root, delta, Seq("k"), "part")
    }
    assert(e.getMessage.contains("more than one"))
    // snapshot unharmed
    assert(spark.read.parquet(root).count() == 6L)
  }

  test("null partition values in the delta are rejected, not silently dropped") {
    val root = freshRoot()
    writeSnapshot(root)
    val delta = Seq[(Long, Option[String], Double, String)](
      (9L, None, 1.0, "U")).toDF("k", "part", "v", "op")
    val e = intercept[IllegalArgumentException] {
      Upsert.mergeIntoPartitioned(spark, root, delta, Seq("k"), "part")
    }
    assert(e.getMessage.contains("null part"))
  }

  test("path-name-unstable partition types are rejected up front") {
    val root = freshRoot()
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0))
      .toDF("k", "part", "v")
      .write.partitionBy("part").mode("overwrite").parquet(root)
    val delta = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 2.0, "U"))
      .toDF("k", "part", "v", "op")
    val e = intercept[IllegalArgumentException] {
      Upsert.mergeIntoPartitioned(spark, root, delta, Seq("k"), "part")
    }
    assert(e.getMessage.contains("path-name-stable"))
  }

  test("a key split across two delta partitions is rejected") {
    val root = freshRoot()
    writeSnapshot(root)
    val delta = Seq((2L, "a", 1.0, "U"), (2L, "b", 2.0, "U"))
      .toDF("k", "part", "v", "op")
    val e = intercept[IllegalArgumentException] {
      Upsert.mergeIntoPartitioned(spark, root, delta, Seq("k"), "part")
    }
    assert(e.getMessage.contains("more than one"))
  }

  test("null op values are rejected, not silently treated as deletes") {
    // collect_set drops nulls: without the explicit null-op count a
    // null-op row would pass the U/D subset check, be excluded from the
    // upserts (null === "U" filters it out), and its key would silently
    // vanish from the snapshot (ADVICE r14)
    val root = freshRoot()
    writeSnapshot(root)
    val delta = Seq[(Long, String, Double, Option[String])](
      (2L, "a", 1.0, None)).toDF("k", "part", "v", "op")
    val e = intercept[IllegalArgumentException] {
      Upsert.mergeIntoPartitioned(spark, root, delta, Seq("k"), "part")
    }
    assert(e.getMessage.contains("null op"))
    // snapshot unharmed — the key is still present
    assert(spark.read.parquet(root).filter($"k" === 2L).count() > 0)
  }

  test("unknown op values are rejected before any IO") {
    val root = freshRoot()
    writeSnapshot(root)
    val sig = Upsert.partitionFileSignature(spark, root, "part=a")
    val delta = Seq((2L, "a", 1.0, "X")).toDF("k", "part", "v", "op")
    intercept[IllegalArgumentException] {
      Upsert.mergeIntoPartitioned(spark, root, delta, Seq("k"), "part")
    }
    assert(Upsert.partitionFileSignature(spark, root, "part=a") == sig)
  }

  test("diffSnapshots emits the minimal U/D delta and merge(from, diff) == to") {
    val root = freshRoot()
    writeSnapshot(root)
    val from = spark.read.parquet(root).select("k", "part", "v")
    val to = Seq(
      (1L, "a", 10.0),  // unchanged
      (2L, "a", 99.0),  // updated
      // 3 deleted
      (4L, "b", 40.0),  // unchanged
      (5L, "b", 50.0),  // unchanged
      (6L, "c", 60.0),  // unchanged
      (7L, "d", 70.0))  // inserted (new partition)
      .toDF("k", "part", "v")
    val delta = Upsert.diffSnapshots(from, to, Seq("k"))
      .as[(Long, String, Double, String)].collect().sortBy(_._1)
    assert(delta.toSeq == Seq(
      (2L, "a", 99.0, "U"), (3L, "a", 30.0, "D"), (7L, "d", 70.0, "U")))
    Upsert.mergeIntoPartitioned(spark, root,
      Upsert.diffSnapshots(from, to, Seq("k")), Seq("k"), "part")
    val merged = spark.read.parquet(root).select("k", "part", "v")
    assert(merged.exceptAll(to).count() == 0 && to.exceptAll(merged).count() == 0)
  }

  test("diffSnapshots of identical snapshots is empty") {
    val df = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "part", "v")
    assert(Upsert.diffSnapshots(df, df, Seq("k")).count() == 0L)
  }

  test("diffSnapshots treats null values null-safely, not as always-differing") {
    val from = Seq[(Long, String, Option[Double])](
      (1L, "a", Some(1.0)), (2L, "a", None)).toDF("k", "part", "v")
    val to = Seq[(Long, String, Option[Double])](
      (1L, "a", None), (2L, "a", None)).toDF("k", "part", "v")
    val delta = Upsert.diffSnapshots(from, to, Seq("k"))
      .as[(Long, String, Option[Double], String)].collect()
    // k=2 is null on both sides → unchanged; k=1 changed value→null → U
    assert(delta.toSeq == Seq((1L, "a", None, "U")))
  }

  test("refreshPartitionSummaries recomputes touched rows, carries the rest, drops emptied") {
    val root = freshRoot()
    writeSnapshot(root)
    def summarize(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("part").agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("v").as("sv"))
    val before = summarize(spark.read.parquet(root)).persist()
    before.count()
    // update in a, delete ALL of c (partition vanishes), b untouched
    val delta = Seq((1L, "a", 100.0, "U"), (6L, "c", 0.0, "D"))
      .toDF("k", "part", "v", "op")
    val stats = Upsert.mergeIntoPartitioned(spark, root, delta, Seq("k"), "part")
    val out = Upsert.refreshPartitionSummaries(spark, root, "part",
      stats.touchedValues, before, summarize)
      .as[(String, Long, Double)].collect().sortBy(_._1)
    before.unpersist()
    assert(out.toSeq == Seq(("a", 3L, 150.0), ("b", 2L, 90.0)))
    // b's row came from the carried-over summary, a's from the re-scan,
    // c dropped because its slice is empty post-merge
  }

  test("untouched partitions are never even OPENED (corrupt-file tripwire)") {
    val root = freshRoot()
    writeSnapshot(root)
    // a poison pill in partition c: any read that touches c explodes, so
    // a merge of a-only succeeding proves the directory pruning is real,
    // not just a filter that still scans everything
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "part=c", "part-corrupt.snappy.parquet"),
      "this is not a parquet file".getBytes("UTF-8"))
    val delta = Seq((1L, "a", -5.0, "U")).toDF("k", "part", "v", "op")
    val stats = Upsert.mergeIntoPartitioned(spark, root, delta, Seq("k"), "part")
    assert(stats.touchedPartitions == Seq("part=a"))
    val a = spark.read.parquet(root).filter(col("part") === "a")
      .select("k", "v").as[(Long, Double)].collect().sortBy(_._1)
    assert(a.toSeq == Seq((1L, -5.0), (2L, 20.0), (3L, 30.0)))
  }

  test("scd2FromChangeLog collapses runs into 1..k ranges with exclusive ends") {
    val log = Seq(
      (1L, 1, "new"), (1L, 2, "new"), (1L, 3, "paid"), (1L, 4, "new"),
      (2L, 1, "new"))
      .toDF("k", "seq", "state")
    val out = Upsert.scd2FromChangeLog(log, Seq("k"), Seq(col("seq")),
        "state", col("seq"))
      .select("k", "range_idx", "state", "valid_from", "valid_to",
        "is_current", "n_rows")
      .as[(Long, Long, String, Int, Option[Int], Boolean, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      (1L, 1L, "new", 1, Some(3), false, 2L),
      (1L, 2L, "paid", 3, Some(4), false, 1L),
      (1L, 3L, "new", 4, None, true, 1L),
      (2L, 1L, "new", 1, None, true, 1L)))
  }

  test("scd2: a key whose FIRST state is NULL still numbers ranges 1..k") {
    val log = Seq(
      (1L, 1, null), (1L, 2, null), (1L, 3, "a"),   // null-leading key
      (2L, 1, "x"), (2L, 2, null), (2L, 3, "x"))    // null island mid-key
      .toDF("k", "seq", "state")
    val out = Upsert.scd2FromChangeLog(log, Seq("k"), Seq(col("seq")),
        "state", col("seq"))
      .select("k", "range_idx", "state", "valid_from", "n_rows")
      .as[(Long, Long, Option[String], Int, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      (1L, 1L, None, 1, 2L), (1L, 2L, Some("a"), 3, 1L),
      (2L, 1L, Some("x"), 1, 1L), (2L, 2L, None, 2, 1L),
      (2L, 3L, Some("x"), 3, 1L)))
  }

  test("partition values needing hive escaping survive the dir swap") {
    val root = freshRoot()
    Seq((1L, "x:1", 1.0), (2L, "plain", 2.0)).toDF("k", "part", "v")
      .write.partitionBy("part").mode("overwrite").parquet(root)
    val delta = Seq((1L, "x:1", 9.0, "U")).toDF("k", "part", "v", "op")
    val stats = Upsert.mergeIntoPartitioned(spark, root, delta, Seq("k"), "part")
    assert(stats.touchedPartitions.size == 1)
    val out = spark.read.parquet(root).filter(col("part") === "x:1")
      .select("v").as[Double].collect()
    assert(out.toSeq == Seq(9.0))
  }

  test("the merge lock blocks a second writer and fails fast on timeout") {
    val root = freshRoot()
    writeSnapshot(root)
    // a stale/foreign lock holder: the merge must NOT break it — it must
    // time out with the holder's identity in the message
    val lock = java.nio.file.Paths.get(root, ".merge-lock")
    java.nio.file.Files.write(lock, "uuid=held-by-test".getBytes)
    val delta = Seq((1L, "a", -1.0, "U")).toDF("k", "part", "v", "op")
    val e = intercept[IllegalStateException] {
      Upsert.mergeIntoPartitioned(spark, root, delta, Seq("k"), "part",
        lockWaitMs = 300L)
    }
    assert(e.getMessage.contains("merge lock"))
    assert(e.getMessage.contains("held-by-test"))
    // snapshot unchanged by the failed attempt
    assert(spark.read.parquet(root).count() == 6L)
    // releasing the lock unblocks the writer; the lock is dropped after
    // the commit and a .merge-log audit record exists
    java.nio.file.Files.delete(lock)
    Upsert.mergeIntoPartitioned(spark, root, delta, Seq("k"), "part")
    assert(!java.nio.file.Files.exists(lock))
    val logDir = java.nio.file.Paths.get(root, ".merge-log")
    // count .json records only — the local ChecksumFileSystem writes a
    // .crc sidecar per file
    assert(java.nio.file.Files.list(logDir)
      .filter(p => p.toString.endsWith(".json")).count() == 1L)
    assert(spark.read.parquet(root).filter(col("k") === 1L)
      .select("v").as[Double].head() == -1.0)
  }

  test("concurrent merges into one root serialize: no lost update") {
    val root = freshRoot()
    writeSnapshot(root)
    // four writers upsert four DISTINCT keys into the SAME partition
    // concurrently. Without the root lock, writer B can read the
    // pre-A partition while A swaps; whichever swaps last erases the
    // other's row (lost update). Under the lock all four must land.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val merges = (0 until 4).map { i =>
      Future {
        val delta = Seq((100L + i, "a", 1000.0 + i, "U"))
          .toDF("k", "part", "v", "op")
        Upsert.mergeIntoPartitioned(spark, root, delta, Seq("k"), "part")
      }
    }
    Await.result(Future.sequence(merges), 5.minutes)
    val got = spark.read.parquet(root)
      .filter(col("k") >= 100L).select("k", "v")
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((100L, 1000.0), (101L, 1001.0), (102L, 1002.0),
      (103L, 1003.0)), s"lost update: only ${got.map(_._1)} landed")
    // original rows intact, all four merges logged, lock released
    assert(spark.read.parquet(root).count() == 10L)
    assert(java.nio.file.Files.list(
        java.nio.file.Paths.get(root, ".merge-log"))
      .filter(p => p.toString.endsWith(".json")).count() == 4L)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, ".merge-lock")))
  }

  test("lockStatus detects a crashed holder's lock without stealing it") {
    val root = freshRoot()
    writeSnapshot(root)
    // no lock → exists = false
    assert(!Upsert.lockStatus(spark, root).exists)
    // a crashed same-host holder: real payload shape, a pid that is
    // certainly dead (pid_max on Linux keeps real pids well below this)
    val host = java.net.InetAddress.getLocalHost.getHostName
    val lock = java.nio.file.Paths.get(root, ".merge-lock")
    java.nio.file.Files.write(lock,
      s"uuid=dead-beef pid=999999999 host=$host at=${System.currentTimeMillis() - 60000}"
        .getBytes)
    val st = Upsert.lockStatus(spark, root)
    assert(st.exists)
    assert(st.uuid.contains("dead-beef"))
    assert(st.pid.contains(999999999L))
    assert(st.pidAlive.contains(false), s"crashed holder not detected: $st")
    assert(st.ageMs.exists(_ >= 60000L))
    // detection must NOT remove the lock (never auto-broken)
    assert(java.nio.file.Files.exists(lock))
    // a LIVE same-host holder (this JVM's pid) reads alive = true
    java.nio.file.Files.write(lock,
      s"uuid=live pid=${ProcessHandle.current().pid()} host=$host at=1".getBytes)
    assert(Upsert.lockStatus(spark, root).pidAlive.contains(true))
    // ... including when the payload carries the real jvmstart
    val myStart = ProcessHandle.current().info().startInstant()
      .map[Long](_.toEpochMilli).orElse(-1L)
    java.nio.file.Files.write(lock,
      (s"uuid=live pid=${ProcessHandle.current().pid()} host=$host " +
        s"jvmstart=$myStart at=1").getBytes)
    assert(Upsert.lockStatus(spark, root).pidAlive.contains(true))
    // pid-recycling: same live pid, but a jvmstart that cannot be this
    // process → the recorded holder is dead even though the pid is live
    java.nio.file.Files.write(lock,
      (s"uuid=recycled pid=${ProcessHandle.current().pid()} host=$host " +
        "jvmstart=12345 at=1").getBytes)
    assert(Upsert.lockStatus(spark, root).pidAlive.contains(false),
      "a recycled pid must not read as the holder being alive")
    // a remote holder's liveness is unknowable from here
    java.nio.file.Files.write(lock,
      "uuid=r pid=1 host=elsewhere.invalid at=1".getBytes)
    assert(Upsert.lockStatus(spark, root).pidAlive.isEmpty)
    // a NON-IDENTIFYING hostname (shared by containers; also the
    // getLocalHost failure fallback) must stay advisory even when it
    // happens to equal the local one — a live REMOTE holder on a
    // same-named machine would otherwise be misreported dead, the
    // exact lost-update the lock exists to prevent (ADVICE r12)
    Seq("unknown", "localhost").foreach { h =>
      java.nio.file.Files.write(lock,
        s"uuid=g pid=999999999 host=$h at=1".getBytes)
      assert(Upsert.lockStatus(spark, root).pidAlive.isEmpty,
        s"host=$h must not be treated as identifying")
    }
  }
}
