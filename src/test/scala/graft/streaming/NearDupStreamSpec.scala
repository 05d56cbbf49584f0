package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Dedup

/** Streaming near-dup: pigeonhole chunk completeness on a stream —
  * within-batch and cross-batch flags, first-wins semantics, horizon
  * pruning. */
class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp = new Timestamp(minute * 60000L)

  private val base = "the quick brown fox jumps over the lazy dog " +
    "while seventeen green bottles stand quietly on the old stone wall"
  private val nearCopy = base.replace("seventeen", "eighteen")
  private val unrelated = "completely different subject matter entirely: " +
    "spectral decomposition of sparse adjacency operators in linear algebra"

  private def hammingOf(a: String, b: String): Int = {
    val r = Seq((a, b)).toDF("ta", "tb")
      .select(Dedup.hamming(Dedup.simHash(col("ta")), Dedup.simHash(col("tb")))
        .cast("int"))
      .head().getInt(0)
    r
  }

  /** The near-pair's measured distance sets the radius (robust to the
    * signature hash/width — a one-token edit lands at a different but
    * deterministic distance for any geometry); the unrelated pair must
    * sit strictly outside it for the negative assertions to mean
    * anything. */
  private lazy val radius: Int = {
    val dNear = hammingOf(base, nearCopy)
    val dUnrel = hammingOf(base, unrelated)
    assert(dNear < dUnrel,
      s"fixture drifted: near=$dNear must be < unrelated=$dUnrel")
    dNear
  }

  private def run(name: String,
                  batches: Seq[Seq[(Long, Timestamp, String)]]): Seq[NearDupStream.NearDup] = {
    val input = MemoryStream[(Long, Timestamp, String)](name.hashCode.abs, spark, None)
    val flags = NearDupStream.nearDupFlags(
      input.toDS().toDF("id", "ts", "text"), "id", "ts", "text",
      maxDist = radius, lateness = "10 minutes")
    val dir = java.nio.file.Files.createTempDirectory(s"graft-nd-$name").toString
    val q = flags.writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", dir).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).as[NearDupStream.NearDup].collect().toSeq
  }

  test("within-batch and cross-batch near-dups flag; unrelated text does not") {
    // precondition sanity: the fixture pair really is within the radius,
    // the unrelated text really is not (radius is derived from the pair,
    // so the first holds by construction; the second is the real check)
    assert(hammingOf(base, unrelated) > radius, "fixture unrelated pair drifted")

    val flags = run("nd1", Seq(
      Seq((1L, ts(1), base), (2L, ts(2), nearCopy), (3L, ts(2), unrelated)),
      Seq((4L, ts(3), base)) // exact text of 1 → hamming 0, cross-batch
    ))
    val byId = flags.groupBy(_.id).view.mapValues(_.map(_.dup_of).toSet).toMap
    assert(byId.contains(2L) && byId(2L).contains(1L),
      s"within-batch near-dup not flagged: $flags")
    assert(byId.contains(4L) && (byId(4L) - 3L).nonEmpty,
      s"cross-batch duplicate not flagged: $flags")
    assert(!byId.contains(3L), s"unrelated doc falsely flagged: $flags")
    assert(!byId.contains(1L), "first arrival must never be flagged")
    // exact re-arrival reports hamming 0 against some earlier member
    assert(flags.filter(_.id == 4L).exists(_.dist == 0))
  }

  test("seen-signature state survives a query restart from the checkpoint") {
    val input = MemoryStream[(Long, Timestamp, String)](31417, spark, None)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-nd-rst-").toString
    val out = java.nio.file.Files.createTempDirectory("graft-nd-rst-out-").toString
    def start() = {
      val flags = NearDupStream.nearDupFlags(
        input.toDS().toDF("id", "ts", "text"), "id", "ts", "text",
        maxDist = 3, lateness = "10 minutes")
      // file sink: the memory sink cannot recover from a checkpoint
      flags.writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", ckpt).start()
    }
    val q1 = start()
    try {
      input.addData(Seq((1L, ts(1), base)))
      q1.processAllAvailable()
    } finally q1.stop()
    // the dup target arrived before the restart — its signature must come
    // back from the state store for the post-restart arrival to flag
    val q2 = start()
    try {
      input.addData(Seq((2L, ts(2), base)))
      q2.processAllAvailable()
    } finally q2.stop()
    val flags = spark.read.parquet(out).as[NearDupStream.NearDup].collect()
    assert(flags.exists(f => f.id == 2L && f.dup_of == 1L && f.dist == 0),
      s"cross-restart duplicate not flagged: ${flags.toSeq}")
  }

  test("identical ids are not self-flagged on re-arrival") {
    val flags = run("nd2", Seq(
      Seq((7L, ts(1), base)),
      Seq((7L, ts(2), base)) // same record retried — id equality is exempt
    ))
    assert(!flags.exists(f => f.id == 7L && f.dup_of == 7L), s"$flags")
  }

  test("a re-observation refreshes retention past the original horizon") {
    // horizon = 10 min. Doc 1 arrives at t=1, is re-observed at t=15
    // (same id + signature — a genuine later sighting, not a within-batch
    // retry). The unrelated doc at t=30 advances the watermark to 20, so
    // the prune floor is 10: the ORIGINAL t=1 entry would be dropped, but
    // the refreshed t=15 entry survives — the near-copy at t=21 must
    // still flag against doc 1.
    val flags = run("nd3", Seq(
      Seq((1L, ts(1), base)),
      Seq((1L, ts(15), base)),
      Seq((9L, ts(30), unrelated)),
      Seq((2L, ts(21), nearCopy))
    ))
    assert(flags.exists(f => f.id == 2L && f.dup_of == 1L),
      s"refreshed entry expired early: $flags")
  }
}
