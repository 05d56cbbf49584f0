package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

import graft.llm.Dedup

/** Streaming NEAR-duplicate detection — the unbounded leg of the dedup
  * family (batch leg: [[graft.llm.Dedup.simHashPairs]]; exact streaming
  * leg: [[StreamOps.dedupByFingerprint]]). The reference has no
  * counterpart (its streaming dedup is exact-by-id, [U] IO/PubsubIO.java
  * idLabel); this extends the mandated LLM-pipeline family to streams.
  *
  * Mechanism: each document's 64-bit SimHash splits into maxDist+1 bit
  * chunks. By pigeonhole, any two signatures within hamming ≤ maxDist
  * agree on at least one chunk, so keying the stream by (chunk index,
  * chunk value) routes every near-dup pair through ≥1 common key — the
  * same complete blocking as the batch operator, re-expressed as a
  * `transformWithState` key space. Per key, ListState holds the
  * signatures seen within the event-time horizon; each arrival compares
  * against only its chunk-mates (the 2^(64/k)-fold reduction vs all-pairs
  * that makes the state bounded and the comparison local).
  *
  * Emissions are (id, dup_of, dist) flags for pairs within `maxDist`,
  * dup_of = an earlier-arrived document — streaming semantics are
  * first-wins, exactly like dropDuplicatesWithinWatermark. A pair
  * agreeing on several chunks emits from each; consumers take
  * `.dropDuplicates("id")` (or treat flags as a set) downstream.
  *
  * State hygiene, two layers: entries older than the watermark minus the
  * horizon are pruned on every key access (the fast path), and every
  * batch registers an event-time timer at (latest arrival + horizon) as
  * the cold-key sweep — a chunk key that never receives another row is
  * never re-accessed, so without the timer its entries would outlive the
  * horizon (for small maxDist the chunk space is large and most keys go
  * cold after one row). When the timer fires past the horizon the key's
  * surviving entries are pruned and an empty key releases its state.
  * Together: memory ∝ docs per horizon, not stream length.
  */
object NearDupStream {

  /** A flagged near-duplicate arrival. */
  final case class NearDup(id: Long, dup_of: Long, dist: Int, ts: Timestamp)

  /** A signature retained in chunk-key state. */
  final case class Seen(id: Long, sh: Long, tsMs: Long)

  final class ChunkProcessor(maxDist: Int, horizonMs: Long)
      extends StatefulProcessor[Long, (Long, Long, Long, Timestamp), NearDup] {

    @transient private var seen: ListState[Seen] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[Seen]("seen", Encoders.product[Seen],
        TTLConfig.NONE)

    override def handleInputRows(key: Long,
                                 rows: Iterator[(Long, Long, Long, Timestamp)],
                                 timers: TimerValues): Iterator[NearDup] = {
      val wm = timers.getCurrentWatermarkInMs()
      val floor = if (wm <= 0) Long.MinValue else wm - horizonMs
      var live = seen.get().filter(_.tsMs >= floor).toList
      val out = List.newBuilder[NearDup]
      // arrival order within the batch is the iterator order — process
      // sequentially so within-batch pairs flag too (first-wins)
      rows.foreach { case (id, _, sh, ts) =>
        val matches = live.filter { s =>
          s.id != id && java.lang.Long.bitCount(s.sh ^ sh) <= maxDist
        }
        if (matches.nonEmpty) {
          // deterministic representative: the smallest matching earlier id
          val rep = matches.minBy(_.id)
          out += NearDup(id, rep.id,
            java.lang.Long.bitCount(rep.sh ^ sh), ts)
        }
        // a retry (same id AND signature already live) is not a new
        // observation — appending again would grow per-key state by one
        // redundant entry per redelivery. It DOES refresh retention: a
        // genuine later re-observation extends the entry's horizon to
        // last-seen + horizon (max guards against late/out-of-order
        // duplicates shrinking it), so a periodically re-crawled doc
        // keeps flagging its near-dups instead of silently expiring
        live.find(s => s.id == id && s.sh == sh) match {
          case Some(s0) =>
            if (ts.getTime > s0.tsMs)
              live = live.map(s =>
                if (s.id == id && s.sh == sh) s.copy(tsMs = ts.getTime) else s)
          case None => live = Seen(id, sh, ts.getTime) :: live
        }
      }
      seen.clear()
      live.reverse.foreach(seen.appendValue)
      // cold-key sweep: when the event clock passes the newest entry's
      // horizon, fire and prune — releases keys that never see data again
      if (live.nonEmpty)
        getHandle.registerTimer(live.map(_.tsMs).max + horizonMs + 1)
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[NearDup] = {
      val wm = timers.getCurrentWatermarkInMs()
      val floor = if (wm <= 0) Long.MinValue else wm - horizonMs
      val live = seen.get().filter(_.tsMs >= floor).toList
      seen.clear()
      if (live.nonEmpty) {
        live.foreach(seen.appendValue)
        getHandle.registerTimer(live.map(_.tsMs).max + horizonMs + 1)
      }
      Iterator.empty
    }
  }

  /** Flag near-duplicate arrivals on a streaming DataFrame of
    * (idCol: long, tsCol: timestamp, textCol: string). `lateness` is the
    * watermark delay; `horizon` is how long a signature stays eligible as
    * a dup target (Beam analogue: the GC horizon of the id-dedup state).
    * Returns the NearDup flag stream (append mode). */
  def nearDupFlags(docs: DataFrame, idCol: String, tsCol: String,
                   textCol: String, maxDist: Int = 3,
                   lateness: String = "10 minutes",
                   horizon: java.time.Duration =
                     java.time.Duration.ofMinutes(10)): Dataset[NearDup] = {
    require(maxDist >= 0 && maxDist < 64, "maxDist must be in [0, 64)")
    val spark = docs.sparkSession
    import spark.implicits._
    val k = maxDist + 1
    docs
      .withColumn("__sh", Dedup.simHash(col(textCol)))
      .withWatermark(tsCol, lateness)
      .select(col(idCol).cast("long").as("__id"),
        explode(array(chunkKeys(col("__sh"), k): _*)).as("__key"),
        col("__sh"), col(tsCol).as("__ts"))
      .as[(Long, Long, Long, Timestamp)]
      .groupByKey(_._2)
      .transformWithState(new ChunkProcessor(maxDist, horizon.toMillis),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Pack (chunk index, chunk bits) into one long grouping key — the
    * same chunk geometry as the batch operator (Dedup.simHashPairs),
    * shared by the streaming processor and the batch leg below. The
    * chunk index sits above the widest chunk's bits (k ≥ 2 ⇒ chunk
    * width ≤ 32, index ≤ 63 → the packed key fits 63 bits); k == 1 is
    * one full-width chunk, so the signature itself is the key. */
  private def chunkKeys(sh: Column, k: Int): Seq[Column] =
    if (k == 1) Seq(sh)
    else {
      val maxWidth = 64 / k + (if (64 % k == 0) 0 else 1)
      (0 until k).map { c =>
        val lo = c * 64 / k
        val hi = (c + 1) * 64 / k
        lit(c.toLong << maxWidth).bitwiseOR(
          shiftrightunsigned(sh, lo).bitwiseAND(lit((1L << (hi - lo)) - 1)))
      }
    }

  /** Deterministic BATCH leg of [[nearDupFlags]] — the oracle-gateable
    * replay of the streaming semantics with arrival order := (ts, id):
    * each document flags against the SMALLEST id among strictly earlier
    * documents within `horizon` whose SimHash is within `maxDist` (the
    * representative rule ChunkProcessor applies to its live state).
    * Same pigeonhole chunk blocking — candidate pairs only ever meet on
    * a shared (chunk index, chunk bits) key, never all-pairs, so the
    * shuffle is bounded by chunk-bucket co-occurrence at any scale.
    *
    * @return (id, dup_of, dist, ts) — one row per flagged document */
  def nearDupFlagsBatch(docs: DataFrame, idCol: String, tsCol: String,
                        textCol: String, maxDist: Int = 3,
                        horizon: java.time.Duration =
                          java.time.Duration.ofMinutes(10)): DataFrame = {
    require(maxDist >= 0 && maxDist < 64, "maxDist must be in [0, 64)")
    val k = maxDist + 1
    val base = docs.select(col(idCol).cast("long").as("__id"),
      col(tsCol).as("__ts"), Dedup.simHash(col(textCol)).as("__sh"))
    val sigs = base.select(col("__id"), col("__ts"), col("__sh"),
      explode(array(chunkKeys(col("__sh"), k): _*)).as("__key"))
    val a = sigs.select(col("__key"), col("__id").as("__ida"),
      col("__ts").as("__tsa"), col("__sh").as("__sha"))
    val b = sigs.select(col("__key"), col("__id").as("__idb"),
      col("__ts").as("__tsb"), col("__sh").as("__shb"))
    val pairs = a.join(b, Seq("__key"))
      .filter(col("__ida") =!= col("__idb"))
      .filter(col("__tsa") < col("__tsb") ||
        (col("__tsa") === col("__tsb") && col("__ida") < col("__idb")))
      .filter(unix_timestamp(col("__tsb")) - unix_timestamp(col("__tsa"))
        <= lit(horizon.getSeconds))
      .filter(Dedup.hamming(col("__sha"), col("__shb")) <= lit(maxDist))
    // a pair agreeing on several chunks appears once per chunk; the
    // min-struct aggregation collapses the duplicates AND picks the
    // smallest-id representative in the same pass
    pairs.groupBy(col("__idb"))
      .agg(min(struct(col("__ida"), col("__sha"))).as("__rep"),
        max(col("__shb")).as("__shb2"), max(col("__tsb")).as("__ts2"))
      .select(col("__idb").as("id"), col("__rep.__ida").as("dup_of"),
        Dedup.hamming(col("__rep.__sha"), col("__shb2")).cast("int").as("dist"),
        col("__ts2").as("ts"))
  }
}
