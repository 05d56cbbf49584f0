package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming funnel: final step completions equal the batch progressive
  * min-ts definition (q_funnel's per-user legs), including out-of-order
  * delivery across micro-batches; converted users drop their buffers;
  * quiet keys seal via timers. */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private val Steps = Seq("view", "click", "purchase")

  private def ts(minute: Int, us: Int = 0): Timestamp = {
    val t = new Timestamp(minute * 60000L)
    t.setNanos(us * 1000)
    t
  }

  /** Batch reference: the q_funnel leg computation per user. */
  private def batchCompletions(events: Seq[(Long, Timestamp, String)]): Set[(Long, Int, Long)] = {
    val df = events.toDF("user_id", "ts", "event_type")
    def leg(step: String, prev: Option[DataFrame]): DataFrame = prev match {
      case None =>
        df.filter(col("event_type") === step)
          .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
      case Some(p) =>
        df.filter(col("event_type") === step)
          .join(p.withColumnRenamed("t", "tp"), Seq("user_id"))
          .filter(col("ts") > col("tp"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
    }
    var prev: Option[DataFrame] = None
    val out = Set.newBuilder[(Long, Int, Long)]
    Steps.zipWithIndex.foreach { case (s, i) =>
      val cur = leg(s, prev)
      cur.collect().foreach(r =>
        out += ((r.getLong(0), i + 1,
          r.getTimestamp(1).getTime * 1000 + r.getTimestamp(1).getNanos / 1000 % 1000)))
      prev = Some(cur)
    }
    out.result()
  }

  /** Watermark-flush events (funnel-typed — only those advance event
    * time; the later ones seal the earlier). Tests must include these
    * in the batch reference. */
  private def flushes(flush: Timestamp): Seq[(Long, Timestamp, String)] = Seq(
    (999L, flush, "view"),
    (999L, new Timestamp(flush.getTime + 600000L), "view"),
    (999L, new Timestamp(flush.getTime + 1200000L), "view"))

  /** Returns stream completions; callers compare against
    * batchCompletions(events ++ flushes(flush)). */
  private def runStream(name: String,
                        batches: Seq[Seq[(Long, Timestamp, String)]],
                        flush: Timestamp): Set[(Long, Int, Long)] = {
    val input = MemoryStream[(Long, Timestamp, String)](name.hashCode.abs, spark, None)
    val done = FunnelStream.stepCompletions(
      input.toDS().toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "event_type", Steps, lateness = "1 minute")
    val dir = java.nio.file.Files.createTempDirectory(s"graft-fn-$name").toString
    val q = done.writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", dir).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      // push the watermark far past every buffered event — flush events
      // must be funnel-typed (only they advance event time); the
      // reference comparison includes them, and the second, later flush
      // seals the first
      flushes(flush).foreach { f =>
        input.addData(Seq(f)); q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).as[FunnelStream.StepDone].collect()
      .map(d => (d.user_id, d.step,
        d.ts.getTime * 1000 + d.ts.getNanos / 1000 % 1000)).toSet
  }

  test("stream completions equal batch legs, in-order delivery") {
    val events = Seq(
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      (2L, ts(1), "click"), (2L, ts(2), "view"), (2L, ts(3), "click"),
      (3L, ts(5), "view"), // never converts past step 1
      (4L, ts(1), "purchase"), (4L, ts(2), "purchase")) // no view: nothing
    val got = runStream("fn_inorder", Seq(events), ts(30))
    assert(got === batchCompletions(events ++ flushes(ts(30))))
    assert(got.exists(_ == ((1L, 3, ts(3).getTime * 1000L))))
    assert(!got.exists(t => t._1 == 4L))
  }

  test("out-of-order delivery across batches still equals batch") {
    // the late 'view' at minute 1 arrives AFTER the click at minute 2 —
    // within the 1-minute lateness, so sealing must reorder them
    val b1 = Seq((1L, ts(2), "click"), (5L, ts(2), "view"))
    val b2 = Seq((1L, ts(1), "view"), (5L, ts(3), "purchase"),
      (5L, ts(2, 1), "click"))
    val all = b1 ++ b2
    val got = runStream("fn_ooo", Seq(b1, b2), ts(30))
    assert(got === batchCompletions(all ++ flushes(ts(30))))
    // user 1: view@1 then click@2 must BOTH complete despite arrival order
    assert(got.contains((1L, 1, ts(1).getTime * 1000L)))
    assert(got.contains((1L, 2, ts(2).getTime * 1000L)))
    // user 5: click one microsecond after view completes strictly
    assert(got.contains((5L, 2, ts(2, 1).getTime * 1000L + 1)))
  }

  test("ties at identical timestamps follow the strict-inequality rule") {
    // click at exactly the view's time does NOT complete step 2;
    // a later click does
    val events = Seq(
      (7L, ts(1), "view"), (7L, ts(1), "click"), (7L, ts(4), "click"))
    val got = runStream("fn_tie", Seq(events), ts(30))
    assert(got === batchCompletions(events ++ flushes(ts(30))))
    assert(got.contains((7L, 2, ts(4).getTime * 1000L)))
  }

  test("a converted user ignores further events and drops the buffer") {
    val b1 = Seq((9L, ts(1), "view"), (9L, ts(2), "click"),
      (9L, ts(3), "purchase"))
    val b2 = Seq((9L, ts(10), "view"), (9L, ts(11), "purchase"))
    val got = runStream("fn_conv", Seq(b1, b2), ts(30))
    assert(got === batchCompletions(b1 ++ b2 ++ flushes(ts(30))))
    assert(got.count(_._1 == 9L) === 3)
  }
}
