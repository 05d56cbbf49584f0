package graft.streaming

import java.sql.Timestamp
import java.time.Duration

import graft.SparkSpec
import graft.operators.Combine.CombineFn
import graft.streaming.TriggerEngine._
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** ReduceFnTester-style tests (SURVEY.md §5 trigger row): inject elements,
  * advance the watermark by feeding later data, assert the panes each
  * configuration emits. */
class TriggerEngineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp = new Timestamp(minute * 60000L)

  object SumFn extends CombineFn[Double, Double, Double] {
    def createAccumulator(): Double = 0.0
    def addInput(acc: Double, in: Double): Double = acc + in
    def mergeAccumulators(a: Double, b: Double): Double = a + b
    def extractOutput(acc: Double): Double = acc
  }

  /** Drive the engine over batches; returns all collected panes. */
  private def run(name: String,
                  trigger: TriggerSpec,
                  mode: AccumulationMode,
                  lateness: Duration,
                  batches: Seq[Seq[(String, Timestamp, Double)]],
                  clock: EngineClock = SystemEngineClock): Seq[Pane[String, Double]] = {
    val input = MemoryStream[(String, Timestamp, Double)](name.hashCode.abs, spark, None)
    val panes = TriggerEngine.windowedAggregate(
      input.toDS(), Duration.ofMinutes(10), lateness, trigger, mode, SumFn,
      clock = clock)
    val dir = java.nio.file.Files.createTempDirectory(s"graft-te-$name").toString
    val q = panes.writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", dir).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).as[Pane[String, Double]].collect().toSeq
  }

  test("default trigger: single ON_TIME pane when watermark passes window end") {
    val panes = run("dflt", TriggerSpec.default, Accumulating, Duration.ZERO, Seq(
      Seq(("a", ts(1), 1.0), ("a", ts(5), 2.0)), // window [0,10)
      Seq(("a", ts(12), 4.0)),                   // advances watermark to 12 → fires [0,10)
      Seq(("a", ts(25), 8.0))                    // advances watermark past [10,20)
    ))
    val w0 = panes.filter(_.windowStart == ts(0))
    assert(w0.map(p => (p.value, p.timing, p.paneIndex, p.isFirst, p.isLast)) ==
      Seq((3.0, "ON_TIME", 0L, true, true)))
    val w10 = panes.filter(_.windowStart == ts(10))
    assert(w10.map(p => (p.value, p.timing)) == Seq((4.0, "ON_TIME")))
  }

  test("early firings AfterCount(2): EARLY panes then ON_TIME, accumulating") {
    val panes = run("early", TriggerSpec(early = AfterCount(2)), Accumulating,
      Duration.ZERO, Seq(
        Seq(("a", ts(1), 1.0), ("a", ts(2), 2.0)), // 2 elements → EARLY (3.0)
        Seq(("a", ts(3), 4.0)),                    // 1 since pane → no fire
        Seq(("a", ts(4), 8.0)),                    // 2 since pane → EARLY (15.0 accumulated)
        Seq(("a", ts(15), 1.0))                    // watermark past end → ON_TIME
      ))
    val w0 = panes.filter(_.windowStart == ts(0)).sortBy(_.paneIndex)
    assert(w0.map(p => (p.value, p.timing, p.paneIndex)) == Seq(
      (3.0, "EARLY", 0L), (15.0, "EARLY", 1L), (15.0, "ON_TIME", 2L)))
    assert(w0.head.isFirst && w0.last.isLast)
  }

  test("discarding mode: panes carry only since-last-pane contents") {
    val panes = run("disc", TriggerSpec(early = AfterCount(2)), Discarding,
      Duration.ZERO, Seq(
        Seq(("a", ts(1), 1.0), ("a", ts(2), 2.0)),
        Seq(("a", ts(3), 4.0)),
        Seq(("a", ts(15), 0.0))
      ))
    val w0 = panes.filter(_.windowStart == ts(0)).sortBy(_.paneIndex)
    assert(w0.map(p => (p.value, p.timing)) == Seq(
      (3.0, "EARLY"), (4.0, "ON_TIME"))) // 4.0 only: discarding
  }

  test("late data within allowed lateness fires LATE panes; beyond is dropped") {
    val panes = run("late",
      TriggerSpec(late = PerBatch), Accumulating, Duration.ofMinutes(10), Seq(
        Seq(("a", ts(1), 1.0)),
        Seq(("a", ts(12), 2.0)),  // watermark 12 → ON_TIME for [0,10)
        Seq(("a", ts(5), 4.0)),   // late, within lateness → LATE pane (5.0)
        Seq(("a", ts(31), 8.0)),  // watermark 31 → [0,10) GC'd at 20
        Seq(("a", ts(6), 16.0))   // beyond lateness → dropped
      ))
    val w0 = panes.filter(_.windowStart == ts(0)).sortBy(_.paneIndex)
    assert(w0.map(p => (p.value, p.timing)) == Seq(
      (1.0, "ON_TIME"), (5.0, "LATE")))
  }

  test("Never trigger with ZERO lateness still emits its single FINAL pane") {
    val panes = run("never0", TriggerSpec.never, Accumulating,
      Duration.ZERO, Seq(
        Seq(("a", ts(1), 1.0), ("a", ts(2), 2.0)),
        Seq(("a", ts(15), 4.0)) // watermark past end → FINAL (not silence)
      ))
    val w0 = panes.filter(_.windowStart == ts(0))
    assert(w0.map(p => (p.value, p.timing, p.isLast)) == Seq((3.0, "FINAL", true)))
  }

  test("Never trigger: one FINAL pane at GC only") {
    val panes = run("never", TriggerSpec.never, Accumulating,
      Duration.ofMinutes(5), Seq(
        Seq(("a", ts(1), 1.0), ("a", ts(2), 2.0)),
        Seq(("a", ts(12), 4.0)),  // watermark 12 < 15 = GC of [0,10)
        Seq(("a", ts(20), 8.0))   // watermark 20 ≥ 15 → FINAL for [0,10)
      ))
    val w0 = panes.filter(_.windowStart == ts(0))
    assert(w0.map(p => (p.value, p.timing, p.isLast)) == Seq((3.0, "FINAL", true)))
  }

  test("AfterProcessingTimeDelay(0): fires on the batch containing data") {
    val panes = run("aptzero",
      TriggerSpec(early = AfterProcessingTimeDelay(0)), Accumulating,
      Duration.ZERO, Seq(
        Seq(("a", ts(1), 1.0)),   // delay 0 elapsed → EARLY each batch w/ data
        Seq(("a", ts(2), 2.0)),
        Seq(("a", ts(15), 0.0))   // watermark past end → ON_TIME
      ))
    val w0 = panes.filter(_.windowStart == ts(0)).sortBy(_.paneIndex)
    assert(w0.map(p => (p.value, p.timing)) == Seq(
      (1.0, "EARLY"), (3.0, "EARLY"), (3.0, "ON_TIME")))
  }

  test("AfterProcessingTimeDelay(huge): no early pane before the watermark") {
    val panes = run("apthuge",
      TriggerSpec(early = AfterProcessingTimeDelay(3600000L)), Accumulating,
      Duration.ZERO, Seq(
        Seq(("a", ts(1), 1.0), ("a", ts(2), 2.0)),
        Seq(("a", ts(15), 0.0))
      ))
    val w0 = panes.filter(_.windowStart == ts(0))
    assert(w0.map(p => (p.value, p.timing)) == Seq((3.0, "ON_TIME")))
  }

  test("QuantizedEventClock makes AfterProcessingTime boundaries deterministic") {
    // Virtual clock = batch max event time floored to 10-min cells; delay
    // = 2 cells. Window [0,10): its pane opens at clock 0, but the window
    // seals (wm 11 at batch 3) before any batch reads clock ≥ 20 min with
    // it unsealed → ON_TIME only. Window [20,30): pane opens at clock 20
    // (batch ts 21); the batch at ts 45 reads clock 40 = 20 + 2 cells
    // while [20,30) is still unsealed (wm 25) → exactly one EARLY pane
    // with the accumulated total, then ON_TIME. No wall time anywhere.
    val cell = 600000L
    val panes = run("qclock",
      TriggerSpec(early = AfterProcessingTimeDelay(2 * cell)), Accumulating,
      Duration.ZERO, Seq(
        Seq(("a", ts(1), 1.0), ("a", ts(5), 2.0)), // [0,10): paneFirst = 0
        Seq(("a", ts(11), 0.5)),  // clock 10 < 0+20 → no fire
        Seq(("a", ts(21), 4.0)),  // wm 11 seals [0,10) → ON_TIME; [20,30) opens @20
        Seq(("a", ts(25), 8.0)),  // clock 20 < 20+20 → no fire
        Seq(("a", ts(45), 0.25)), // clock 40 ≥ 20+20, [20,30) unsealed (wm 25) → EARLY
        Seq(("a", ts(65), 0.0))   // seals [20,30) and [40,50)
      ), clock = QuantizedEventClock(cell))
    val w0 = panes.filter(_.windowStart == ts(0)).sortBy(_.paneIndex)
    assert(w0.map(p => (p.value, p.timing)) == Seq((3.0, "ON_TIME")),
      s"window [0,10) must seal before its virtual delay elapses: $w0")
    val w20 = panes.filter(_.windowStart == ts(20)).sortBy(_.paneIndex)
    assert(w20.map(p => (p.value, p.timing, p.paneIndex)) == Seq(
      (12.0, "EARLY", 0L), (12.0, "ON_TIME", 1L)),
      s"window [20,30) must fire EARLY exactly at the 2-cell boundary: $w20")
  }

  test("AfterFirst finishes after its first firing") {
    // AfterFirst(count 5, per-batch) fires on the first batch with data,
    // then is finished: later batches produce no EARLY panes.
    val panes = run("afirst",
      TriggerSpec(early = AfterFirst(Seq(AfterCount(5), PerBatch))), Accumulating,
      Duration.ZERO, Seq(
        Seq(("a", ts(1), 1.0)),
        Seq(("a", ts(2), 2.0)),   // would fire PerBatch, but trigger finished
        Seq(("a", ts(15), 0.0))
      ))
    val w0 = panes.filter(_.windowStart == ts(0)).sortBy(_.paneIndex)
    assert(w0.map(p => (p.value, p.timing)) == Seq(
      (1.0, "EARLY"), (3.0, "ON_TIME")))
  }

  test("AfterAll waits for every sub-condition") {
    // AfterAll(count 2, delay 0): nothing on the 1-element batch, fires
    // once both hold; finishes after that single firing.
    val panes = run("aall",
      TriggerSpec(early = AfterAll(Seq(AfterCount(2), AfterProcessingTimeDelay(0)))),
      Accumulating, Duration.ZERO, Seq(
        Seq(("a", ts(1), 1.0)),
        Seq(("a", ts(2), 2.0)),   // 2 since pane → fire, then finished
        Seq(("a", ts(3), 4.0)),   // no further EARLY panes
        Seq(("a", ts(15), 0.0))
      ))
    val w0 = panes.filter(_.windowStart == ts(0)).sortBy(_.paneIndex)
    assert(w0.map(p => (p.value, p.timing)) == Seq(
      (3.0, "EARLY"), (7.0, "ON_TIME")))
  }

  test("Repeatedly(AfterCount) keeps firing; OrFinally stops it") {
    val repeated = run("rept",
      TriggerSpec(early = Repeatedly(AfterCount(1))), Accumulating,
      Duration.ZERO, Seq(
        Seq(("a", ts(1), 1.0)),
        Seq(("a", ts(2), 2.0)),
        Seq(("a", ts(3), 4.0)),
        Seq(("a", ts(15), 0.0))
      ))
    val rw0 = repeated.filter(_.windowStart == ts(0)).sortBy(_.paneIndex)
    assert(rw0.map(_.timing) == Seq("EARLY", "EARLY", "EARLY", "ON_TIME"))

    val stopped = run("orfin",
      TriggerSpec(early = OrFinally(Repeatedly(PerBatch), AfterCount(3))),
      Accumulating, Duration.ZERO, Seq(
        Seq(("a", ts(1), 1.0)),   // per-batch fire, until(count 3) not yet
        Seq(("a", ts(2), 2.0), ("a", ts(3), 4.0)),
        // ^ 2 since pane < 3 → per-batch fire; still not finished
        Seq(("a", ts(4), 8.0), ("a", ts(5), 16.0), ("a", ts(6), 32.0)),
        // ^ 3 since pane → until-condition holds at this firing → finished
        Seq(("a", ts(7), 64.0)),  // no more EARLY panes
        Seq(("a", ts(15), 0.0))
      ))
    val sw0 = stopped.filter(_.windowStart == ts(0)).sortBy(_.paneIndex)
    assert(sw0.map(p => (p.value, p.timing)) == Seq(
      (1.0, "EARLY"), (7.0, "EARLY"), (63.0, "EARLY"), (127.0, "ON_TIME")))
  }

  test("AfterEach.inOrder consumes sub-triggers one pane at a time") {
    val panes = run("aeach",
      TriggerSpec(early = AfterEach(Seq(AfterCount(2), PerBatch))), Accumulating,
      Duration.ZERO, Seq(
        Seq(("a", ts(1), 1.0)),   // sub0 = count(2): 1 element → no fire
        Seq(("a", ts(2), 2.0)),   // 2 since pane → fire pane 0, advance
        Seq(("a", ts(3), 4.0)),   // sub1 = per-batch → fire pane 1, finished
        Seq(("a", ts(4), 8.0)),   // exhausted → no fire
        Seq(("a", ts(15), 0.0))
      ))
    val w0 = panes.filter(_.windowStart == ts(0)).sortBy(_.paneIndex)
    assert(w0.map(p => (p.value, p.timing)) == Seq(
      (3.0, "EARLY"), (7.0, "EARLY"), (15.0, "ON_TIME")))
  }

  test("beamStyle wraps composites in Repeatedly: AfterFirst keeps firing") {
    // Same composite as the finish-once test above, but through the
    // Beam-exact constructor: AfterWatermarkEarlyAndLate wraps early
    // firings in Repeatedly.forever, so the composite repeats every batch.
    val panes = run("beamstyle",
      TriggerSpec.beamStyle(early = AfterFirst(Seq(AfterCount(5), PerBatch))),
      Accumulating, Duration.ZERO, Seq(
        Seq(("a", ts(1), 1.0)),
        Seq(("a", ts(2), 2.0)),   // fires again — not finished under Beam wrap
        Seq(("a", ts(15), 0.0))
      ))
    val w0 = panes.filter(_.windowStart == ts(0)).sortBy(_.paneIndex)
    assert(w0.map(p => (p.value, p.timing)) == Seq(
      (1.0, "EARLY"), (3.0, "EARLY"), (3.0, "ON_TIME")))
  }

  test("AfterEach as a LATE trigger starts at its first sub-trigger") {
    // Early + on-time panes advance the window's global pane index to 2;
    // the late AfterEach must still begin at sub0 (its own pane count),
    // not treat its subs as already consumed.
    val panes = run("aeachlate",
      TriggerSpec(early = PerBatch, late = AfterEach(Seq(AfterCount(2), PerBatch))),
      Accumulating, Duration.ofMinutes(10), Seq(
        Seq(("a", ts(1), 1.0)),    // EARLY pane 0
        Seq(("a", ts(12), 2.0)),   // true watermark 12 → ON_TIME for [0,10)
        Seq(("a", ts(5), 4.0)),    // late; sub0=count(2): 1 since pane → no fire
        Seq(("a", ts(6), 8.0)),    // 2 since pane → LATE (sub0), advance
        Seq(("a", ts(7), 16.0)),   // sub1=per-batch → LATE, trigger finished
        Seq(("a", ts(8), 32.0)),   // finished → dropped
        Seq(("a", ts(31), 0.0))    // GC
      ))
    val w0 = panes.filter(_.windowStart == ts(0)).sortBy(_.paneIndex)
    assert(w0.map(p => (p.value, p.timing)) == Seq(
      (1.0, "EARLY"), (1.0, "ON_TIME"), (13.0, "LATE"), (29.0, "LATE")))
  }

  test("Repeatedly(AfterEach) cycles its subs instead of stalling (Beam reset)") {
    val panes = run("aeachcycle",
      TriggerSpec(early = Repeatedly(AfterEach(Seq(AfterCount(2), PerBatch)))),
      Accumulating, Duration.ZERO, Seq(
        Seq(("a", ts(1), 1.0)),   // sub0 = count(2): 1 element → no fire
        Seq(("a", ts(2), 2.0)),   // 2 since pane → fire (sub0), advance
        Seq(("a", ts(3), 4.0)),   // sub1 = per-batch → fire, CYCLE to sub0
        Seq(("a", ts(4), 8.0)),   // sub0 again: 1 since pane → no fire
        Seq(("a", ts(5), 16.0)),  // 2 since pane → fire (sub0)
        Seq(("a", ts(15), 0.0))
      ))
    val w0 = panes.filter(_.windowStart == ts(0)).sortBy(_.paneIndex)
    assert(w0.map(p => (p.value, p.timing)) == Seq(
      (3.0, "EARLY"), (7.0, "EARLY"), (31.0, "EARLY"), (31.0, "ON_TIME")))
  }

  test("late data is DROPPED when no late firing is configured (finished trigger)") {
    val panes = run("latedrop",
      TriggerSpec(), Accumulating, Duration.ofMinutes(10), Seq(
        Seq(("a", ts(1), 1.0)),
        Seq(("a", ts(12), 2.0)),  // watermark 12 → ON_TIME for [0,10)
        Seq(("a", ts(5), 4.0)),   // post-on-time, no late firings → dropped
        Seq(("a", ts(31), 8.0))   // GC [0,10): must NOT re-emit a FINAL pane
      ))
    val w0 = panes.filter(_.windowStart == ts(0))
    assert(w0.map(p => (p.value, p.timing)) == Seq((1.0, "ON_TIME")))
  }

  test("sliding windows: multi-window assignment with independent triggers") {
    val input = MemoryStream[(String, Timestamp, Double)](992, spark, None)
    val panes = TriggerEngine.slidingWindowedAggregate(
      input.toDS(), Duration.ofMinutes(10), Duration.ofMinutes(5),
      Duration.ZERO, TriggerSpec(early = PerBatch), Accumulating, SumFn)
    val dir = java.nio.file.Files.createTempDirectory("graft-sl-").toString
    val q = panes.writeStream.format("memory").queryName("sl")
      .outputMode("append").option("checkpointLocation", dir).start()
    try {
      input.addData(Seq(("a", ts(7), 1.0))) // windows [0,10) and [5,15)
      q.processAllAvailable()
      input.addData(Seq(("a", ts(12), 2.0))) // windows [5,15) and [10,20)
      q.processAllAvailable()
      input.addData(Seq(("a", ts(30), 0.0))) // watermark closes all three
      q.processAllAvailable()
      input.addData(Seq(("a", ts(31), 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val all = spark.table("sl").as[Pane[String, Double]].collect()
    def onTime(startMin: Int) =
      all.filter(p => p.windowStart == ts(startMin) && p.timing == "ON_TIME").map(_.value).toSeq
    assert(onTime(0) == Seq(1.0))   // only the first element
    assert(onTime(5) == Seq(3.0))   // both elements
    assert(onTime(10) == Seq(2.0))  // only the second
    // early panes fired per batch for each touched window
    assert(all.count(p => p.windowStart == ts(5) && p.timing == "EARLY") == 2)
  }

  test("WindowInto builder composes the same engine run as explicit config") {
    val input = MemoryStream[(String, Timestamp, Double)](991, spark, None)
    val panes = TriggerEngine.WindowInto.fixedWindows(Duration.ofMinutes(10))
      .triggering(early = AfterCount(2))
      .accumulatingFiredPanes()
      .aggregate(input.toDS(), SumFn)
    val dir = java.nio.file.Files.createTempDirectory("graft-wi-").toString
    val q = panes.writeStream.format("memory").queryName("wi")
      .outputMode("append").option("checkpointLocation", dir).start()
    try {
      input.addData(Seq(("a", ts(1), 1.0), ("a", ts(2), 2.0)))
      q.processAllAvailable()
      input.addData(Seq(("a", ts(15), 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val w0 = spark.table("wi").as[Pane[String, Double]].collect()
      .filter(_.windowStart == ts(0)).sortBy(_.paneIndex)
    assert(w0.map(p => (p.value, p.timing)).toSeq == Seq((3.0, "EARLY"), (3.0, "ON_TIME")))
  }

  test("processingTimeAggregate emits wall-clock panes, firing without new data") {
    val input = MemoryStream[(String, Double)](993, spark, None)
    val panes = TriggerEngine.processingTimeAggregate(
      input.toDS(), Duration.ofMillis(0), Accumulating, SumFn)
    val dir = java.nio.file.Files.createTempDirectory("graft-pt-").toString
    val q = panes.writeStream.format("memory").queryName("pt")
      .outputMode("append").option("checkpointLocation", dir).start()
    def panesFor(k: String): Seq[Pane[String, Double]] =
      spark.table("pt").as[Pane[String, Double]].collect().filter(_.key == k).toSeq
    // the pane timer fires on a NO-DATA micro-batch after the data batch —
    // the quiet-key guarantee the event-time engine can't give. POLL, do
    // not processAllAvailable(): the processing-time engine runs continuous
    // timer-check batches, so the query never reaches the quiescent point
    // processAllAvailable waits for.
    def await(expect: => Boolean): Unit = {
      val deadline = System.currentTimeMillis() + 30000
      while (!expect && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(expect)
    }
    try {
      input.addData(Seq(("a", 1.0), ("a", 2.0)))
      await(panesFor("a").nonEmpty)
      assert(panesFor("a").head.value == 3.0)
      assert(panesFor("a").head.timing == "EARLY")
      assert(panesFor("a").head.isFirst && !panesFor("a").head.isLast)
      // second pane accumulates (Accumulating mode) and bumps the index
      input.addData(Seq(("a", 4.0)))
      await(panesFor("a").size >= 2)
      val second = panesFor("a").sortBy(_.paneIndex).apply(1)
      assert(second.value == 7.0 && second.paneIndex == 1L)
      // an independent key fires its own pane without further input
      input.addData(Seq(("b", 8.0)))
      await(panesFor("b").nonEmpty)
      assert(panesFor("b").head.value == 8.0)
    } finally q.stop()
  }

  test("wall-clock nudge: a QUIET key's window pane fires without any watermark advance") {
    val input = MemoryStream[(String, Timestamp, Double)](996, spark, None)
    val panes = TriggerEngine.windowedAggregateWithWallClockNudge(
      input.toDS(), Duration.ofMinutes(10), Duration.ofMinutes(0),
      TriggerSpec.default, Accumulating, SumFn, Duration.ofMillis(0))
    val dir = java.nio.file.Files.createTempDirectory("graft-nudge-").toString
    val q = panes.writeStream.format("memory").queryName("nudge")
      .outputMode("append").option("checkpointLocation", dir).start()
    def panesFor(k: String): Seq[Pane[String, Double]] =
      spark.table("nudge").as[Pane[String, Double]].collect().filter(_.key == k).toSeq
    def await(expect: => Boolean): Unit = {
      val deadline = System.currentTimeMillis() + 30000
      while (!expect && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(expect)
    }
    try {
      // data for k, then SILENCE: no watermark advance, no further input.
      // The event-time engine alone would emit nothing here (default
      // trigger, window still open) — the nudge leg must fire anyway.
      input.addData(Seq(("k", ts(1), 1.0), ("k", ts(2), 2.0)))
      await(panesFor("k").exists(_.timing == "EARLY_WALL"))
      val wall = panesFor("k").filter(_.timing == "EARLY_WALL").head
      assert(wall.value == 3.0)
      assert(wall.windowStart.getTime == 0L &&
        wall.windowEnd.getTime == 10 * 60000L)
      assert(panesFor("k").forall(_.timing == "EARLY_WALL"),
        "no event-time pane may exist before the watermark moves")
      // the event-time leg stays authoritative: advancing the watermark
      // past the window end still yields the ON_TIME pane
      input.addData(Seq(("adv", ts(30), 9.0)))
      await(panesFor("k").exists(_.timing == "ON_TIME"))
      assert(panesFor("k").find(_.timing == "ON_TIME").get.value == 3.0)
    } finally q.stop()
  }

  test("processingTimeAggregate in Discarding mode emits per-pane contents only") {
    val input = MemoryStream[(String, Double)](994, spark, None)
    val panes = TriggerEngine.processingTimeAggregate(
      input.toDS(), Duration.ofMillis(0), Discarding, SumFn)
    val dir = java.nio.file.Files.createTempDirectory("graft-ptd-").toString
    val q = panes.writeStream.format("memory").queryName("ptd")
      .outputMode("append").option("checkpointLocation", dir).start()
    def got: Seq[Pane[String, Double]] =
      spark.table("ptd").as[Pane[String, Double]].collect().toSeq
    def await(expect: => Boolean): Unit = {
      val deadline = System.currentTimeMillis() + 30000
      while (!expect && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(expect)
    }
    try {
      input.addData(Seq(("a", 1.0), ("a", 2.0)))
      await(got.nonEmpty)
      input.addData(Seq(("a", 4.0)))
      await(got.size >= 2)
      val sorted = got.sortBy(_.paneIndex)
      // discarding: second pane carries only the since-last-pane sum
      assert(sorted.map(_.value) == Seq(3.0, 4.0))
    } finally q.stop()
  }

  test("engine state survives a query restart from the checkpoint") {
    val input = MemoryStream[(String, Timestamp, Double)](995, spark, None)
    val dir = java.nio.file.Files.createTempDirectory("graft-rst-").toString
    val out = java.nio.file.Files.createTempDirectory("graft-rst-out-").toString
    def start() = {
      val panes = TriggerEngine.windowedAggregate(
        input.toDS(), Duration.ofMinutes(10), Duration.ZERO,
        TriggerSpec(early = AfterCount(2)), Accumulating, SumFn)
      // file sink: the memory sink cannot recover from a checkpoint
      panes.writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", dir).start()
    }
    val q1 = start()
    try {
      input.addData(Seq(("a", ts(1), 1.0), ("a", ts(2), 2.0))) // EARLY 3.0
      q1.processAllAvailable()
    } finally q1.stop()
    // restart: the window's accumulator and pane index must come back from
    // the state store, not reset
    val q2 = start()
    try {
      input.addData(Seq(("a", ts(3), 4.0), ("a", ts(4), 8.0))) // EARLY 15.0
      q2.processAllAvailable()
      input.addData(Seq(("a", ts(15), 0.0)))                   // ON_TIME 15.0
      q2.processAllAvailable()
    } finally q2.stop()
    val w0 = spark.read.parquet(out).as[Pane[String, Double]].collect()
      .filter(_.windowStart == ts(0)).sortBy(_.paneIndex).toSeq
    assert(w0.map(p => (p.value, p.timing, p.paneIndex)) == Seq(
      (3.0, "EARLY", 0L), (15.0, "EARLY", 1L), (15.0, "ON_TIME", 2L)))
  }

  test("multiple keys and windows stay independent") {
    val panes = run("multi", TriggerSpec.default, Accumulating, Duration.ZERO, Seq(
      Seq(("a", ts(1), 1.0), ("b", ts(1), 2.0), ("a", ts(11), 4.0)),
      Seq(("a", ts(25), 0.0), ("b", ts(25), 0.0))
    ))
    val byKeyWindow = panes.groupBy(p => (p.key, p.windowStart))
    assert(byKeyWindow(("a", ts(0))).head.value == 1.0)
    assert(byKeyWindow(("b", ts(0))).head.value == 2.0)
    assert(byKeyWindow(("a", ts(10))).head.value == 4.0)
  }
}
