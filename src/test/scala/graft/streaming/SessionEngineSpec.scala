package graft.streaming

import java.sql.Timestamp
import java.time.Duration

import graft.SparkSpec
import graft.operators.Combine.CombineFn
import graft.streaming.TriggerEngine.{Accumulating, AccumulationMode, Discarding, Pane}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Merging-WindowFn engine tests: sessions extend, bridge-merge, fire
  * early panes, and close on the watermark — behaviors the session_window
  * DSL (default trigger only) cannot express. */
class SessionEngineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp = new Timestamp(minute * 60000L)

  object SumFn extends CombineFn[Double, Double, Double] {
    def createAccumulator(): Double = 0.0
    def addInput(acc: Double, in: Double): Double = acc + in
    def mergeAccumulators(a: Double, b: Double): Double = a + b
    def extractOutput(acc: Double): Double = acc
  }

  private def run(name: String,
                  gapMin: Int,
                  latenessMin: Int,
                  earlyPerBatch: Boolean,
                  mode: AccumulationMode,
                  batches: Seq[Seq[(String, Timestamp, Double)]],
                  latePerBatch: Boolean = false): Seq[Pane[String, Double]] = {
    val input = MemoryStream[(String, Timestamp, Double)](name.hashCode.abs, spark, None)
    val panes = SessionEngine.sessionAggregateWith(
      input.toDS(),
      SessionEngine.FixedGapSessions[String, Double](gapMin * 60000L),
      Duration.ofMinutes(latenessMin),
      earlyPerBatch, mode, SumFn, latePerBatch = latePerBatch)
    val dir = java.nio.file.Files.createTempDirectory(s"graft-se-$name").toString
    val q = panes.writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", dir).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).as[Pane[String, Double]].collect().toSeq
  }

  test("sessions close on the watermark with merged bounds") {
    val panes = run("seclose", gapMin = 10, latenessMin = 0, earlyPerBatch = false,
      Accumulating, Seq(
        Seq(("a", ts(1), 1.0), ("a", ts(5), 2.0)),  // one session [1, 15)
        Seq(("a", ts(40), 4.0)),                    // separate session [40, 50)
        Seq(("a", ts(60), 0.0)),                    // watermark 60 closes both
        Seq(("a", ts(61), 0.0))                     // extra batch for timers
      ))
    val closed = panes.filter(_.timing == "ON_TIME").sortBy(_.windowStart.getTime)
    assert(closed.take(2).map(p => (p.windowStart, p.windowEnd, p.value)) == Seq(
      (ts(1), ts(15), 3.0), (ts(40), ts(50), 4.0)))
  }

  test("a bridging event MERGES two open sessions, combining accumulators") {
    val panes = run("semerge", gapMin = 10, latenessMin = 20, earlyPerBatch = false,
      Accumulating, Seq(
        Seq(("a", ts(5), 1.0)),   // session A [5, 15)
        Seq(("a", ts(20), 2.0)),  // session B [20, 30)
        Seq(("a", ts(13), 4.0)),  // [13, 23) overlaps both → [5, 30), acc 7.0
        Seq(("a", ts(60), 0.0)),  // watermark 40 closes the merged session
        Seq(("a", ts(80), 0.0))
      ))
    val closed = panes.filter(p => p.timing == "ON_TIME" && p.windowStart == ts(5))
    assert(closed.map(p => (p.windowEnd, p.value)) == Seq((ts(30), 7.0)))
  }

  test("events exactly `gap` apart do NOT merge (half-open boundary)") {
    // (events start at minute 30: a ts-0 event is eaten by Spark's initial
    // watermark filter — epoch artifact, unrelated to session semantics)
    val panes = run("sebound", gapMin = 10, latenessMin = 0, earlyPerBatch = false,
      Accumulating, Seq(
        Seq(("a", ts(30), 1.0), ("a", ts(40), 2.0)), // touch at 40 → 2 sessions
        Seq(("a", ts(90), 0.0)),
        Seq(("a", ts(91), 0.0))
      ))
    val closed = panes.filter(_.timing == "ON_TIME").sortBy(_.windowStart.getTime)
    assert(closed.take(2).map(p => (p.windowStart, p.windowEnd, p.value)) == Seq(
      (ts(30), ts(40), 1.0), (ts(40), ts(50), 2.0)))
  }

  test("early firings for open sessions — what session_window DSL cannot do") {
    val panes = run("seearly", gapMin = 10, latenessMin = 0, earlyPerBatch = true,
      Accumulating, Seq(
        Seq(("a", ts(1), 1.0)),   // EARLY pane for open session (1.0)
        Seq(("a", ts(5), 2.0)),   // extends; EARLY again (3.0, accumulating)
        Seq(("a", ts(40), 4.0)),  // watermark 40 closes [1, 15) → ON_TIME
        Seq(("a", ts(60), 0.0))
      ))
    val s1 = panes.filter(_.windowStart == ts(1)).sortBy(_.paneIndex)
    assert(s1.map(p => (p.value, p.timing)) == Seq(
      (1.0, "EARLY"), (3.0, "EARLY"), (3.0, "ON_TIME")))
    assert(s1.last.windowEnd == ts(15)) // end extended by the second event
  }

  test("custom merging WindowFn: per-key data-driven session gaps") {
    // key "short" sessions gap 5 min, key "long" gap 30 min — the same
    // event spacing (20 min) splits one key's sessions and merges the
    // other's. This is the user-defined merging-window extension point:
    // only assign() is custom, the merge machinery is the engine's.
    val assigner = new SessionEngine.MergingWindowAssigner[String, Double] {
      def assign(key: String, tsMs: Long, value: Double): (Long, Long) =
        (tsMs, tsMs + (if (key == "long") 30 else 5) * 60000L)
    }
    val input = MemoryStream[(String, Timestamp, Double)](
      "sedyn".hashCode.abs, spark, None)
    val panes = SessionEngine.sessionAggregateWith(
      input.toDS(), assigner, Duration.ofMinutes(0),
      earlyPerBatch = false, Accumulating, SumFn)
    val dir = java.nio.file.Files.createTempDirectory("graft-se-dyn").toString
    val q = panes.writeStream.format("memory").queryName("sedyn")
      .outputMode("append").option("checkpointLocation", dir).start()
    try {
      Seq(
        Seq(("short", ts(30), 1.0), ("long", ts(30), 10.0)),
        Seq(("short", ts(50), 2.0), ("long", ts(50), 20.0)),
        Seq(("short", ts(200), 0.0), ("long", ts(200), 0.0)),
        Seq(("short", ts(300), 0.0), ("long", ts(300), 0.0))
      ).foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val out = spark.table("sedyn").as[Pane[String, Double]].collect().toSeq
      .filter(_.timing == "ON_TIME")
    val short = out.filter(p => p.key == "short" && p.windowStart.getTime < ts(200).getTime)
      .sortBy(_.windowStart.getTime)
    val long = out.filter(p => p.key == "long" && p.windowStart.getTime < ts(200).getTime)
    // 5-min gap: events at 30 and 50 are separate sessions
    assert(short.map(p => (p.windowStart, p.windowEnd, p.value)) == Seq(
      (ts(30), ts(35), 1.0), (ts(50), ts(55), 2.0)))
    // 30-min gap: the same spacing merges into one [30, 80) session
    assert(long.map(p => (p.windowStart, p.windowEnd, p.value)) == Seq(
      (ts(30), ts(80), 30.0)))
  }

  test("late arrivals merge into the FIRED session and fire LATE panes") {
    // lateness 1000 min spans the whole timeline, so Spark's upstream
    // filter passes the late row and the fired session is retained. The
    // late row [610, 620) overlaps the sealed [600, 615): it must merge
    // back in — EXTENDING the end and the accumulator — and fire a LATE
    // pane, not resurrect a fresh partial session (the pre-r13 behavior).
    val panes = run("selate", gapMin = 10, latenessMin = 1000,
      earlyPerBatch = false, Accumulating, Seq(
        Seq(("a", ts(600), 1.0), ("a", ts(605), 2.0)), // session [600, 615)
        Seq(("a", ts(1200), 4.0)),  // trueWm 605 — not sealed yet
        Seq(("a", ts(1300), 8.0)),  // trueWm 1200 ≥ 615 → ON_TIME fires
        Seq(("a", ts(610), 16.0)),  // LATE row into the fired session
        Seq(("a", ts(3000), 0.5)),  // seals [1200, 1210)
        Seq(("a", ts(3100), 0.25))  // seals [1300, 1310); GCs [600, 620)
      ), latePerBatch = true)
    val s600 = panes.filter(_.windowStart == ts(600)).sortBy(_.paneIndex)
    assert(s600.map(p => (p.timing, p.windowEnd, p.value, p.paneIndex, p.isLast)) ==
      Seq(("ON_TIME", ts(615), 3.0, 0L, false),
        ("LATE", ts(620), 19.0, 1L, false)),
      s"late merge must extend the fired session and fire LATE: $s600")
    // the fired-then-extended session emits no duplicate ON_TIME and no
    // resurrected partial pane; the untouched sessions seal normally
    assert(panes.count(p => p.windowStart == ts(600) && p.timing == "ON_TIME") == 1)
    assert(panes.exists(p => p.windowStart == ts(1200) && p.timing == "ON_TIME"
      && p.value == 4.0))
  }

  test("discarding mode emits per-pane increments across merges") {
    val panes = run("sedisc", gapMin = 10, latenessMin = 0, earlyPerBatch = true,
      Discarding, Seq(
        Seq(("a", ts(1), 1.0)),
        Seq(("a", ts(5), 2.0)),
        Seq(("a", ts(40), 4.0)),
        Seq(("a", ts(60), 0.0))
      ))
    val s1 = panes.filter(_.windowStart == ts(1)).sortBy(_.paneIndex)
    assert(s1.map(p => (p.value, p.timing)) == Seq(
      (1.0, "EARLY"), (2.0, "EARLY"), (0.0, "ON_TIME")))
  }
}
