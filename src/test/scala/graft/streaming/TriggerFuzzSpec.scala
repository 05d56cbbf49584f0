package graft.streaming

import java.sql.Timestamp
import java.time.Duration

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.operators.Combine.CombineFn
import TriggerEngine._

/** Property fuzz of the trigger algebra (SURVEY §7 hard-part 1's named
  * mitigation): the engine evaluates composite triggers STATELESSLY from a
  * monotone per-pane context (FiringCtx), where Beam's design is a tree of
  * STATEFUL per-sub trigger machines. This spec implements the stateful
  * formulation independently as the reference model and checks the two
  * agree on the full pane sequence over randomly generated composite
  * triggers (depth ≤ 3) and randomly generated element/watermark
  * schedules — the composite corner cases (OrFinally inside Repeatedly,
  * AfterEach exhaustion/cycling, AfterAll latching) are exactly where a
  * fuzzer earns its keep over directed tests.
  *
  * Seeds are PINNED (org.scalacheck.rng.Seed(caseIndex)) so every run
  * fuzzes the identical case set — failures reproduce.
  *
  * Wall-clock triggers (AfterProcessingTimeDelay) are excluded: their
  * firing depends on real time and cannot be modeled deterministically;
  * they keep their directed coverage in TriggerEngineSpec.
  */
class TriggerFuzzSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ the model
  //
  // Beam-style stateful trigger machines: each node tracks its own
  // progress; a pane fire resets every node's within-pane progress, and
  // the fired node's finishing rule decides trigger completion.

  private trait Machine {
    def onElements(n: Int): Unit
    def shouldFire: Boolean
    /** Called when THE PANE fires (whole-trigger fire): reset within-pane
      * progress everywhere; return true if this node is now finished. */
    def onPaneFire(): Boolean
  }

  private def machineOf(f: Firing): Machine = f match {
    case NoFiring => new Machine {
      def onElements(n: Int): Unit = ()
      def shouldFire = false
      def onPaneFire() = false
    }
    case AfterCount(k) => new Machine {
      private var c = 0L
      def onElements(n: Int): Unit = c += n
      def shouldFire = c >= k
      def onPaneFire() = { c = 0; true } // atomic: finishes on fire
    }
    case PerBatch => new Machine {
      private var c = 0L
      def onElements(n: Int): Unit = c += n
      def shouldFire = c > 0
      def onPaneFire() = { c = 0; true }
    }
    case AfterProcessingTimeDelay(_) =>
      sys.error("wall-clock triggers are excluded from the fuzz generator")
    case AfterFirst(subs) => new Machine {
      private val ms = subs.map(machineOf)
      def onElements(n: Int): Unit = ms.foreach(_.onElements(n))
      def shouldFire = ms.exists(_.shouldFire)
      def onPaneFire() = { ms.foreach(_.onPaneFire()); true }
    }
    case AfterAll(subs) => new Machine {
      private val ms = subs.map(machineOf)
      def onElements(n: Int): Unit = ms.foreach(_.onElements(n))
      def shouldFire = ms.nonEmpty && ms.forall(_.shouldFire)
      def onPaneFire() = { ms.foreach(_.onPaneFire()); true }
    }
    case Repeatedly(sub) => new Machine {
      private var m = machineOf(sub)
      def onElements(n: Int): Unit = m.onElements(n)
      def shouldFire = m.shouldFire
      def onPaneFire() = {
        if (m.onPaneFire()) m = machineOf(sub) // finished sub → fresh start
        false // Repeatedly never finishes
      }
    }
    case OrFinally(main, until) => new Machine {
      // engine-documented semantics (trait doc): behave as `main` (which
      // RESETS per pane, never finishing on its own inside the composite)
      // until `until`'s condition holds at fire time — that pane is last.
      private val m = machineOf(main)
      private val u = machineOf(until)
      def onElements(n: Int): Unit = { m.onElements(n); u.onElements(n) }
      def shouldFire = m.shouldFire || u.shouldFire
      def onPaneFire() = {
        val done = u.shouldFire
        m.onPaneFire(); u.onPaneFire()
        done
      }
    }
    case AfterEach(subs) => new Machine {
      private val ms = subs.map(machineOf)
      private var idx = 0
      def onElements(n: Int): Unit = ms.foreach(_.onElements(n))
      def shouldFire = idx < ms.length && ms(idx).shouldFire
      def onPaneFire() = {
        ms.foreach(_.onPaneFire())
        idx += 1
        idx >= ms.length
      }
    }
  }

  /** Top-level wrap: bare atomics repeat, mirroring the engine's
    * documented `effective` contract. */
  private def topMachine(f: Firing): Machine = f match {
    case AfterCount(_) | PerBatch => machineOf(Repeatedly(f))
    case other => machineOf(other)
  }

  // ------------------------------------------------------ trigger generator

  private val atomGen: Gen[Firing] =
    Gen.frequency(
      5 -> Gen.choose(1, 3).map(AfterCount(_)),
      3 -> Gen.const(PerBatch),
      1 -> Gen.const(NoFiring))

  // AfterEach is position-dependent and supported only at the TOP level
  // with atomic subs — the engine's validateFiring rejects anything else
  // (the first fuzz run caught the nested form silently stalling), so the
  // generator mirrors the enforced contract: inner nodes never produce
  // AfterEach; the top generator may.
  private def innerGen(depth: Int): Gen[Firing] =
    if (depth <= 0) atomGen
    else Gen.frequency(
      3 -> atomGen,
      2 -> Gen.listOfN(2, innerGen(depth - 1)).map(AfterFirst(_)),
      2 -> Gen.listOfN(2, innerGen(depth - 1)).map(AfterAll(_)),
      2 -> innerGen(depth - 1).map(Repeatedly(_)),
      2 -> Gen.zip(innerGen(depth - 1), innerGen(depth - 1))
        .map { case (m, u) => OrFinally(m, u) })

  private val afterEachGen: Gen[Firing] =
    Gen.choose(2, 3).flatMap(n => Gen.listOfN(n, atomGen).map(AfterEach(_)))

  private def firingGen(depth: Int): Gen[Firing] =
    Gen.frequency(
      6 -> innerGen(depth),
      2 -> afterEachGen,
      1 -> afterEachGen.map(Repeatedly(_)))

  private def gen[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // ------------------------------------------- pure algebra vs model fuzz

  test("stateless FiringCtx evaluation ≡ stateful Beam-style machines (500 pinned cases)") {
    (0 until 500).foreach { i =>
      val f = gen(firingGen(3), 1000L + i)
      val deltas = gen(Gen.listOfN(12, Gen.choose(0, 3)), 5000L + i)
      // implementation side: the engine's pane loop distilled — stateless
      // readiness over the monotone context, exactly as handleInputRows
      val eff = effective(f)
      var since = 0L; var panes = 0L; var finished = false
      val implFires = scala.collection.mutable.ArrayBuffer.empty[Int]
      deltas.zipWithIndex.foreach { case (d, step) =>
        since += d
        val ctx = FiringCtx(since, 0L, 0L, panes)
        if (!finished && ready(eff, ctx)) {
          implFires += step
          finished = finishesOnFire(eff, ctx)
          since = 0L; panes += 1
        }
      }
      // model side: stateful machines
      val m = topMachine(f)
      var mFinished = false
      val modelFires = scala.collection.mutable.ArrayBuffer.empty[Int]
      deltas.zipWithIndex.foreach { case (d, step) =>
        m.onElements(d)
        if (!mFinished && m.shouldFire) {
          modelFires += step
          mFinished = m.onPaneFire()
        }
      }
      assert(implFires == modelFires,
        s"case $i: trigger $f deltas $deltas — engine fires at $implFires, model at $modelFires")
    }
  }

  // ------------------------------------------- end-to-end engine vs model

  object CountFn extends CombineFn[Double, Double, Double] {
    def createAccumulator(): Double = 0.0
    def addInput(acc: Double, in: Double): Double = acc + in
    def mergeAccumulators(a: Double, b: Double): Double = a + b
    def extractOutput(acc: Double): Double = acc
  }

  private def ts(minute: Int): Timestamp = new Timestamp(minute * 60000L)

  /** Scalar simulation of one 10-minute window (start 0, lateness 5) for
    * key "k" over a phase-separated schedule: early batches, a watermark
    * advancer past the window end, late batches, an advancer past the
    * lateness bound. Mirrors the engine's documented batch semantics:
    * data evaluates against the PREVIOUS batches' watermark; timers fire
    * once the watermark (including this batch) crosses them. */
  private def simulate(early: Firing, late: Firing,
                       mode: AccumulationMode,
                       earlyBatches: Seq[Int], lateBatches: Seq[Int])
      : Seq[(String, Long, Double, Boolean, Boolean)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Double, Boolean, Boolean)]
    var acc = 0.0; var paneAcc = 0.0; var paneIdx = 0L
    def value: Double = if (mode == Accumulating) acc else paneAcc
    def firePane(timing: String, isLast: Boolean): Unit = {
      out += ((timing, paneIdx, value, paneIdx == 0L, isLast))
      paneAcc = 0.0; paneIdx += 1
    }
    // early phase: watermark still 0 (events ≤ minute 9 < lateness floor)
    val em = topMachine(early)
    var eFinished = false
    var sinceLast = 0
    earlyBatches.foreach { n =>
      (0 until n).foreach { _ => acc += 1; paneAcc += 1 }
      em.onElements(n); sinceLast += n
      if (!eFinished && em.shouldFire) {
        firePane("EARLY", isLast = false)
        eFinished = em.onPaneFire()
        sinceLast = 0
      }
    }
    // advancer to minute 12: trueWm = 12 ≥ wEnd 10 → ON_TIME pane (fires
    // even if empty since last pane), not last (lateness > 0)
    firePane("ON_TIME", isLast = false)
    sinceLast = 0
    // late phase
    val lm = topMachine(late)
    var lFinished = false
    lateBatches.foreach { n =>
      if (late != NoFiring && !lFinished) {
        // with a live late trigger the data buffers into the pane
        (0 until n).foreach { _ => acc += 1; paneAcc += 1 }
        lm.onElements(n); sinceLast += n
        if (n > 0 && lm.shouldFire) {
          firePane("LATE", isLast = false)
          lFinished = lm.onPaneFire()
          sinceLast = 0
        }
      }
      // late == NoFiring or finished late trigger: engine DROPS the data
    }
    // advancer to minute 20: trueWm ≥ wEnd + lateness → GC; residual FINAL
    // only when undelivered contents remain under a live late trigger
    if (sinceLast > 0 && late != NoFiring && !lFinished)
      firePane("FINAL", isLast = true)
    out.toSeq
  }

  private def runEngine(name: String, early: Firing, late: Firing,
                        mode: AccumulationMode,
                        earlyBatches: Seq[Int], lateBatches: Seq[Int])
      : Seq[(String, Long, Double, Boolean, Boolean)] = {
    val input = MemoryStream[(String, Timestamp, Double)](name.hashCode.abs, spark, None)
    val panes = TriggerEngine.windowedAggregate(
      input.toDS(), Duration.ofMinutes(10), Duration.ofMinutes(5),
      TriggerSpec(early = early, late = late), mode, CountFn)
    val dir = java.nio.file.Files.createTempDirectory(s"graft-tf-$name").toString
    val q = panes.writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", dir).start()
    try {
      // early batches: events inside the window (minutes 1..9)
      earlyBatches.zipWithIndex.foreach { case (n, b) =>
        input.addData((0 until n).map(j => ("k", ts(1 + (b + j) % 9), 1.0)))
        q.processAllAvailable()
      }
      // close the window (different key; its own panes are filtered out)
      input.addData(Seq(("adv", ts(12), 1.0))); q.processAllAvailable()
      lateBatches.zipWithIndex.foreach { case (n, _) =>
        // minutes 8..9: above the row-age acceptance floor (sparkWm = 7
        // after the minute-12 advancer; Spark's operator filter drops
        // rows older than that BEFORE the engine — see windowedAggregate's
        // documented divergence) yet still inside window [0, 10)
        input.addData((0 until n).map(j => ("k", ts(8 + j % 2), 1.0)))
        q.processAllAvailable()
      }
      input.addData(Seq(("adv", ts(20), 1.0))); q.processAllAvailable()
    } finally q.stop()
    spark.table(name).as[Pane[String, Double]].collect().toSeq
      .filter(p => p.key == "k" && p.windowStart.getTime == 0L)
      .sortBy(_.paneIndex)
      .map(p => (p.timing, p.paneIndex, p.value, p.isFirst, p.isLast))
  }

  test("engine pane sequence ≡ scalar model over random triggers and schedules (pinned)") {
    (0 until 10).foreach { i =>
      val early = gen(firingGen(2), 42L + i)
      val late = gen(firingGen(1), 4242L + i)
      val mode = if (i % 2 == 0) Accumulating else Discarding
      val earlyBatches = gen(Gen.listOfN(3, Gen.choose(0, 3)), 777L + i)
      val lateBatches = gen(Gen.listOfN(2, Gen.choose(0, 2)), 888L + i)
      val expected = simulate(early, late, mode, earlyBatches, lateBatches)
      val actual = runEngine(s"tf$i", early, late, mode, earlyBatches, lateBatches)
      assert(actual == expected,
        s"case $i: early=$early late=$late mode=$mode " +
          s"earlyBatches=$earlyBatches lateBatches=$lateBatches\n" +
          s"engine: $actual\nmodel : $expected")
    }
  }
}
