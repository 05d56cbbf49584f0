package graft.streaming

import graft.operators.Combine.CombineFn
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz of the session MERGE ALGEBRA (SessionEngine.absorbInterval)
  * against a scalar interval model — no streams, pure unit level, the
  * complement of SessionEngineSpec's end-to-end micro-batch tests.
  *
  * Model: classic interval merging. Each event i contributes the interval
  * [ts_i, ts_i + gap_i); the final session set is the unique partition of
  * events into groups whose intervals form strictly-overlapping chains
  * (touching intervals do NOT merge — half-open semantics), each session
  * spanning [min start, max end) and accumulating the sum of its events.
  *
  * Properties:
  *  1. folding absorbInterval over events in ANY order yields exactly the
  *     model's (start, end, sum) set — merge must be order-insensitive,
  *     the property Beam's mergeWindows contract demands;
  *  2. event count conservation: Σ sinceLastPane over sessions = #events.
  */
class SessionMergeFuzzSpec extends AnyFunSuite {

  private object SumFn extends CombineFn[Double, Double, Double] {
    def createAccumulator(): Double = 0.0
    def addInput(a: Double, v: Double): Double = a + v
    def mergeAccumulators(a: Double, b: Double): Double = a + b
    def extractOutput(a: Double): Double = a
  }

  private def fold(events: Seq[(Long, Long, Double)]): List[SessionEngine.SessionState[Double]] =
    events.foldLeft(List.empty[SessionEngine.SessionState[Double]]) {
      case (open, (ts, gap, v)) =>
        SessionEngine.absorbInterval(open, ts, ts + gap, v, SumFn)
    }

  /** Scalar reference: union-find over strictly-overlapping intervals. */
  private def model(events: Seq[(Long, Long, Double)]): Set[(Long, Long, Double)] = {
    val n = events.length
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for (i <- 0 until n; j <- (i + 1) until n) {
      val (si, gi, _) = events(i); val (sj, gj, _) = events(j)
      if (si < sj + gj && sj < si + gi) parent(find(i)) = find(j)
    }
    // NOTE: strict pairwise overlap is not transitive through the GROUP
    // span — but session merging IS transitive through chains: a∼b, b∼c
    // puts a,c in one session even if a,c don't overlap. Union-find over
    // the pairwise relation captures exactly the chain closure.
    events.indices.groupBy(find).values.map { idxs =>
      val starts = idxs.map(events(_)._1)
      val ends = idxs.map(i => events(i)._1 + events(i)._2)
      (starts.min, ends.max, idxs.map(events(_)._3).sum)
    }.toSet
  }

  test("absorbInterval ≡ interval-merge model on random event sets, any order") {
    val eventGen = for {
      ts <- Gen.chooseNum(0L, 60L)
      gap <- Gen.chooseNum(1L, 12L)
      v <- Gen.chooseNum(1, 9).map(_.toDouble)
    } yield (ts, gap, v)
    val seqGen = Gen.chooseNum(0, 25).flatMap(n => Gen.listOfN(n, eventGen))
    var tried = 0
    (0 until 400).foreach { seed =>
      seqGen.apply(Gen.Parameters.default, Seed(seed.toLong)).foreach { events =>
        tried += 1
        val expected = model(events)
        // original order, reversed, and a deterministic shuffle
        val orders = Seq(
          events,
          events.reverse,
          events.zipWithIndex.sortBy { case (_, i) => (i * 7919) % 104729 }.map(_._1))
        orders.foreach { ord =>
          val got = fold(ord)
          assert(got.map(s => (s.start, s.end, s.acc)).toSet == expected,
            s"merge diverged (order ${orders.indexOf(ord)}) on events=$events")
          assert(got.map(_.sinceLastPane).sum == events.length.toLong,
            s"event count not conserved on events=$events")
          // open sessions must be pairwise non-overlapping
          val sorted = got.sortBy(_.start)
          sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
            assert(a.end <= b.start, s"overlapping sessions survived: $got")
          }
        }
      }
    }
    assert(tried >= 300, "generator drought")
  }

  /** The model NOTE above, pinned: chains merge transitively. */
  test("a bridging interval merges two sessions it only partially overlaps") {
    val out = fold(Seq((0L, 5L, 1.0), (10L, 5L, 2.0), (4L, 7L, 4.0)))
    assert(out.map(s => (s.start, s.end, s.acc)) == List((0L, 15L, 7.0)))
    assert(out.head.sinceLastPane == 3L)
  }
}
