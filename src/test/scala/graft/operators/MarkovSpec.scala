package graft.operators

import graft.SparkSpec

/** transitions: hand-computable chains, per-key isolation, (order, id)
  * tie-breaking, last-event exclusion, and row-stochastic rows. */
class MarkovSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long, String)]) =
    Markov.transitions(rows.toDF("k", "t", "id", "s"),
        keyCol = "k", orderCol = "t", idCol = "id", stateCol = "s")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

  test("counts and probabilities on a hand-traced chain") {
    // key 1: a b a b a  → a→b ×2, b→a ×2
    // key 2: a a c      → a→a, a→c
    val rows = Seq[(Long, Long, Long, String)](
      (1, 10, 1, "a"), (1, 20, 2, "b"), (1, 30, 3, "a"),
      (1, 40, 4, "b"), (1, 50, 5, "a"),
      (2, 10, 6, "a"), (2, 20, 7, "a"), (2, 30, 8, "c"))
    val out = run(rows)
    assert(out === Map(
      ("a", "b") -> ((2L, 0.5)), ("a", "a") -> ((1L, 0.25)),
      ("a", "c") -> ((1L, 0.25)), ("b", "a") -> ((2L, 1.0))))
  }

  test("a key's last event contributes no transition") {
    val out = run(Seq((1L, 1L, 1L, "x")))
    assert(out.isEmpty)
  }

  test("chains never cross keys") {
    val out = run(Seq((1L, 1L, 1L, "a"), (2L, 2L, 2L, "b")))
    assert(out.isEmpty)
  }

  test("simultaneous events order by id (deterministic chain)") {
    // same timestamp: id order 1,2,3 → a→b, b→c (never a→c)
    val out = run(Seq((1L, 5L, 1L, "a"), (1L, 5L, 2L, "b"), (1L, 5L, 3L, "c")))
    assert(out === Map(("a", "b") -> ((1L, 1.0)), ("b", "c") -> ((1L, 1.0))))
  }

  test("probabilities are row-stochastic per from_state") {
    val rows = (1L to 120L).map { i =>
      (i % 7, i, i, "s" + (i * 48271 % 5))
    }
    val byFrom = run(rows).groupBy(_._1._1).view
      .mapValues(_.values.map(_._2).sum)
    byFrom.foreach { case (from, total) =>
      assert(math.abs(total - 1.0) < 1e-12, s"$from sums to $total")
    }
  }
}
