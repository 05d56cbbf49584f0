package graft

/** Pocket version of the `graft.Stress` bound-check half, inside the
  * suite: the 10× sf0.1 stress run validates the self-assert booleans by
  * hand once per round, but between those runs nothing would notice a
  * change that breaks an error bound ONLY under duplicate-dense
  * candidate structures. A factor-2 blow-up of sf0.001 (1,000 docs,
  * seconds not minutes) keeps that property observed on every `sbt
  * test`: every boolean output column of every stressed query must stay
  * all-TRUE on the densified corpus. */
class StressSpec extends SparkSpec {

  test("self-assert bound booleans hold on a factor-2 duplicate-dense corpus") {
    val work = java.nio.file.Files.createTempDirectory("graft-stress-smoke-").toString
    Stress.blowUp(spark, "/root/testdata/sf0.001", work, factor = 2)
    val violations = Stress.boundViolations(spark, work, Stress.allQueries)
    // the map keys are the queries that HAVE bound booleans — if a
    // refactor drops them all, the smoke must fail rather than pass
    // vacuously
    assert(violations.nonEmpty,
      "no self-asserting query left in the stress set — smoke is vacuous")
    val bad = violations.filter(_._2.nonEmpty)
    assert(bad.isEmpty, s"self-assert bounds violated at factor 2: $bad")
  }
}
