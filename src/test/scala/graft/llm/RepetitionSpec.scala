package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("ngramRepetitionStats: repeated bigram dominates, clean doc near zero") {
    // "spam spam spam spam" (19 chars): bigram "spam spam" ×3, each 9 chars
    // → top mass 27, dup mass 27 → frac 27/19.
    val docs = Seq(
      (1L, "spam spam spam spam"),
      (2L, "one two three four five"),
      (3L, "x"), // 1 token → no bigrams
      (4L, "")   // empty → 0.0 guards
    ).toDF("doc_id", "text")
    val out = Repetition.ngramRepetitionStats(docs, "doc_id", "text", 2)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out(0)._2 === 27.0 / 19.0 && out(0)._3 === 27.0 / 19.0)
    // all bigrams unique: top = one bigram's mass, dup = 0
    assert(out(1)._2 > 0.0 && out(1)._3 === 0.0)
    assert(out(2) === ((3L, 0.0, 0.0)))
    assert(out(3) === ((4L, 0.0, 0.0)))
  }

  test("duplicateLineStats: counts repeats, ignores blank lines") {
    val docs = Seq(
      (1L, "aaa\nbbb\naaa\n \naaa"), // aaa×3 bbb×1 (blank ignored): 4 lines, 2 dups
      (2L, "unique"),
      (3L, "\n \n") // only blanks → zero lines
    ).toDF("doc_id", "text")
    val out = Repetition.duplicateLineStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out(0) === ((1L, 4L, 0.5, 0.5)))
    assert(out(1) === ((2L, 1L, 0.0, 0.0)))
    assert(out(2) === ((3L, 0L, 0.0, 0.0)))
  }

  test("editDistancePairs: finds banded near-dups, no cartesian plan") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"), // dist 3 to #1
      (3L, "completely different text that shares nothing ha"),
      (4L, "zz") // different band
    ).toDF("doc_id", "text")
    val pairs = Repetition.editDistancePairs(docs, "doc_id", "text",
      prefixLen = 48, maxDist = 5, bandWidth = 20)
    assertNoCartesian(pairs)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)))
  }

  test("repetition aggregations plan map-side partials, no cartesian") {
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val stats = Repetition.ngramRepetitionStats(docs, "doc_id", "text", 2)
    assertNoCartesian(stats)
    val plan = stats.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"expected hash aggregation:\n$plan")
  }
}
