package graft.llm

import graft.SparkSpec

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "a totally different document about spark internals"),
    (3L, "prefix words then the quick brown fox jumps over the lazy dog as well")
  ).toDF("doc_id", "text")

  private val probes = Seq(
    (100L, "quick brown fox jumps over the lazy"),
    (200L, "no such span anywhere")
  ).toDF("probe_id", "ptext")

  test("exactOverlap finds verbatim containment only") {
    val hits = Contamination.exactOverlap(docs, "doc_id", "text",
      probes, "probe_id", "ptext")
      .as[(Long, Long)].collect().toSet
    assert(hits == Set((100L, 1L), (100L, 3L)))
  }

  test("ngramOverlap finds shared n-token spans") {
    val hits = Contamination.ngramOverlap(docs, "doc_id", "text",
      probes, "probe_id", "ptext", n = 5)
      .as[(Long, Long)].collect().toSet
    assert(hits == Set((100L, 1L), (100L, 3L))) // doc 2 shares no 5-gram
  }

  test("short probes fall back to a full-run shingle and still match") {
    val shortProbe = Seq((300L, "spark internals")).toDF("probe_id", "ptext")
    // probe has 2 tokens < n: it matches only a doc whose own sub-n
    // full-run shingle equals it — doc 2 has 7 tokens, so windows differ
    val hits = Contamination.ngramOverlap(docs, "doc_id", "text",
      shortProbe, "probe_id", "ptext", n = 5)
      .as[(Long, Long)].collect().toSet
    assert(hits.isEmpty)
    // but an exact-substring check still catches it
    val exact = Contamination.exactOverlap(docs, "doc_id", "text",
      shortProbe, "probe_id", "ptext")
      .as[(Long, Long)].collect().toSet
    assert(exact == Set((300L, 2L)))
  }

  test("contaminationReport counts hit documents per probe") {
    val rep = Contamination.contaminationReport(docs, "doc_id", "text",
      probes, "probe_id", "ptext", n = 5)
      .as[(Long, Long)].collect().toMap
    assert(rep == Map(100L -> 2L))
  }

  test("overlapComplete: short probes route through exact-substring, long through grams") {
    val mixed = Seq(
      (100L, "quick brown fox jumps over the lazy"), // 7 tokens ≥ n=5 → gram leg
      (300L, "spark internals"),                     // 2 tokens < 5 → exact leg
      (400L, "")                                     // 0 tokens → matches nothing
    ).toDF("probe_id", "ptext")
    val hits = Contamination.overlapComplete(docs, "doc_id", "text",
      mixed, "probe_id", "ptext", n = 5)
      .as[(Long, Long)].collect().toSet
    // the short probe now DOES find its containing long document —
    // the false-negative the pure n-gram leg has by construction
    assert(hits == Set((100L, 1L), (100L, 3L), (300L, 2L)))
  }

  test("scrubOverlaps removes EVERY matching span occurrence (no keeper)") {
    val out = Contamination.scrubOverlaps(docs, "doc_id", "text",
      probes, "probe_id", "ptext", n = 5)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // probe 100 = "quick brown fox jumps over the lazy" (7 tokens → 3
    // 5-grams). Doc 1 tokens 1..7 carry them (positions 1,2,3 → tokens
    // 1-7 covered); doc 3 the same run shifted by 3 (tokens 4-10).
    assert(out(1L) === ((10L, 7L, "the dog tonight")))
    assert(out(2L) === ((7L, 0L, "a totally different document about spark internals")))
    assert(out(3L) === ((14L, 7L, "prefix words then the dog as well")))
  }

  test("scrubOverlaps: probes shorter than n scrub nothing (documented gap)") {
    val shortP = Seq((300L, "spark internals")).toDF("probe_id", "ptext")
    val out = Contamination.scrubOverlaps(docs, "doc_id", "text",
      shortP, "probe_id", "ptext", n = 5)
      .as[(Long, Long, Long, String)].collect()
    assert(out.forall(_._3 == 0L))
  }

  test("scrubOverlapsStreaming (native projection) ≡ scrubOverlaps (relational)") {
    val rel = Contamination.scrubOverlaps(docs, "doc_id", "text",
      probes, "probe_id", "ptext", n = 5)
      .as[(Long, Long, Long, String)].collect().toSet
    val nat = Contamination.scrubOverlapsStreaming(docs, "doc_id", "text",
      probes.select($"ptext"), "ptext", n = 5)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(nat == rel)
  }

  test("scrubOverlapsStreaming rejects probe-gram sets above the bound") {
    val e = intercept[IllegalArgumentException] {
      Contamination.scrubOverlapsStreaming(docs, "doc_id", "text",
        probes.select($"ptext"), "ptext", n = 5, maxProbeGrams = 2)
    }
    assert(e.getMessage.contains("maxProbeGrams"))
  }

  test("scrubOverlapsStreaming: null and empty docs pass through") {
    val d = Seq((1L, ""), (2L, null.asInstanceOf[String]),
      (3L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val out = Contamination.scrubOverlapsStreaming(d, "doc_id", "text",
      probes.select($"ptext"), "ptext", n = 5)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(out(1L) === ((Some(0L), Some(0L), Some(""))))
    assert(out(2L) === ((None, None, None)))
    assert(out(3L) === ((Some(10L), Some(7L), Some("the dog tonight"))))
  }
}
