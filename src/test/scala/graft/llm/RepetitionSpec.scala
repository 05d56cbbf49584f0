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

  test("editDistancePairs ≡ within-band all-pairs (PassJoin path included)") {
    // Random corpus spanning both candidate paths: long docs (full
    // prefixes → PassJoin segment blocking) and short docs (salted band
    // join), plus planted near-dup pairs in each regime.
    val rng = new scala.util.Random(7)
    def randStr(n: Int) = (0 until n).map(_ => ('a' + rng.nextInt(4)).toChar).mkString
    val longBase = (0 until 6).map(_ => randStr(100))
    val shortBase = (0 until 6).map(_ => randStr(30))
    def mutate(s: String, k: Int): String =
      (0 until k).foldLeft(s)((t, _) => {
        val i = rng.nextInt(t.length)
        t.substring(0, i) + ('a' + rng.nextInt(4)).toChar + t.substring(i + 1)
      })
    val docs = (longBase ++ longBase.map(mutate(_, 2)) ++
      shortBase ++ shortBase.map(mutate(_, 1)) ++
      (0 until 20).map(_ => randStr(60 + rng.nextInt(60))))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val prefixLen = 48; val maxDist = 4; val bandWidth = 32
    val got = Repetition.editDistancePairs(docs, "doc_id", "text",
      prefixLen, maxDist, bandWidth)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // reference: plain quadratic within-band definition
    val pre = docs.select(col("doc_id"),
      substring(col("text"), 1, prefixLen).as("pre"),
      (length(col("text")) / bandWidth).cast("long").as("band"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (ia, pa, ba) <- pre; (ib, pb, bb) <- pre
      if ia < ib && ba == bb
      d = lev(pa, pb) if d <= maxDist
    } yield (ia, ib, d)).toSet
    assert(got === want)
    assert(want.nonEmpty, "fixture must plant at least one near-dup pair")
  }

  test("repetition aggregations plan map-side partials, no cartesian") {
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val stats = Repetition.ngramRepetitionStats(docs, "doc_id", "text", 2)
    assertNoCartesian(stats)
    val plan = stats.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"expected hash aggregation:\n$plan")
  }
}
