package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TextRelevance.kneserNeyBigram hand-worked probabilities and mass
  * bounds; zipfFit recovers a constructed power law and matches the
  * scalar quantized OLS. */
class KneserNeyZipfSpec extends SparkSpec {
  import spark.implicits._

  test("kneserNeyBigram matches hand-computed probabilities") {
    // corpus: "a b a b a c" -> bigrams: (a,b)x2, (b,a)x2, (a,c)x1
    // c(a·)=3, N1+(a·)=2; c(b·)=2, N1+(b·)=1; N1+(·a)=1, N1+(·b)=1,
    // N1+(·c)=1; N1+(··)=3
    val docs = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val out = TextRelevance.kneserNeyBigram(docs, "doc_id", "text",
        discount = 0.75, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val pCont = 1.0 / 3.0
    def pkn(c: Long, cv: Long, n1fw: Long): Double =
      math.max(c - 0.75, 0.0) / cv + 0.75 * n1fw / cv * pCont
    assert(out(("a", "b"))._1 === 2L)
    assert(math.abs(out(("a", "b"))._2 - pkn(2, 3, 2)) < 1e-6)
    assert(math.abs(out(("a", "c"))._2 - pkn(1, 3, 2)) < 1e-6)
    assert(math.abs(out(("b", "a"))._2 - pkn(2, 2, 1)) < 1e-6)
    // per-context mass over SEEN continuations stays <= 1 (the rest is
    // reserved backoff mass for unseen words)
    val massA = out(("a", "b"))._2 + out(("a", "c"))._2
    assert(massA < 1.0 + 1e-9)
  }

  test("minCount filters the table but not the counts behind it") {
    val docs = Seq((1L, "x y x y x z")).toDF("doc_id", "text")
    val all = TextRelevance.kneserNeyBigram(docs, "doc_id", "text",
      0.75, 1L).collect()
    val freq = TextRelevance.kneserNeyBigram(docs, "doc_id", "text",
      0.75, 2L).collect()
    assert(all.length === 3 && freq.length === 2)
    // (x,y)'s probability is identical in both runs — the filter must
    // not change the denominators
    val pAll = all.find(r => r.getString(0) == "x" && r.getString(1) == "y").get.getDouble(3)
    val pFreq = freq.find(r => r.getString(0) == "x" && r.getString(1) == "y").get.getDouble(3)
    assert(pAll === pFreq)
  }

  test("zipfFit recovers a constructed power law (slope ~ -1)") {
    // word w_r appears floor(600/r) times, r = 1..30: ln f = ln 600 - ln r
    // (letter-only words — the tokenizer strips digits)
    val abc = "abcdefghijklmnopqrstuvwxyz"
    def wd(r: Int) = s"w${abc(r / 26)}${abc(r % 26)}"
    val words = (1 to 30).flatMap(r => Seq.fill(600 / r)(wd(r)))
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val out = TextRelevance.zipfFit(docs, "doc_id", "text", topK = 30)
      .collect().head
    assert(out.getLong(0) === 30L)
    assert(math.abs(out.getDouble(1) - (-1.0)) < 0.02, s"slope ${out.getDouble(1)}")
    assert(out.getDouble(3) > 0.999) // near-perfect fit
  }

  test("zipfFit matches the scalar quantized OLS bit-for-bit") {
    val abc = "abcdefghijklmnopqrstuvwxyz"
    val words = (1 to 25).flatMap(r =>
      Seq.fill(1 + (r * 48271 % 97))(s"v${abc(r / 26)}${abc(r % 26)}"))
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val out = TextRelevance.zipfFit(docs, "doc_id", "text", topK = 20)
      .collect().head
    // scalar replay: top-20 by (freq desc, word), 9-dp rounded ln terms
    val freqs = words.groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (w, f) => (-f, w) }.take(20)
    def r9(x: Double): BigDecimal =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val terms = freqs.zipWithIndex.map { case ((_, f), i) =>
      val xd = r9(math.log(i + 1.0)).toDouble
      val yd = r9(math.log(f.toDouble)).toDouble
      (r9(xd), r9(yd), r9(xd * yd), r9(xd * xd), r9(yd * yd))
    }
    val n = terms.size.toDouble
    val sx = terms.map(_._1).sum.toDouble; val sy = terms.map(_._2).sum.toDouble
    val sxy = terms.map(_._3).sum.toDouble
    val sxx = terms.map(_._4).sum.toDouble; val syy = terms.map(_._5).sum.toDouble
    val varx = n * sxx - sx * sx; val vary = n * syy - sy * sy
    val cov = n * sxy - sx * sy
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getDouble(1) === r6(cov / varx))
    assert(out.getDouble(2) === r6((sy - (cov / varx) * sx) / n))
    assert(out.getDouble(3) === r6(cov * cov / (varx * vary)))
  }
}
