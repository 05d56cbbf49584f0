package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** StringMetricExprs: Jaro–Winkler against DuckDB-derived golden vectors
  * plus an independent O(n·m)-matrix reference; URL canonicalization and
  * registrable-domain edge cases the oracle fixtures don't reach. */
class StringMetricExprsSpec extends SparkSpec {
  import spark.implicits._

  // ---- Jaro–Winkler ----

  /** Golden vectors captured from DuckDB `jaro_winkler_similarity`
    * (2026-08-14, the oracle engine the queries compare against) —
    * pinning the cross-engine conventions: empty strings score 0,
    * ab/ba has no window, boost only above 0.7. */
  private val duckdbGolden = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
    ("abc", "abc", 1.0),
    ("", "abc", 0.0),
    ("", "", 0.0),
    ("a", "b", 0.0),
    ("ab", "ba", 0.0),
    ("CRATE", "TRACE", 0.7333333333333334),
    ("DwAyNE", "DuANE", 0.8400000000000001),
    ("hello world", "hello wrold", 0.9818181818181818),
    ("ab", "abcdefgh", 0.8),
    ("abcdefg", "abcdefg!", 0.975),
    ("aabbcc", "ccbbaa", 0.5555555555555555),
    ("abcxxxxx", "abcyyyyy", 0.5833333333333334), // jaro < 0.7: no boost
    ("aXbcdef", "aYbcdef", 0.9142857142857143))

  test("jaro_winkler matches the DuckDB golden vectors bit-for-bit") {
    duckdbGolden.foreach { case (a, b, want) =>
      val got = StringMetricExprs.jaroWinklerSim(a, b)
      assert(got == want, s"jw($a, $b): got $got want $want")
    }
  }

  /** Independent reference: maximum-cardinality greedy matching done with
    * an explicit O(n·m) candidate matrix rather than the single-pass
    * flag arrays — different code shape, same definition. */
  private def jwReference(s1: String, s2: String): Double = {
    val (l1, l2) = (s1.length, s2.length)
    if (l1 == 0 || l2 == 0) return 0.0
    val mw = math.max(0, math.max(l1, l2) / 2 - 1)
    val used = Array.fill(l2)(false)
    val matches1 = scala.collection.mutable.ArrayBuffer[Char]()
    val matchedAt2 = Array.fill(l2)(false)
    for (i <- 0 until l1) {
      val js = (math.max(0, i - mw) to math.min(l2 - 1, i + mw))
        .find(j => !used(j) && s1.charAt(i) == s2.charAt(j))
      js.foreach { j => used(j) = true; matchedAt2(j) = true; matches1 += s1.charAt(i) }
    }
    val m = matches1.length
    if (m == 0) return 0.0
    val matches2 = (0 until l2).filter(matchedAt2).map(s2.charAt)
    val t = matches1.zip(matches2).count { case (x, y) => x != y } / 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (jaro > 0.7) {
      val l = s1.zip(s2).take(4).takeWhile { case (x, y) => x == y }.length
      jaro + 0.1 * l * (1.0 - jaro)
    } else jaro
  }

  test("jaro_winkler agrees with the independent matrix reference on fuzz") {
    val strGen = Gen.chooseNum(0, 14).flatMap(n =>
      Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c', 'd', 'e', 'f', ' ', '\'')))
    var checked = 0
    (0 until 800).foreach { i =>
      val params = Gen.Parameters.default
      for {
        a <- Gen.zip(strGen, strGen).apply(params, Seed(i.toLong))
      } {
        val (s1, s2) = a
        assert(StringMetricExprs.jaroWinklerSim(s1, s2) == jwReference(s1, s2),
          s"mismatch on ($s1, $s2)")
        checked += 1
      }
    }
    assert(checked > 700)
  }

  test("jaro_winkler runs as a Column and through SQL registration") {
    graft.GraftExtensions.register(spark)
    val df = Seq(("MARTHA", "MARHTA")).toDF("a", "b")
    val viaColumn = df.select(
      StringMetricExprs.jaroWinkler(col("a"), col("b"))).head.getDouble(0)
    val viaSql = df.selectExpr("jaro_winkler(a, b)").head.getDouble(0)
    assert(viaColumn == 0.9611111111111111)
    assert(viaSql == viaColumn)
  }

  test("canonicalize_url and registrable_domain resolve in SQL") {
    graft.GraftExtensions.register(spark)
    val row = Seq("HTTPS://WWW.Img.Example.CO.UK:443/a//b/?utm_source=x&id=1#f")
      .toDF("u")
      .selectExpr("canonicalize_url(u) AS c",
        "registrable_domain('img.example.co.uk:8080') AS d")
      .head
    assert(row.getString(0) === "https://img.example.co.uk/a/b?id=1")
    assert(row.getString(1) === "example.co.uk")
  }

  // ---- URL canonicalization ----

  private def canon(u: String): String = StringMetricExprs.canonicalize(u)

  test("canonicalize_url erases each documented noise source") {
    assert(canon("HTTPS://WWW.Example.COM:443/a//b/?utm_source=x&id=1#frag")
      === "https://example.com/a/b?id=1")
    assert(canon("http://example.com:80/") === "http://example.com/")
    assert(canon("http://example.com:8080/x") === "http://example.com:8080/x")
    // https keeps :80 (non-default for the scheme), http keeps :443
    assert(canon("https://example.com:80/x") === "https://example.com:80/x")
    assert(canon("http://example.com:443/x") === "http://example.com:443/x")
    // params sorted, tracking dropped, '?' vanishes when nothing remains
    assert(canon("http://e.com/p?b=2&a=1") === "http://e.com/p?a=1&b=2")
    assert(canon("http://e.com/p?utm_campaign=c&gclid=g&fbclid=f&ref=r")
      === "http://e.com/p")
    // root slash survives; empty path stays empty
    assert(canon("http://e.com/") === "http://e.com/")
    assert(canon("http://e.com") === "http://e.com")
    // www only strips as a prefix; inner subdomains keep
    assert(canon("http://www.img.e.com/x") === "http://img.e.com/x")
    assert(canon("http://img.www.e.com/x") === "http://img.www.e.com/x")
    // non-URL input returned unchanged
    assert(canon("not a url") === "not a url")
    // idempotence on a mixed case
    val once = canon("HTTP://WWW.A.CO.UK:80//x//y/?z=1&utm_x=9#f")
    assert(canon(once) === once)
  }

  test("registrable_domain handles suffix tiers and ports") {
    import StringMetricExprs.{registrableDomain => rd}
    assert(rd("img.cdn.example.co.uk") === "example.co.uk")
    assert(rd("a.b.example.com") === "example.com")
    assert(rd("example.com") === "example.com")
    assert(rd("example.co.uk") === "example.co.uk")
    assert(rd("localhost") === "localhost")
    assert(rd("EXAMPLE.COM:8080") === "example.com")
    assert(rd("deep.example.com.au") === "example.com.au")
  }

  // ---- kAnonymize ----

  test("kAnonymize suppresses exactly the under-k groups") {
    val df = Seq(
      ("a", 1), ("a", 2), ("a", 3), // group a: 3 rows
      ("b", 4), ("b", 5), // group b: 2 rows
      ("c", 6)) // group c: 1 row
      .toDF("q", "v")
    val out = graft.llm.Curation.kAnonymize(df, Seq("q"), k = 2)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(out === Set(("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5)))
    val strict = graft.llm.Curation.kAnonymize(df, Seq("q"), k = 4)
    assert(strict.count() === 0)
    intercept[IllegalArgumentException] {
      graft.llm.Curation.kAnonymize(df.withColumnRenamed("v", "__gn"), Seq("q"), 2)
    }
  }
}
