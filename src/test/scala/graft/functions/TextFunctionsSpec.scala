package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.functions.col

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String)(implicit e: org.apache.spark.sql.Encoder[T]): T =
    Seq(text).toDF("t").select(c.as[T](e)).head()

  test("tokens lower-cases, splits on non-letters, drops empties") {
    val out = one[Seq[String]](TextFunctions.tokens(col("t")), "Hello, World! don't stop")
    assert(out == Seq("hello", "world", "don't", "stop"))
  }

  test("tokenCount and approxBpeTokenCount") {
    assert(one[Int](TextFunctions.tokenCount(col("t")), "a  quick   brown fox") == 4)
    // "hello" -> ceil(5/4)=2, "world2000" -> "world"(2) + "2000"(1)
    assert(one[Long](TextFunctions.approxBpeTokenCount(col("t")), "hello world2000") == 5L)
  }

  test("punctRatio / stopwordRatio / qualityScore bounds") {
    assert(one[Double](TextFunctions.punctRatio(col("t")), "ab,.") == 0.5)
    assert(one[Double](TextFunctions.stopwordRatio(col("t"), TextFunctions.EnglishStopwords),
      "the cat and the dog") == 0.6)
    val q = one[Double](TextFunctions.qualityScore(col("t")),
      "the quick brown fox jumps over the lazy dog")
    assert(q == 1.0)
    assert(one[Double](TextFunctions.qualityScore(col("t")), "!!! ???") < 0.5)
  }

  test("qualityScore's single-pass form is value-identical to the array form") {
    import org.apache.spark.sql.functions._
    // the legacy formulation qualityScore replaced (array tokens + isin),
    // kept here FULLY inlined in Column-combinator form so the reference
    // shares no code with the native expression under test
    def legacy(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val ts = filter(split(lower(text), "[^a-z']+"), t => length(t) > 0)
      val nTok = size(ts)
      val meanWordLen = when(nTok === 0, 0.0)
        .otherwise(length(regexp_replace(lower(text), "[^a-z']", "")).cast("double") / nTok)
      val lenOk = when(nTok >= 5 && nTok <= 100000, 1.0).otherwise(0.0)
      val wordLenOk = when(meanWordLen >= 2.0 && meanWordLen <= 12.0, 1.0).otherwise(0.0)
      val punct = length(regexp_replace(text, "[^\\p{Punct}]", ""))
      val punctRatio = when(length(text) === 0, 0.0)
        .otherwise(punct.cast("double") / length(text).cast("double"))
      val punctOk = when(punctRatio < lit(0.2), 1.0).otherwise(0.0)
      val hits = size(filter(ts,
        t => t.isin(TextFunctions.EnglishStopwords.map(lit): _*)))
      val stopRatio = when(size(ts) === 0, 0.0)
        .otherwise(hits.cast("double") / size(ts).cast("double"))
      val stopOk = when(stopRatio > 0.0, 1.0).otherwise(0.0)
      (lenOk + wordLenOk + punctOk + stopOk) / 4.0
    }
    val edges = Seq(
      "", " ", "!!! ???", "the", "athe thea", "a", "an and'the", "don't",
      "'the'", "the'cat", "x the y", "THE CAT", "ünïcöde tëxt the",
      "tab\tthe\nnewline", "1234 5678", "a,b.c;d", "o'neill o'the'hill",
      "andandand", "'''", "is-it for,on with. at")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text")).as[String].collect().toSeq
    val df = (edges ++ docs).toDF("t")
    val mismatches = df
      .select(TextFunctions.qualityScore(col("t")).as("fast"),
        legacy(col("t")).as("ref"), col("t"))
      .filter(col("fast") =!= col("ref"))
      .collect()
    assert(mismatches.isEmpty,
      s"single-pass qualityScore diverges on: ${mismatches.take(5).mkString("; ")}")
  }

  test("langId picks the marker-heavy language") {
    assert(one[String](TextFunctions.langId(col("t")),
      "the cat is on the mat and that is that") == "en")
    assert(one[String](TextFunctions.langId(col("t")),
      "der hund und die katze ist nicht da") == "de")
    assert(one[String](TextFunctions.langId(col("t")), "zzz qqq") == "und")
  }

  test("fingerprint is whitespace/case-insensitive but content-sensitive") {
    val f1 = one[Long](TextFunctions.fingerprint(col("t")), "Hello   World")
    val f2 = one[Long](TextFunctions.fingerprint(col("t")), "hello world")
    val f3 = one[Long](TextFunctions.fingerprint(col("t")), "hello there")
    assert(f1 == f2 && f1 != f3)
  }

  test("shingleHashes emits n-k+1 hashes, stable across calls") {
    val h = one[Seq[Long]](TextFunctions.shingleHashes(col("t"), 3), "a b c d e")
    assert(h.length == 3) // abc bcd cde
    val h2 = one[Seq[Long]](TextFunctions.shingleHashes(col("t"), 3), "a b c d e")
    assert(h == h2)
    // short text falls back to a single whole-text hash
    assert(one[Seq[Long]](TextFunctions.shingleHashes(col("t"), 5), "a b").length == 1)
  }

  test("scrubPii redacts emails, IPs, and phone runs; clean text untouched") {
    val s = one[String](TextFunctions.scrubPii(col("t")),
      "mail bob.smith+x@corp.example.com node 192.168.0.17 tel +1 (555) 010-4242 end")
    assert(s == "mail <EMAIL> node <IP> tel <PHONE> end")
    val clean = "no personal data in this sentence at all"
    assert(one[String](TextFunctions.scrubPii(col("t")), clean) == clean)
    // version-ish dotted numbers match the IPv4 shape only with 4 octets
    assert(one[String](TextFunctions.scrubPii(col("t")), "v1.2.3 stays") == "v1.2.3 stays")
  }

  test("winnowing: subset of shingles, compact, shared-run guarantee") {
    val text = "one two three four five six seven eight nine ten"
    val sh = one[Seq[Long]](TextFunctions.shingleHashes(col("t"), 3), text)
    val fp = one[Seq[Long]](TextFunctions.winnowingFingerprints(col("t"), 3, 4), text)
    assert(fp.toSet.subsetOf(sh.toSet))
    assert(fp.length < sh.length) // compaction
    // guarantee: docs sharing a run of w+k-1=6 tokens share a fingerprint
    val a = one[Seq[Long]](TextFunctions.winnowingFingerprints(col("t"), 3, 4),
      "xxx yyy one two three four five six zzz")
    val b = one[Seq[Long]](TextFunctions.winnowingFingerprints(col("t"), 3, 4),
      "aaa one two three four five six bbb ccc")
    assert(a.toSet.intersect(b.toSet).nonEmpty)
  }
}
