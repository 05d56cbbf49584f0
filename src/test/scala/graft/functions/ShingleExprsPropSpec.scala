package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property fuzz: the native expressions must equal the Column-combinator
  * reference forms on ARBITRARY strings — whitespace runs, unicode,
  * apostrophes, digit/letter boundaries, empty input — not just the
  * curated sample list in ShingleExprsSpec. (Seeded Gen sampling; the
  * scalatest-scalacheck bridge isn't on the classpath.) */
class ShingleExprsPropSpec extends SparkSpec {
  import spark.implicits._

  private val wordChar = Gen.frequency(
    (8, Gen.alphaLowerChar), (2, Gen.alphaUpperChar), (1, Gen.numChar),
    (1, Gen.oneOf('\'', '!', '.', ',', '-', '_')),
    (1, Gen.oneOf('ü', 'ß', 'é', '漢', 'א')),
    (3, Gen.oneOf(' ', '\t', '\n')))
  private val textGen: Gen[String] =
    Gen.chooseNum(0, 120).flatMap(n => Gen.stringOfN(n, wordChar))

  private def shinglesReference(text: org.apache.spark.sql.Column, k: Int) = {
    val ts = filter(split(lower(text), "[^a-z']+"), t => length(t) > 0)
    val n = size(ts)
    when(n < k, array(xxhash64(concat_ws(" ", ts))))
      .otherwise(transform(sequence(lit(1), n - lit(k - 1)),
        i => xxhash64(concat_ws(" ", slice(ts, i, lit(k))))))
  }

  private def simhashReference(text: org.apache.spark.sql.Column) = {
    // 64-bit per-bit vote over the 3-shingle hash reference (NOT the
    // native ShingleHash — fully independent chain); bit positions are
    // Scala-side literals (shiftrightunsigned takes an Int)
    val hs = shinglesReference(text, 3)
    (0 until 64).map { i =>
      val vote = aggregate(hs, lit(0), (acc, h) =>
        acc + when(shiftrightunsigned(h, i).bitwiseAND(lit(1L)) === 1L, 1)
          .otherwise(-1))
      when(vote > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  test("native shingle/minhash/simhash ≡ reference forms on random text") {
    val texts = (0 until 200).flatMap { i =>
      textGen.apply(Gen.Parameters.default, Seed(i.toLong))
    }
    assert(texts.length >= 150, "generator drought")
    val df = texts.toDF("text")
    val rows = df.select(
      col("text"),
      ShingleExprs.shingleHashes(col("text"), 3).as("f_sh"),
      shinglesReference(col("text"), 3).as("r_sh"),
      ShingleExprs.minHashSignature(col("text"), 3, 8).as("f_mh"),
      ShingleExprs.simHash(col("text")).as("f_si"),
      simhashReference(col("text")).as("r_si"))
      .collect()
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"shingles diverged on: ${t.take(60)}")
      assert(r.getLong(4) == r.getLong(5), s"simhash diverged on: ${t.take(60)}")
      // minhash: every position = min over shingles of the salted hash
      val sh = r.getSeq[Long](1)
      val expected = (0 until 8).map { j =>
        val salt = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(j, 42L)
        sh.map(h => org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(h, salt)).min
      }
      assert(r.getSeq[Long](3) == expected, s"minhash diverged on: ${t.take(60)}")
    }
  }

  test("native ngrams/pairs/quality/gopher ≡ reference forms on random text") {
    // richer alphabet: stopwords, bullets, ellipses (both spellings),
    // '#', İ (whose lowercase EXPANDS to i + combining dot), newlines —
    // the shapes the byte-scan expressions must not mis-handle
    val richChar = Gen.frequency(
      (6, Gen.alphaLowerChar), (2, Gen.alphaUpperChar), (1, Gen.numChar),
      (2, Gen.oneOf('\'', '!', '.', ',', '-', '*', '#', '…', '•')),
      (1, Gen.oneOf('ü', 'ß', 'é', '漢', 'א', 'İ')),
      (3, Gen.oneOf(' ', '\t', '\n', '\r')))
    val word = Gen.frequency(
      (3, Gen.oneOf(TextFunctions.EnglishStopwords)),
      (2, Gen.oneOf(TextFunctions.LanguageMarkers.values.flatten.toSeq)),
      (1, Gen.oneOf("...", "…", "- x", "• y", "#tag")),
      (5, Gen.chooseNum(1, 9).flatMap(n => Gen.stringOfN(n, richChar))))
    val gen: Gen[String] = Gen.chooseNum(0, 30).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val texts = (0 until 300).flatMap { i =>
      gen.apply(Gen.Parameters.default, Seed(1000L + i))
    }
    assert(texts.length >= 250, "generator drought")
    val df = texts.toDF("text")
    val text = col("text")
    val ts = filter(split(lower(text), "[^a-z']+"), t => length(t) > 0)

    // ngram strings + consecutive pairs references (HOF forms)
    val ngramRef = when(size(ts) >= 2,
      transform(sequence(lit(1), size(ts) - 1), i =>
        array_join(slice(ts, i, lit(2)), " ")))
      .otherwise(array().cast("array<string>"))
    val pairsRef = when(size(ts) >= 2,
      transform(sequence(lit(1), size(ts) - 1), i =>
        struct(element_at(ts, i).as("v"), element_at(ts, i + 1).as("w"))))
      .otherwise(array().cast("array<struct<v:string,w:string>>"))

    // quality reference (inlined Column form)
    val nTok = size(ts)
    val meanWordLen = when(nTok === 0, 0.0)
      .otherwise(length(regexp_replace(lower(text), "[^a-z']", "")).cast("double") / nTok)
    val qLenOk = when(nTok >= 5 && nTok <= 100000, 1.0).otherwise(0.0)
    val qWordLenOk = when(meanWordLen >= 2.0 && meanWordLen <= 12.0, 1.0).otherwise(0.0)
    val punct = length(regexp_replace(text, "[^\\p{Punct}]", ""))
    val punctRatio = when(length(text) === 0, 0.0)
      .otherwise(punct.cast("double") / length(text).cast("double"))
    val qPunctOk = when(punctRatio < lit(0.2), 1.0).otherwise(0.0)
    val hits = size(filter(ts, t => t.isin(TextFunctions.EnglishStopwords.map(lit): _*)))
    val stopRatio = when(size(ts) === 0, 0.0)
      .otherwise(hits.cast("double") / size(ts).cast("double"))
    val qStopOk = when(stopRatio > 0.0, 1.0).otherwise(0.0)
    val qualityRef = (qLenOk + qWordLenOk + qPunctOk + qStopOk) / 4.0

    // gopher reference (inlined Column form, minWords=3 so random texts
    // exercise both sides of every threshold)
    val words = filter(split(text, "\\s+"), w => length(w) > 0)
    val nWords = size(words)
    val meanLen = when(nWords === 0, 0.0)
      .otherwise(aggregate(words, lit(0L), (acc, w) => acc + length(w))
        .cast("double") / nWords)
    val symbols =
      (length(text) - length(regexp_replace(text, "#", ""))) +
        (length(text) - length(regexp_replace(text, "…", ""))) +
        ((length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) /
          lit(3)).cast("int")
    val alphaFrac = when(nWords === 0, 0.0)
      .otherwise(size(filter(words, w => w.rlike("[A-Za-z]"))).cast("double") / nWords)
    val distinctStops = size(array_intersect(array_distinct(ts),
      array(TextFunctions.EnglishStopwords.map(lit): _*)))
    val lines = filter(split(text, "\n"), l => length(trim(l)) > 0)
    val nLines = size(lines)
    val bulletFrac = when(nLines === 0, 0.0)
      .otherwise(size(filter(lines, l => trim(l).rlike("^[-*•]"))).cast("double") / nLines)
    val ellipsisFrac = when(nLines === 0, 0.0)
      .otherwise(size(filter(lines, l => trim(l).rlike("(\\.\\.\\.|…)$"))).cast("double") / nLines)
    val gfWords = nWords >= 3 && nWords <= 20
    val gfWordLen = meanLen >= 3.0 && meanLen <= 10.0
    val gfSymbols = when(nWords === 0, false)
      .otherwise(symbols.cast("double") / nWords <= 0.1)
    val gfAlpha = alphaFrac >= 0.8
    val gfStopwords = distinctStops >= 2
    val gfBullets = bulletFrac < 0.9 && ellipsisFrac < 0.3
    val gopherRef = struct(
      nWords.cast("long").as("n_words"), gfWords.as("f_words"),
      gfWordLen.as("f_word_len"), gfSymbols.as("f_symbols"),
      gfAlpha.as("f_alpha"), gfStopwords.as("f_stopwords"),
      gfBullets.as("f_bullets"),
      (gfWords && gfWordLen && gfSymbols && gfAlpha && gfStopwords && gfBullets)
        .as("keep"))

    // langId reference (inlined Column form incl. array_max tie-break)
    val langScored = TextFunctions.LanguageMarkers.toSeq.sortBy(_._1).map {
      case (lang, ms) =>
        struct(size(filter(ts, t => t.isin(ms.map(lit): _*))).as("hits"),
          lit(lang).as("lang"))
    }
    val langBest = array_max(array(langScored: _*))
    val langRef = when(langBest.getField("hits") > 0,
      langBest.getField("lang")).otherwise("und")

    // whitespace-count + BPE-proxy references (HOF forms)
    val wsRef = size(filter(split(text, "\\s+"), t => length(t) > 0))
    val bpePieces = split(text,
      "(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])|\\s+|(?=[^a-zA-Z0-9\\s])")
    val bpeRef = aggregate(
      filter(bpePieces, p => length(p) > 0), lit(0L),
      (acc, p) => acc + ceil(length(p).cast("double") / 4.0).cast("long"))

    val rows = df.select(
      text,
      ShingleExprs.ngramStrings(text, 2).as("f_ng"), ngramRef.as("r_ng"),
      ShingleExprs.consecutivePairs(ts).as("f_cp"), pairsRef.as("r_cp"),
      ShingleExprs.qualityScore(text).as("f_q"), qualityRef.as("r_q"),
      ShingleExprs.gopherFlags(text, 3, 20).as("f_g"), gopherRef.as("r_g"),
      ShingleExprs.langId(text).as("f_l"), langRef.as("r_l"),
      ShingleExprs.wsTokenCount(text).as("f_w"), wsRef.as("r_w"),
      ShingleExprs.bpeProxyCount(text).as("f_b"), bpeRef.as("r_b"))
      .collect()
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"ngrams diverged on: ${t.take(80)}")
      assert(r.getSeq[org.apache.spark.sql.Row](3) == r.getSeq[org.apache.spark.sql.Row](4),
        s"pairs diverged on: ${t.take(80)}")
      assert(r.getDouble(5) == r.getDouble(6),
        s"quality diverged on: ${t.take(80)}")
      assert(r.getStruct(7) == r.getStruct(8),
        s"gopher diverged on: ${t.take(80)} -> ${r.getStruct(7)} vs ${r.getStruct(8)}")
      assert(r.getString(9) == r.getString(10),
        s"langId diverged on: ${t.take(80)} -> ${r.getString(9)} vs ${r.getString(10)}")
      assert(r.getInt(11) == r.getInt(12),
        s"wsTokenCount diverged on: ${t.take(80)}")
      assert(r.getLong(13) == r.getLong(14),
        s"bpeProxyCount diverged on: ${t.take(80)} -> ${r.getLong(13)} vs ${r.getLong(14)}")
    }
  }

  test("native scrubSpans ≡ Column-combinator reference on random text + probes") {
    // Reference: mark token i removed iff some start p with p <= i < p+n
    // has gram-hash(p) in the probe set — the same contract the relational
    // scrubOverlaps implements (ContaminationSpec pins native ≡ relational
    // on directed fixtures; this pins it on arbitrary strings).
    val n = 3
    val texts = (0 until 150).flatMap { i =>
      textGen.apply(Gen.Parameters.default, Seed(1000L + i))
    }
    assert(texts.length >= 100, "generator drought")
    // probe set: every 3rd text contributes its grams, so some texts are
    // fully scrubbed, some partially (prefix overlap), most untouched
    val probeTexts = texts.zipWithIndex.collect { case (t, i) if i % 3 == 0 => t }
    val probeHashes = probeTexts.toDF("p")
      .select(explode(ShingleExprs.ngramStrings(col("p"), n)).as("g"))
      .select(xxhash64(col("g"))).distinct().collect().map(_.getLong(0))

    val ts = filter(split(lower(col("text")), "[^a-z']+"), t => length(t) > 0)
    val probeArr = typedLit(probeHashes.toSeq)
    val starts = when(size(ts) >= n,
      filter(sequence(lit(1), greatest(size(ts) - lit(n - 1), lit(1))),
        i => array_contains(probeArr,
          xxhash64(concat_ws(" ", slice(ts, i, lit(n)))))))
      .otherwise(array().cast("array<int>"))
    val keptRef = filter(
      transform(ts, (t, i) => struct(t.as("t"), i.as("i"))),
      s => !exists(starts,
        p => s.getField("i") >= p - 1 && s.getField("i") < p - 1 + lit(n)))
    val rows = texts.toDF("text").select(
      col("text"),
      ShingleExprs.scrubSpans(col("text"), n, probeHashes).as("f"),
      size(ts).as("r_n"),
      (size(ts) - size(keptRef)).as("r_rm"),
      concat_ws(" ", transform(keptRef, s => s.getField("t"))).as("r_txt"))
      .collect()
    rows.foreach { r =>
      val t = r.getString(0)
      val f = r.getStruct(1)
      assert(f.getInt(0) == r.getInt(2),
        s"n_tokens diverged on: ${t.take(80)}")
      assert(f.getInt(1) == r.getInt(3),
        s"n_removed diverged on: ${t.take(80)} -> ${f.getInt(1)} vs ${r.getInt(3)}")
      assert(f.getString(2) == r.getString(4),
        s"scrubbed_text diverged on: ${t.take(80)}")
    }
  }

  test("native winnowing ≡ the Column-combinator reference on random text") {
    val texts = (0 until 200).flatMap { i =>
      textGen.apply(Gen.Parameters.default, Seed(9000L + i))
    }
    assert(texts.length >= 150, "generator drought")
    for ((k, w) <- Seq((3, 4), (2, 7), (1, 1))) {
      val rows = texts.toDF("text").select(
        col("text"),
        ShingleExprs.winnowFingerprints(col("text"), k, w).as("f"),
        TextFunctions.winnowingFingerprintsReference(col("text"), k, w).as("r"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"winnow(k=$k,w=$w) diverged on: ${r.getString(0).take(80)}")
      }
    }
  }
}
