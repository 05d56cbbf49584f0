package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Combine

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("gopherQualityFlags: each rule flags its own failure mode") {
    val good = ("the quick brown fox and the lazy dog ran to the old mill " +
      "with a pail of water for the morning chores in town") // 24 words, stopwords, alpha
    val docs = Seq(
      (1L, good),
      (2L, "short text"),                                  // too few words
      (3L, ("# " * 30).trim),                              // symbol-heavy, no alpha
      (4L, (1 to 30).map(_.toString).mkString(" ")),       // digits: alpha fails
      (5L, (("- item\n" * 29) + "the a line of text here") + (" and the of to in is it that for on with" * 2)) // bullet-heavy
    ).toDF("doc_id", "text")
    val out = Curation.gopherQualityFlags(docs, "doc_id", "text", minWords = 20)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1).getBoolean(out(1).fieldIndex("keep")), "clean doc must pass")
    assert(!out(2).getBoolean(out(2).fieldIndex("f_words")))
    assert(!out(3).getBoolean(out(3).fieldIndex("f_symbols")))
    assert(!out(4).getBoolean(out(4).fieldIndex("f_alpha")))
    assert(!out(5).getBoolean(out(5).fieldIndex("f_bullets")))
  }

  test("gopherQualityFlags native form ≡ inlined Column-combinator reference") {
    // the Column formulation GopherFlags replaced, fully inlined
    def legacy(df: org.apache.spark.sql.DataFrame, minWords: Int, maxWords: Int) = {
      val text = col("text")
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
        .otherwise(size(filter(words, w => w.rlike("[A-Za-z]")))
          .cast("double") / nWords)
      val distinctStops = size(array_intersect(
        array_distinct(filter(split(lower(text), "[^a-z']+"), t => length(t) > 0)),
        array(graft.functions.TextFunctions.EnglishStopwords.map(lit): _*)))
      val lines = filter(split(text, "\n"), l => length(trim(l)) > 0)
      val nLines = size(lines)
      val bulletFrac = when(nLines === 0, 0.0)
        .otherwise(size(filter(lines, l => trim(l).rlike("^[-*•]")))
          .cast("double") / nLines)
      val ellipsisFrac = when(nLines === 0, 0.0)
        .otherwise(size(filter(lines, l => trim(l).rlike("(\\.\\.\\.|…)$")))
          .cast("double") / nLines)
      val fWords = nWords >= minWords && nWords <= maxWords
      val fWordLen = meanLen >= 3.0 && meanLen <= 10.0
      val fSymbols = when(nWords === 0, false)
        .otherwise(symbols.cast("double") / nWords <= 0.1)
      val fAlpha = alphaFrac >= 0.8
      val fStopwords = distinctStops >= 2
      val fBullets = bulletFrac < 0.9 && ellipsisFrac < 0.3
      df.select(col("doc_id"), nWords.cast("long").as("n_words"),
        fWords.as("f_words"), fWordLen.as("f_word_len"),
        fSymbols.as("f_symbols"), fAlpha.as("f_alpha"),
        fStopwords.as("f_stopwords"), fBullets.as("f_bullets"),
        (fWords && fWordLen && fSymbols && fAlpha && fStopwords && fBullets)
          .as("keep"))
    }
    val edges = Seq(
      "", " ", "\t", "word", "the quick…brown fox#tag and.....",
      "- bullet one\n- bullet two\n* third\n• fourth\nthe plain line",
      "line one...\nline two…\nline three\n   \nthe end",
      "  \t mixed \t tabs\nthe line\twith\ttabs for it",
      "…", "...", ".....", "......", "# # # #",
      "ünïcode wörds the straße of tökens is here for you",
      "ends with spaces...   \n   - starts with spaces",
      (1 to 60).map(_ => "the").mkString(" "),
      "a b c d e f g h i j k l m n o p q r s t u v w x y z")
    val fixture = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val lined = fixture.select(col("doc_id"),
      concat_ws("\n", col("text"), substring(col("text"), 1, 40),
        lit("- a bullet..."), col("text")).as("text"))
    val edgeDf = edges.zipWithIndex
      .map { case (t, i) => (10000L + i, t) }.toDF("doc_id", "text")
    Seq(fixture, lined, edgeDf).foreach { df =>
      Seq((50, 100000), (20, 30), (0, 5)).foreach { case (mn, mx) =>
        val fast = Curation.gopherQualityFlags(df, "doc_id", "text", mn, mx)
        val slow = legacy(df, mn, mx)
        assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty,
          s"gopher flags diverge at minWords=$mn maxWords=$mx: " +
            fast.exceptAll(slow).take(3).mkString("; "))
      }
    }
  }

  test("selectByTokenBudget: greedy by score, stops at budget, overshoot ≤ 1 doc") {
    // scores: doc 1..6 have quality-ordered scores via explicit column
    val docs = Seq(
      (1L, 0.9, 40L), (2L, 0.8, 40L), (3L, 0.7, 40L),
      (4L, 0.6, 40L), (5L, 0.5, 40L), (6L, 0.4, 40L)
    ).toDF("doc_id", "score0", "tokens0")
    val out = Curation.selectByTokenBudget(docs, "doc_id",
      col("score0"), col("tokens0"), budget = 100L)
      .orderBy(col("doc_id")).collect()
    // 40+40=80 < 100, third doc starts at 80 < 100 → taken (overshoot to 120)
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(out.last.getAs[Long]("cum_tokens") === 120L)
  }

  test("prefixSum: matches single-partition cumsum and does not collapse to one task") {
    val df = (1L to 1000L).map(i => (i, i % 97)).toDF("id", "v")
    // pin the fan-out: the cumsum must be identical across any partitioning
    val out = Combine.prefixSum(df, Seq(col("id").asc), col("v"), "cum",
      numPartitions = 8)
    assertNoCartesian(out)
    val rows = out.orderBy("id").collect().map(r => (r.getLong(0), r.getAs[Long]("cum")))
    var acc = 0L
    rows.foreach { case (i, cum) =>
      acc += i % 97
      assert(cum === acc, s"prefix sum diverged at id $i")
    }
    // distributed shape: the data window runs per range partition, so with
    // a pinned 8-way fan-out the ranged frame must actually have 8 partitions
    val ranged = df.withColumn("__v", col("v"))
      .repartitionByRange(8, col("id").asc)
    assert(ranged.rdd.getNumPartitions === 8,
      "range repartition must fan out so the windowed sum stays distributed")
  }

  test("prefixSum: a literal colliding with a column named '1' is not substituted") {
    // the fast path must require a BARE attribute: lit(1).toString == "1",
    // and a column literally named "1" must not be silently summed instead
    val df = (1L to 10L).map(i => (i, 100L)).toDF("id", "1")
    val out = Combine.prefixSum(df, Seq(col("id").asc), lit(1L), "cum")
      .orderBy("id").collect().map(_.getAs[Long]("cum"))
    assert(out.toSeq === (1L to 10L).toSeq, "lit(1) must sum as 1 per row, not column '1'")
  }

  test("prefixSum: an input column literally named __v survives the temp path") {
    val df = (1L to 5L).map(i => (i, i * 10L)).toDF("id", "__v")
    val out = Combine.prefixSum(df, Seq(col("id").asc), col("id") * 2, "cum")
    assert(out.columns.contains("__v"), "input column __v must not be dropped")
    val rows = out.orderBy("id").collect()
    assert(rows.map(_.getAs[Long]("__v")).toSeq === Seq(10L, 20L, 30L, 40L, 50L))
    assert(rows.map(_.getAs[Long]("cum")).toSeq === Seq(2L, 6L, 12L, 20L, 30L))
  }

  test("semDedup: drops within-cluster near-identical vectors, keeps min id") {
    val mk = (base: Double) => Array.tabulate(4)(i => (base + i).toFloat)
    val corpus = Seq(
      (1L, mk(1.0), 0), (2L, mk(1.0), 0),   // identical → 2 dropped
      (3L, Array(5f, -4f, 3f, -2f), 1),     // own direction → kept
      (4L, mk(1.0).map(x => x * 2f), 0)     // same direction as 1 → dropped
    ).toDF("vec_id", "embedding", "label")
    val cents = corpus.orderBy(col("vec_id")).limit(2)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cent_emb"))
    val kept = Similarity.semDedup(corpus, cents, threshold = 0.99)
      .select("vec_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L))
  }

  test("trimByQuantiles: exact interpolated (n-1)*q bounds, inclusive band") {
    // values 1..100: p05 = 1 + 99*0.05 = 5.95, p95 = 1 + 99*0.95 = 95.05
    // → keep exactly 6..95
    val df = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("id", "v")
    val kept = Curation.trimByQuantiles(df, "id", col("v"), 0.05, 0.95)
      .select("id").as[Long].collect().toSet
    assert(kept === (6L to 95L).toSet)
  }

  test("truncateTokens: head+tail cap, under-cap passthrough normalized") {
    val doc = (1 to 100).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, doc), (2L, "a  b\nc")).toDF("id", "text")
    val out = Curation.truncateTokens(df, "id", "text",
        maxTokens = 10, headFrac = 0.75)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // headN = ceil(7.5) = 8, tailN = 2 → first 8 + last 2
    assert(out(1L)._1 ==
      ((1 to 8).map(i => s"w$i") ++ Seq("w99", "w100")).mkString(" "))
    assert(out(1L)._2 == 10L)
    // under the cap: whitespace-normalized passthrough
    assert(out(2L) == (("a b c", 3L)))
  }

  test("truncateTokens: tailN=0 (ceil rounds head to the full cap) is head-only") {
    // maxTokens=1 → headN=1, tailN=0: must not build slice(_, -0, 0)
    val df = Seq((1L, "alpha beta gamma")).toDF("id", "text")
    val out = Curation.truncateTokens(df, "id", "text",
        maxTokens = 1, headFrac = 0.5)
      .collect().head
    assert(out.getString(1) == "alpha" && out.getLong(2) == 1L)
  }

  test("trimByQuantiles: lo=0, hi=1 keeps everything") {
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v")
    val kept = Curation.trimByQuantiles(df, "id", col("v"), 0.0, 1.0)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L))
  }

  test("dsirLogWeights: target ≡ raw ⇒ every weight is exactly zero") {
    // identical distributions make every per-bucket log-ratio 0, and the
    // exact DECIMAL sum keeps the zero exact — no float residue
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "stock market prices rose sharply today"),
      (3L, "the dog ran through the tall grass")).toDF("doc_id", "text")
    val out = Curation.dsirLogWeights(docs, docs, "doc_id", "text", buckets = 64)
      .collect()
    assert(out.length == 3)
    out.foreach(r => assert(r.getDouble(r.fieldIndex("logw")) == 0.0,
      s"doc ${r.getLong(0)} expected exact 0, got $r"))
  }

  test("dsirLogWeights: target-like docs outscore off-domain docs") {
    val target = Seq(
      (100L, "theorem proof lemma corollary induction hypothesis"),
      (101L, "proof by induction on the lemma and the theorem"),
      (102L, "the corollary follows from the main theorem proof")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "lemma proof theorem induction corollary"),   // on-domain
      (2L, "pizza recipe cheese tomato basil oven"),     // off-domain
      (3L, "the proof of the theorem uses induction")    // on-domain
    ).toDF("doc_id", "text")
    val w = Curation.dsirLogWeights(raw, target, "doc_id", "text", buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("logw"))).toMap
    assert(w(1) > w(2) && w(3) > w(2),
      s"on-domain docs must outscore the off-domain doc: $w")
    // null text carries no evidence: the doc is absent, others unchanged
    val withNull = raw.union(Seq((4L, null: String)).toDF("doc_id", "text"))
    val w2 = Curation.dsirLogWeights(withNull, target, "doc_id", "text", buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("logw"))).toMap
    assert(!w2.contains(4L) && w2 == w)
  }

  test("dsirScore: frozen-table per-row scorer ≡ dsirLogWeights bit-for-bit, on batch AND stream") {
    val target = Seq(
      (100L, "theorem proof lemma corollary induction hypothesis"),
      (101L, "proof by induction on the lemma and the theorem")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "lemma proof theorem induction corollary"),
      (2L, "pizza recipe cheese tomato basil oven"),
      (3L, "the proof of the theorem uses induction")).toDF("doc_id", "text")
    val table = Curation.dsirRatioTable(raw, target, "text", buckets = 256)
    val batch = Curation.dsirLogWeights(raw, target, "doc_id", "text", buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("logw"))).toMap
    // batch projection: exactly the shuffle-free scorer, bit-equal
    val scored = raw
      .select(col("doc_id"), Curation.dsirScore(col("text"), table, 256).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored == batch,
      s"per-row scorer must be bit-equal to the aggregate path: $scored vs $batch")
    // null text scores null (no evidence), not 0
    val nullScore = Seq((9L, null: String)).toDF("doc_id", "text")
      .select(Curation.dsirScore(col("text"), table, 256)).collect().head
    assert(nullScore.isNullAt(0))
    // the same Column runs on an unbounded frame — ingest-time scoring
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String)](11, spark, None)
    val out = input.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), Curation.dsirScore(col("text"), table, 256).as("s"))
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir-").toString
    val q = out.writeStream.format("memory").queryName("dsir_stream")
      .outputMode("append").option("checkpointLocation", dir).start()
    try {
      input.addData(Seq((1L, "lemma proof theorem induction corollary"),
        (2L, "pizza recipe cheese tomato basil oven"),
        (3L, "the proof of the theorem uses induction")))
      q.processAllAvailable()
      val got = spark.table("dsir_stream")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got == batch, s"stream scores must equal batch: $got vs $batch")
    } finally q.stop()
  }

  // ---- dpNoisedCounts ----------------------------------------------

  /** Scalar twin of the geometric draw: md5 hex prefix → 52-bit int →
    * trailing zeros of (v | 2^52). */
  private def scalarGeom(key: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(13)
    val v = java.lang.Long.parseLong(hex, 16) | 4503599627370496L
    java.lang.Long.numberOfTrailingZeros(v).toLong
  }

  test("dpNoisedCounts: noise matches the scalar md5 derivation exactly") {
    val df = Seq(("s0", "en"), ("s0", "en"), ("s0", "de"), ("s1", "en"))
      .toDF("source", "lang")
    val got = Curation.dpNoisedCounts(df, Seq("source", "lang"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.size == 3)
    for (((src, lang), (n, noise, noised)) <- got) {
      val expectN = Seq(("s0", "en") -> 2L, ("s0", "de") -> 1L,
        ("s1", "en") -> 1L).toMap.apply((src, lang))
      val expect = scalarGeom(s"graft-dp-a|$src|$lang") -
        scalarGeom(s"graft-dp-b|$src|$lang")
      assert(n == expectN)
      assert(noise == expect, s"($src,$lang): noise $noise vs $expect")
      assert(noised == n + noise)
    }
  }

  test("dpNoisedCounts: the noise is two-sided geometric with ratio 1/2") {
    // mechanism-level check over many independent groups: P(noise = 0)
    // = (1-α)/(1+α) = 1/3 and the distribution is symmetric
    val df = (0 until 20000).map(i => (s"g$i", "x")).toDF("source", "lang")
    val noises = Curation.dpNoisedCounts(df, Seq("source", "lang"))
      .select($"noise").collect().map(_.getLong(0))
    val n = noises.length.toDouble
    val p0 = noises.count(_ == 0L) / n
    assert(math.abs(p0 - 1.0 / 3.0) < 0.02, s"P(noise=0) = $p0, want ~1/3")
    val mean = noises.sum / n
    assert(math.abs(mean) < 0.05, s"mean $mean, want ~0")
    val p1 = noises.count(_ == 1L) / n
    val pm1 = noises.count(_ == -1L) / n
    // P(±1) = α(1-α)/(1+α)... = 1/6 each for α = 1/2
    assert(math.abs(p1 - 1.0 / 6.0) < 0.02 && math.abs(pm1 - 1.0 / 6.0) < 0.02,
      s"P(±1) = ($p1, $pm1), want ~1/6 each")
  }
}
