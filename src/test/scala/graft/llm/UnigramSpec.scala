package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unigram trainer: relational ≡ scalar reference, Viterbi optimality by
  * brute force, tie rule, coverage, pruning arithmetic. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private val fixtureWords = Seq(
    ("internationalization", 3L), ("international", 7L), ("nation", 20L),
    ("nationalism", 4L), ("intern", 9L), ("internal", 6L), ("ion", 15L),
    ("melon", 5L), ("lemon", 5L), ("me", 11L), ("on", 13L), ("in", 17L))

  test("relational train equals the scalar reference piece-for-piece") {
    val df = fixtureWords.toDF("word", "freq")
    val got = Unigram.train(df, vocabSize = 30, rounds = 3,
      maxPieceLen = 5, maxSeed = 200,
      localThreshold = 0) // force the relational path — the cutover would route to the scalar reference itself
    val want = Unigram.scalarTrain(fixtureWords, vocabSize = 30, rounds = 3,
      maxPieceLen = 5, maxSeed = 200)
    assert(got.map(p => (p.piece, p.cnt)) === want.map(p => (p.piece, p.cnt)))
    got.zip(want).foreach { case (g, w) =>
      assert(g.logp == w.logp, s"logp drift on ${g.piece}")
    }
  }

  test("viterbi is optimal and breaks ties toward the longer last piece") {
    // brute force over all segmentations of short words
    def segs(w: String, maxLen: Int): Seq[List[String]] =
      if (w.isEmpty) Seq(Nil)
      else (1 to math.min(maxLen, w.length)).flatMap(l =>
        segs(w.drop(l), maxLen).map(rest => w.take(l) :: rest))
    val logp = Map("a" -> -2.0, "b" -> -2.5, "ab" -> -4.5, "ba" -> -3.0,
      "aba" -> -6.0, "bab" -> -5.5, "abab" -> -8.0)
    for (w <- Seq("a", "ab", "aba", "abab", "ababa", "babab", "aabba")) {
      if (w.forall(c => logp.contains(c.toString))) {
        val (seg, score) = Unigram.scalarViterbi(w, logp, 4)
        val all = segs(w, 4).filter(_.forall(logp.contains))
        val bestScore = all.map(_.map(logp).sum).max
        assert(score == bestScore, s"$w: $score vs brute $bestScore")
        assert(seg.mkString == w)
        // tie rule: among max-score segmentations, viterbi's pick has the
        // longest last piece at every suffix decision — check the final one
        val winners = all.filter(_.map(logp).sum == bestScore)
        assert(winners.map(_.last.length).max == seg.last.length,
          s"$w: tie not broken toward longer last piece ($seg vs $winners)")
      }
    }
    // "ab"+"a" vs "a"+"ba": -4.5-2.0 = -6.5 vs -2.0-3.0 = -5.0 → no tie;
    // construct an exact tie: "ab"(-4.5) vs "a"+"b"(-4.5) on word "ab"
    val (tieSeg, _) = Unigram.scalarViterbi("ab", logp, 4)
    assert(tieSeg === List("ab"))
  }

  test("native expression agrees with scalar viterbi on the fixture") {
    val vocab = Unigram.scalarTrain(fixtureWords, 30, 3, 5, 200)
    val logp = vocab.map(p => p.piece -> p.logp).toMap
    val df = fixtureWords.toDF("word", "freq")
      .select(col("word"), Unigram.segment(col("word"), vocab, 5).as("s"))
      .select(col("word"), col("s.seg"), col("s.vscore"), col("s.gscore"),
        col("s.cscore"))
    df.collect().foreach { r =>
      val w = r.getString(0)
      val (seg, score) = Unigram.scalarViterbi(w, logp, 5)
      assert(r.getSeq[String](1).toList === seg, s"seg mismatch on $w")
      assert(r.getDouble(2) == score, s"score mismatch on $w")
      assert(r.getDouble(2) >= r.getDouble(3), s"greedy beat viterbi on $w")
      assert(r.getDouble(2) >= r.getDouble(4), s"chars beat viterbi on $w")
    }
  }

  test("coverage: every corpus word stays segmentable after pruning") {
    // tiny vocabSize forces aggressive pruning; chars must survive
    val vocab = Unigram.scalarTrain(fixtureWords, vocabSize = 2,
      rounds = 3, maxPieceLen = 5, maxSeed = 200)
    val chars = fixtureWords.flatMap(_._1.toSeq).toSet.map((c: Char) => c.toString)
    assert(chars.subsetOf(vocab.map(_.piece).toSet))
    val logp = vocab.map(p => p.piece -> p.logp).toMap
    fixtureWords.foreach { case (w, _) =>
      val (seg, score) = Unigram.scalarViterbi(w, logp, 5)
      assert(seg.mkString == w && score != graft.functions.UnigramViterbi.Unsegmentable)
    }
  }

  test("out-of-vocabulary characters fall back to the documented sentinel") {
    val (seg, score) = Unigram.scalarViterbi("axb", Map("a" -> -1.0, "b" -> -1.0), 3)
    assert(score == graft.functions.UnigramViterbi.Unsegmentable)
    assert(seg === List("a", "x", "b"))
    val row = Seq("axb").toDF("word")
      .select(Unigram.segment(col("word"),
        Seq(Unigram.Piece("a", 1, -1.0), Unigram.Piece("b", 1, -1.0)), 3).as("s"))
      .select(col("s.seg"), col("s.vscore")).head
    assert(row.getSeq[String](0).toList === List("a", "x", "b"))
    assert(row.getDouble(1) == graft.functions.UnigramViterbi.Unsegmentable)
  }

  test("pruning keeps vocabSize + chars with deterministic order") {
    val vocab = Unigram.scalarTrain(fixtureWords, vocabSize = 10,
      rounds = 2, maxPieceLen = 4, maxSeed = 100)
    val chars = fixtureWords.flatMap(_._1.toSeq).toSet.size
    assert(vocab.size <= 10 + chars)
    assert(vocab.map(_.piece) == vocab.map(_.piece).sorted)
  }
}
