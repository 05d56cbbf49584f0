package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("greedy merge is non-overlapping left-to-right: aaa -> [aa, a], aaaa -> [aa, aa]") {
    val df = Seq("aaa", "aaaa", "ababa").toDF("w")
      .select(col("w"), Bpe.mergeOnce(
        transform(sequence(lit(1), length(col("w"))), i => col("w").substr(i, lit(1))),
        "a", "a").as("m"))
      .as[(String, Seq[String])].collect().toMap
    assert(df("aaa") == Seq("aa", "a"))
    assert(df("aaaa") == Seq("aa", "aa"))
    assert(df("ababa") == Seq("a", "b", "a", "b", "a"))
    // and the scalar reference agrees
    assert(Bpe.scalarMergeOnce(List("a", "a", "a"), "a", "a") ==
      (List("aa", "a"), 2L, 1L))
    assert(Bpe.scalarMergeOnce(List("a", "a", "a", "a"), "a", "a") ==
      (List("aa", "aa"), 3L, 2L))
  }

  test("relational trainer reproduces the scalar reference trajectory (classic fixture)") {
    // the Sennrich-paper-style fixture: frequent 'ug'/'un' units
    val words = Seq(("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L),
      ("hugs", 5L))
    val expected = Bpe.scalarTrain(words, numMerges = 8)
    val got = Bpe.train(words.toDF("word", "freq"), numMerges = 8,
      localThreshold = 0) // force the relational path — the cutover would route to the scalar reference itself
    assert(got == expected)
    // (u,g)=20 beats (p,u)=17 and (u,n)=16; with ug fused, (u,n)=16 wins next
    assert(expected.take(2).map(m => m.left + m.right) == Seq("ug", "un"))
  }

  test("relational trainer matches scalar reference on pseudo-random fixtures incl. ties and repeats") {
    val rnd = new scala.util.Random(42)
    (0 until 2).foreach { trial =>
      val words = (0 until 30).map { _ =>
        val len = 1 + rnd.nextInt(6)
        (Seq.fill(len)(('a' + rnd.nextInt(3)).toChar).mkString, // aaa/aab/... repeats force overlap handling
          1L + rnd.nextInt(5))
      }.distinct
      val expected = Bpe.scalarTrain(words, numMerges = 6)
      val got = Bpe.train(words.toDF("word", "freq"), numMerges = 6,
        localThreshold = 0)
      assert(got == expected, s"trial $trial diverged:\n got=$got\n exp=$expected")
    }
  }

  test("applyMerges encodes new text with the learned vocab (rank-order application)") {
    val words = Seq(("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L), ("hugs", 5L))
    val merges = Bpe.scalarTrain(words, numMerges = 4).map(m => (m.left, m.right))
    val enc = Seq("hugpun").toDF("w")
      .select(Bpe.applyMerges(
        transform(sequence(lit(1), length(col("w"))), i => col("w").substr(i, lit(1))),
        merges).as("syms"))
      .as[Seq[String]].collect().head
    // scalar application of the same merges in order
    var syms = "hugpun".map(_.toString).toList
    merges.foreach { case (l, r) => syms = Bpe.scalarMergeOnce(syms, l, r)._1 }
    assert(enc == syms)
  }

  test("encodeWords survives long merge lists (let-bound linear trees) and matches scalar") {
    val words = Seq(("banana", 3L), ("bandana", 2L), ("ananas", 4L), ("cabana", 1L))
    val merges = Bpe.scalarTrain(words, numMerges = 12).map(m => (m.left, m.right))
    assert(merges.length > 5, "fixture too small to exercise deep chaining")
    val got = Bpe.encodeWords(words.toDF("word", "freq"), merges)
      .select("word", "syms").as[(String, Seq[String])].collect().toMap
    words.foreach { case (w, _) =>
      var syms = w.map(_.toString).toList
      merges.foreach { case (l, r) => syms = Bpe.scalarMergeOnce(syms, l, r)._1 }
      assert(got(w) == syms, s"word $w: ${got(w)} vs $syms")
    }
  }

  test("replay re-derives the trainer's per-rank trajectory (the gate's independent leg)") {
    val words = Seq(("banana", 3L), ("bandana", 2L), ("ananas", 4L))
    val merges = Bpe.train(words.toDF("word", "freq"), numMerges = 5,
      localThreshold = 0)
    val pairs = merges.map(m => (m.left, m.right))
    val weighted = words.flatMap { case (w, f) =>
      Bpe.replay(w, pairs).map { case (rank, pos, app) => (rank, pos * f, app * f) }
    }.groupBy(_._1).view
      .mapValues(v => (v.map(_._2).sum, v.map(_._3).sum)).toMap
    merges.foreach { m =>
      assert(weighted(m.rank) == ((m.pairCount, m.applied)),
        s"rank ${m.rank}: replay=${weighted(m.rank)} trainer=(${m.pairCount},${m.applied})")
    }
  }
}
