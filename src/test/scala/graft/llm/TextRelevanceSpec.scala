package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextRelevanceSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark streams data data data"),
    (2L, "spark joins tables"),
    (3L, "completely unrelated words here")
  ).toDF("doc_id", "text")

  test("termCounts: per-doc term frequencies") {
    val tc = TextRelevance.termCounts(docs, "doc_id", "text")
    assert(tc.filter($"doc_id" === 1 && $"term" === "data")
      .head().getAs[Long]("tf") == 3L)
    assert(tc.filter($"doc_id" === 2).count() == 3L)
  }

  test("tfIdf: corpus-wide terms weigh less than rare ones") {
    val w = TextRelevance.tfIdf(docs, "doc_id", "text")
      .filter($"doc_id" === 1)
      .select($"term", $"tfidf").as[(String, Double)].collect().toMap
    // 'data' (tf=3, df=1) must dominate 'spark' (tf=1, df=2)
    assert(w("data") > w("spark"))
    assert(w.values.forall(_ > 0.0))
  }

  test("bm25: matching docs scored, higher tf wins, non-matching absent") {
    val s = TextRelevance.bm25(docs, "doc_id", "text", Seq("data", "spark"))
      .select($"doc_id", $"score", $"n_matched")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(s.keySet == Set(1L, 2L))       // doc 3 matches nothing
    assert(s(1L)._2 == 2L && s(2L)._2 == 1L)
    assert(s(1L)._1 > s(2L)._1)           // tf(data)=3 + spark beats spark alone
  }

  test("unigram log-perplexity: vocabulary outliers score higher") {
    val corpus = Seq(
      (1L, "spark data spark data spark data"),
      (2L, "spark data spark data"),
      (3L, "zq xv qj wk")  // gibberish: every token is rare
    ).toDF("doc_id", "text")
    val s = TextRelevance.unigramLogPerplexity(corpus, "doc_id", "text")
      .as[(Long, Option[Double])].collect().map(r => r._1 -> r._2.get).toMap
    assert(s(3L) > s(1L) && s(3L) > s(2L))
    assert(s.values.forall(_ > 0.0))
  }

  test("bm25 requires query terms") {
    intercept[IllegalArgumentException] {
      TextRelevance.bm25(docs, "doc_id", "text", Seq.empty)
    }
  }

  test("bigramPairs: consecutive pairs, short docs emit nothing") {
    val d = Seq((1L, "a b c b c"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val bg = TextRelevance.bigramPairs(d, "doc_id", "text")
      .as[(Long, String, String)].collect().toSeq
    assert(bg.filter(_._1 == 1L).map(p => (p._2, p._3)) ==
      Seq(("a", "b"), ("b", "c"), ("c", "b"), ("b", "c")))
    assert(!bg.exists(_._1 != 1L))
  }

  test("bigram LM cross-scoring: reference-like text beats shuffled and gibberish") {
    val ref = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox runs over the lazy cat"),
      (4L, "the lazy dog sleeps while the quick fox jumps"))
      .toDF("doc_id", "text")
    val tgt = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // in-domain
      (3L, "dog lazy the over jumps fox brown quick the"), // same words, broken order
      (5L, "zq xv qj wk mn bp"),                           // gibberish
      (7L, "x"))                                           // < 2 tokens → null
      .toDF("doc_id", "text")
    val s = TextRelevance.bigramLogPerplexity(ref, tgt, "doc_id", "text")
      .as[(Long, Option[Double])].collect().toMap
    assert(s(1L).get < s(3L).get, "bigram order must matter")
    assert(s(3L).get < s(5L).get, "known words must beat unknown words")
    assert(s(7L).isEmpty, "sub-bigram docs score null")
    assert(s(1L).get > 0.0)
  }

  test("invertedIndex: positions, tf, doc_freq, and the maxDf stopword cap") {
    val idx = TextRelevance.invertedIndex(docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getSeq[Long](4)))).toMap
    // "data" occurs in doc 1 at 1-based token positions 3,4,5
    assert(idx(("data", 1L)) === ((1L, 3L, Seq(3L, 4L, 5L))))
    // "spark" occurs in two docs, position 1 in each
    assert(idx(("spark", 1L)) === ((2L, 1L, Seq(1L))))
    assert(idx(("spark", 2L)) === ((2L, 1L, Seq(1L))))
    // every posting's tf equals its position count
    assert(idx.values.forall { case (_, tf, ps) => tf == ps.length })
    // maxDf=1 drops the df-2 term ("spark"), keeps everything else
    val capped = TextRelevance.invertedIndex(docs, "doc_id", "text", maxDf = 1L)
      .select("term").distinct().as[String].collect().toSet
    assert(!capped.contains("spark"))
    assert(capped.contains("data") && capped.contains("tables"))
    // relative cap: df=2 over 3 docs fails frac 0.5 (2 > 1.5), passes 0.7
    val frac = TextRelevance.invertedIndex(docs, "doc_id", "text", maxDfFrac = 0.5)
      .select("term").distinct().as[String].collect().toSet
    assert(!frac.contains("spark") && frac.contains("data"))
    val loose = TextRelevance.invertedIndex(docs, "doc_id", "text", maxDfFrac = 0.7)
      .select("term").distinct().as[String].collect().toSet
    assert(loose.contains("spark"))
  }

  test("phraseSearch: exact sequences only, repeated terms, overlaps, case") {
    val d = Seq(
      (1L, "big data data data pipeline"),
      (2L, "data pipeline Data Data"),   // case-insensitive match at 4
      (3L, "data and data again"),       // "data data" never consecutive
      (4L, "no match at all")
    ).toDF("doc_id", "text")
    // repeated-term phrase: "data data" — overlapping occurrences count
    val rep = TextRelevance.phraseSearch(d, "doc_id", "text", Seq("data", "data"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rep(1L) === ((2L, 2L)))  // starts at positions 2 and 3 (overlap)
    assert(rep(2L) === ((1L, 3L)))
    assert(!rep.contains(3L) && !rep.contains(4L))
    // three-term phrase spanning the repeats: doc 1 matches at start 3
    // (data@3 data@4 pipeline@5); doc 2's "data pipeline" lacks the
    // double-data prefix
    val tri = TextRelevance.phraseSearch(d, "doc_id", "text",
      Seq("data", "data", "pipeline"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(tri == Seq((1L, 1L, 3L)))
    val tri2 = TextRelevance.phraseSearch(d, "doc_id", "text",
      Seq("data", "data", "data"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(tri2 == Seq((1L, 1L, 2L)))
    // single-term phrase degenerates to term lookup
    val one = TextRelevance.phraseSearch(d, "doc_id", "text", Seq("pipeline"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(one(1L) === ((1L, 5L)) && one(2L) === ((1L, 2L)))
  }
}
