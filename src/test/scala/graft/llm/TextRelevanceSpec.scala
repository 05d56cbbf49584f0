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
}
