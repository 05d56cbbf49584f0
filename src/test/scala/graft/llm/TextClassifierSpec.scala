package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("charNGrams keeps non-Latin script and lowercases") {
    val grams = Seq("中文Ab").toDF("t")
      .select(TextClassifier.charNGrams(col("t"), 3)).as[Seq[String]]
      .collect().head
    assert(grams == Seq("中文a", "文ab"))
    // shorter-than-n text still yields one (truncated) gram, not an error
    val short = Seq("ab").toDF("t")
      .select(TextClassifier.charNGrams(col("t"), 3)).as[Seq[String]]
      .collect().head
    assert(short == Seq("ab"))
  }

  private def tokens(c: org.apache.spark.sql.Column) =
    graft.functions.TextFunctions.tokens(c)

  private def labelled = {
    val famA = Seq("join", "merge", "hash", "group")
    val famB = Seq("scan", "filter", "sort", "order")
    def famCount(fam: Seq[String]) = size(filter(
      tokens(col("text")), t => t.isInCollection(fam)))
    spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("label_b", (famCount(famA) > famCount(famB)).cast("double"))
  }

  test("learns the planted token-family target with strong held-out metrics") {
    // the fixture's lang tag is label noise (identical word soup per
    // language; measured AUC ≈ 0.59) — the gate target is content-derived
    val docs = labelled
    val res = TextClassifier.trainEvaluate(docs, "doc_id",
      tokens(col("text")), col("label_b"))
    info(f"heldout acc=${res.testAccuracy}%.3f auc=${res.testAuc}%.3f " +
      s"train=${res.trainN} test=${res.testN}")
    assert(res.trainN + res.testN == docs.count())
    assert(res.testAccuracy >= 0.9,
      f"held-out accuracy ${res.testAccuracy}%.3f below floor")
    assert(res.testAuc >= 0.95, f"held-out AUC ${res.testAuc}%.3f below floor")
  }

  test("corpus scoring agrees with held-out predictions and separates the classes") {
    val docs = labelled
    val res = TextClassifier.trainEvaluate(docs, "doc_id",
      tokens(col("text")), col("label_b"))
    val scored = TextClassifier.score(docs, tokens(col("text")),
      res.coefficients, res.intercept)
    assert(scored.count() == docs.count())
    // score > 0.5 must reproduce the held-out predictions exactly (same
    // margin arithmetic, sigmoid is monotone)
    val joined = scored.select(col("doc_id").as("id"),
        (col("score") > 0.5).cast("double").as("p2"))
      .join(res.scoredTest.select(col("id"), col("prediction")), Seq("id"))
    assert(joined.filter(col("p2") =!= col("prediction")).count() == 0)
    // and the learned scores separate the planted classes on the corpus
    val gap = scored.groupBy(col("label_b"))
      .agg(avg(col("score")).as("m")).orderBy(col("label_b"))
      .select("m").as[Double].collect()
    assert(gap(1) - gap(0) > 0.5, s"mean-score gap too small: ${gap.toSeq}")
  }

  test("training is deterministic: two runs give identical metrics and predictions") {
    def run() = TextClassifier.trainEvaluate(labelled, "doc_id",
      tokens(col("text")), col("label_b"), maxIter = 10)
    val (a, b) = (run(), run())
    assert(a.testAccuracy == b.testAccuracy && a.testAuc == b.testAuc)
    val pa = a.scoredTest.select("id", "prediction").as[(Long, Double)].collect().sorted.toSeq
    val pb = b.scoredTest.select("id", "prediction").as[(Long, Double)].collect().sorted.toSeq
    assert(pa == pb)
  }
}
