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

  test("evalReport: hand-computed Mann-Whitney AUC with ties, threshold at target recall") {
    // pos scores {0.9, 0.8, 0.5}, neg {0.7, 0.5, 0.3, 0.1}:
    // pairs won = 4 + 4 + (2 + 0.5 tie) = 10.5 of 12 → AUC 0.875
    val df = Seq(
      (0.9, true), (0.8, true), (0.5, true),
      (0.7, false), (0.5, false), (0.3, false), (0.1, false)
    ).toDF("s", "y")
    val r = TextClassifier.evalReport(df, col("y"), col("s"), targetRecall = 2.0 / 3.0)
      .collect().head
    assert(r.getLong(r.fieldIndex("n_pos")) == 3L && r.getLong(r.fieldIndex("n_neg")) == 4L)
    assert(r.getDouble(r.fieldIndex("auc")) == 10.5 / 12.0)
    // recall 2/3 needs 2 positives ≥ cut: highest such cut is 0.8,
    // where precision is 2/2 and achieved recall exactly 2/3
    assert(r.getDouble(r.fieldIndex("threshold")) == 0.8)
    assert(r.getDouble(r.fieldIndex("precision")) == 1.0)
    assert(r.getDouble(r.fieldIndex("recall")) == 2.0 / 3.0)
    // recall 1.0 forces the cut down to 0.5 where the tied negative
    // enters: precision 3/5
    val r2 = TextClassifier.evalReport(df, col("y"), col("s"), targetRecall = 1.0)
      .collect().head
    assert(r2.getDouble(r2.fieldIndex("threshold")) == 0.5)
    assert(r2.getDouble(r2.fieldIndex("precision")) == 0.6)
    assert(r2.getDouble(r2.fieldIndex("recall")) == 1.0)
    // degenerate sanity: perfect separation → AUC 1; inverted → AUC 0
    val sep = Seq((1.0, true), (0.9, true), (0.2, false)).toDF("s", "y")
    assert(TextClassifier.evalReport(sep, col("y"), col("s"), 1.0)
      .select("auc").as[Double].head() == 1.0)
    val inv = Seq((0.1, true), (0.9, false)).toDF("s", "y")
    assert(TextClassifier.evalReport(inv, col("y"), col("s"), 1.0)
      .select("auc").as[Double].head() == 0.0)
    // null score/label rows grade nothing
    val withNulls = df.union(Seq((Option.empty[Double], true))
      .toDF("s", "y").select(col("s").cast("double"), col("y")))
    val r3 = TextClassifier.evalReport(withNulls, col("y"), col("s"), 1.0)
      .collect().head
    assert(r3.getLong(r3.fieldIndex("n_pos")) == 3L)
  }

  test("evalReport: seeded fuzz vs the pairwise AUC definition and a scalar threshold scan") {
    val rng = new scala.util.Random(4242L)
    for (round <- 1 to 20) {
      val n = 3 + rng.nextInt(40)
      // coarse score grid so ties actually occur
      val data = Seq.fill(n)((rng.nextInt(8) / 7.0, rng.nextBoolean()))
      val pos = data.filter(_._2).map(_._1)
      val neg = data.filterNot(_._2).map(_._1)
      if (pos.nonEmpty && neg.nonEmpty) {
        val targetRecall = (1 + rng.nextInt(10)) / 10.0
        val r = TextClassifier.evalReport(
            data.toDF("s", "y"), col("y"), col("s"), targetRecall)
          .collect().head
        // pairwise Mann-Whitney definition: wins + half-ties over P·N
        val wins = (for (p <- pos; q <- neg) yield
          if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
        val aucRef = wins / (pos.size.toDouble * neg.size)
        assert(math.abs(r.getDouble(r.fieldIndex("auc")) - aucRef) < 1e-12,
          s"round $round: auc ${r.getDouble(r.fieldIndex("auc"))} != $aucRef")
        // scalar threshold scan: highest cut keeping >= ceil(recall·P) positives
        val needed = math.ceil(targetRecall * pos.size).toLong
        val tRef = data.map(_._1).distinct.sorted(Ordering[Double].reverse)
          .filter(t => pos.count(_ >= t) >= needed).headOption.get
        assert(r.getDouble(r.fieldIndex("threshold")) == tRef,
          s"round $round: threshold ${r.getDouble(r.fieldIndex("threshold"))} != $tRef")
        val tp = pos.count(_ >= tRef).toDouble
        val fp = neg.count(_ >= tRef).toDouble
        assert(r.getDouble(r.fieldIndex("precision")) == tp / (tp + fp))
        assert(r.getDouble(r.fieldIndex("recall")) == tp / pos.size)
      }
    }
  }

  test("evalReportPerGroup: per-group pairwise AUC; one-class groups emit NULL") {
    val df = Seq(
      ("a", 0.9, true), ("a", 0.5, true), ("a", 0.7, false), ("a", 0.5, false),
      ("b", 0.2, true), ("b", 0.8, false),
      ("c", 0.6, true), ("c", 0.4, true) // positives only: AUC undefined
    ).toDF("g", "s", "y")
    val out = TextClassifier.evalReportPerGroup(df, col("g"), col("y"), col("s"))
      .orderBy(col("group")).collect()
    // a: wins 2 (0.9 beats both) + 0 (0.5 < 0.7) + 0.5 (tie) = 2.5 of 4
    val a = out(0)
    assert(a.getString(0) == "a" && a.getDouble(a.fieldIndex("auc")) == 2.5 / 4.0)
    val b = out(1)
    assert(b.getString(0) == "b" && b.getDouble(b.fieldIndex("auc")) == 0.0)
    val cRow = out(2)
    assert(cRow.getString(0) == "c" && cRow.isNullAt(cRow.fieldIndex("auc")) &&
      cRow.getLong(cRow.fieldIndex("n_pos")) == 2L)
  }

  test("calibrationTable: bin edges, top-bin fold, exact per-bin rates") {
    val df = Seq(
      (0.05, false),            // bin 0
      (0.15, true), (0.19, false), // bin 1: frac_pos 0.5, mean 0.17
      (1.0, true)               // exactly 1.0 folds into bin 9, not 10
    ).toDF("s", "y")
    val out = TextClassifier.calibrationTable(df, col("y"), col("s"), bins = 10)
      .orderBy(col("bin"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (0L, 1L, 0.0, 0.05),
      (1L, 2L, 0.5, 0.17),
      (9L, 1L, 1.0, 1.0)))
  }

  test("evalReport: an input with no positives (or no negatives) reports NULL metrics, not NaN") {
    // all-negative: P = 0 must NOT set threshold to the max score
    val neg = Seq((0.9, false), (0.1, false)).toDF("s", "y")
    val r1 = TextClassifier.evalReport(neg, col("y"), col("s"), 0.9).collect()
    assert(r1.length == 1)
    assert(r1(0).getLong(0) == 0L && r1(0).getLong(1) == 2L)
    for (c <- Seq("auc", "threshold", "precision", "recall"))
      assert(r1(0).isNullAt(r1(0).fieldIndex(c)), s"$c should be NULL at P=0")
    // all-positive: N = 0 gives a real threshold/recall but a NULL auc
    val pos = Seq((0.9, true), (0.1, true)).toDF("s", "y")
    val r2 = TextClassifier.evalReport(pos, col("y"), col("s"), 1.0).collect()
    assert(r2.length == 1)
    assert(r2(0).getLong(0) == 2L && r2(0).getLong(1) == 0L)
    assert(r2(0).isNullAt(r2(0).fieldIndex("auc")))
    assert(r2(0).getDouble(r2(0).fieldIndex("threshold")) == 0.1)
    assert(r2(0).getDouble(r2(0).fieldIndex("recall")) == 1.0)
    assert(r2(0).getDouble(r2(0).fieldIndex("precision")) == 1.0)
    // empty input: still one row, zero counts, NULL metrics
    val r3 = TextClassifier.evalReport(neg.filter(col("s") > 2), col("y"),
      col("s"), 0.5).collect()
    assert(r3.length == 1 && r3(0).getLong(0) == 0L && r3(0).getLong(1) == 0L)
    assert(r3(0).isNullAt(r3(0).fieldIndex("auc")))
  }
}
