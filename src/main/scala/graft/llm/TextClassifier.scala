package graft.llm

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Combine

/** Trained text classification over hashed character-n-gram features —
  * the fastText recipe (Joulin et al. 2016, arXiv:1607.01759) that
  * production curation pipelines use for learned quality/language
  * filters (CCNet, LLaMA data prep): cheap deterministic features via
  * the hashing trick, a linear model, corpus-scale scoring as one
  * narrow ML pipeline.
  *
  * Spark-first composition, no custom training code: features are a
  * relational char-n-gram explode ([[charNGrams]], codegen'd) into
  * `ml.feature.HashingTF` (murmur3 hashing trick, deterministic), the
  * model is `ml.classification.LogisticRegression` (distributed L-BFGS —
  * each iteration is one treeAggregate over the feature vectors, the
  * textbook data-parallel training loop), and scoring is the model's
  * `transform`, a map-side matrix-vector product that scales to any
  * corpus size with zero shuffles.
  *
  * Train/test discipline rides [[Combine.hashBucket]]: membership is a
  * pure function of the document id (auditable, reproducible), so the
  * held-out metrics the correctness gate pins are a deterministic
  * function of data + hyperparameters.
  */
object TextClassifier {

  /** Lowercased character n-grams of `text` — keeps non-Latin script
    * (unlike the `[a-z']` word tokenizer), which is what makes char
    * n-grams the standard language-robust feature. */
  def charNGrams(text: Column, n: Int): Column = {
    val t = lower(text)
    transform(sequence(lit(1), greatest(length(t) - (n - 1), lit(1))),
      i => t.substr(i, lit(n)))
  }

  final case class EvalResult(trainN: Long, testN: Long,
                              testAccuracy: Double, testAuc: Double,
                              scoredTest: DataFrame,
                              coefficients: Array[Double], intercept: Double)

  /** The production apply step: score EVERY row of `df` with a trained
    * model's raw parameters — one narrow map-side pass (featurize +
    * margin), zero shuffles, no model object in any closure. Returns
    * `df` plus a `score` column (the sigmoid probability of label 1). */
  def score(df: DataFrame, grams: Column, coefficients: Array[Double],
            intercept: Double, dim: Int = 4096): DataFrame = {
    val featurize = new HashingTF()
      .setInputCol("__grams").setOutputCol("__features").setNumFeatures(dim)
    val marginUdf = udf((v: org.apache.spark.ml.linalg.Vector) => {
      var s = intercept
      v.foreachActive((i, x) => s += coefficients(i) * x)
      1.0 / (1.0 + math.exp(-s))
    })
    featurize.transform(df.withColumn("__grams", grams))
      .withColumn("score", marginUdf(col("__features")))
      .drop("__grams", "__features")
  }

  /** Train on a deterministic 80/20 hash split of `df` and evaluate on
    * the held-out 20%. `grams` is the feature token array (word tokens,
    * [[charNGrams]], or their concat — fastText uses both); `label` must
    * be 0.0/1.0. Returns held-out accuracy + AUROC and the scored test
    * frame (id, label, prediction, rawPrediction margin). */
  def trainEvaluate(df: DataFrame, idCol: String, grams: Column, label: Column,
                    dim: Int = 4096, maxIter: Int = 30)
      : EvalResult = {
    val prepped = df.select(col(idCol).as("id"),
        grams.as("grams"), label.cast("double").as("label"))
      .withColumn("bucket", Combine.hashBucket(col("id"), 5))
    val featurize = new HashingTF()
      .setInputCol("grams").setOutputCol("features").setNumFeatures(dim)
    val train = featurize.transform(prepped.filter(col("bucket") < 4)).cache()
    val test = featurize.transform(prepped.filter(col("bucket") === 4)).cache()
    try {
      val fitted = new LogisticRegression()
        .setMaxIter(maxIter).setRegParam(1e-4)
        .setFeaturesCol("features").setLabelCol("label")
        .fit(train)
      // Score with the raw coefficients, not model.transform: the fitted
      // model carries its training summary, the summary pins the
      // SparkSession (whose ObservationManager is not serializable), and
      // model.copy() re-attaches the summary — so the model must never
      // ride a task closure. The linear margin w·x + b IS the model's
      // rawPrediction; margin > 0 ≡ probability > 0.5.
      val coefs = fitted.coefficients.toArray
      val intercept = fitted.intercept
      val marginUdf = udf((v: org.apache.spark.ml.linalg.Vector) => {
        var s = intercept
        v.foreachActive((i, x) => s += coefs(i) * x)
        s
      })
      val scored = test.withColumn("rawPrediction", marginUdf(col("features")))
        .select(col("id"), col("label"),
          when(col("rawPrediction") > 0d, 1.0).otherwise(0.0).as("prediction"),
          col("rawPrediction"))
      val auc = new BinaryClassificationEvaluator()
        .setLabelCol("label").setRawPredictionCol("rawPrediction")
        .setMetricName("areaUnderROC")
        .evaluate(scored)
      val Row2 = scored.agg(
        count(lit(1)).as("n"),
        sum(when(col("prediction") === col("label"), 1L).otherwise(0L)).as("hit"))
        .collect()(0)
      val (testN, hits) = (Row2.getLong(0), Row2.getLong(1))
      EvalResult(train.count(), testN,
        if (testN == 0) 0.0 else hits.toDouble / testN, auc, scored,
        coefs, intercept)
    } finally {
      train.unpersist(); test.unpersist()
    }
  }

  /** Exact, engine-replayable binary-classifier evaluation — the "is my
    * quality filter any good, and where do I cut" report a curation
    * pipeline needs before deploying a threshold:
    *
    *  - `auc`: exact Mann-Whitney AUC (ties get the standard half
    *    credit). Computed WITHOUT a global rank: scores aggregate to a
    *    distinct-score table, [[Combine.prefixSum]] supplies cumulative
    *    negative counts (range-partitioned — never a single-partition
    *    window over the corpus), and 2·Σ np·(2·cumNegBelow + nn) stays
    *    in exact integer arithmetic until one final division.
    *  - `threshold`: the highest score cut achieving `targetRecall` —
    *    max s with #(positives ≥ s) ≥ ⌈targetRecall·P⌉.
    *  - `precision`/`recall`: achieved at that threshold (≥-inclusive).
    *
    * Output: one row (n_pos, n_neg, auc, threshold, precision, recall).
    * Rows with NULL score or label are excluded (they grade nothing).
    * `ml`'s BinaryClassificationEvaluator computes AUC by approximate
    * curve sampling; this is the exact relational form, and every number
    * replays in SQL (window cumsum over distinct scores). */
  def evalReport(df: DataFrame, label: Column, score: Column,
                 targetRecall: Double): DataFrame = {
    require(targetRecall > 0.0 && targetRecall <= 1.0,
      s"targetRecall must be in (0, 1], got $targetRecall")
    val base = df.filter(score.isNotNull && label.isNotNull)
      .select(score.cast("double").as("s"),
        when(label, 1L).otherwise(0L).as("y"))
    val byScore = base.groupBy(col("s")).agg(
      sum(col("y")).as("np"),
      (count(lit(1)) - sum(col("y"))).as("nn"))
    // inclusive cumsums over ascending score; strictly-below = cum − own
    val c1 = Combine.prefixSum(byScore, Seq(col("s").asc), col("nn"), "cum_nn")
    val c = Combine.prefixSum(c1, Seq(col("s").asc), col("np"), "cum_np")
    val totals = byScore.agg(
      coalesce(sum(col("np")), lit(0L)).as("P"),
      coalesce(sum(col("nn")), lit(0L)).as("N"))
    // 2·(AUC numerator): Σ np·(2·negBelow + nn) — exact longs throughout
    val auc2 = c.agg(coalesce(
      sum(col("np") * (lit(2L) * (col("cum_nn") - col("nn")) + col("nn"))),
      lit(0L)).as("num2"))
    val withTotals = c.crossJoin(broadcast(totals))
      .withColumn("pos_at_or_above", col("P") - (col("cum_np") - col("np")))
      .withColumn("neg_at_or_above", col("N") - (col("cum_nn") - col("nn")))
    val need = ceil(lit(targetRecall) * col("P"))
    // P = 0 makes need = 0, which would pass EVERY row and set the
    // threshold to the global max score while auc/recall divide by
    // zero into NaN — guard the missing-class cases like
    // [[evalReportPerGroup]] does: one row, NULL metrics. The
    // at-threshold counts ride the same aggregation via max_by
    // (scores are distinct after the byScore collapse, so max_by is
    // deterministic; on an empty cut it is NULL, not a dropped row).
    val cut = withTotals.filter(col("pos_at_or_above") >= need && col("P") > 0)
      .agg(max(col("s")).as("threshold"),
        max_by(col("pos_at_or_above"), col("s")).as("pos_at_or_above"),
        max_by(col("neg_at_or_above"), col("s")).as("neg_at_or_above"))
    broadcast(totals).crossJoin(broadcast(auc2)).crossJoin(broadcast(cut))
      .select(
        col("P").as("n_pos"), col("N").as("n_neg"),
        when(col("P") > 0 && col("N") > 0,
          col("num2").cast("double") /
            (lit(2.0) * col("P") * col("N"))).as("auc"),
        col("threshold"),
        (col("pos_at_or_above").cast("double") /
          (col("pos_at_or_above") + col("neg_at_or_above"))).as("precision"),
        (col("pos_at_or_above").cast("double") / col("P")).as("recall"))
  }

  /** Per-group exact AUC — the bias audit: does the filter score
    * separate positives equally well across sources/languages/domains?
    * A filter with AUC 0.9 overall and 0.6 on one source silently
    * under-curates that source. Same exact Mann-Whitney arithmetic as
    * [[evalReport]], but cumulative counts ride a window PARTITIONED BY
    * the group (scale-safe: each partition holds one group's distinct
    * scores, never the corpus). Groups missing a class emit a NULL auc
    * rather than disappearing — absence would read as "fine".
    * Output: (group, n_pos, n_neg, auc). */
  def evalReportPerGroup(df: DataFrame, group: Column, label: Column,
                         score: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(score.isNotNull && label.isNotNull && group.isNotNull)
      .select(group.as("g"), score.cast("double").as("s"),
        when(label, 1L).otherwise(0L).as("y"))
    val byScore = base.groupBy(col("g"), col("s")).agg(
      sum(col("y")).as("np"),
      (count(lit(1)) - sum(col("y"))).as("nn"))
    val w = Window.partitionBy(col("g")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byScore
      .withColumn("cum_nn", sum(col("nn")).over(w))
      .groupBy(col("g"))
      .agg(
        sum(col("np")).as("n_pos"),
        sum(col("nn")).as("n_neg"),
        sum(col("np") * (lit(2L) * (col("cum_nn") - col("nn")) + col("nn")))
          .as("num2"))
      .select(col("g").as("group"), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          col("num2").cast("double") / (lit(2.0) * col("n_pos") * col("n_neg")))
          .as("auc"))
  }

  /** Calibration (reliability-diagram) table: scores bucket into `bins`
    * equal-width bins over [0, 1] (scores at exactly 1.0 fold into the
    * top bin); each bin reports its count, observed positive rate, and
    * mean score. A well-calibrated filter has frac_pos ≈ mean_score per
    * bin; the gap drives ECE. One groupBy — no window, no sort. The
    * mean goes through a 9-dp DECIMAL sum (hash-parity rule), so every
    * number is an order-free pure function of the data. Output:
    * (bin, n, frac_pos, mean_score), one row per NON-EMPTY bin. */
  def calibrationTable(df: DataFrame, label: Column, score: Column,
                       bins: Int = 10): DataFrame = {
    require(bins > 0, "bins must be positive")
    import org.apache.spark.sql.types.DecimalType
    val base = df.filter(score.isNotNull && label.isNotNull)
      .select(score.cast("double").as("s"),
        when(label, 1L).otherwise(0L).as("y"))
    base
      .withColumn("bin",
        least(floor(col("s") * bins).cast("long"), lit(bins - 1L)))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        (sum(col("y")).cast("double") / count(lit(1))).as("frac_pos"),
        (sum(round(col("s"), 9).cast(DecimalType(28, 12))).cast("double") /
          count(lit(1))).as("mean_score"))
  }
}
