package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Combine

/** Corpus-curation operators: rule-based document filtering and
  * budget-bounded selection — the final "what actually goes into the
  * training run" stage of an LLM data pipeline (SURVEY.md §2.9). The
  * reference SDK has no counterpart; nearest primitives are Filter and
  * Top (SURVEY.md §2.1/§2.3).
  *
  * Scale posture: [[gopherQualityFlags]] is pure Column arithmetic (one
  * scan, codegen, no shuffle); [[selectByTokenBudget]] rides on
  * [[Combine.prefixSum]] — a range-partitioned distributed cumulative
  * sum, never a single-partition window.
  */
object Curation {

  /** Gopher-style quality rules (Rae et al. 2021, "Scaling Language
    * Models", appendix A1.1): per-document boolean flags, one column per
    * rule, plus `keep` = AND of all. Flags rather than a filter so the
    * audit view ("why was this doc dropped") is first-class.
    *
    *  - `f_words`:     minWords ≤ whitespace word count ≤ maxWords
    *  - `f_word_len`:  3 ≤ mean word length ≤ 10
    *  - `f_symbols`:   ('#' + '…') per word ≤ 0.1
    *  - `f_alpha`:     ≥ 80% of words contain a letter
    *  - `f_stopwords`: ≥ 2 distinct stopwords from the common-word list
    *  - `f_bullets`:   < 90% of lines start with a bullet, and < 30% end
    *                   with an ellipsis
    *
    * The decision logic is deterministic and engine-replayable (the
    * oracle replays every rule in SQL); the hot path runs as ONE native
    * Expression ([[graft.functions.ShingleExprs.GopherFlags]], three
    * byte scans) because the Column-combinator form evaluated the
    * whitespace-words array ~4x and each flag twice — byte-for-byte
    * parity with the inlined Column reference is asserted in
    * CurationSpec. The struct is materialized in its own projection so
    * the expression runs once per row (CollapseProject keeps non-cheap
    * multi-referenced aliases un-inlined). */
  def gopherQualityFlags(df: DataFrame, idCol: String, textCol: String,
                         minWords: Int = 50, maxWords: Int = 100000): DataFrame =
    df.select(col(idCol),
        graft.functions.ShingleExprs.gopherFlags(col(textCol), minWords, maxWords)
          .as("__g"))
      .select(
        col(idCol),
        col("__g.n_words").as("n_words"),
        col("__g.f_words").as("f_words"),
        col("__g.f_word_len").as("f_word_len"),
        col("__g.f_symbols").as("f_symbols"),
        col("__g.f_alpha").as("f_alpha"),
        col("__g.f_stopwords").as("f_stopwords"),
        col("__g.f_bullets").as("f_bullets"),
        col("__g.keep").as("keep"))

  /** Curation decision trace — the observability inverse of the drop
    * pipeline: instead of filtering documents away, label EVERY
    * document with the first stage that would drop it (`gopher` →
    * `dedup` → `trim`) or `kept`. The funnel report this feeds answers
    * the question every training-data pipeline gets asked — "where did
    * my documents go?" — per source, with numbers an auditor can
    * recompute (all three stage decisions are deterministic functions
    * of the corpus). Same per-stage plans as the filtering pipeline;
    * the only addition is three left joins of id-sized frames. */
  def pipelineFunnel(docs: DataFrame, idCol: String, textCol: String,
                     lengthCol: Column, minWords: Int = 50,
                     lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    val flags = gopherQualityFlags(docs, idCol, textCol, minWords)
      .select(col(idCol), col("keep"))
    val kept = docs.join(flags.filter(col("keep")).select(col(idCol)), Seq(idCol))
    val keepers = Dedup.exactByKey(kept, idCol,
        TextFunctions.fingerprintPortable(col(textCol)))
      .select(col("keeper").as(idCol), lit(true).as("__kp"))
    val deduped = kept.join(keepers.select(col(idCol)), Seq(idCol))
    val trimmed = trimByQuantiles(deduped, idCol, lengthCol, lo, hi)
      .select(col(idCol), lit(true).as("__tr"))
    docs
      .join(flags, Seq(idCol), "left")
      .join(keepers, Seq(idCol), "left")
      .join(trimmed, Seq(idCol), "left")
      .withColumn("stage",
        when(!col("keep"), "gopher")
          .when(col("__kp").isNull, "dedup")
          .when(col("__tr").isNull, "trim")
          .otherwise("kept"))
      .drop("keep", "__kp", "__tr")
  }

  /** Budget-bounded greedy selection: take documents in descending
    * `score` order (ties by ascending id) until the token budget is
    * spent — "best docs first until the run's token budget is full", the
    * standard curation step between scoring and training. A document is
    * selected iff the budget is not yet exhausted when its turn comes
    * (its exclusive prefix sum < budget), so the result overshoots by at
    * most one document and is a pure function of (score, id, tokens).
    *
    * The global order runs through [[Combine.prefixSum]] — a
    * range-partitioned cumulative sum, NOT an unpartitioned window: at
    * corpus scale the sort stays distributed and no task sees more than
    * its range partition. Output: (id, score, tokens, cum_tokens),
    * cum_tokens inclusive. */
  def selectByTokenBudget(df: DataFrame, idCol: String, score: Column,
                          tokens: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val scored = df.select(col(idCol), score.as("score"),
      tokens.cast("long").as("tokens"))
    Combine.prefixSum(scored, Seq(col("score").desc, col(idCol).asc),
        col("tokens"), "cum_tokens")
      .filter(col("cum_tokens") - col("tokens") < budget)
  }

  /** Quantile outlier trim: keep rows whose `value` lies within the
    * corpus's [lo, hi] quantile band — the standard "drop freakishly
    * short/long documents" curation pass. Bounds are EXACT interpolated
    * percentiles (`percentile`, the (n−1)·q linear-interpolation
    * definition both Spark and DuckDB's quantile_cont implement), computed
    * in one aggregation and attached via a 1-row broadcast, so the filter
    * itself is a codegen'd scan predicate.
    *
    * Scale note: exact percentile buffers per-value counts on the final
    * aggregator, so it is the right tool when `value` has a bounded
    * domain (document lengths, token counts). For unbounded/continuous
    * domains at corpus scale, swap in `percentile_approx` — the plan
    * shape (1-row broadcast + scan filter) is unchanged; the bound is
    * then engine-specific and leaves the oracle-checkable set. */
  def trimByQuantiles(df: DataFrame, idCol: String, value: Column,
                      lo: Double, hi: Double): DataFrame = {
    require(0.0 <= lo && lo <= hi && hi <= 1.0, "need 0 <= lo <= hi <= 1")
    val bounds = df.agg(
      percentile(value, lit(lo)).as("__lo"),
      percentile(value, lit(hi)).as("__hi"))
    df.select(col(idCol), value.as("value"))
      .crossJoin(broadcast(bounds))
      .filter(col("value") >= col("__lo") && col("value") <= col("__hi"))
      .select(col(idCol), col("value"))
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    * arXiv:2302.03169): score every raw document by its log importance
    * weight log p̂_target(x) − log p̂_raw(x) under hashed-n-gram bag
    * models, so downstream selection (top-k, or ∝-weight sampling via
    * [[Combine.weightedSampleByHash]]) shifts the raw corpus toward the
    * target domain. Features are the word unigrams + bigrams
    * ([[TextFunctions.tokens]] / [[graft.functions.ShingleExprs.NgramStrings]]
    * with the space-joined convention), hashed into `buckets` via the
    * engine-portable md5 bucket ([[Combine.hashBucket]]); each side's
    * distribution is the Laplace-smoothed bucket frequency
    * (count+1)/(total+buckets); a doc's weight is
    * Σ_b c_doc[b]·(ln p̂_t[b] − ln p̂_r[b]).
    *
    * Scale posture: one (doc, bucket) aggregation over the raw corpus
    * (map-side partials) feeds both the per-doc feature counts and the
    * raw bucket totals; the target corpus aggregates straight to its
    * `buckets`-row total table. The per-bucket log-ratio table is
    * `buckets` rows — broadcast — so scoring is one shuffle on
    * (doc, bucket) plus one on doc, independent of corpus size. The
    * log-ratios are quantized to 9 dp and summed as exact DECIMALs
    * (BASELINE.md hash-parity rule), so `logw` is an order-free pure
    * function of the data: same doubles on any engine, any partitioning.
    *
    * Output: (idCol, n_feats, logw). Docs with NULL text or zero
    * features are absent (they carry no evidence either way). */
  /** The DSIR hashed-feature stream: unigrams + bigrams of `textCol`,
    * exploded and md5-bucketed. One definition feeds every DSIR entry
    * point, so the feature convention cannot drift between them. */
  private def dsirFeatureBucket(textCol: String, buckets: Int): Column =
    Combine.hashBucket(col("__f"), buckets)

  private def dsirFeats(df: DataFrame, textCol: String): DataFrame =
    df.filter(col(textCol).isNotNull)
      .withColumn("__f", explode(concat(
        TextFunctions.tokens(col(textCol)),
        graft.functions.ShingleExprs.ngramStrings(col(textCol), 2))))

  /** The `buckets`-row quantized log-ratio frame shared by
    * [[dsirLogWeights]] and [[dsirRatioTable]] — the smoothing and
    * 9-dp quantization live HERE once, so the bit-parity contract
    * between the aggregate path and the frozen-table scorer cannot be
    * broken by editing one copy. Inputs: (__b, __cr) raw bucket totals,
    * (__b, __ct) target bucket totals. */
  private def dsirLrFrame(rawTot: DataFrame, tgtTot: DataFrame,
                          buckets: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val rawN = rawTot.agg(coalesce(sum(col("__cr")), lit(0L)).as("__tr"))
    val tgtN = tgtTot.agg(coalesce(sum(col("__ct")), lit(0L)).as("__tt"))
    // buckets-row log-ratio table over the RAW side's buckets (a scored
    // doc's features are a subset of the raw corpus's by construction);
    // absent-in-target buckets smooth to count 0
    rawTot
      .join(tgtTot, Seq("__b"), "left")
      .crossJoin(broadcast(rawN)).crossJoin(broadcast(tgtN))
      .select(col("__b"),
        round(
          log((coalesce(col("__ct"), lit(0L)) + 1.0) / (col("__tt") + buckets.toDouble)) -
          log((col("__cr") + 1.0) / (col("__tr") + buckets.toDouble)), 9)
          .cast(DecimalType(19, 12)).as("__lr"))
  }

  def dsirLogWeights(raw: DataFrame, target: DataFrame, idCol: String,
                     textCol: String, buckets: Int = 1024): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    import org.apache.spark.sql.types.DecimalType
    val rawDocBuckets = dsirFeats(raw, textCol)
      .select(col(idCol), dsirFeatureBucket(textCol, buckets).as("__b"))
      .groupBy(col(idCol), col("__b")).agg(count(lit(1)).as("__c"))
    val rawTot = rawDocBuckets.groupBy(col("__b"))
      .agg(sum(col("__c")).as("__cr"))
    val tgtTot = dsirFeats(target, textCol)
      .select(dsirFeatureBucket(textCol, buckets).as("__b"))
      .groupBy(col("__b")).agg(count(lit(1)).as("__ct"))
    rawDocBuckets.join(broadcast(dsirLrFrame(rawTot, tgtTot, buckets)), Seq("__b"))
      .groupBy(col(idCol))
      .agg(
        sum(col("__c").cast(DecimalType(18, 0)) * col("__lr"))
          .cast("double").as("logw"),
        sum(col("__c")).as("n_feats"))
      .select(col(idCol), col("n_feats"), col("logw"))
  }

  /** The DSIR per-bucket log-ratio table as a driver-side map — bounded
    * by `buckets` (the same bounded-collect class as Mixture's per-domain
    * maps, NOT a corpus collect). Values are the 9-dp-quantized ratios as
    * exact BigDecimals, so any consumer summing them reproduces
    * [[dsirLogWeights]] bit-for-bit: decimal addition is associative, so
    * per-feature and per-bucket-count summation orders agree exactly.
    * The bucket totals are aggregated straight from the feature stream
    * (Σ of the per-doc counts — identical longs to the per-doc path). */
  def dsirRatioTable(raw: DataFrame, target: DataFrame, textCol: String,
                     buckets: Int = 1024): Map[Long, java.math.BigDecimal] = {
    require(buckets > 0, "buckets must be positive")
    val rawTot = dsirFeats(raw, textCol)
      .select(dsirFeatureBucket(textCol, buckets).as("__b"))
      .groupBy(col("__b")).agg(count(lit(1)).as("__cr"))
    val tgtTot = dsirFeats(target, textCol)
      .select(dsirFeatureBucket(textCol, buckets).as("__b"))
      .groupBy(col("__b")).agg(count(lit(1)).as("__ct"))
    dsirLrFrame(rawTot, tgtTot, buckets)
      .collect()
      .map(r => r.getLong(0) -> r.getDecimal(1))
      .toMap
  }

  /** Per-row DSIR score from a frozen ratio table: Σ over the row's
    * unigram+bigram features of the table's quantized log-ratio — ONE
    * scan, ZERO shuffles, and streaming-legal (a pure projection), which
    * makes it the ingest-time deployment shape: freeze the table against
    * yesterday's corpus, score every arriving document in the stream.
    * Bit-equal to [[dsirLogWeights]] on the corpus the table was built
    * from (asserted in CurationSpec): the decimal sum is order-free, so
    * per-feature summation here equals per-bucket-count summation there.
    * Features whose bucket is absent from the table (never seen in the
    * table's raw corpus) contribute nothing — they carry no evidence
    * under either model. NULL text scores NULL. */
  def dsirScore(text: Column, table: Map[Long, java.math.BigDecimal],
                buckets: Int = 1024): Column = {
    require(buckets > 0, "buckets must be positive")
    require(table.keySet.forall(k => k >= 0 && k < buckets),
      s"table has bucket keys outside [0, $buckets) - was it built with a different bucket count?")
    import org.apache.spark.sql.types.DecimalType
    // exact integer arithmetic: the 9-dp ratios become nano-unit longs
    // (|lr| < 100 ⇒ |nanos| < 10^11; a row's sum < n_feats·10^11 ≪ 2^63),
    // so the in-row fold is overflow-safe long addition — no decimal
    // precision-promotion rules inside the lambda. The table densifies
    // to a buckets-length ARRAY literal (keys are exactly [0, buckets);
    // absent buckets are 0 = "no evidence"), because element_at on a MAP
    // literal is a per-feature O(buckets) linear key scan — a 1000×
    // slowdown on exactly the ingest hot path this exists for — while an
    // array index is O(1).
    val dense: Seq[Long] = (0L until buckets.toLong).map(b =>
      table.get(b).map(_.movePointRight(9).longValueExact()).getOrElse(0L))
    val m = typedlit(dense)
    val fs = concat(TextFunctions.tokens(text),
      graft.functions.ShingleExprs.ngramStrings(text, 2))
    val sumNanos = aggregate(fs, lit(0L),
      (a, f) => a + element_at(m,
        (Combine.hashBucket(f, buckets) + 1L).cast("int")))
    // ÷10^9 in DECIMAL (exact at scale ≥ 9), then one double cast — the
    // same mathematical value dsirLogWeights casts, hence the same double
    (sumNanos.cast(DecimalType(38, 9)) / lit(1000000000L)).cast("double")
  }

  /** Head+tail token truncation: cap each document at `maxTokens`
    * whitespace tokens, keeping the first ceil(headFrac·maxTokens) and
    * the last maxTokens−head tokens — the standard long-document cap
    * (context windows care about openings and endings; the middle is the
    * cheapest cut). Documents at or under the cap pass through with the
    * same single-space rejoin, so output text is whitespace-normalized
    * either way and the operator is a pure array slice — one scan,
    * codegen, no shuffle, replayable in SQL. Output: (id, text_trunc,
    * n_tokens). */
  def truncateTokens(df: DataFrame, idCol: String, textCol: String,
                     maxTokens: Int, headFrac: Double = 0.75): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(headFrac > 0.0 && headFrac < 1.0, "headFrac must be in (0, 1)")
    val headN = math.ceil(maxTokens * headFrac).toInt
    val tailN = maxTokens - headN
    val ws = filter(split(col(textCol), "\\s+"), t => length(t) > 0)
    // ceil can round headFrac up to the full cap (e.g. maxTokens=1) —
    // slice(_, -0, 0) is a runtime error, so the tail leg must vanish
    val over =
      if (tailN == 0) slice(ws, 1, headN)
      else concat(slice(ws, 1, headN), slice(ws, -tailN, tailN))
    val kept = when(size(ws) <= maxTokens, ws).otherwise(over)
    df.select(col(idCol),
      array_join(kept, " ").as("text_trunc"),
      least(size(ws), lit(maxTokens)).cast("long").as("n_tokens"))
  }

  /** k-anonymity suppression (Sweeney 2002): drop every row whose
    * quasi-identifier combination occurs fewer than k times, so no
    * released row is re-identifiable below a group of k. Suppression
    * (not generalization): groups under k vanish entirely — the
    * conservative default for corpus releases.
    *
    * One hash shuffle on the quasi columns (a count window, no join, no
    * second scan of the input); hot quasi-groups only ever carry a
    * count, so skew is harmless. Rows with NULL in a quasi column form
    * their own group per SQL window-partition semantics — pre-bucket
    * NULLs explicitly if a different policy is wanted. */
  def kAnonymize(df: DataFrame, quasi: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(!df.columns.contains("__gn"),
      "input already has a __gn column; rename it before kAnonymize")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(quasi.map(col): _*)
    df.withColumn("__gn", count(lit(1)).over(w))
      .filter(col("__gn") >= k)
      .drop("__gn")
  }

  /** Differentially-private group counts via the geometric mechanism
    * (Ghosh, Roughgarden & Sundararajan, "Universally Utility-
    * Maximizing Privacy Mechanisms", STOC 2009): each count gets
    * two-sided-geometric noise with ratio α = 1/2 — the ε = ln 2 DP
    * release for a sensitivity-1 count query — computed ENTIRELY in
    * integer arithmetic. A geometric(1/2) draw is the number of
    * trailing zero bits of a uniform integer, so
    * `noise = ntz(h1) − ntz(h2)` over two independent 52-bit hash
    * draws is an exact discrete-Laplace sample: no float logs, no
    * inverse-CDF rounding, bit-reproducible in any engine.
    *
    * Determinism caveat (by design, stated loudly): the draws are
    * seeded from the group key via the portable md5 device, so the
    * release is REPLAYABLE — which is what lets the DuckDB oracle pin
    * every noised count, and what a PRODUCTION release must change
    * (derive the seed from a per-release secret, or the noise can be
    * subtracted). The mechanism and its ε are unaffected by where the
    * uniform bits come from.
    *
    * One hash-aggregation shuffle; the noise is a per-group scalar
    * expression on the (small) aggregated frame.
    *
    * @return one row per group: keys, `n` (true count — drop it from a
    *         real release; kept here so audits and the oracle can see
    *         the mechanism), `noise`, `n_noised` (= n + noise, can go
    *         negative as the raw mechanism prescribes)
    */
  def dpNoisedCounts(df: DataFrame, keys: Seq[String],
                     seed: String = "graft-dp"): DataFrame = {
    require(keys.nonEmpty, "need at least one group-by column")
    // ntz of (v | 2^52): Geometric(1/2) capped at 52 — the cap keeps the
    // v=0 corner (probability 2^-52) finite and identical cross-engine
    def geom(tag: String): Column = {
      val keyStr = concat_ws("|", lit(s"$seed-$tag") +: keys.map(col): _*)
      val v = conv(substring(md5(keyStr.cast("binary")), 1, 13), 16, 10)
        .cast("long")
      val w = v.bitwiseOR(lit(4503599627370496L))
      bit_count(w.bitwiseAND(-w) - 1).cast("long")
    }
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("noise", geom("a") - geom("b"))
      .withColumn("n_noised", col("n") + col("noise"))
  }
}
