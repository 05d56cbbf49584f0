package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic domain-mixture sampling: downsample each domain (source,
  * language, quality tier …) at its own rate so the output matches a target
  * mixture — the standard knob for rebalancing web-scale corpora before
  * pretraining. Part of the mandated LLM-pipeline family (SURVEY.md §2.9);
  * the reference SDK's nearest primitive is per-key Sample
  * (SURVEY.md §2.3), which is neither deterministic nor rate-targeted.
  *
  * Membership is a pure function of the row id (md5 fraction vs. a
  * per-domain threshold): reproducible across engines, stable under
  * repartitioning, and rerunnable — the properties an auditable corpus
  * needs that `rand(seed)` (engine- and partitioning-specific) lacks.
  *
  * Scale posture: the filter is a scan-side predicate (no shuffle, no
  * join); the rate table is a CASE expression over the domain column
  * (domain cardinality is small by contract — sources, languages). The
  * only action is a per-domain count for [[rebalanceRates]], a
  * k-row aggregate with map-side partials.
  */
object Mixture {

  /** Uniform hash fraction in [0, 1): first 8 hex digits of md5 of the
    * id's decimal string over 2^32. Exactly representable double
    * arithmetic (32-bit integer / power of two), so the `< rate`
    * comparison is bit-identical across engines. */
  def hashFraction(id: Column): Column =
    conv(substring(md5(id.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Keep each row with its domain's rate: `hashFraction(id) < rate`.
    * Domains absent from `rates` use `defaultRate` (1.0 keeps them all). */
  def sampleByRates(df: DataFrame, idCol: String, domainCol: String,
                    rates: Map[String, Double],
                    defaultRate: Double = 1.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (domain, r)) =>
      when(col(domainCol) === lit(domain), lit(r)).otherwise(acc)
    }
    df.filter(hashFraction(col(idCol)) < rate)
  }

  /** [[sampleByRates]] generalized to rates ABOVE 1 — deterministic
    * UPsampling, the other half of temperature mixing (rare domains must
    * repeat to reach their target share; DoReMi/multilingual-LM recipes
    * routinely run epochs > 1 on small sources). Each row emits
    * ⌊rate⌋ guaranteed copies plus one extra when its md5 fraction falls
    * under frac(rate), tagged with an `epoch` column (0-based copy index)
    * so downstream ids stay unique — expected copies = rate exactly, and
    * membership of every copy is a pure function of (id, rate):
    * reproducible across engines, stable under repartitioning.
    *
    * Scale posture: a scan-side explode of sequence(0, n−1) — no
    * shuffle, no join; the blow-up is exactly the requested oversampling
    * factor. Rates in [0, 1] degrade to [[sampleByRates]] plus a zero
    * `epoch` column. */
  def sampleByRatesWithRepeats(df: DataFrame, idCol: String,
                               domainCol: String,
                               rates: Map[String, Double],
                               defaultRate: Double = 1.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(_ >= 0),
      "rates must be >= 0")
    // this transform APPENDS columns; silently overwriting a same-named
    // input column would corrupt caller data
    Seq("epoch", "__n").foreach { c =>
      require(!df.columns.contains(c),
        s"sampleByRatesWithRepeats writes a '$c' column; input already has one - rename it first")
    }
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (domain, r)) =>
      when(col(domainCol) === lit(domain), lit(r)).otherwise(acc)
    }
    val copies = (floor(rate).cast("long") +
      when(hashFraction(col(idCol)) < rate - floor(rate), 1L).otherwise(0L))
    df.withColumn("__n", copies)
      .filter(col("__n") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__n") - 1)))
      .drop("__n")
  }

  /** Per-domain keep-rates that reshape observed counts toward `targets`
    * (domain → share of the output) with total output ≈ `outFraction` of
    * the input. rate_d = outFraction·N·share_d / n_d, clamped to 1 under
    * the default `capAtOne` (for [[sampleByRates]], which cannot
    * replicate rows — undersized domains are kept whole); pass
    * `capAtOne = false` and feed [[sampleByRatesWithRepeats]] to realize
    * rates above 1 as deterministic epoch repeats.
    *
    * Runs one k-row count action (k = domain cardinality, small by
    * contract). The arithmetic is plain IEEE double in a fixed order so an
    * external auditor (or SQL oracle) reproduces the exact thresholds.
    */
  /** Temperature-scaled mixture (the multilingual-LM sampling rule:
    * share_d ∝ n_d^alpha): alpha = 1 keeps natural proportions, alpha = 0
    * is uniform, alpha in between up-weights small domains without the
    * hard targets of [[rebalanceRates]]. Returns per-domain keep-rates
    * realizing those shares at ≈ `outFraction` of the input.
    *
    * `capAtOne` (default) clamps every rate to 1 for [[sampleByRates]],
    * which cannot replicate rows — small domains are kept whole and the
    * realized mixture undershoots their target share. Pass
    * `capAtOne = false` to get the TRUE temperature rates (> 1 for
    * domains below their share) and feed them to
    * [[sampleByRatesWithRepeats]], which realizes rates above 1 as
    * deterministic epoch repeats.
    *
    * One k-row count action; the share arithmetic runs driver-side in a
    * FIXED (domain-sorted) order so the normalizer sum is reproducible
    * IEEE arithmetic an external auditor can replay. */
  def temperatureRates(df: DataFrame, domainCol: String, alpha: Double,
                       outFraction: Double,
                       capAtOne: Boolean = true): Map[String, Double] = {
    require(alpha >= 0 && alpha <= 1, "alpha must be in [0, 1]")
    require(outFraction > 0 && outFraction <= 1, "outFraction must be in (0, 1]")
    // null domains are not sampleable (no Map key; .sorted would NPE) —
    // excluded from counts AND totals for a consistent denominator.
    // CARDINALITY CONTRACT: this (and every collect in this file)
    // gathers one row per DOMAIN — mixture domains are a curated
    // handful (sources/languages), never data-scale; a million-domain
    // corpus should aggregate its mixture weights distributively
    val counts = df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val doms = counts.keys.toSeq.sorted
    val pw = doms.map(d => d -> math.pow(counts(d).toDouble, alpha)).toMap
    val z = doms.map(pw).sum
    val total = doms.map(counts).sum
    doms.map { d =>
      val raw = outFraction * total * (pw(d) / z) / counts(d)
      d -> (if (capAtOne) math.min(1.0, raw) else raw)
    }.toMap
  }

  def rebalanceRates(df: DataFrame, domainCol: String,
                     targets: Map[String, Double],
                     outFraction: Double,
                     capAtOne: Boolean = true): Map[String, Double] = {
    require(outFraction > 0 && outFraction <= 1, "outFraction must be in (0, 1]")
    require(targets.values.forall(_ >= 0), "target shares must be >= 0")
    // null domains are not sampleable (no Map key; .sorted would NPE) —
    // excluded from counts AND totals for a consistent denominator
    val counts = df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    targets.map { case (domain, share) =>
      val n = counts.getOrElse(domain, 0L)
      val raw = if (n == 0L) 0.0 else outFraction * total * share / n
      domain -> (if (capAtOne) math.min(1.0, raw) else raw)
    }
  }

  /** TOKEN-MASS variant of [[rebalanceRates]]: pretraining mixtures are
    * specified in tokens ("30% web, 15% code BY TOKENS"), and solving
    * rates on document counts over-keeps domains of long documents. The
    * per-domain `weight` aggregate (typically a token count) replaces
    * count(*) in the rate arithmetic; rates still act on whole ROWS via
    * [[sampleByRates]] — the md5-fraction keep decision is independent of
    * a row's weight, so the EXPECTED kept mass realizes `share ×
    * outFraction × total mass` exactly (the per-domain realized mass
    * concentrates around it; document-level mixture noise is inherent to
    * row-atomic sampling and reported by the registered query).
    *
    * `weight` must be non-negative and integer-valued for cross-engine
    * reproducibility: integer-valued doubles below 2^53 sum exactly in
    * any order, so the driver-side arithmetic is replayable by an
    * external auditor summing in ANY order. One k-row aggregate action
    * with map-side partials. */
  def rebalanceRatesByWeight(df: DataFrame, domainCol: String,
                             weight: Column,
                             targets: Map[String, Double],
                             outFraction: Double,
                             capAtOne: Boolean = true): Map[String, Double] = {
    require(outFraction > 0 && outFraction <= 1, "outFraction must be in (0, 1]")
    require(targets.values.forall(_ >= 0), "target shares must be >= 0")
    val masses = df.filter(col(domainCol).isNotNull).groupBy(col(domainCol))
      .agg(sum(weight.cast("long")).as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(masses.values.forall(_ >= 0L), "weights must be non-negative")
    val total = masses.values.sum
    targets.map { case (domain, share) =>
      val w = masses.getOrElse(domain, 0L)
      val raw = if (w == 0L) 0.0 else outFraction * total * share / w
      domain -> (if (capAtOne) math.min(1.0, raw) else raw)
    }
  }

  /** TOKEN-MASS variant of [[temperatureRates]] (same motivation as
    * [[rebalanceRatesByWeight]]): p_d ∝ mass_d^alpha over token mass.
    * Domain iteration stays FIXED (domain-sorted) so the normalizer sum
    * is reproducible IEEE arithmetic. */
  def temperatureRatesByWeight(df: DataFrame, domainCol: String,
                               weight: Column, alpha: Double,
                               outFraction: Double,
                               capAtOne: Boolean = true): Map[String, Double] = {
    require(alpha >= 0 && alpha <= 1, "alpha must be in [0, 1]")
    require(outFraction > 0 && outFraction <= 1, "outFraction must be in (0, 1]")
    val masses = df.filter(col(domainCol).isNotNull).groupBy(col(domainCol))
      .agg(sum(weight.cast("long")).as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(masses.values.forall(_ >= 0L), "weights must be non-negative")
    val doms = masses.keys.toSeq.sorted
    val pw = doms.map(d => d -> math.pow(masses(d).toDouble, alpha)).toMap
    val z = doms.map(pw).sum
    val total = doms.map(masses).sum
    doms.map { d =>
      val raw =
        if (masses(d) == 0L) 0.0
        else outFraction * total * (pw(d) / z) / masses(d)
      d -> (if (capAtOne) math.min(1.0, raw) else raw)
    }.toMap
  }
}
