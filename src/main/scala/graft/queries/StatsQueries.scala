package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Anova, Benford, Hypothesis, Inequality, Isotonic, Markov, Moments, Normalize, RankStats, Regress, Robust, Survival, TheilSen, TimeSeries}
import graft.queries.QueryUtil._

/** Statistics pack: Markov transition estimation, Kaplan-Meier
  * survival, autocorrelation diagnostics, rank statistics (Spearman ρ,
  * Mann-Whitney U), and concentration indices (Gini, HHI).
  *
  * Oracle posture: all full-value DuckDB oracles. Transition counts are
  * exact longs with one-division probabilities; the ACF replays the
  * identical DECIMAL-sums-then-one-IEEE-tree device as q_linreg; the
  * survival curve is the one sequential recurrence here and rides the
  * repo's recursive-CTE replay discipline (the oracle folds the
  * IDENTICAL left-associated product tree in ascending event-time
  * order, like EWMA/CUSUM/Holt).
  */
object StatsQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // First-order user-journey transition matrix over the events
    // stream: P(next event type | current), exact counts, (ts, id)
    // deterministic chain order.
    "q_markov" -> { (s, dir) =>
      Markov.transitions(
          Tables(s, dir).events.withColumn("us", unix_micros(col("ts"))),
          keyCol = "user_id", orderCol = "us", idCol = "event_id",
          stateCol = "event_type")
        .orderBy(col("from_state"), col("to_state"))
    },

    // Kaplan-Meier time-to-conversion: per user, hours from first
    // activity to the first big-ticket purchase (value ≥ 150), censored
    // at last activity for users who never convert (~55% — real
    // censoring mass); one curve per user_id%4 cohort.
    "q_survival_km" -> { (s, dir) =>
      val u = Tables(s, dir).events
        .groupBy(col("user_id"))
        .agg(
          min(unix_micros(col("ts"))).as("t0"),
          max(unix_micros(col("ts"))).as("t1"),
          min(when(col("event_type") === "purchase" && col("value") >= 150,
            unix_micros(col("ts")))).as("tc"))
      val subjects = u.select(
        pmod(col("user_id"), lit(4)).cast("string").as("cohort"),
        expr("(coalesce(tc, t1) - t0) div 3600000000").as("dur_h"),
        when(col("tc").isNotNull, 1L).otherwise(0L).as("obs"))
      Survival.kaplanMeier(subjects, "cohort", "dur_h", "obs")
        .orderBy(col("cohort"), col("t"))
    },

    // ACF at lags 1..3 of the hourly TOTAL event value per type — the
    // same hourly slot grid as q_ewma (slots unique per key), Pearson
    // over DECIMAL-exact sums. Totals, not means: a mean's division can
    // land exactly on a 4-dp midpoint where Spark (shortest-repr
    // HALF_UP) and DuckDB (exact-binary nearest) re-quantize the double
    // differently; the 4-dp-exact sum is midpoint-safe by construction.
    "q_autocorr" -> { (s, dir) =>
      val obs = Tables(s, dir).events
        .groupBy(col("event_type"),
          expr("unix_timestamp(ts) DIV 3600").as("slot"))
        .agg(dsum(col("value")).as("v"))
      Regress.autocorr(obs, Seq("event_type"), "slot", "v", Seq(1, 2, 3))
        .withColumn("lag", col("lag").cast("long"))
        .orderBy(col("event_type"), col("lag"))
    },

    // Spearman rank correlation of extended price vs quantity per
    // return flag — quantity is integral (heavy ties), so this
    // exercises the tie-averaged doubled-rank arithmetic end to end.
    "q_spearman" -> { (s, dir) =>
      RankStats.spearmanPerKey(Tables(s, dir).lineitem,
          Seq("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_returnflag"))
    },

    // Mann-Whitney U: does the discount distribution differ between
    // open (O) and finished (F) lines within each return flag? Discount
    // has ~11 distinct values — the tie-correction term dominates σ.
    "q_mannwhitney" -> { (s, dir) =>
      RankStats.mannWhitney(Tables(s, dir).lineitem, Seq("l_returnflag"),
          col("l_linestatus"), a = "O", b = "F", value = col("l_discount"))
        .orderBy(col("l_returnflag"))
    },

    // Gini coefficient of order value per priority class — the revenue
    // concentration audit (rank-formula over ascending order totals).
    "q_gini" -> { (s, dir) =>
      Inequality.giniPerKey(Tables(s, dir).orders,
          Seq("o_orderpriority"), col("o_totalprice"))
        .orderBy(col("o_orderpriority"))
    },

    // HHI + top-share of per-customer spend within each market segment
    // — two-level: exact per-customer totals feed the share index.
    "q_hhi" -> { (s, dir) =>
      val t = Tables(s, dir)
      val spend = t.orders.join(t.customer,
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("c_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,4)")).as("spend"))
      Inequality.hhiPerKey(spend, Seq("c_mktsegment"), col("spend"))
        .orderBy(col("c_mktsegment"))
    },

    // Chi-square independence of event type × epoch-day-of-week per
    // user cohort. The day index is pure integer arithmetic
    // (epoch_us div day) % 7 — NOT dayofweek(), whose week origin
    // differs between engines. The statistic rides the 6-dp
    // integer-quantized cell terms (order-free exact sum).
    "q_chisq" -> { (s, dir) =>
      val f = Tables(s, dir).events.select(
        pmod(col("user_id"), lit(2)).as("cohort"),
        col("event_type").as("a"),
        expr("pmod(unix_micros(ts) DIV 86400000000, 7)").as("b"))
      Hypothesis.chiSquareIndependence(f, Seq("cohort"), col("a"), col("b"))
        .orderBy(col("cohort"))
    },

    // Two-proportion z-test: do high-value orders (> 200k) occur at a
    // different rate in open vs finished orders, per priority class?
    "q_proportions" -> { (s, dir) =>
      Hypothesis.proportionsZTest(Tables(s, dir).orders,
          Seq("o_orderpriority"), col("o_orderstatus"), a = "O", b = "F",
          success = col("o_totalprice") > 200000)
        .orderBy(col("o_orderpriority"))
    },

    // Benford first-digit audit of order totals per status — leading
    // digit from the integer-part string (no log10 on either engine),
    // expected shares as shared hardcoded literals.
    "q_benford" -> { (s, dir) =>
      Benford.firstDigitAudit(Tables(s, dir).orders,
          Seq("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderstatus"), col("digit"))
    },

    // Kolmogorov-Smirnov two-sample statistic: price distribution of
    // open vs finished lines per return flag. D rides exact integer
    // cross-products max|cum_a·n_b − cum_b·n_a| — one division at the
    // end, no float CDF accumulation.
    "q_ks" -> { (s, dir) =>
      Hypothesis.ksTest(Tables(s, dir).lineitem, Seq("l_returnflag"),
          col("l_linestatus"), a = "O", b = "F",
          value = col("l_extendedprice"))
        .orderBy(col("l_returnflag"))
    },

    // Tukey-fence robust statistics of quantity per return flag —
    // exact interpolated quartiles (the q_percentile_exact device),
    // 1.5·IQR fences, outlier census, winsorized DECIMAL mean.
    "q_robust_stats" -> { (s, dir) =>
      Robust.iqrStats(Tables(s, dir).lineitem, Seq("l_returnflag"),
          col("l_quantity"))
        .orderBy(col("l_returnflag"))
    },

    // Skewness / kurtosis / Jarque-Bera from exact DECIMAL power sums
    // (quantity ≤ 50, well inside the DECIMAL(8,4) input contract).
    "q_moments" -> { (s, dir) =>
      Moments.skewKurt(Tables(s, dir).lineitem, Seq("l_returnflag"),
          col("l_quantity"))
        .orderBy(col("l_returnflag"))
    },

    // Isotonic regression (PAVA) of 4-hour slot totals per event type.
    // The engine pools adjacent violators with exact-rational merge
    // decisions; the oracle evaluates the INDEPENDENT max-min
    // characterization fitted[i] = max_{j≤i} min_{k≥i} mean(y[j..k])
    // from DECIMAL prefix sums — agreement proves the pooling.
    "q_isotonic" -> { (s, dir) =>
      val obs = Tables(s, dir).events
        .groupBy(col("event_type"),
          expr("unix_timestamp(ts) DIV 14400").as("slot"))
        .agg(sum(col("value").cast("decimal(18,4)")).as("y"))
      Isotonic.fit(obs, Seq("event_type"), col("slot"), col("y"))
        .orderBy(col("event_type"), col("o"))
    },

    // Welch's unequal-variance t-test on the same O-vs-F split as
    // q_ks/q_mannwhitney — the parametric member of the family.
    "q_welch" -> { (s, dir) =>
      Hypothesis.welchT(Tables(s, dir).lineitem, Seq("l_returnflag"),
          col("l_linestatus"), a = "O", b = "F",
          value = col("l_extendedprice"))
        .orderBy(col("l_returnflag"))
    },

    // Theil-Sen robust trend of the 4-hour slot totals per event type
    // (the same grid as q_isotonic) — lower-median rank selection over
    // all pairwise slopes, never an interpolated midpoint.
    "q_theilsen" -> { (s, dir) =>
      val obs = Tables(s, dir).events
        .groupBy(col("event_type"),
          expr("unix_timestamp(ts) DIV 14400").as("slot"))
        .agg(sum(col("value").cast("decimal(18,4)")).as("y"))
      TheilSen.fit(obs, Seq("event_type"), col("slot"), col("y"))
        .orderBy(col("event_type"))
    },

    // The scale-path variant (VERDICT r11 task 3): same grid, but the
    // pairwise median runs on a deterministic md5-selected 64-point
    // subsample per key — pair count bounded by C(64,2) whatever the
    // series length, closing fit's measured superlinear tail. The
    // oracle replays the identical hash selection.
    "q_theilsen_sampled" -> { (s, dir) =>
      val obs = Tables(s, dir).events
        .groupBy(col("event_type"),
          expr("unix_timestamp(ts) DIV 14400").as("slot"))
        .agg(sum(col("value").cast("decimal(18,4)")).as("y"))
      TheilSen.fitSampled(obs, Seq("event_type"), col("slot"), col("y"),
          maxPoints = 64)
        .orderBy(col("event_type"))
    },

    // Cross-correlation: does click volume lead purchase volume, per
    // user cohort? CCF at lags −2..2 over the 4-hour slot grid —
    // negative lags = purchases leading (same DECIMAL-sums device as
    // q_autocorr, lead/lag spelled identically in the oracle).
    "q_ccf" -> { (s, dir) =>
      val obs = Tables(s, dir).events
        .groupBy(pmod(col("user_id"), lit(2)).as("cohort"),
          expr("unix_timestamp(ts) DIV 14400").as("slot"))
        .agg(
          sum(when(col("event_type") === "click", col("value"))
            .otherwise(lit(0)).cast("decimal(18,4)")).cast("double").as("x"),
          sum(when(col("event_type") === "purchase", col("value"))
            .otherwise(lit(0)).cast("decimal(18,4)")).cast("double").as("y"))
      Regress.crosscorr(obs, Seq("cohort"), "slot", "x", "y",
          Seq(-2, -1, 0, 1, 2))
        .withColumn("lag", col("lag").cast("long"))
        .orderBy(col("cohort"), col("lag"))
    },

    // Classical additive seasonal decomposition of the 4-hour slot
    // totals per event type, period 6 (= 24 h): centered 2×6 MA trend
    // from exact doubled window sums, per-phase seasonal means DEFINED
    // over exact sums (no float accumulation), residual per row.
    "q_decompose" -> { (s, dir) =>
      val obs = Tables(s, dir).events
        .groupBy(col("event_type"),
          expr("unix_timestamp(ts) DIV 14400").as("slot"))
        .agg(sum(col("value").cast("decimal(18,4)")).as("y"))
      TimeSeries.decomposeAdditive(obs, "event_type", "slot", "y",
          period = 6)
        .orderBy(col("event_type"), col("o"))
    },

    // Log-rank test over the q_survival_km construction: does
    // time-to-conversion differ between even and odd users, per
    // user_id%3 stratum? E and V quantize to 6-dp integers with staged
    // integer divisions (order-free exact sums — float Σ of rationals
    // with per-time denominators could never hash-match).
    "q_logrank" -> { (s, dir) =>
      val u = Tables(s, dir).events
        .groupBy(col("user_id"))
        .agg(
          min(unix_micros(col("ts"))).as("t0"),
          max(unix_micros(col("ts"))).as("t1"),
          min(when(col("event_type") === "purchase" && col("value") >= 150,
            unix_micros(col("ts")))).as("tc"))
      val subjects = u.select(
        pmod(col("user_id"), lit(3)).cast("string").as("stratum"),
        pmod(col("user_id"), lit(2)).cast("string").as("grp"),
        expr("(coalesce(tc, t1) - t0) div 3600000000").as("dur_h"),
        when(col("tc").isNotNull, 1L).otherwise(0L).as("obs"))
      Survival.logRank(subjects, Seq("stratum"), col("grp"), a = "0",
          b = "1", duration = col("dur_h"), observed = col("obs"))
        .orderBy(col("stratum"))
    },

    // Median / MAD robust location-scale with a Hampel outlier census
    // — the rank-based companion to q_robust_stats' Tukey fences.
    "q_mad_stats" -> { (s, dir) =>
      Robust.madStats(Tables(s, dir).lineitem, Seq("l_returnflag"),
          col("l_quantity"))
        .orderBy(col("l_returnflag"))
    },

    // Quantile-normalize the odd-custkey half of per-customer spend
    // onto the even-half reference distribution, per market segment —
    // rank-selection mapping with exact integer target ranks.
    "q_quantile_norm" -> { (s, dir) =>
      val t = Tables(s, dir)
      val spend = t.orders.join(t.customer,
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("c_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,4)"))
          .cast("double").as("spend"))
      val srcHalf = spend.filter(pmod(col("c_custkey"), lit(2)) === 1)
      val refHalf = spend.filter(pmod(col("c_custkey"), lit(2)) === 0)
      Normalize.quantileNormalize(srcHalf, refHalf, Seq("c_mktsegment"),
          col("spend"), col("c_custkey"))
        .orderBy(col("c_mktsegment"), col("src_rank"))
    },

    // Mann-Kendall trend significance on the q_theilsen grid — S and
    // the tie-corrected variance numerator are exact integers, so the
    // whole test replays bit-for-bit (report WITH the Theil-Sen slope).
    "q_mann_kendall" -> { (s, dir) =>
      val obs = Tables(s, dir).events
        .groupBy(col("event_type"),
          expr("unix_timestamp(ts) DIV 14400").as("slot"))
        .agg(sum(col("value").cast("decimal(18,4)")).as("y"))
      TheilSen.mannKendall(obs, Seq("event_type"), col("slot"), col("y"))
        .orderBy(col("event_type"))
    },

    // Cohen's kappa: chance-corrected agreement between two order
    // "raters" — urgent-priority (digit ≤ 2) vs high-value (> 200k) —
    // per order status. κ = (D·N − P)/(N² − P): one exact-integer
    // division, no quantization.
    "q_kappa" -> { (s, dir) =>
      Hypothesis.cohensKappa(Tables(s, dir).orders,
          Seq("o_orderstatus"),
          raterA = (substring(col("o_orderpriority"), 1, 1)
            .cast("int") <= 2).cast("string"),
          raterB = (col("o_totalprice") > 200000).cast("string"))
        .orderBy(col("o_orderstatus"))
    },

    // Cochran-Armitage trend: does the high-value-order rate trend
    // with priority rank (the '1-URGENT'..'5-LOW' leading digit), per
    // order status? Exact integer w-moments — no quantization needed.
    "q_trend_test" -> { (s, dir) =>
      Hypothesis.trendTest(Tables(s, dir).orders,
          Seq("o_orderstatus"),
          score = substring(col("o_orderpriority"), 1, 1).cast("int"),
          success = col("o_totalprice") > 200000)
        .orderBy(col("o_orderstatus"))
    },

    // Kruskal-Wallis: does l_quantity's distribution differ across the
    // five supplier-mod classes, per return flag? Heavy integer ties
    // exercise the tie-corrected H; 9-dp integer-quantized group terms
    // keep the varying-denominator sum order-free.
    "q_kruskal" -> { (s, dir) =>
      RankStats.kruskalWallis(Tables(s, dir).lineitem, Seq("l_returnflag"),
          groupCol = pmod(col("l_suppkey"), lit(5)), value = col("l_quantity"))
        .orderBy(col("l_returnflag"))
    },

    // One-way ANOVA F: does mean retail price differ across three
    // brands, per part type? Exact conditional DECIMAL sums pivot into
    // one row; SSB/SSW/F are fixed left-to-right trees.
    "q_anova" -> { (s, dir) =>
      Anova.oneWayF(Tables(s, dir).part, Seq("p_type"),
          groupCol = col("p_brand"),
          groups = Seq("Brand#1", "Brand#2", "Brand#3"),
          value = col("p_retailprice"))
        .orderBy(col("p_type"))
    },

    // Brown-Forsythe: is price VARIANCE equal across the same brands?
    // The one-way F of |x − lower-median_g| — median by rank selection.
    "q_brown_forsythe" -> { (s, dir) =>
      Anova.brownForsythe(Tables(s, dir).part, Seq("p_type"),
          groupCol = col("p_brand"),
          groups = Seq("Brand#1", "Brand#2", "Brand#3"),
          value = col("p_retailprice"))
        .orderBy(col("p_type"))
    },

    // Cohen's d of the discount gap between open and fulfilled lines,
    // per return flag — the effect-size companion to q_welch (same
    // two-sample construction): is a significant difference also BIG?
    "q_cohens_d" -> { (s, dir) =>
      Hypothesis.cohensD(Tables(s, dir).lineitem, Seq("l_returnflag"),
          col("l_linestatus"), a = "O", b = "F", value = col("l_discount"))
        .orderBy(col("l_returnflag"))
    },

    // 10%-trimmed and Winsorized mean order value per priority — the
    // robust location estimators next to q_robust_stats/q_mad_stats;
    // exact rank selection, no clamp scan (k values clamp per boundary).
    "q_trimmed_stats" -> { (s, dir) =>
      Robust.trimmedStats(Tables(s, dir).orders, Seq("o_orderpriority"),
          col("o_totalprice"))
        .orderBy(col("o_orderpriority"))
    },

    // Mutual information (nats) between order priority and the customer
    // mod-3 class, per order status — the information-theoretic
    // dependence companion to q_chisq; observed cells only.
    "q_mutual_info" -> { (s, dir) =>
      Hypothesis.mutualInfo(Tables(s, dir).orders, Seq("o_orderstatus"),
          x = col("o_orderpriority"), y = pmod(col("o_custkey"), lit(3)))
        .orderBy(col("o_orderstatus"))
    },

    // Pearson correlation matrix over lineitem's four measures in ONE
    // pass — exact DECIMAL pairwise sufficient statistics, olsPerKey's
    // IEEE tree per unordered pair.
    "q_corr_matrix" -> { (s, dir) =>
      Regress.corrMatrix(Tables(s, dir).lineitem,
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy(col("col_a"), col("col_b"))
    },
  )

  // ---- oracle SQL ---------------------------------------------------

  val oracles: Map[String, String] = Map(
    "q_markov" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                      event_type FROM events),
         pr AS (SELECT event_type AS from_state,
                  lead(event_type) OVER (
                    PARTITION BY user_id ORDER BY us, event_id) AS to_state
                FROM e),
         c AS (SELECT from_state, to_state, COUNT(*) AS n
               FROM pr WHERE to_state IS NOT NULL GROUP BY 1, 2)
         SELECT from_state, to_state, CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY from_state) AS DOUBLE) AS p
         FROM c ORDER BY from_state, to_state""",
    "q_survival_km" ->
      """WITH RECURSIVE u AS (
           SELECT user_id, CAST(user_id % 4 AS VARCHAR) AS cohort,
             min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1,
             min(CASE WHEN event_type = 'purchase' AND value >= 150
                 THEN epoch_us(ts) END) AS tc
           FROM events GROUP BY 1, 2),
         s AS (SELECT cohort, (coalesce(tc, t1) - t0) // 3600000000 AS t,
                 CASE WHEN tc IS NOT NULL THEN 1 ELSE 0 END AS obs
               FROM u),
         c AS (SELECT cohort, t, CAST(SUM(obs) AS BIGINT) AS d,
                 COUNT(*) AS tot
               FROM s GROUP BY 1, 2),
         k AS (SELECT cohort, t, d,
                 CAST(SUM(tot) OVER (
                   PARTITION BY cohort ORDER BY t DESC) AS BIGINT) AS at_risk
               FROM c),
         e AS (SELECT cohort, t, d, at_risk, row_number() OVER (
                 PARTITION BY cohort ORDER BY t) AS rn
               FROM k WHERE d > 0),
         r AS (
           SELECT cohort, t, d, at_risk, rn,
             (1.0 - CAST(d AS DOUBLE) / CAST(at_risk AS DOUBLE)) AS surv
           FROM e WHERE rn = 1
           UNION ALL
           SELECT e.cohort, e.t, e.d, e.at_risk, e.rn,
             r.surv * (1.0 - CAST(e.d AS DOUBLE) / CAST(e.at_risk AS DOUBLE))
           FROM e JOIN r ON e.cohort = r.cohort AND e.rn = r.rn + 1)
         SELECT cohort, t, d, at_risk, surv
         FROM r ORDER BY cohort, t""",
    "q_autocorr" ->
      """WITH obs AS (SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS slot,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
           FROM events GROUP BY 1, 2),
         l AS (
           SELECT event_type, 1 AS lag, v AS x, lead(v, 1) OVER (
             PARTITION BY event_type ORDER BY slot) AS y FROM obs
           UNION ALL
           SELECT event_type, 2, v, lead(v, 2) OVER (
             PARTITION BY event_type ORDER BY slot) FROM obs
           UNION ALL
           SELECT event_type, 3, v, lead(v, 3) OVER (
             PARTITION BY event_type ORDER BY slot) FROM obs),
         a AS (SELECT event_type, lag, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(x AS DECIMAL(18,4))) AS sx,
             SUM(CAST(y AS DECIMAL(18,4))) AS sy,
             SUM(CAST(x AS DECIMAL(19,4)) * CAST(y AS DECIMAL(19,4))) AS sxy,
             SUM(CAST(x AS DECIMAL(19,4)) * CAST(x AS DECIMAL(19,4))) AS sxx,
             SUM(CAST(y AS DECIMAL(19,4)) * CAST(y AS DECIMAL(19,4))) AS syy
           FROM l WHERE y IS NOT NULL GROUP BY 1, 2),
         d AS (SELECT event_type, lag, n, CAST(n AS DOUBLE) AS nd,
             CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
             CAST(sxy AS DOUBLE) AS sxyd, CAST(sxx AS DOUBLE) AS sxxd,
             CAST(syy AS DOUBLE) AS syyd
           FROM a)
         SELECT event_type, CAST(lag AS BIGINT) AS lag, n,
           CASE WHEN nd * sxxd - sxd * sxd > 0 AND nd * syyd - syd * syd > 0
             THEN round((nd * sxyd - sxd * syd)
                    / sqrt((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)), 6)
           END AS r
         FROM d ORDER BY event_type, lag""",
    // Doubled tie-averaged ranks (rank() + peer-inclusive running
    // count = minRank + maxRank), exact HUGEINT sums, then the
    // IDENTICAL IEEE tree as RankStats.spearmanPerKey.
    "q_spearman" ->
      """WITH r AS (SELECT l_returnflag,
             rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
               + count(*) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rx,
             rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
               + count(*) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ry
           FROM lineitem),
         a AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(rx AS HUGEINT)) AS sx, SUM(CAST(ry AS HUGEINT)) AS sy,
             SUM(CAST(rx AS HUGEINT) * CAST(ry AS HUGEINT)) AS sxy,
             SUM(CAST(rx AS HUGEINT) * CAST(rx AS HUGEINT)) AS sxx,
             SUM(CAST(ry AS HUGEINT) * CAST(ry AS HUGEINT)) AS syy
           FROM r GROUP BY 1),
         d AS (SELECT l_returnflag, n, CAST(n AS DOUBLE) AS nd,
             CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
             CAST(sxy AS DOUBLE) AS sxyd, CAST(sxx AS DOUBLE) AS sxxd,
             CAST(syy AS DOUBLE) AS syyd
           FROM a)
         SELECT l_returnflag, n,
           CASE WHEN nd * sxxd - sxd * sxd > 0 AND nd * syyd - syd * syd > 0
             THEN round((nd * sxyd - sxd * syd)
               / sqrt((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)), 6)
           END AS rho
         FROM d ORDER BY l_returnflag""",
    // Combined-sample doubled ranks, exact tie-cube correction, one
    // fixed z tree — spelled exactly as RankStats.mannWhitney.
    "q_mannwhitney" ->
      """WITH f AS (SELECT l_returnflag, l_linestatus = 'O' AS isa,
             l_discount AS v
           FROM lineitem WHERE l_linestatus IN ('O', 'F')),
         r AS (SELECT l_returnflag, isa,
             rank() OVER (PARTITION BY l_returnflag ORDER BY v)
               + count(*) OVER (PARTITION BY l_returnflag ORDER BY v
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r2
           FROM f),
         t AS (SELECT l_returnflag,
             SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT) * CAST(c AS HUGEINT)
               - CAST(c AS HUGEINT)) AS tcorr
           FROM (SELECT l_returnflag, v, COUNT(*) AS c FROM f GROUP BY 1, 2)
           GROUP BY 1),
         a AS (SELECT l_returnflag,
             CAST(SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN isa THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
             SUM(CASE WHEN isa THEN CAST(r2 AS HUGEINT) ELSE 0 END) AS r2a
           FROM r GROUP BY 1),
         d AS (SELECT a.l_returnflag, n_a, n_b,
             CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd,
             CAST(n_a + n_b AS DOUBLE) AS nd,
             CAST(r2a AS DOUBLE) AS r2ad, CAST(tcorr AS DOUBLE) AS tcorrd
           FROM a JOIN t ON a.l_returnflag = t.l_returnflag),
         u AS (SELECT l_returnflag, n_a, n_b, nad, nbd, nd, tcorrd,
             r2ad - nad * (nad + 1.0) AS du
           FROM d)
         SELECT l_returnflag, n_a, n_b,
           du / 2.0 AS u_a,
           nad * nbd - du / 2.0 AS u_b,
           CASE WHEN n_a > 0 AND n_b > 0 AND
               nad * nbd / 3.0 * (nd + 1.0 - tcorrd / (nd * (nd - 1.0))) > 0
             THEN round((du - nad * nbd)
               / sqrt(nad * nbd / 3.0
                   * (nd + 1.0 - tcorrd / (nd * (nd - 1.0)))), 6)
           END AS z
         FROM u ORDER BY l_returnflag""",
    // Sorted-rank Gini: DECIMAL-exact Σi·x and Σx, then the identical
    // IEEE tree as Inequality.giniPerKey.
    "q_gini" ->
      """WITH r AS (SELECT o_orderpriority,
             CAST(o_totalprice AS DECIMAL(18,4)) AS x,
             row_number() OVER (PARTITION BY o_orderpriority
               ORDER BY CAST(o_totalprice AS DECIMAL(18,4))) AS i
           FROM orders),
         a AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(x * CAST(i AS DECIMAL(12,0))) AS si,
             MIN(x) AS minx
           FROM r GROUP BY 1),
         d AS (SELECT o_orderpriority, n, CAST(n AS DOUBLE) AS nd,
             CAST(sx AS DOUBLE) AS sxd, CAST(si AS DOUBLE) AS sid, minx
           FROM a)
         SELECT o_orderpriority, n, sxd AS total,
           CASE WHEN minx >= 0 AND sxd > 0
             THEN round((2.0 * sid - (nd + 1.0) * sxd) / (nd * sxd), 6)
           END AS gini
         FROM d ORDER BY o_orderpriority""",
    // Exact per-customer spend totals feed Σx², (Σx)², max x — the
    // identical trees as Inequality.hhiPerKey. x is DECIMAL(19,4), not
    // (18,4): width ≤ 18 keeps DuckDB's decimal in int64 storage and
    // x*x overflows the multiply; width 19 forces hugeint (the values
    // are identical — Spark's side is (18,4) with BigDecimal promotion).
    "q_hhi" ->
      """WITH spend AS (SELECT c_mktsegment,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(19,4)) AS x
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY c_mktsegment, c_custkey),
         a AS (SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(x * x) AS sxx, MAX(x) AS mx
           FROM spend GROUP BY 1),
         d AS (SELECT c_mktsegment, n, CAST(sx AS DOUBLE) AS sxd,
             CAST(sxx AS DOUBLE) AS sxxd, CAST(mx AS DOUBLE) AS mxd
           FROM a)
         SELECT c_mktsegment, n, sxd AS total,
           CASE WHEN sxd > 0 THEN round(sxxd / (sxd * sxd), 6) END AS hhi,
           CASE WHEN sxd > 0 THEN round(mxd / sxd, 6) END AS top_share
         FROM d ORDER BY c_mktsegment""",
    // 6-dp integer-quantized cell terms (GREATEST(e6,1) convention),
    // exact HUGEINT sums — the identical arithmetic as
    // Hypothesis.chiSquareIndependence.
    "q_chisq" ->
      """WITH f AS (SELECT user_id % 2 AS cohort, event_type AS a,
             (epoch_us(ts) // 86400000000) % 7 AS b FROM events),
         cells AS (SELECT cohort, a, b, COUNT(*) AS o FROM f GROUP BY 1, 2, 3),
         rm AS (SELECT cohort, a, SUM(o) AS ra FROM cells GROUP BY 1, 2),
         cm AS (SELECT cohort, b, SUM(o) AS cb FROM cells GROUP BY 1, 2),
         tot AS (SELECT cohort, CAST(SUM(o) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT a) AS BIGINT) AS r,
             CAST(COUNT(DISTINCT b) AS BIGINT) AS c
           FROM cells GROUP BY 1),
         grid AS (SELECT rm.cohort, a, b, ra, cb
           FROM rm JOIN cm ON rm.cohort = cm.cohort),
         j AS (SELECT grid.cohort, COALESCE(o, 0) AS o, ra, cb, n, r, c
           FROM grid LEFT JOIN cells USING (cohort, a, b)
             JOIN tot ON grid.cohort = tot.cohort),
         t AS (SELECT cohort, n, r, c,
             GREATEST((CAST(ra AS HUGEINT) * cb * 1000000) // n, 1) AS e6,
             CAST(o AS HUGEINT) * 1000000 AS o6
           FROM j),
         s AS (SELECT cohort, n, r, c,
             SUM(((o6 - e6) * (o6 - e6)) // e6) AS chi6
           FROM t GROUP BY 1, 2, 3, 4)
         SELECT cohort, n, r, c, (r - 1) * (c - 1) AS dof,
           round(CAST(chi6 AS DOUBLE) / 1000000.0, 6) AS chi2,
           CASE WHEN least(r, c) > 1
             THEN round(sqrt(CAST(chi6 AS DOUBLE) / 1000000.0
               / (CAST(n AS DOUBLE) * (CAST(least(r, c) AS DOUBLE) - 1.0))), 6)
           END AS cramers_v
         FROM s ORDER BY cohort""",
    "q_proportions" ->
      """WITH f AS (SELECT o_orderpriority, o_orderstatus = 'O' AS isa,
             o_totalprice > 200000 AS s
           FROM orders WHERE o_orderstatus IN ('O', 'F')),
         a AS (SELECT o_orderpriority,
             CAST(SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN isa AND s THEN 1 ELSE 0 END) AS BIGINT) AS x_a,
             CAST(SUM(CASE WHEN NOT isa AND s THEN 1 ELSE 0 END) AS BIGINT) AS x_b
           FROM f GROUP BY 1),
         d AS (SELECT o_orderpriority, n_a, n_b, x_a, x_b,
             CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd,
             CAST(x_a AS DOUBLE) AS xad, CAST(x_b AS DOUBLE) AS xbd
           FROM a)
         SELECT o_orderpriority, n_a, n_b, x_a, x_b,
           CASE WHEN n_a > 0 THEN round(xad / nad, 6) END AS p_a,
           CASE WHEN n_b > 0 THEN round(xbd / nbd, 6) END AS p_b,
           CASE WHEN n_a > 0 AND n_b > 0
               AND (xad + xbd) / (nad + nbd) > 0
               AND (xad + xbd) / (nad + nbd) < 1
             THEN round((xad / nad - xbd / nbd)
               / sqrt((xad + xbd) / (nad + nbd)
                   * (1.0 - (xad + xbd) / (nad + nbd))
                   * (1.0 / nad + 1.0 / nbd)), 6)
           END AS z
         FROM d ORDER BY o_orderpriority""",
    // Leading digit from the integer-part string; expected shares are
    // the SAME hardcoded literals as Benford.Expected.
    "q_benford" ->
      """WITH f AS (SELECT o_orderstatus,
             CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
               1, 1) AS INT) AS digit
           FROM orders WHERE o_totalprice >= 1),
         counted AS (SELECT o_orderstatus, digit, COUNT(*) AS n_d
           FROM f GROUP BY 1, 2),
         tot AS (SELECT o_orderstatus, CAST(SUM(n_d) AS BIGINT) AS n
           FROM counted GROUP BY 1),
         exp AS (SELECT digit, CAST(exp_share AS DOUBLE) AS exp_share
           FROM (VALUES
             (1, 0.3010299956639812), (2, 0.17609125905568124),
             (3, 0.12493873660829992), (4, 0.09691001300805642),
             (5, 0.07918124604762482), (6, 0.06694678963061322),
             (7, 0.05799194697768673), (8, 0.05115252244738129),
             (9, 0.04575749056067514)) AS t(digit, exp_share)),
         g AS (SELECT o_orderstatus, n, digit, exp_share
           FROM tot CROSS JOIN exp),
         j AS (SELECT g.o_orderstatus, g.digit,
             CAST(COALESCE(n_d, 0) AS BIGINT) AS n_d, n, exp_share
           FROM g LEFT JOIN counted
             ON g.o_orderstatus = counted.o_orderstatus
               AND g.digit = counted.digit)
         SELECT o_orderstatus, digit, n_d, n,
           round(CAST(n_d AS DOUBLE) / CAST(n AS DOUBLE), 6) AS obs_share,
           exp_share,
           round(abs(CAST(n_d AS DOUBLE) / CAST(n AS DOUBLE) - exp_share), 6)
             AS abs_dev
         FROM j ORDER BY o_orderstatus, digit""",
    // Peer-inclusive RANGE cumulative counts, exact HUGEINT
    // cross-products, one division — the identical arithmetic as
    // Hypothesis.ksTest.
    "q_ks" ->
      """WITH f AS (SELECT l_returnflag, l_linestatus = 'O' AS isa,
             l_extendedprice AS v
           FROM lineitem WHERE l_linestatus IN ('O', 'F')),
         t AS (SELECT l_returnflag,
             CAST(SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS BIGINT) AS n_b
           FROM f GROUP BY 1),
         r AS (SELECT l_returnflag,
             SUM(CASE WHEN isa THEN 1 ELSE 0 END) OVER (
               PARTITION BY l_returnflag ORDER BY v
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
             SUM(CASE WHEN NOT isa THEN 1 ELSE 0 END) OVER (
               PARTITION BY l_returnflag ORDER BY v
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
           FROM f),
         m AS (SELECT r.l_returnflag, n_a, n_b,
             MAX(ABS(CAST(ca AS HUGEINT) * n_b - CAST(cb AS HUGEINT) * n_a))
               AS dmax
           FROM r JOIN t USING (l_returnflag) GROUP BY 1, 2, 3),
         d AS (SELECT l_returnflag, n_a, n_b,
             CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd,
             CAST(dmax AS DOUBLE) AS dmaxd
           FROM m)
         SELECT l_returnflag, n_a, n_b,
           CASE WHEN n_a > 0 AND n_b > 0
             THEN round(dmaxd / (nad * nbd), 6) END AS d,
           CASE WHEN n_a > 0 AND n_b > 0
             THEN round(sqrt(nad * nbd / (nad + nbd))
               * (dmaxd / (nad * nbd)), 6) END AS ks_stat
         FROM d ORDER BY l_returnflag""",
    // quantile_cont ≡ percentile bit-for-bit at quarter fractions over
    // integer-valued quantities; fences and clamp replay the identical
    // trees as Robust.iqrStats.
    "q_robust_stats" ->
      """WITH q AS (SELECT l_returnflag,
             quantile_cont(l_quantity, 0.25) AS q1,
             quantile_cont(l_quantity, 0.75) AS q3
           FROM lineitem GROUP BY 1),
         j AS (SELECT l.l_returnflag, l_quantity AS v, q1, q3,
             q1 - (q3 - q1) * 1.5 AS lo, q3 + (q3 - q1) * 1.5 AS hi
           FROM lineitem l JOIN q USING (l_returnflag))
         SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, q1, q3,
           q3 - q1 AS iqr, lo, hi,
           CAST(SUM(CASE WHEN v < lo OR v > hi THEN 1 ELSE 0 END) AS BIGINT)
             AS n_out,
           round(CAST(SUM(CAST(GREATEST(lo, LEAST(hi, v)) AS DECIMAL(18,4)))
             AS DOUBLE) / COUNT(*), 6) AS winsor_mean
         FROM j GROUP BY l_returnflag, q1, q3, lo, hi
         ORDER BY l_returnflag""",
    // Exact DECIMAL power sums then the identical central-moment IEEE
    // trees as Moments.skewKurt.
    "q_moments" ->
      """WITH p AS (SELECT l_returnflag, CAST(l_quantity AS DECIMAL(8,4)) AS x,
             CAST(CAST(l_quantity AS DECIMAL(8,4))
               * CAST(l_quantity AS DECIMAL(8,4)) AS DECIMAL(20,8)) AS x2
           FROM lineitem),
         p2 AS (SELECT l_returnflag, x, x2,
             CAST(x2 * x AS DECIMAL(28,12)) AS x3 FROM p),
         p3 AS (SELECT l_returnflag, x, x2, x3, x3 * x AS x4 FROM p2),
         a AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS s1, SUM(x2) AS s2, SUM(x3) AS s3, SUM(x4) AS s4
           FROM p3 GROUP BY 1),
         d AS (SELECT l_returnflag, n, CAST(n AS DOUBLE) AS nd,
             CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
             CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
             CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
             CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
           FROM a),
         m AS (SELECT l_returnflag, n, nd, m1,
             r2 - m1 * m1 AS m2,
             r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1 AS m3,
             r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2
               - 3.0 * m1 * m1 * m1 * m1 AS m4
           FROM d)
         SELECT l_returnflag, n, round(m1, 6) AS mean,
           round(m2, 6) AS variance,
           CASE WHEN m2 > 0 THEN round(m3 / (m2 * sqrt(m2)), 6)
           END AS skewness,
           CASE WHEN m2 > 0 THEN round(m4 / (m2 * m2), 6) END AS kurtosis,
           CASE WHEN m2 > 0 THEN round(nd / 6.0
             * ((m3 / (m2 * sqrt(m2))) * (m3 / (m2 * sqrt(m2)))
               + 0.25 * (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0)), 6)
           END AS jb
         FROM m ORDER BY l_returnflag""",
    // The max-min characterization evaluated directly from DECIMAL
    // prefix sums — an independent derivation of the PAVA fit (see
    // Isotonic scaladoc; double rounding is monotone over the finite
    // candidate set, so max/min commute with the double cast).
    "q_isotonic" ->
      """WITH obs AS (SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) // 14400 AS o,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS y
           FROM events GROUP BY 1, 2),
         idx AS (SELECT event_type, o, y, row_number() OVER (
             PARTITION BY event_type ORDER BY o) AS i FROM obs),
         ps AS (SELECT event_type, o, y, i, SUM(y) OVER (
             PARTITION BY event_type ORDER BY i) AS s FROM idx),
         pairs AS (SELECT a.event_type, a.i AS j, b.i AS k,
             CAST(b.s - a.s + a.y AS DOUBLE)
               / CAST(b.i - a.i + 1 AS DOUBLE) AS m
           FROM ps a JOIN ps b
             ON a.event_type = b.event_type AND b.i >= a.i),
         minm AS (SELECT p.event_type, i.i, p.j, MIN(p.m) AS mn
           FROM pairs p JOIN idx i
             ON p.event_type = i.event_type AND p.j <= i.i AND p.k >= i.i
           GROUP BY 1, 2, 3),
         fit AS (SELECT event_type, i, MAX(mn) AS fitted
           FROM minm GROUP BY 1, 2)
         SELECT idx.event_type, idx.o, CAST(idx.y AS DOUBLE) AS y,
           round(fit.fitted, 6) AS fitted
         FROM idx JOIN fit
           ON idx.event_type = fit.event_type AND idx.i = fit.i
         ORDER BY idx.event_type, idx.o""",
    // The identical Welch trees over exact DECIMAL sums.
    "q_welch" ->
      """WITH f AS (SELECT l_returnflag, l_linestatus = 'O' AS isa,
             CAST(l_extendedprice AS DECIMAL(18,4)) AS x
           FROM lineitem WHERE l_linestatus IN ('O', 'F')),
         a AS (SELECT l_returnflag,
             CAST(SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             SUM(CASE WHEN isa THEN x END) AS sa,
             SUM(CASE WHEN NOT isa THEN x END) AS sb,
             SUM(CASE WHEN isa THEN CAST(x AS DECIMAL(19,4))
               * CAST(x AS DECIMAL(19,4)) END) AS qa,
             SUM(CASE WHEN NOT isa THEN CAST(x AS DECIMAL(19,4))
               * CAST(x AS DECIMAL(19,4)) END) AS qb
           FROM f GROUP BY 1),
         d AS (SELECT l_returnflag, n_a, n_b,
             CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd,
             CAST(sa AS DOUBLE) AS sad, CAST(sb AS DOUBLE) AS sbd,
             CAST(qa AS DOUBLE) AS qad, CAST(qb AS DOUBLE) AS qbd
           FROM a),
         m AS (SELECT l_returnflag, n_a, n_b, nad, nbd,
             sad / nad AS ma, sbd / nbd AS mb,
             (qad - sad * sad / nad) / (nad - 1.0) / nad AS sea,
             (qbd - sbd * sbd / nbd) / (nbd - 1.0) / nbd AS seb
           FROM d)
         SELECT l_returnflag, n_a, n_b,
           CASE WHEN n_a > 0 THEN round(ma, 6) END AS mean_a,
           CASE WHEN n_b > 0 THEN round(mb, 6) END AS mean_b,
           CASE WHEN n_a > 1 AND n_b > 1 AND sea + seb > 0
             THEN round((ma - mb) / sqrt(sea + seb), 6) END AS t,
           CASE WHEN n_a > 1 AND n_b > 1 AND sea + seb > 0
             THEN round((sea + seb) * (sea + seb)
               / (sea * sea / (nad - 1.0) + seb * seb / (nbd - 1.0)), 6)
           END AS df
         FROM m ORDER BY l_returnflag""",
    // Lower-median rank selection over all pairwise slopes — the
    // identical construction as TheilSen.fit.
    "q_theilsen" ->
      """WITH obs AS (SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) // 14400 AS o,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS y
           FROM events GROUP BY 1, 2),
         pairs AS (SELECT a.event_type,
             CAST(b.y - a.y AS DOUBLE) / CAST(b.o - a.o AS DOUBLE) AS slope
           FROM obs a JOIN obs b
             ON a.event_type = b.event_type AND b.o > a.o),
         sl AS (SELECT event_type, slope,
             row_number() OVER (PARTITION BY event_type ORDER BY slope) AS rnk,
             COUNT(*) OVER (PARTITION BY event_type) AS m
           FROM pairs),
         s AS (SELECT event_type, m AS n_pairs, slope
           FROM sl WHERE rnk = (m + 1) // 2),
         res AS (SELECT o2.event_type, s.slope, s.n_pairs,
             CAST(o2.y AS DOUBLE) - s.slope * CAST(o2.o AS DOUBLE) AS r
           FROM obs o2 JOIN s ON o2.event_type = s.event_type),
         rr AS (SELECT event_type, slope, n_pairs, r,
             row_number() OVER (PARTITION BY event_type ORDER BY r) AS rnk,
             COUNT(*) OVER (PARTITION BY event_type) AS n
           FROM res)
         SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           round(slope, 6) AS slope, round(r, 6) AS intercept
         FROM rr WHERE rnk = (n + 1) // 2 ORDER BY event_type""",
    // q_theilsen over the md5-rank 64-point subsample — the identical
    // hash selection (md5 of key|order, smallest 64 per key), then the
    // same pair/median construction.
    "q_theilsen_sampled" ->
      """WITH obs0 AS (SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) // 14400 AS o,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS y
           FROM events GROUP BY 1, 2),
         ranked AS (SELECT event_type, o, y,
             row_number() OVER (PARTITION BY event_type
               ORDER BY md5(concat_ws('|', event_type, CAST(o AS VARCHAR)))) AS hr
           FROM obs0),
         obs AS (SELECT event_type, o, y FROM ranked WHERE hr <= 64),
         pairs AS (SELECT a.event_type,
             CAST(b.y - a.y AS DOUBLE) / CAST(b.o - a.o AS DOUBLE) AS slope
           FROM obs a JOIN obs b
             ON a.event_type = b.event_type AND b.o > a.o),
         sl AS (SELECT event_type, slope,
             row_number() OVER (PARTITION BY event_type ORDER BY slope) AS rnk,
             COUNT(*) OVER (PARTITION BY event_type) AS m
           FROM pairs),
         s AS (SELECT event_type, m AS n_pairs, slope
           FROM sl WHERE rnk = (m + 1) // 2),
         res AS (SELECT o2.event_type, s.slope, s.n_pairs,
             CAST(o2.y AS DOUBLE) - s.slope * CAST(o2.o AS DOUBLE) AS r
           FROM obs o2 JOIN s ON o2.event_type = s.event_type),
         rr AS (SELECT event_type, slope, n_pairs, r,
             row_number() OVER (PARTITION BY event_type ORDER BY r) AS rnk,
             COUNT(*) OVER (PARTITION BY event_type) AS n
           FROM res)
         SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           round(slope, 6) AS slope, round(r, 6) AS intercept
         FROM rr WHERE rnk = (n + 1) // 2 ORDER BY event_type""",
    // lead/lag shifts + the identical DECIMAL-sums Pearson device as
    // Regress.crosscorr.
    "q_ccf" ->
      """WITH obs AS (SELECT user_id % 2 AS cohort,
             CAST(floor(epoch(ts)) AS BIGINT) // 14400 AS slot,
             CAST(SUM(CASE WHEN event_type = 'click'
               THEN CAST(value AS DECIMAL(18,4)) ELSE 0 END) AS DOUBLE) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase'
               THEN CAST(value AS DECIMAL(18,4)) ELSE 0 END) AS DOUBLE) AS y
           FROM events GROUP BY 1, 2),
         l AS (
           SELECT cohort, -2 AS lag, x, lag(y, 2) OVER (
             PARTITION BY cohort ORDER BY slot) AS y FROM obs
           UNION ALL
           SELECT cohort, -1, x, lag(y, 1) OVER (
             PARTITION BY cohort ORDER BY slot) FROM obs
           UNION ALL
           SELECT cohort, 0, x, lead(y, 0) OVER (
             PARTITION BY cohort ORDER BY slot) FROM obs
           UNION ALL
           SELECT cohort, 1, x, lead(y, 1) OVER (
             PARTITION BY cohort ORDER BY slot) FROM obs
           UNION ALL
           SELECT cohort, 2, x, lead(y, 2) OVER (
             PARTITION BY cohort ORDER BY slot) FROM obs),
         a AS (SELECT cohort, lag, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(x AS DECIMAL(18,4))) AS sx,
             SUM(CAST(y AS DECIMAL(18,4))) AS sy,
             SUM(CAST(x AS DECIMAL(19,4)) * CAST(y AS DECIMAL(19,4))) AS sxy,
             SUM(CAST(x AS DECIMAL(19,4)) * CAST(x AS DECIMAL(19,4))) AS sxx,
             SUM(CAST(y AS DECIMAL(19,4)) * CAST(y AS DECIMAL(19,4))) AS syy
           FROM l WHERE x IS NOT NULL AND y IS NOT NULL GROUP BY 1, 2),
         d AS (SELECT cohort, lag, n, CAST(n AS DOUBLE) AS nd,
             CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
             CAST(sxy AS DOUBLE) AS sxyd, CAST(sxx AS DOUBLE) AS sxxd,
             CAST(syy AS DOUBLE) AS syyd
           FROM a)
         SELECT cohort, CAST(lag AS BIGINT) AS lag, n,
           CASE WHEN nd * sxxd - sxd * sxd > 0 AND nd * syyd - syd * syd > 0
             THEN round((nd * sxyd - sxd * syd)
               / sqrt((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)), 6)
           END AS r
         FROM d ORDER BY cohort, lag""",
    // Centered 2×m MA from exact window sums; per-phase seasonal means
    // over exact sums, centered by the UNWEIGHTED mean of the 6 phase
    // means (fixed left-to-right tree over conditional sums — the R
    // decompose() convention) — the identical trees as
    // TimeSeries.decomposeAdditive.
    "q_decompose" -> {
      val phaseMeanSql = (0 until 6).map { p =>
        s"""(CAST(SUM(CASE WHEN p = $p THEN y END) AS DOUBLE)
               - CAST(SUM(CASE WHEN p = $p THEN d END) AS DOUBLE) / 12.0)
               / CAST(COUNT(CASE WHEN p = $p THEN 1 END) AS DOUBLE)"""
      }.mkString("\n             + ")
      s"""WITH obs AS (SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) // 14400 AS o,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS y
           FROM events GROUP BY 1, 2),
         t AS (SELECT event_type, o, y,
             SUM(y) OVER (PARTITION BY event_type ORDER BY o
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s1,
             SUM(y) OVER (PARTITION BY event_type ORDER BY o
               ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS s0,
             COUNT(*) OVER (PARTITION BY event_type ORDER BY o
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS cnt
           FROM obs),
         tf AS (SELECT event_type, o, y, s1 + s0 AS d, o % 6 AS p
           FROM t WHERE cnt = 7),
         ph AS (SELECT event_type, p, CAST(COUNT(*) AS BIGINT) AS np,
             SUM(y) AS spy, SUM(d) AS spd FROM tf GROUP BY 1, 2),
         gl AS (SELECT event_type,
             ($phaseMeanSql) / 6.0 AS g
           FROM tf GROUP BY 1),
         j AS (SELECT tf.event_type, tf.o, tf.y,
             CAST(tf.d AS DOUBLE) / 12.0 AS trend,
             (CAST(spy AS DOUBLE) - CAST(spd AS DOUBLE) / 12.0)
                 / CAST(np AS DOUBLE)
               - gl.g AS seasonal
           FROM tf JOIN ph ON tf.event_type = ph.event_type AND tf.p = ph.p
             JOIN gl ON tf.event_type = gl.event_type)
         SELECT event_type, o, CAST(y AS DOUBLE) AS y,
           round(trend, 6) AS trend, round(seasonal, 6) AS seasonal,
           round(CAST(y AS DOUBLE) - trend - seasonal, 6) AS resid
         FROM j ORDER BY event_type, o"""
    },
    // Staged 6-dp integer quantization of E and V (HUGEINT // chains),
    // exact sums, one IEEE tree — identical to Survival.logRank.
    "q_logrank" ->
      """WITH u AS (SELECT user_id, min(epoch_us(ts)) AS t0,
             max(epoch_us(ts)) AS t1,
             min(CASE WHEN event_type = 'purchase' AND value >= 150
                 THEN epoch_us(ts) END) AS tc
           FROM events GROUP BY 1),
         s AS (SELECT CAST(user_id % 3 AS VARCHAR) AS stratum,
             user_id % 2 = 0 AS isa,
             (coalesce(tc, t1) - t0) // 3600000000 AS t,
             CASE WHEN tc IS NOT NULL THEN 1 ELSE 0 END AS obs
           FROM u),
         c AS (SELECT stratum, t,
             SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS cb,
             SUM(CASE WHEN isa THEN obs ELSE 0 END) AS da,
             SUM(CASE WHEN NOT isa THEN obs ELSE 0 END) AS db
           FROM s GROUP BY 1, 2),
         r AS (SELECT stratum, t, da, db,
             SUM(ca) OVER (PARTITION BY stratum ORDER BY t DESC) AS na,
             SUM(cb) OVER (PARTITION BY stratum ORDER BY t DESC) AS nb
           FROM c),
         f AS (SELECT stratum, da, na, nb, da + db AS d, na + nb AS n
           FROM r WHERE da + db > 0),
         q AS (SELECT stratum, da, d, n, nb,
             (CAST(d AS HUGEINT) * na * 1000000) // n AS e16
           FROM f),
         q2 AS (SELECT stratum, da, e16,
             CASE WHEN n > 1
               THEN ((e16 * nb) // n * (n - d)) // (n - 1) ELSE 0 END AS v6
           FROM q),
         t2 AS (SELECT stratum,
             CAST(SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS BIGINT) AS n_b
           FROM s GROUP BY 1),
         ag AS (SELECT stratum, CAST(SUM(da) AS BIGINT) AS o_a,
             CAST(SUM(e16) AS DOUBLE) AS e16d,
             CAST(SUM(v6) AS DOUBLE) AS v6d
           FROM q2 GROUP BY 1)
         SELECT ag.stratum, n_a, n_b, o_a,
           round(e16d / 1000000.0, 6) AS e_a,
           CASE WHEN n_a > 0 AND n_b > 0 AND 1000000.0 * v6d > 0
             THEN round((CAST(o_a AS DOUBLE) * 1000000.0 - e16d)
               * (CAST(o_a AS DOUBLE) * 1000000.0 - e16d)
               / (1000000.0 * v6d), 6) END AS chi2,
           CASE WHEN n_a > 0 AND n_b > 0 AND 1000000.0 * v6d > 0
             THEN round((CAST(o_a AS DOUBLE) * 1000000.0 - e16d)
               / sqrt(1000000.0 * v6d), 6) END AS z
         FROM ag JOIN t2 ON ag.stratum = t2.stratum
         ORDER BY ag.stratum""",
    // Exact half-fraction medians (quantile_cont ≡ percentile) and the
    // shared 1.4826… consistency literal — identical to Robust.madStats.
    "q_mad_stats" ->
      """WITH m AS (SELECT l_returnflag,
             quantile_cont(l_quantity, 0.5) AS median
           FROM lineitem GROUP BY 1),
         d AS (SELECT l.l_returnflag, median,
             abs(l_quantity - median) AS ad
           FROM lineitem l JOIN m USING (l_returnflag)),
         md AS (SELECT l_returnflag, median,
             quantile_cont(ad, 0.5) AS mad
           FROM d GROUP BY 1, 2),
         c AS (SELECT d.l_returnflag, d.median, md.mad,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN ad > 3.0 * (mad * 1.482602218505602)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_out
           FROM d JOIN md ON d.l_returnflag = md.l_returnflag
           GROUP BY 1, 2, 3)
         SELECT l_returnflag, n, median, mad,
           round(mad * 1.482602218505602, 6) AS sigma_hat, n_out
         FROM c ORDER BY l_returnflag""",
    // Rank-selection quantile mapping with exact integer target ranks —
    // identical to Normalize.quantileNormalize.
    "q_quantile_norm" ->
      """WITH spend AS (SELECT c_mktsegment, c_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS spend
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2),
         s AS (SELECT c_mktsegment, c_custkey AS id, spend AS value,
             row_number() OVER (PARTITION BY c_mktsegment
               ORDER BY spend, c_custkey) AS src_rank,
             COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
           FROM spend WHERE c_custkey % 2 = 1),
         r AS (SELECT c_mktsegment, spend AS rv,
             row_number() OVER (PARTITION BY c_mktsegment
               ORDER BY spend) AS t,
             COUNT(*) OVER (PARTITION BY c_mktsegment) AS m
           FROM spend WHERE c_custkey % 2 = 0),
         mm AS (SELECT c_mktsegment, MAX(m) AS m FROM r GROUP BY 1),
         j AS (SELECT s.c_mktsegment, s.id, s.value, s.src_rank,
             (CAST(s.src_rank AS HUGEINT) * mm.m + s.n - 1) // s.n AS t
           FROM s JOIN mm ON s.c_mktsegment = mm.c_mktsegment)
         SELECT j.c_mktsegment, CAST(j.id AS BIGINT) AS id, j.value,
           CAST(j.src_rank AS BIGINT) AS src_rank, r.rv AS normalized
         FROM j JOIN r ON j.c_mktsegment = r.c_mktsegment AND j.t = r.t
         ORDER BY j.c_mktsegment, j.src_rank""",
    // Exact integer S and tie-corrected variance numerator — identical
    // to TheilSen.mannKendall.
    "q_mann_kendall" ->
      """WITH obs AS (SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) // 14400 AS o,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS y
           FROM events GROUP BY 1, 2),
         p AS (SELECT a.event_type, CAST(sign(b.y - a.y) AS BIGINT) AS sg
           FROM obs a JOIN obs b
             ON a.event_type = b.event_type AND b.o > a.o),
         sA AS (SELECT event_type, CAST(SUM(sg) AS BIGINT) AS s
           FROM p GROUP BY 1),
         t AS (SELECT event_type,
             SUM(CAST(c AS HUGEINT) * (c - 1) * (2 * c + 5)) AS tcorr,
             CAST(SUM(c) AS BIGINT) AS n
           FROM (SELECT event_type, y, COUNT(*) AS c FROM obs GROUP BY 1, 2)
           GROUP BY 1),
         d AS (SELECT sA.event_type, s, n, CAST(n AS DOUBLE) AS nd,
             CAST(s AS DOUBLE) AS sd, CAST(tcorr AS DOUBLE) AS tc
           FROM sA JOIN t ON sA.event_type = t.event_type),
         v AS (SELECT event_type, s, n, nd, sd,
             (nd * (nd - 1.0) * (2.0 * nd + 5.0) - tc) / 18.0 AS var18
           FROM d)
         SELECT event_type, n, s,
           round(sd / (nd * (nd - 1.0) / 2.0), 6) AS tau,
           CASE WHEN var18 > 0 THEN round(
             CASE WHEN s > 0 THEN (sd - 1.0) / sqrt(var18)
                  WHEN s < 0 THEN (sd + 1.0) / sqrt(var18)
                  ELSE CAST(0.0 AS DOUBLE) END, 6) END AS z
         FROM v ORDER BY event_type""",
    // κ = (D·N − P)/(N² − P) over exact counts — identical to
    // Hypothesis.cohensKappa.
    "q_kappa" ->
      """WITH f AS (SELECT o_orderstatus,
             CAST(CAST(substr(o_orderpriority, 1, 1) AS INT) <= 2
               AS VARCHAR) AS a,
             CAST(o_totalprice > 200000 AS VARCHAR) AS b
           FROM orders),
         cells AS (SELECT o_orderstatus, a, b, COUNT(*) AS o
           FROM f GROUP BY 1, 2, 3),
         tot AS (SELECT o_orderstatus, CAST(SUM(o) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN a = b THEN o ELSE 0 END) AS BIGINT) AS d
           FROM cells GROUP BY 1),
         rm AS (SELECT o_orderstatus, a AS l, SUM(o) AS ra
           FROM cells GROUP BY 1, 2),
         cm AS (SELECT o_orderstatus, b AS l, SUM(o) AS cb
           FROM cells GROUP BY 1, 2),
         ps AS (SELECT rm.o_orderstatus,
             SUM(CAST(ra AS HUGEINT) * cb) AS p
           FROM rm JOIN cm ON rm.o_orderstatus = cm.o_orderstatus
             AND rm.l = cm.l
           GROUP BY 1),
         j AS (SELECT tot.o_orderstatus, n, d, p,
             CAST(n AS DOUBLE) AS nd,
             CAST(d AS HUGEINT) * n - p AS num,
             CAST(n AS HUGEINT) * n - p AS den
           FROM tot JOIN ps ON tot.o_orderstatus = ps.o_orderstatus)
         SELECT o_orderstatus, n, d AS agree,
           round(CAST(d AS DOUBLE) / nd, 6) AS p_o,
           round(CAST(p AS DOUBLE) / (nd * nd), 6) AS p_e,
           CASE WHEN den <> 0
             THEN round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)
           END AS kappa
         FROM j ORDER BY o_orderstatus""",
    // Exact integer w-moments, one IEEE tree — identical to
    // Hypothesis.trendTest.
    "q_trend_test" ->
      """WITH f AS (SELECT o_orderstatus,
             CAST(substr(o_orderpriority, 1, 1) AS INT) AS w,
             o_totalprice > 200000 AS s
           FROM orders),
         a AS (SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS x,
             SUM(CAST(w AS HUGEINT)) AS swn,
             SUM(CASE WHEN s THEN CAST(w AS HUGEINT) ELSE 0 END) AS swx,
             SUM(CAST(w AS HUGEINT) * CAST(w AS HUGEINT)) AS sw2n
           FROM f GROUP BY 1),
         d AS (SELECT o_orderstatus, n, x,
             CAST(n AS DOUBLE) AS nd, CAST(x AS DOUBLE) AS xd,
             CAST(swn AS DOUBLE) AS swnd, CAST(swx AS DOUBLE) AS swxd,
             CAST(sw2n AS DOUBLE) AS sw2nd
           FROM a)
         SELECT o_orderstatus, n, x,
           CASE WHEN n > 0 THEN round(xd / nd, 6) END AS p,
           CASE WHEN xd * (nd - xd) * (nd * sw2nd - swnd * swnd) / nd > 0
             THEN round((nd * swxd - xd * swnd)
               / sqrt(xd * (nd - xd) * (nd * sw2nd - swnd * swnd) / nd), 6)
           END AS z
         FROM d ORDER BY o_orderstatus""",

    // doubled-rank device (see q_mannwhitney) + 9-dp integer-quantized
    // group terms over HUGEINT `//` — identical to RankStats.kruskalWallis.
    "q_kruskal" ->
      """WITH f AS (SELECT l_returnflag AS k, l_suppkey % 5 AS g,
             l_quantity AS v FROM lineitem),
         r AS (SELECT k, g,  v,
             rank() OVER (PARTITION BY k ORDER BY v)
               + count(*) OVER (PARTITION BY k ORDER BY v
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r2
           FROM f),
         t AS (SELECT k,
             SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT) * CAST(c AS HUGEINT)
               - CAST(c AS HUGEINT)) AS tcorr
           FROM (SELECT k, v, COUNT(*) AS c FROM f GROUP BY 1, 2)
           GROUP BY 1),
         pg AS (SELECT k, g, CAST(COUNT(*) AS BIGINT) AS ng,
             SUM(CAST(r2 AS HUGEINT)) AS s2
           FROM r GROUP BY 1, 2),
         pk AS (SELECT k, CAST(SUM(ng) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS ngroups FROM pg GROUP BY 1),
         tm AS (SELECT pg.k,
             SUM((s2 * s2 * 1000000000)
               // (CAST(ng AS HUGEINT) * n * (n + 1))) AS tsum
           FROM pg JOIN pk ON pg.k = pk.k GROUP BY 1),
         d AS (SELECT pk.k, n, ngroups, CAST(n AS DOUBLE) AS nd,
             CAST(tsum AS DOUBLE) AS tsumd, CAST(tcorr AS DOUBLE) AS tcorrd
           FROM pk JOIN tm ON pk.k = tm.k JOIN t ON pk.k = t.k),
         e AS (SELECT k, n, ngroups, nd,
             3.0 * tsumd / 1000000000.0 - 3.0 * (nd + 1.0) AS h,
             1.0 - tcorrd / (nd * nd * nd - nd) AS c
           FROM d)
         SELECT k AS l_returnflag, n, ngroups AS n_groups,
           CASE WHEN n >= 2 AND ngroups >= 2 AND c > 0
             THEN round(h, 6) END AS h,
           CASE WHEN n >= 2 AND ngroups >= 2 AND c > 0
             THEN round(h / c, 6) END AS h_corrected
         FROM e ORDER BY l_returnflag""",

    // pivot-style conditional exact-DECIMAL sums, fixed left-to-right
    // F tree — identical to Anova.oneWayF / brownForsythe.
    "q_anova" -> anovaOracleSql(brownForsythe = false),
    "q_brown_forsythe" -> anovaOracleSql(brownForsythe = true),

    // exact conditional DECIMAL sums, one IEEE tree — identical to
    // Hypothesis.cohensD.
    "q_cohens_d" ->
      """WITH f AS (SELECT l_returnflag AS k, l_linestatus = 'O' AS isa,
             CAST(l_discount AS DECIMAL(8,4)) AS x
           FROM lineitem WHERE l_linestatus IN ('O', 'F')),
         a AS (SELECT k,
             CAST(SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN isa THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
             SUM(CASE WHEN isa THEN x END) AS sa,
             SUM(CASE WHEN NOT isa THEN x END) AS sb,
             SUM(CASE WHEN isa THEN x * x END) AS qa,
             SUM(CASE WHEN NOT isa THEN x * x END) AS qb
           FROM f GROUP BY 1),
         d AS (SELECT k, n_a, n_b,
             CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd,
             CAST(sa AS DOUBLE) AS sad, CAST(sb AS DOUBLE) AS sbd,
             CAST(qa AS DOUBLE) AS qad, CAST(qb AS DOUBLE) AS qbd
           FROM a),
         e AS (SELECT k, n_a, n_b, nad, nbd, sad, sbd,
             ((qad - sad * sad / nad) + (qbd - sbd * sbd / nbd))
               / (nad + nbd - 2.0) AS sp2
           FROM d)
         SELECT k AS l_returnflag, n_a, n_b,
           CASE WHEN n_a > 0 THEN round(sad / nad, 6) END AS mean_a,
           CASE WHEN n_b > 0 THEN round(sbd / nbd, 6) END AS mean_b,
           CASE WHEN n_a >= 2 AND n_b >= 2 AND sp2 > 0
             THEN round((sad / nad - sbd / nbd) / sqrt(sp2), 6) END AS d
         FROM e ORDER BY l_returnflag""",

    // rank-selected trim, exact decimal kept-sum; Winsorized sum =
    // keptSum + k·lo + k·hi — identical to Robust.trimmedStats.
    "q_trimmed_stats" ->
      """WITH r AS (SELECT o_orderpriority AS k,
             CAST(o_totalprice AS DECIMAL(18,4)) AS x,
             row_number() OVER (PARTITION BY o_orderpriority
               ORDER BY CAST(o_totalprice AS DECIMAL(18,4))) AS r,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
           FROM orders),
         t AS (SELECT k, x, r, n, n * 1 // 10 AS kk FROM r),
         a AS (SELECT k, CAST(max(n) AS BIGINT) AS n,
             max(kk) AS kk,
             SUM(CASE WHEN r > kk AND r <= n - kk THEN x END) AS skept,
             CAST(SUM(CASE WHEN r > kk AND r <= n - kk THEN 1 ELSE 0 END)
               AS BIGINT) AS n_trimmed,
             MIN(CASE WHEN r > kk AND r <= n - kk THEN x END) AS lo,
             MAX(CASE WHEN r > kk AND r <= n - kk THEN x END) AS hi
           FROM t GROUP BY 1)
         SELECT k AS o_orderpriority, n, n_trimmed,
           CASE WHEN n_trimmed > 0 THEN
             round(CAST(skept AS DOUBLE) / CAST(n_trimmed AS DOUBLE), 6)
           END AS trimmed_mean,
           CASE WHEN n_trimmed > 0 THEN
             round(CAST(skept + kk * lo + kk * hi AS DOUBLE)
               / CAST(n AS DOUBLE), 6)
           END AS winsorized_mean
         FROM a ORDER BY o_orderpriority""",

    // observed-cell MI terms as one IEEE tree over exact counts,
    // rounded-then-DECIMAL summed — identical to Hypothesis.mutualInfo.
    "q_mutual_info" ->
      """WITH f AS (SELECT o_orderstatus AS k, o_orderpriority AS x,
             CAST(o_custkey % 3 AS VARCHAR) AS y FROM orders),
         cells AS (SELECT k, x, y, count(*) AS nxy FROM f GROUP BY 1, 2, 3),
         xm AS (SELECT k, x, CAST(SUM(nxy) AS BIGINT) AS nx
           FROM cells GROUP BY 1, 2),
         ym AS (SELECT k, y, CAST(SUM(nxy) AS BIGINT) AS ny
           FROM cells GROUP BY 1, 2),
         tot AS (SELECT k, CAST(SUM(nxy) AS BIGINT) AS n
           FROM cells GROUP BY 1),
         terms AS (SELECT c.k, t.n,
             CAST(nxy AS DOUBLE) / CAST(t.n AS DOUBLE)
               * ln(CAST(t.n AS DOUBLE) * CAST(nxy AS DOUBLE)
                 / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))) AS t
           FROM cells c
           JOIN xm ON c.k = xm.k AND c.x = xm.x
           JOIN ym ON c.k = ym.k AND c.y = ym.y
           JOIN tot t ON c.k = t.k)
         SELECT k AS o_orderstatus, CAST(max(n) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_cells,
           CASE WHEN max(n) > 0 THEN
             round(CAST(SUM(CAST(round(t, 9) AS DECIMAL(28,12))) AS DOUBLE), 6)
           END AS mi
         FROM terms GROUP BY 1 ORDER BY o_orderstatus""",

    // one-pass pairwise sufficient statistics, olsPerKey's IEEE tree —
    // identical to Regress.corrMatrix.
    "q_corr_matrix" -> corrMatrixOracleSql,
  )

  /** Oracle generator mirroring Regress.corrMatrix over lineitem's four
    * measures: one aggregation CTE + one SELECT per unordered pair. */
  private def corrMatrixOracleSql: String = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    // width 19, not 18: DuckDB multiplies DECIMAL(18) in int64, which
    // overflows — width >= 19 forces the hugeint path (values identical)
    def d(c: String) = s"CAST($c AS DECIMAL(19,4))"
    val sums = cols.map(c => s"SUM(${d(c)}) AS s_$c") ++
      (for { i <- cols.indices; j <- i until cols.length } yield
        s"SUM(${d(cols(i))} * ${d(cols(j))}) AS p_${cols(i)}_${cols(j)}")
    val notNull = cols.map(c => s"$c IS NOT NULL").mkString(" AND ")
    val pairSelects =
      (for { i <- cols.indices; j <- (i + 1) until cols.length } yield {
        val (a, b) = (cols(i), cols(j))
        s"""SELECT '$a' AS col_a, '$b' AS col_b, n,
           CASE WHEN nd * CAST(p_${a}_$a AS DOUBLE) - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE) > 0
                 AND nd * CAST(p_${b}_$b AS DOUBLE) - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE) > 0
             THEN round((nd * CAST(p_${a}_$b AS DOUBLE) - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE))
               / sqrt((nd * CAST(p_${a}_$a AS DOUBLE) - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE))
                    * (nd * CAST(p_${b}_$b AS DOUBLE) - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE))), 6)
           END AS r
         FROM a"""
      }).mkString("\n         UNION ALL\n         ")
    s"""WITH a AS (SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) AS DOUBLE) AS nd,
           ${sums.mkString(",\n           ")}
         FROM lineitem WHERE $notNull)
         $pairSelects
         ORDER BY col_a, col_b"""
  }

  /** Shared oracle generator for q_anova / q_brown_forsythe: the same
    * conditional-sum pivot + fixed-tree F as Anova.fFrom, over the raw
    * prices or the median-centered absolute deviations. */
  private def anovaOracleSql(brownForsythe: Boolean): String = {
    val groups = Seq("Brand#1", "Brand#2", "Brand#3")
    val inList = groups.map(g => s"'$g'").mkString(", ")
    val condAggs = groups.zipWithIndex.map { case (g, i) =>
      s"""COUNT(CASE WHEN g = '$g' THEN 1 END) AS n$i,
             SUM(CASE WHEN g = '$g' THEN x END) AS s$i,
             SUM(CASE WHEN g = '$g' THEN x * x END) AS q$i"""
    }.mkString(",\n             ")
    val sumSq = groups.indices.map(i =>
      s"CAST(s$i AS DOUBLE) * CAST(s$i AS DOUBLE) / CAST(n$i AS DOUBLE)")
      .mkString(" + ")
    val allPresent = groups.indices.map(i => s"n$i > 0").mkString(" AND ")
    val baseCte =
      if (!brownForsythe)
        """base AS (SELECT p_type AS k, p_brand AS g,
             CAST(p_retailprice AS DECIMAL(8,4)) AS x
           FROM part WHERE p_brand IN (%s))""".format(inList)
      else
        """b0 AS (SELECT p_type AS k, p_brand AS g,
             CAST(p_retailprice AS DECIMAL(8,4)) AS x0
           FROM part WHERE p_brand IN (%s)),
         med AS (SELECT k, g, x0 AS med FROM (
             SELECT k, g, x0,
               row_number() OVER (PARTITION BY k, g ORDER BY x0) AS rn,
               count(*) OVER (PARTITION BY k, g) AS cnt
             FROM b0)
           WHERE rn = (cnt + 1) // 2),
         base AS (SELECT b0.k, b0.g,
             CAST(abs(b0.x0 - med.med) AS DECIMAL(9,4)) AS x
           FROM b0 JOIN med ON b0.k = med.k AND b0.g = med.g)"""
          .format(inList)
    s"""WITH $baseCte,
         a AS (SELECT k,
             $condAggs
           FROM base GROUP BY 1),
         d AS (SELECT k, CAST(n0 + n1 + n2 AS BIGINT) AS n,
             n0, n1, n2,
             CAST(n0 + n1 + n2 AS DOUBLE) AS nd,
             CAST(s0 + s1 + s2 AS DOUBLE) AS sd,
             CAST(q0 + q1 + q2 AS DOUBLE) AS qd,
             $sumSq AS sumsq
           FROM a),
         e AS (SELECT k, n, n0, n1, n2, nd,
             sumsq - sd * sd / nd AS ssb,
             qd - sumsq AS ssw
           FROM d)
         SELECT k AS p_type, n, CAST(3 AS BIGINT) AS n_groups,
           CASE WHEN $allPresent AND n > 3 AND ssw > 0
             THEN round(ssb, 6) END AS ssb,
           CASE WHEN $allPresent AND n > 3 AND ssw > 0
             THEN round(ssw, 6) END AS ssw,
           CASE WHEN $allPresent AND n > 3 AND ssw > 0
             THEN round((ssb / (3.0 - 1.0)) / (ssw / (nd - 3.0)), 6) END AS f
         FROM e ORDER BY p_type"""
  }
}
