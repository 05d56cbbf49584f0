package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Markov, Regress, Survival}
import graft.queries.QueryUtil._

/** Sequential-statistics pack: Markov transition estimation,
  * Kaplan-Meier survival, and autocorrelation diagnostics — the
  * time-ordered follow-ons to the closed-form OLS family.
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
  )
}
