package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Attribution, Regress, Spatial}
import graft.queries.QueryUtil._

/** Round-9 continuation pack: spatial grid-blocked joins, closed-form
  * per-key OLS, and multi-touch conversion attribution — three analytic
  * families a warehouse user reaches for that the inventory did not yet
  * carry.
  *
  * Oracle posture: all full-value DuckDB oracles. The spatial pair is
  * the strongest kind — the operator's grid decomposition must
  * reproduce the oracle's direct O(n²) distance predicate EXACTLY
  * (integer coordinates, integer squared distances: no epsilon to hide
  * a missed pair). OLS replays as the identical IEEE tree over exact
  * DECIMAL sufficient statistics; attribution re-derives first/last
  * touch from the JOIN formulation with min/max(struct) — a genuinely
  * different decomposition from the engine's range-window form.
  *
  * Synthetic geometry: customer points at
  * x = (c_custkey·48271) mod 10⁶, y = (c_custkey·16807) mod 10⁶
  * (the two classic Lehmer multipliers) — pure positive-integer
  * arithmetic, identical in both engines, near-uniform over the grid.
  */
object GeoQueries {

  private def points(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).customer.select(
      col("c_custkey").as("id"),
      (col("c_custkey") * 48271 % 1000000).as("x"),
      (col("c_custkey") * 16807 % 1000000).as("y"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // All point pairs within radius 30000 of each other (exact integer
    // squared distance). The operator never forms the n² cross join —
    // cell blocking with the forward half-neighborhood generates each
    // qualifying pair exactly once — while the oracle states the n²
    // definition directly; matching outputs prove the decomposition.
    "q_spatial_join" -> { (s, dir) =>
      Spatial.radiusJoin(points(s, dir), radius = 30000L)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Each point's 5 nearest neighbors within radius 50000, ranked by
    // (dist2, id) — deterministic ties. Points with thin neighborhoods
    // emit fewer than 5 rows; the oracle ranks the same bounded
    // candidate set with the same tiebreak.
    "q_spatial_knn" -> { (s, dir) =>
      Spatial.knnWithinRadius(points(s, dir), radius = 50000L, k = 5)
        .orderBy(col("id"), col("rnk"))
    },

    // Per-(returnflag, linestatus) OLS of extendedprice on quantity —
    // the SQL:2003 regr_* family as one map-combinable hash aggregation
    // over exact DECIMAL sufficient statistics, coefficients as fixed
    // IEEE trees (identical in the oracle, unlike the float regr_*
    // built-ins whose partial-sum order drifts).
    "q_linreg" -> { (s, dir) =>
      Regress.olsPerKey(Tables(s, dir).lineitem,
          Seq("l_returnflag", "l_linestatus"),
          col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // Point-in-rectangle containment: customer points × supplier
    // catchment boxes (Lehmer-derived centers and half-widths — exact
    // integer geometry, boxes may extend negative / past the grid). The
    // operator replicates each box onto only the grid cells its bbox
    // covers; the oracle states the direct points × boxes BETWEEN
    // predicate — identical pair sets prove the cell decomposition.
    "q_spatial_contain" -> { (s, dir) =>
      val rects = Tables(s, dir).supplier.select(
        col("s_suppkey").as("rid"),
        (col("s_suppkey") * 48271 % 1000000 - (col("s_suppkey") * 69621 % 20000 + 1000)).as("xmin"),
        (col("s_suppkey") * 16807 % 1000000 - (col("s_suppkey") * 40692 % 20000 + 1000)).as("ymin"),
        (col("s_suppkey") * 48271 % 1000000 + (col("s_suppkey") * 69621 % 20000 + 1000)).as("xmax"),
        (col("s_suppkey") * 16807 % 1000000 + (col("s_suppkey") * 40692 % 20000 + 1000)).as("ymax"))
      Spatial.containsJoin(points(s, dir), rects, cellSize = 25000L)
        .orderBy(col("id"), col("rid"))
    },

    // First-touch × last-touch attribution matrix over the events
    // stream: purchases attribute to click/view touches by the same
    // user in a 48 h lookback; untouched purchases are 'direct'.
    // The engine computes per-conversion touches as ONE range-window
    // pass (no join blowup); the oracle re-derives them from the
    // conversions × touches join with min/max(struct) tie-broken by
    // event id — different decomposition, identical rows required.
    "q_attribution" -> { (s, dir) =>
      Attribution.touchAttribution(Tables(s, dir).events,
          userCol = "user_id", tsCol = "ts", idCol = "event_id",
          typeCol = "event_type", valueCol = "value",
          convType = "purchase", touchTypes = Seq("click", "view"),
          lookbackUs = 48L * 3600L * 1000000L)
        .groupBy(
          coalesce(col("first_channel"), lit("direct")).as("first_channel"),
          coalesce(col("last_channel"), lit("direct")).as("last_channel"))
        .agg(count(lit(1)).as("n_conversions"),
          dsum(col("conv_value")).as("revenue"),
          sum(col("n_touches")).as("total_touches"))
        .orderBy(col("first_channel"), col("last_channel"))
    },
  )

  // ---- oracle SQL ---------------------------------------------------

  private val ptsSql =
    """p AS (SELECT c_custkey AS id, (c_custkey * 48271) % 1000000 AS x,
                    (c_custkey * 16807) % 1000000 AS y
            FROM customer)"""

  val oracles: Map[String, String] = Map(
    "q_spatial_join" ->
      s"""WITH $ptsSql
         SELECT a.id AS id_a, b.id AS id_b,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
         FROM p a JOIN p b ON a.id < b.id
         WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
               <= 900000000
         ORDER BY id_a, id_b""",
    "q_spatial_knn" ->
      s"""WITH $ptsSql,
         c AS (SELECT a.id, b.id AS neighbor_id,
                 (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
               FROM p a JOIN p b ON a.id <> b.id
               WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                     <= 2500000000),
         r AS (SELECT *, row_number() OVER (
                 PARTITION BY id ORDER BY dist2, neighbor_id) AS rnk
               FROM c)
         SELECT id, neighbor_id, dist2, CAST(rnk AS BIGINT) AS rnk
         FROM r WHERE rnk <= 5 ORDER BY id, rnk""",
    "q_spatial_contain" ->
      s"""WITH $ptsSql,
         r AS (SELECT s_suppkey AS rid,
             (s_suppkey * 48271) % 1000000 - ((s_suppkey * 69621) % 20000 + 1000) AS xmin,
             (s_suppkey * 16807) % 1000000 - ((s_suppkey * 40692) % 20000 + 1000) AS ymin,
             (s_suppkey * 48271) % 1000000 + ((s_suppkey * 69621) % 20000 + 1000) AS xmax,
             (s_suppkey * 16807) % 1000000 + ((s_suppkey * 40692) % 20000 + 1000) AS ymax
           FROM supplier)
         SELECT p.id, r.rid, p.x, p.y
         FROM p JOIN r ON p.x BETWEEN r.xmin AND r.xmax
                      AND p.y BETWEEN r.ymin AND r.ymax
         ORDER BY p.id, r.rid""",
    "q_linreg" ->
      """WITH a AS (SELECT l_returnflag, l_linestatus,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS sy,
             SUM(CAST(l_quantity AS DECIMAL(19,4))
               * CAST(l_extendedprice AS DECIMAL(19,4))) AS sxy,
             SUM(CAST(l_quantity AS DECIMAL(19,4))
               * CAST(l_quantity AS DECIMAL(19,4))) AS sxx,
             SUM(CAST(l_extendedprice AS DECIMAL(19,4))
               * CAST(l_extendedprice AS DECIMAL(19,4))) AS syy
           FROM lineitem GROUP BY 1, 2),
         d AS (SELECT l_returnflag, l_linestatus, n,
             CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
             CAST(sy AS DOUBLE) AS syd, CAST(sxy AS DOUBLE) AS sxyd,
             CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd
           FROM a)
         SELECT l_returnflag, l_linestatus, n,
           sxd AS sum_x, syd AS sum_y,
           CASE WHEN nd * sxxd - sxd * sxd > 0
             THEN round((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd), 6)
           END AS slope,
           CASE WHEN nd * sxxd - sxd * sxd > 0
             THEN round((syd - ((nd * sxyd - sxd * syd)
                    / (nd * sxxd - sxd * sxd)) * sxd) / nd, 6)
           END AS intercept,
           CASE WHEN nd * sxxd - sxd * sxd > 0 AND nd * syyd - syd * syd > 0
             THEN round(((nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd))
                    / ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)), 6)
           END AS r2
         FROM d ORDER BY l_returnflag, l_linestatus""",
    "q_attribution" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                      event_type, value FROM events),
         t AS (SELECT * FROM e WHERE event_type IN ('click', 'view')),
         c AS (SELECT * FROM e WHERE event_type = 'purchase'),
         j AS (SELECT c.event_id AS conv_id, c.value AS conv_value,
                 max({'us': t.us, 'id': t.event_id, 'ch': t.event_type}) AS lastS,
                 min({'us': t.us, 'id': t.event_id, 'ch': t.event_type}) AS firstS,
                 count(t.us) AS n_touches
               FROM c LEFT JOIN t ON t.user_id = c.user_id
                 AND t.us < c.us AND t.us >= c.us - 172800000000
               GROUP BY 1, 2)
         SELECT coalesce(firstS.ch, 'direct') AS first_channel,
           coalesce(lastS.ch, 'direct') AS last_channel,
           CAST(count(*) AS BIGINT) AS n_conversions,
           CAST(SUM(CAST(conv_value AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           CAST(SUM(n_touches) AS BIGINT) AS total_touches
         FROM j GROUP BY 1, 2 ORDER BY first_channel, last_channel""",
  )
}
