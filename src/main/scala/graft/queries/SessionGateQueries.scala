package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.SessionEngine
import graft.streaming.SessionEngine.MergingWindowAssigner
import graft.streaming.TriggerEngine.{Accumulating, Pane}

/** Driver gates for the merging-window engine (VERDICT r11 task 1 — core
  * row 40, the last oracle-reachable spec-only row): run
  * [[SessionEngine.sessionAggregateWith]] with a CUSTOM
  * `MergingWindowAssigner` (per-row dynamic gap — a function of both the
  * key and the value, which Beam expresses only as a user-defined merging
  * WindowFn) as a REAL AvailableNow streaming query over the ordered file
  * replay, and emit the merged session pane table for DuckDB to replay
  * with gaps-and-islands SQL.
  *
  * Determinism device (same family as [[TriggerGateQueries]]):
  *  - the feed is the events table cut on an epoch-aligned day grid
  *    SIZED FROM THE DATA SPAN (≤ ~9 micro-batches at any sf — the
  *    replay-cost contract of VERDICT r11 task 4), one single-file
  *    parquet per populated cell in time order, then two far-future
  *    flush rows (key `__flush`, filtered from the output) that push the
  *    watermark past every session end so all ON_TIME panes and GC land
  *    inside real batches;
  *  - because every interval starts at its row's timestamp and the cells
  *    replay in time order, a later row can never bridge two
  *    already-disjoint open sessions (bridging needs ts < the left
  *    session's end ≤ the right session's start ≤ ts — a contradiction),
  *    so at the end of any batch each final session's absorbed prefix is
  *    EXACTLY ONE open session: the final session table equals global
  *    gaps-and-islands over the fixture, independent of the batch grid;
  *  - a prefix's end always exceeds the next session row's timestamp
  *    (strict-overlap membership) which bounds the watermark from above,
  *    so no session can close before its last row arrives;
  *  - pane VALUES are commutative (count + Σ user_id), and within-batch
  *    absorb order only changes the transient merge tree, not the merged
  *    accumulator (the CombineFn is associative-commutative).
  *
  * The engine works in MILLISECONDS (java.sql.Timestamp.getTime), so the
  * oracle truncates the fixture's microsecond timestamps with
  * `epoch_us(ts) // 1000` and scales session bounds back by ×1000.
  */
object SessionGateQueries {

  type Q = (SparkSession, String) => DataFrame

  private val DayUs = 86400000000L

  /** The custom merging WindowFn under test: per-row dynamic gap
    * (15 + len(key) + value mod 10) minutes — key- AND value-dependent,
    * beyond fixed-gap Sessions (and beyond Spark's session_window gap
    * column only in that the engine also exposes pane metadata and early
    * firings over it). Mirrored literally in the oracle SQL. */
  private final case class DynGapAssigner() extends MergingWindowAssigner[String, Long] {
    def assign(key: String, tsMs: Long, value: Long): (Long, Long) =
      (tsMs, tsMs + (15L + key.length + (value % 10L)) * 60000L)
  }

  /** Events → ordered feed: populated day-grid cells sized so the replay
    * is ≤ ~9 micro-batches at any sf (cellDays = ceil(spanDays/8)), then
    * two flush rows a day apart beyond max ts + the max possible gap. */
  private def buildSessionFeed(s: SparkSession, dir: String): String = {
    import ReplayFeed.{tmp, writeOrderedFeed}
    val feed = tmp("sess_feed")
    val ev = Tables(s, dir).events.select(
      col("event_type").as("k"), col("ts"),
      col("user_id").cast("long").as("v"))
    ev.persist() // feeds the bounds scan + one filter job per grid cell
    val b = ev.agg(min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi")).head()
    val (loUs, hiUs) = (b.getLong(0), b.getLong(1))
    // the shared adaptive grid (cellDays = ceil(spanDays/8), ≤ ~9
    // cells); the oracle recomputes the identical integer arithmetic
    val cellUs = ReplayFeed.adaptiveCellUs(ev, "ts", 8)
    val cell = (unix_micros(col("ts")) / cellUs).cast("long")
    val mains = (loUs / cellUs to hiUs / cellUs).map(i => ev.filter(cell === i))
    // max gap is (15 + keyLen + 9) minutes << 1 day, so hi + 1 day clears
    // every session end and hi + 2 days makes that watermark land in a
    // real batch
    def flush(us: Long) = s.range(1).select(
      lit("__flush").as("k"), timestamp_micros(lit(us)).as("ts"), lit(0L).as("v"))
    val ordered = mains ++ Seq(flush(hiUs + DayUs), flush(hiUs + 2 * DayUs))
    try writeOrderedFeed(ordered.filterNot(_.isEmpty), feed)
    finally { ev.unpersist(); () }
    feed
  }

  val defs: Map[String, Q] = Map(

    // §2.4 row 40 under the driver gate: the merging-window engine with a
    // custom key+value-dependent gap assigner, ON_TIME panes only — each
    // merged session fires exactly once when the watermark passes its
    // end, pane_index 0, isFirst = isLast = true.
    "q_session_engine" -> { (s, dir) =>
      import s.implicits._
      val feed = buildSessionFeed(s, dir)
      TriggerGateQueries.runPanes(s, feed,
        (in: Dataset[(String, Timestamp, Long)]) =>
          SessionEngine.sessionAggregateWith(
            in, DynGapAssigner(), java.time.Duration.ZERO,
            earlyPerBatch = false, Accumulating, TriggerGateQueries.NSumFn))
    },

    // SURVEY §7 hard part 4: merging windows × EARLY firings — the
    // interaction Spark's session_window DSL cannot express. Accumulating
    // mode: every micro-batch that feeds a still-open session fires an
    // EARLY pane with the running (n, Σv); the ON_TIME pane repeats the
    // sealed total with pane_index = the session's populated-cell count.
    "q_session_engine_early" -> { (s, dir) =>
      import s.implicits._
      val feed = buildSessionFeed(s, dir)
      TriggerGateQueries.runPanes(s, feed,
        (in: Dataset[(String, Timestamp, Long)]) =>
          SessionEngine.sessionAggregateWith(
            in, DynGapAssigner(), java.time.Duration.ZERO,
            earlyPerBatch = true, Accumulating, TriggerGateQueries.NSumFn))
    },
  )

  /** Gaps-and-islands prelude shared by both oracles: per-row dynamic
    * interval [ms, ms + gap), running max end over the key's earlier
    * rows, strict-overlap island flag (a row exactly AT the running end
    * starts a new session — half-open intervals), island ids by running
    * sum. Ties on ms are duplicates-in-all-but-v; (ms, v) makes the
    * order deterministic and island aggregates are order-invariant. */
  private val islandsCte =
    """WITH ev AS (
         SELECT event_type AS k, epoch_us(ts) // 1000 AS ms, user_id AS v,
           epoch_us(ts) AS us,
           epoch_us(ts) // 1000
             + (15 + length(event_type) + (user_id % 10)) * 60000 AS iend
         FROM events),
       w AS (
         SELECT k, ms, v, us, iend,
           max(iend) OVER (PARTITION BY k ORDER BY ms, v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
         FROM ev),
       isl AS (
         SELECT k, ms, v, us, iend,
           SUM(CASE WHEN prev_end IS NULL OR ms >= prev_end THEN 1 ELSE 0 END)
             OVER (PARTITION BY k ORDER BY ms, v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         FROM w),
       sess AS (
         SELECT k, sid, min(ms) AS ss, max(iend) AS se,
           count(*) AS n, sum(v) AS sum_v
         FROM isl GROUP BY k, sid)"""

  val oracles: Map[String, String] = Map(

    "q_session_engine" ->
      s"""$islandsCte
         SELECT k, CAST(ss * 1000 AS BIGINT) AS ws_us,
           CAST(se * 1000 AS BIGINT) AS we_us,
           'ON_TIME' AS timing, CAST(0 AS BIGINT) AS pane_index,
           TRUE AS is_first, TRUE AS is_last,
           CAST(n AS BIGINT) AS n, CAST(sum_v AS BIGINT) AS sum_v
         FROM sess ORDER BY k, ws_us, pane_index""",

    // EARLY panes replay the batch grid: cell size derives from the data
    // span with the same integer arithmetic as the feed builder; one
    // EARLY pane per (session, populated cell) carrying the cumulative
    // (n, Σv) through that cell; the ON_TIME pane repeats the total at
    // pane_index = populated-cell count.
    "q_session_engine_early" ->
      s"""$islandsCte,
         bounds AS (
           SELECT ((max(us) // $DayUs) - (min(us) // $DayUs) + 8) // 8
             * $DayUs AS cell_us
           FROM ev),
         bc AS (
           SELECT k, sid, us // (SELECT cell_us FROM bounds) AS cell,
             count(*) AS cn, sum(v) AS cs, max(iend) AS ce
           FROM isl GROUP BY 1, 2, 3),
         cum AS (
           SELECT k, sid, cell,
             SUM(cn) OVER win AS n_cum, SUM(cs) OVER win AS s_cum,
             MAX(ce) OVER win AS e_cum,
             ROW_NUMBER() OVER (PARTITION BY k, sid ORDER BY cell) - 1 AS idx
           FROM bc
           WINDOW win AS (PARTITION BY k, sid ORDER BY cell
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         ncell AS (
           SELECT k, sid, count(*) AS ncells FROM bc GROUP BY k, sid),
         -- an EARLY pane reports the OPEN session's end as of its batch
         -- (the cumulative max interval end), not the final end
         panes AS (
           SELECT c.k, c.sid, 'EARLY' AS timing, c.idx,
             c.idx = 0 AS is_first, FALSE AS is_last,
             c.n_cum AS n, c.s_cum AS sum_v, c.e_cum AS we_ms
           FROM cum c
           UNION ALL
           SELECT s.k, s.sid, 'ON_TIME', nc.ncells, FALSE, TRUE,
             s.n, s.sum_v, s.se
           FROM sess s JOIN ncell nc ON s.k = nc.k AND s.sid = nc.sid)
         SELECT p.k, CAST(s.ss * 1000 AS BIGINT) AS ws_us,
           CAST(p.we_ms * 1000 AS BIGINT) AS we_us,
           p.timing, CAST(p.idx AS BIGINT) AS pane_index,
           p.is_first, p.is_last,
           CAST(p.n AS BIGINT) AS n, CAST(p.sum_v AS BIGINT) AS sum_v
         FROM panes p JOIN sess s ON p.k = s.k AND p.sid = s.sid
         ORDER BY p.k, ws_us, pane_index""",
  )
}
