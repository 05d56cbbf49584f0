package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.Tables
import graft.queries.QueryUtil._
import graft.streaming._

/** Driver gates for the seven sealed-chain streaming operators
  * (VERDICT r10 task 2): each runs the REAL streaming processor —
  * EWMA, CUSUM, Holt, Holt-Winters, gap-fill, funnel, rate-anomaly —
  * as an AvailableNow query over a deterministic ordered file replay
  * of the events table (the q_stream_dedup device via [[ReplayFeed]]),
  * then flushes the watermark past every real slot with two far-future
  * sentinel rows so EVERYTHING seals. The sealed output of each chain
  * equals its batch leg bit for bit (the r10 *StreamSpec equalities),
  * so the oracle is the batch leg's already-green DuckDB SQL, reused
  * VERBATIM — the driver now proves the streaming execution itself,
  * not just the batch-shaped kernel.
  *
  * Determinism: the feeds are cut on an epoch-aligned adaptive day grid (~4 cells at any sf)
  * (hour- and 4-hour-aligned, so no slot ever spans two files), files
  * replay oldest-first one per micro-batch, and every emitted row is a
  * sealed slot whose value depends only on the slot's own rows and its
  * predecessors — batch-boundary-invariant by the seal discipline.
  */
object StreamChainGateQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Replay chunk grid target: ~2 cells whatever the data span (the
    * sealed-chain outputs are batch-boundary-invariant, so the grid is
    * pure replay cost — VERDICT r11 task 4, coarsened again in r15 per
    * the VERDICT r14 "coarser grid where the oracle does not replay
    * batch boundaries" directive). At the 31-day fixtures the derived
    * 16-day cells give 2-3 data files + 2 flush files — still a
    * multi-batch replay (every chain seals slots across ≥2 batch
    * boundaries, and the restart gate still splits mid-feed), at ~2
    * fewer micro-batches of fixed cost per gate. */
  private val TargetCells = 16

  /** Hourly slot index from a sealed slot_ts (matches the batch legs'
    * `unix_timestamp(ts) DIV 3600`). */
  private def hourSlot(c: org.apache.spark.sql.Column) =
    (unix_micros(c) / 3600000000L).cast("long")

  /** events with the q_ewma sampling filter, as (k, ts, v) rows. */
  private def sampledEvents(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events
      .filter(pmod(col("event_id"), lit(13)) === 0)
      .select(col("event_type").as("k"), col("ts"),
        col("value").cast("double").as("v"))

  private val DayUs = 86400000000L

  /** Two flush rows one/two days past the data's max event time —
    * DERIVED from the data (a hard-coded date would sit below max
    * event time on a larger-span fixture and never advance the
    * watermark): +1 day clears every slot end + the 1-hour lateness,
    * the second row makes the first's watermark effect land in a real
    * batch. Each carries its replay sequence (past the last grid cell). */
  private def flushRows(s: SparkSession, k: Any, maxUs: Long,
                        cellUs: Long): Seq[DataFrame] =
    Seq(1, 2).map(d => s.range(1).select(lit(k).as("k"),
      timestamp_micros(lit(maxUs + d * DayUs)).as("ts"), lit(0.0).as("v"),
      lit(maxUs / cellUs + d).as("__seq")))

  /** Write the (k, ts, v) frame as an adaptive-grid ordered feed plus two
    * past-the-end flush rows under `flushKey`; return the feed dir.
    * ONE bounds agg + ONE write job total (guide §1.2). */
  private def buildFeed(s: SparkSession, rows: DataFrame,
                        flushKey: Any): String = {
    val feed = ReplayFeed.tmp("sc_feed")
    rows.persist() // feeds the bounds scan + the one seq-partitioned write
    try {
      // one bounds scan serves the grid AND the flush timestamps; the
      // single seq-partitioned write replaces the per-cell filter writes
      // and per-cell isEmpty probes
      val (cellUs, _, maxUs) =
        ReplayFeed.adaptiveCellBounds(rows, "ts", TargetCells)
      val all = rows.withColumn("__seq", ReplayFeed.cellSeq("ts", cellUs))
      ReplayFeed.writeSeqFeed(
        flushRows(s, flushKey, maxUs, cellUs).foldLeft(all)(_ unionByName _),
        feed)
    } finally { rows.unpersist(); () }
    feed
  }

  /** Replay the feed through `op` as a real AvailableNow streaming
    * query; return the parquet-sunk result. */
  private def runStream(s: SparkSession, feed: String, schema: StructType,
                        op: DataFrame => DataFrame): DataFrame =
      // no-data batch skipped: the chains' flush rows seal every slot in
      // a real batch (oracle-proven against the batch legs)
      ReplayFeed.withGatePartitions(s, keepNoDataBatches = false) {
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(feed)
    val outDir = ReplayFeed.tmp("sc_out"); val ckpt = ReplayFeed.tmp("sc_ckpt")
    val q = op(stream).writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    StateMetrics.debugDurations(q, s"chain:$outDir")
    s.read.parquet(outDir)
  }

  /** [[runStream]] interrupted by a REAL checkpoint restart (VERDICT r13
    * task 3 — the q_trigger_restart device applied to a sealed-chain
    * processor): the feed's second half is held out, a first query
    * drains the visible half and terminates, the held files move back,
    * and a brand-new query resumes from the same checkpoint. The chain's
    * ListState buffers (unsealed slot rows) and the sealed frontier
    * (last sealed slot + carried recurrence state) must survive the
    * RocksDB round-trip, or the post-restart recurrence visibly diverges
    * from the uninterrupted batch-leg oracle. */
  private def runStreamWithRestart(s: SparkSession, feed: String,
                                   schema: StructType,
                                   op: DataFrame => DataFrame): DataFrame =
      // no-data batch skipped: flush-row design, oracle-proven (see runStream)
      ReplayFeed.withGatePartitions(s, keepNoDataBatches = false) {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val outDir = ReplayFeed.tmp("scr_out"); val ckpt = ReplayFeed.tmp("scr_ckpt")
    def run(): Unit = {
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(feed)
      val q = op(stream).writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val listing = Files.list(Paths.get(feed))
    val all =
      try listing.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
        .sortBy(_.getFileName.toString)
      finally listing.close()
    val split = all.size / 2
    require(split >= 1 && split < all.size,
      s"feed too small to split for the restart gate (${all.size} files)")
    val stage = Paths.get(ReplayFeed.tmp("scr_stage"))
    val held = all.drop(split)
    held.foreach(f => Files.move(f, stage.resolve(f.getFileName)))
    run()
    val phase1 = s.read.parquet(outDir).count()
    require(phase1 > 0,
      "chain restart gate: the first phase sealed no slots — the split " +
        "point is degenerate and the gate would not prove a mid-state restart")
    held.foreach(f => Files.move(stage.resolve(f.getFileName), f))
    run() // fresh query object, same checkpoint
    val total = s.read.parquet(outDir).count()
    require(total > phase1,
      "chain restart gate: the resumed query emitted nothing — the " +
        "restart did not continue the feed")
    s.read.parquet(outDir)
  }

  private val ktvSchema = StructType.fromDDL("k STRING, ts TIMESTAMP, v DOUBLE")

  /** Shared gate shape for the four (key, slot_ts, …) chains over the
    * sampled hourly series: replay, seal, drop the flush key, rename to
    * the batch leg's columns. */
  private def hourlyChainGate(s: SparkSession, dir: String,
                              op: DataFrame => DataFrame,
                              outCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val feed = buildFeed(s, sampledEvents(s, dir), "__flush")
    runStream(s, feed, ktvSchema, op)
      .filter(col("key") =!= "__flush")
      .select(col("key").as("event_type") +: hourSlot(col("slot_ts")).as("slot") +: outCols: _*)
      .orderBy(col("event_type"), col("slot"))
  }

  val defs: Map[String, Q] = Map(

    // §2.9 EWMA, streaming leg under the driver gate: sealed stream
    // points must equal the q_ewma batch recurrence bit for bit.
    "q_stream_ewma" -> { (s, dir) =>
      hourlyChainGate(s, dir,
        st => EwmaStream.smoothed(st, "k", "ts", "v", alpha = 0.25).toDF(),
        Seq(col("v"), col("ewma")))
    },

    // VERDICT r13 task 3: the EWMA chain killed mid-feed and resumed
    // from its checkpoint (the q_trigger_restart device on a
    // transformWithState sealed chain). The recurrence is order-1 —
    // every sealed point depends on ALL its predecessors — so a lost
    // or double-applied slot after the restart shifts every subsequent
    // ewma value; the combined output must still equal the
    // uninterrupted q_ewma batch oracle bit for bit.
    "q_stream_ewma_restart" -> { (s, dir) =>
      val feed = buildFeed(s, sampledEvents(s, dir), "__flush")
      runStreamWithRestart(s, feed, ktvSchema,
          st => EwmaStream.smoothed(st, "k", "ts", "v", alpha = 0.25).toDF())
        .filter(col("key") =!= "__flush")
        .select(col("key").as("event_type"), hourSlot(col("slot_ts")).as("slot"),
          col("v"), col("ewma"))
        .orderBy(col("event_type"), col("slot"))
    },

    // §2.9 CUSUM drift detection, streaming leg: in-control targets are
    // the same exact per-type davg doubles the batch query derives.
    "q_stream_cusum" -> { (s, dir) =>
      import s.implicits._
      val targets = Tables(s, dir).events
        .filter(pmod(col("event_id"), lit(13)) === 0)
        .groupBy(col("event_type")).agg(davg(col("value")).as("t"))
        .as[(String, Double)].collect().toMap
      hourlyChainGate(s, dir,
        st => CusumStream.drifting(st, "k", "ts", "v", targets,
          slack = 0.5, threshold = 250.0).toDF(),
        Seq(col("v"), col("cusum"), col("alarm")))
    },

    // §2.9 Holt linear trend, streaming leg (α=0.5, β=0.25).
    "q_stream_holt" -> { (s, dir) =>
      hourlyChainGate(s, dir,
        st => HoltStream.trending(st, "k", "ts", "v",
          alpha = 0.5, beta = 0.25).toDF(),
        Seq(col("v"), col("level"), col("trend"), col("forecast")))
    },

    // §2.9 gap-fill (LOCF + linear interpolation), streaming leg: the
    // dense grid between sealed observations, identical to q_gapfill.
    "q_stream_gapfill" -> { (s, dir) =>
      val feed = buildFeed(s, sampledEvents(s, dir), "__flush")
      runStream(s, feed, ktvSchema,
          st => GapFillStream.filled(st, "k", "ts", "v").toDF())
        .filter(col("key") =!= "__flush")
        .select(col("key").as("event_type"), hourSlot(col("slot_ts")).as("slot"),
          col("slot_ts"), col("v"), col("ffill"), col("interp"))
        .orderBy(col("event_type"), col("slot"))
    },

    // §2.9 Holt-Winters additive, streaming leg — the one r10 VERDICT
    // called out by name. The batch leg smooths 4-hour slot SUMS, so
    // the feed is one row per (type, slot) carrying the exact
    // DECIMAL(18,4)-summed slot total (a 1-row slot's mean IS its sum);
    // the stream then warms up on the first 6 slots and recurses
    // exactly as q_holt_winters' recursive-CTE oracle replays.
    "q_stream_holt_winters" -> { (s, dir) =>
      val obs = Tables(s, dir).events
        .groupBy(col("event_type").as("k"),
          expr("unix_timestamp(ts) DIV 14400").as("slot"))
        .agg(sum(col("value").cast("decimal(18,4)")).cast("double").as("v"))
        .select(col("k"), to_timestamp(col("slot") * 14400).as("ts"), col("v"))
      val feed = buildFeed(s, obs, "__flush")
      runStream(s, feed, ktvSchema,
          st => HoltWintersStream.smoothing(st, "k", "ts", "v", period = 6,
            slotDuration = java.time.Duration.ofHours(4)).toDF())
        .filter(col("key") =!= "__flush")
        .select(col("key").as("event_type"),
          (unix_micros(col("slot_ts")) / 14400000000L).cast("long").as("slot"),
          col("v").as("y"),
          round(col("level"), 6).as("level"), round(col("trend"), 6).as("trend"),
          round(col("seasonal"), 6).as("seasonal"),
          round(col("forecast"), 6).as("forecast"))
        .orderBy(col("event_type"), col("slot"))
    },

    // §2.9 ordered funnel, streaming leg: per-user step completions
    // (first event of each step type strictly after the previous step's
    // completion) — the per-user rows q_funnel's counts aggregate.
    "q_stream_funnel" -> { (s, dir) =>
      val rows = Tables(s, dir).events
        .select(col("user_id").cast("long").as("k"), col("ts"),
          col("event_type").as("v"))
      val feed = ReplayFeed.tmp("sc_feed")
      rows.persist()
      try {
        val (cellUs, _, maxUs) =
          ReplayFeed.adaptiveCellBounds(rows, "ts", TargetCells)
        // flush rows must carry a STEP type (the internal filter drops
        // other types BEFORE the watermark node) under a reserved user
        val flush = Seq(1, 2).map(d => s.range(1)
          .select(lit(-1L).as("k"),
            timestamp_micros(lit(maxUs + d * DayUs)).as("ts"),
            lit("view").as("v"), lit(maxUs / cellUs + d).as("__seq")))
        ReplayFeed.writeSeqFeed(
          flush.foldLeft(
            rows.withColumn("__seq", ReplayFeed.cellSeq("ts", cellUs)))(
            _ unionByName _), feed)
      } finally { rows.unpersist(); () }
      runStream(s, feed, StructType.fromDDL("k BIGINT, ts TIMESTAMP, v STRING"),
          st => FunnelStream.stepCompletions(st, "k", "ts", "v",
            steps = Seq("view", "click", "purchase")).toDF())
        .filter(col("user_id") >= 0)
        .select(col("user_id"), col("step").cast("long").as("step"),
          col("step_name"), col("ts"))
        .orderBy(col("user_id"), col("step"))
    },

    // §2.9 trailing-window rate anomaly, streaming leg: sealed hourly
    // flags over ALL events, identical to q_anomaly_rate's scored rows.
    "q_stream_rate_anomaly" -> { (s, dir) =>
      val rows = Tables(s, dir).events
        .select(col("event_type").as("k"), col("ts"), lit(0.0).as("v"))
      val feed = buildFeed(s, rows, "__flush")
      runStream(s, feed, ktvSchema,
          st => RateAnomalyStream.hourlyFlags(st, "k", "ts").toDF())
        .filter(col("event_type") =!= "__flush")
        .select(col("event_type"), col("hour"), col("n"),
          col("trail_sum"), col("trail_cnt"), col("spike_hi"), col("dip_lo"))
        .orderBy(col("event_type"), col("hour"))
    },
  )

  /** Oracles: the batch legs' green SQL, reused verbatim — the stream
    * gates emit the identical column set. q_stream_funnel's oracle is
    * the per-user row form of q_funnel's step CTEs. */
  val oracles: Map[String, String] = Map(
    "q_stream_ewma" -> AnalyticsQueries.oracles("q_ewma"),
    // the restart gate's claim is oracle invariance — q_ewma verbatim
    "q_stream_ewma_restart" -> AnalyticsQueries.oracles("q_ewma"),
    "q_stream_cusum" -> WarehouseQueries.oracles("q_cusum"),
    "q_stream_holt" -> WarehouseQueries.oracles("q_holt_trend"),
    "q_stream_gapfill" -> AnalyticsQueries.oracles("q_gapfill"),
    "q_stream_holt_winters" -> WarehouseQueries.oracles("q_holt_winters"),
    "q_stream_rate_anomaly" -> WindowQueries.oracles("q_anomaly_rate"),
    "q_stream_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
             WHERE event_type = 'view' GROUP BY 1),
         c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
             WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
         p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
             WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
         SELECT user_id, CAST(1 AS BIGINT) AS step, 'view' AS step_name, t1 AS ts FROM v
         UNION ALL
         SELECT user_id, CAST(2 AS BIGINT), 'click', t2 FROM c
         UNION ALL
         SELECT user_id, CAST(3 AS BIGINT), 'purchase', t3 FROM p
         ORDER BY user_id, step""",
  )
}
