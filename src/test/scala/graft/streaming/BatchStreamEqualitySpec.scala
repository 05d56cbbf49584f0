package graft.streaming

import java.sql.Timestamp
import java.time.Duration

import graft.SparkSpec
import graft.operators.Combine.CombineFn
import graft.queries.QueryUtil.dsum
import graft.streaming.TriggerEngine._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch ≡ stream equality for the windowed-aggregate family over the
  * REAL events fixture: the same rows fed through MemoryStream into the
  * engines' default-trigger paths must produce exactly the batch
  * q_fixed_window / q_sliding_window / q_session_window answers,
  * row-for-row. The DuckDB gate cannot replay stateful micro-batch
  * execution, so the gate's green batch rows are the strongest available
  * oracle for the streaming core — this spec wires them to it.
  *
  * Sum parity: the batch queries route double sums through DECIMAL(18,4)
  * (QueryUtil.dsum) to make them order-independent; the stream-side
  * CombineFn replicates exactly that (valueOf → setScale(4, HALF_UP) →
  * exact decimal addition → one final doubleValue), so sums compare
  * bit-for-bit even though arrival order differs from scan order.
  */
/** Per-row dynamic gap carried in the value: assign [ts, ts + gapMs).
  * Top-level so the serialized processor does not drag the suite along. */
final case class GapFromValue() extends SessionEngine.MergingWindowAssigner[Long, (Double, Long)] {
  def assign(key: Long, tsMs: Long, v: (Double, Long)): (Long, Long) = (tsMs, tsMs + v._2)
}

class BatchStreamEqualitySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** (count, exact decimal sum) — the stream-side twin of
    * count(lit(1)) + dsum(value). */
  object CountDsumFn
      extends CombineFn[Double, (Long, java.math.BigDecimal), (Long, Double)] {
    private def dec(v: Double): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(v).setScale(4, java.math.RoundingMode.HALF_UP)
    def createAccumulator(): (Long, java.math.BigDecimal) =
      (0L, java.math.BigDecimal.ZERO)
    def addInput(acc: (Long, java.math.BigDecimal), in: Double): (Long, java.math.BigDecimal) =
      (acc._1 + 1L, acc._2.add(dec(in)))
    def mergeAccumulators(a: (Long, java.math.BigDecimal),
                          b: (Long, java.math.BigDecimal)): (Long, java.math.BigDecimal) =
      (a._1 + b._1, a._2.add(b._2))
    def extractOutput(acc: (Long, java.math.BigDecimal)): (Long, Double) =
      (acc._1, acc._2.doubleValue)
  }

  object CountFn extends CombineFn[Double, Long, Long] {
    def createAccumulator(): Long = 0L
    def addInput(acc: Long, in: Double): Long = acc + 1L
    def mergeAccumulators(a: Long, b: Long): Long = a + b
    def extractOutput(acc: Long): Long = acc
  }

  private def events = graft.Tables(spark, dir).events

  /** Drive panes over (all real rows) then two sentinel batches that push
    * the watermark far past the last real window so every real window
    * fires ON_TIME and its close timer runs. Returns the fired panes with
    * the sentinel key filtered back out. */
  private def runStream[K, O](name: String,
                              rows: Seq[(K, Timestamp, Double)],
                              sentinelKey: K,
                              maxTsMs: Long,
                              build: org.apache.spark.sql.Dataset[(K, Timestamp, Double)] =>
                                     org.apache.spark.sql.Dataset[Pane[K, O]])(
      implicit ek: org.apache.spark.sql.Encoder[(K, Timestamp, Double)],
      ep: org.apache.spark.sql.Encoder[Pane[K, O]]): Seq[Pane[K, O]] = {
    val input = MemoryStream[(K, Timestamp, Double)](name.hashCode.abs, spark, None)
    val panes = build(input.toDS())
    val ckpt = java.nio.file.Files.createTempDirectory(s"graft-bse-$name").toString
    val q = panes.writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      input.addData(rows)
      q.processAllAvailable()
      input.addData(Seq((sentinelKey, new Timestamp(maxTsMs + 6 * 3600 * 1000L), 0.0)))
      q.processAllAvailable()
      // one more batch so close timers registered at the new watermark run
      input.addData(Seq((sentinelKey, new Timestamp(maxTsMs + 7 * 3600 * 1000L), 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).as[Pane[K, O]](ep).collect().toSeq
      .filter(_.key != sentinelKey)
  }

  test("batch ≡ stream: fixed 1h windows over the real events fixture") {
    val batch = events
      .groupBy(Windows.fixed(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("w_start"), col("n"), col("sum_value"))
      .as[(Timestamp, Long, Double)].collect().toSet
    assert(batch.nonEmpty)

    val rows = events.select(col("ts"), col("value")).as[(Timestamp, Double)]
      .collect().toSeq.map { case (t, v) => ("all", t, v) }
    val maxTsMs = rows.map(_._2.getTime).max

    val panes = runStream[String, (Long, Double)]("bse_fixed", rows, "sentinel", maxTsMs,
      ds => TriggerEngine.windowedAggregate(ds, Duration.ofHours(1), Duration.ZERO,
        TriggerSpec.default, Accumulating, CountDsumFn))
    assert(panes.forall(p => p.timing == "ON_TIME" && p.isFirst && p.isLast))
    val got = panes.map(p => (p.windowStart, p.value._1, p.value._2)).toSet
    assert(got == batch)
  }

  test("batch ≡ stream: sliding 1h/30m windows over the real events fixture") {
    val batch = events
      .groupBy(Windows.sliding(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("n"))
      .as[(Timestamp, Long)].collect().toSet
    assert(batch.nonEmpty)

    val rows = events.select(col("ts"), col("value")).as[(Timestamp, Double)]
      .collect().toSeq.map { case (t, v) => ("all", t, v) }
    val maxTsMs = rows.map(_._2.getTime).max

    val panes = runStream[String, Long]("bse_sliding", rows, "sentinel", maxTsMs,
      ds => TriggerEngine.slidingWindowedAggregate(ds, Duration.ofHours(1),
        Duration.ofMinutes(30), Duration.ZERO, TriggerSpec.default, Accumulating, CountFn))
    val got = panes.map(p => (p.windowStart, p.value)).toSet
    assert(got == batch)
  }

  test("batch ≡ stream: DYNAMIC-gap sessions — custom merging assigner matches session_window") {
    // The strongest cross-check of the custom merging WindowFn engine:
    // sessionAggregateWith with a per-row gap assigner must reproduce
    // Spark's own dynamic session_window (the q_session_dynamic batch
    // query) row-for-row on the real fixture.
    object CountDsum2Fn
        extends CombineFn[(Double, Long), (Long, java.math.BigDecimal), (Long, Double)] {
      private def dec(v: Double): java.math.BigDecimal =
        java.math.BigDecimal.valueOf(v).setScale(4, java.math.RoundingMode.HALF_UP)
      def createAccumulator(): (Long, java.math.BigDecimal) =
        (0L, java.math.BigDecimal.ZERO)
      def addInput(acc: (Long, java.math.BigDecimal), in: (Double, Long)): (Long, java.math.BigDecimal) =
        (acc._1 + 1L, acc._2.add(dec(in._1)))
      def mergeAccumulators(a: (Long, java.math.BigDecimal),
                            b: (Long, java.math.BigDecimal)): (Long, java.math.BigDecimal) =
        (a._1 + b._1, a._2.add(b._2))
      def extractOutput(acc: (Long, java.math.BigDecimal)): (Long, Double) =
        (acc._1, acc._2.doubleValue)
    }

    val evs = events.select(col("user_id"), col("ts"), col("value"),
        (length(col("event_type")).cast("long") * 3L * 60000L).as("gap_ms"))
      .as[(Long, Timestamp, Double, Long)].collect().toSeq

    // ms- vs µs-precision boundary guard, dynamic-gap version: sweep each
    // user's rows in µs and require every merge decision to be ≥ 2 ms
    // away from the running-max session end (see the fixed-gap test).
    def micros(t: Timestamp): Long = t.getTime / 1000L * 1000000L + t.getNanos / 1000L
    evs.groupBy(_._1).values.foreach { rows =>
      var maxEnd = Long.MinValue
      rows.sortBy(r => micros(r._2)).foreach { r =>
        val t = micros(r._2)
        if (maxEnd != Long.MinValue)
          assert(math.abs(t - maxEnd) >= 2000L,
            "fixture has a dynamic-gap merge decision at the ms/µs boundary")
        maxEnd = math.max(maxEnd, t + r._4 * 1000L)
      }
    }

    val batch = events
      .groupBy(col("user_id"),
        Windows.sessionsDynamic(col("ts"),
          expr("make_interval(0, 0, 0, 0, 0, length(event_type) * 3, 0)")).as("w"))
      .agg(count(lit(1)).as("n"), graft.queries.QueryUtil.dsum(col("value")).as("sum_value"))
      .select(col("user_id"),
        date_trunc("second", col("w.start")).as("session_start"),
        col("n"), col("sum_value"))
      .as[(Long, Timestamp, Long, Double)].collect().toSet
    assert(batch.nonEmpty)

    val rows = evs.map { case (u, t, v, g) => (u, t, (v, g)) }
    val maxTsMs = rows.map(_._2.getTime).max

    val input = MemoryStream[(Long, Timestamp, (Double, Long))](912, spark, None)
    val panes = SessionEngine.sessionAggregateWith(input.toDS(), GapFromValue(),
      Duration.ZERO, earlyPerBatch = false, Accumulating, CountDsum2Fn)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-bse-dyn").toString
    val q = panes.writeStream.format("memory").queryName("bse_dynamic")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      input.addData(rows)
      q.processAllAvailable()
      input.addData(Seq((-1L, new Timestamp(maxTsMs + 6 * 3600 * 1000L), (0.0, 60000L))))
      q.processAllAvailable()
      input.addData(Seq((-1L, new Timestamp(maxTsMs + 7 * 3600 * 1000L), (0.0, 60000L))))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("bse_dynamic").as[Pane[Long, (Long, Double)]].collect().toSeq
      .filter(_.key != -1L)
      .map { p =>
        (p.key, new Timestamp(p.windowStart.getTime / 1000L * 1000L),
          p.value._1, p.value._2)
      }.toSet
    assert(got == batch)
  }

  test("batch ≡ stream: 15-minute-gap sessions per user over the real events fixture") {
    // The session engine merges intervals at millisecond precision
    // (Timestamp.getTime) while batch session_window works at Spark's
    // native microseconds. Guard the fixture against the one case where
    // that can legitimately diverge: a consecutive same-user pair within
    // 2 ms of EXACTLY the 15-minute gap, where sub-ms truncation could
    // flip the merge decision. Fails loudly on a regenerated fixture
    // rather than as a confusing set mismatch below.
    val gapMs = 15 * 60 * 1000L
    val boundary = events.selectExpr("user_id", "cast(ts as double) as t")
      .withColumn("d", col("t") - lag("t", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("t")))
      .filter(col("d").isNotNull &&
        abs(col("d") * 1000 - lit(gapMs.toDouble)) < 2.0)
      .count()
    assert(boundary == 0L, "fixture has a same-user pair at the exact gap boundary")

    val batch = events
      .groupBy(col("user_id"), Windows.sessions(col("ts"), "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("user_id"),
        date_trunc("second", col("w.start")).as("session_start"),
        col("n"), col("sum_value"))
      .as[(Long, Timestamp, Long, Double)].collect().toSet
    assert(batch.nonEmpty)

    val rows = events.select(col("user_id"), col("ts"), col("value"))
      .as[(Long, Timestamp, Double)].collect().toSeq
    val maxTsMs = rows.map(_._2.getTime).max

    val panes = runStream[Long, (Long, Double)]("bse_session", rows, -1L, maxTsMs,
      ds => SessionEngine.sessionAggregate(ds, Duration.ofMinutes(15), Duration.ZERO,
        earlyPerBatch = false, Accumulating, CountDsumFn))
    assert(panes.forall(_.timing == "ON_TIME"))
    val got = panes.map { p =>
      (p.key, new Timestamp(p.windowStart.getTime / 1000L * 1000L),
        p.value._1, p.value._2)
    }.toSet
    assert(got == batch)
  }
}
