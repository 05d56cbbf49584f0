package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** touchAttribution: lookback boundaries are [conv−L, conv), first/last
  * tie-break by event id (order-free struct min/max, not frame order),
  * direct conversions carry NULL channels, and later touches never
  * attribute backwards. */
class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1700000000000000L // µs epoch

  private def mkEvents(rows: Seq[(Long, Long, Long, String, Double)]) = {
    // (user, id, usOffset, type, value) -> DataFrame with real timestamps
    rows.toDF("user_id", "event_id", "off", "event_type", "value")
      .withColumn("ts", timestamp_micros(lit(base) + col("off")))
      .drop("off")
  }

  private def run(df: org.apache.spark.sql.DataFrame, lookbackUs: Long) =
    Attribution.touchAttribution(df, "user_id", "ts", "event_id",
        "event_type", "value", "buy", Seq("ad", "email"), lookbackUs)
      .select("conv_id", "first_channel", "last_channel", "n_touches")
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), Option(r.getString(2)), r.getLong(3)))
      .toMap

  test("window boundaries: touch at conv−L included, at conv excluded, after ignored") {
    val L = 1000L
    val ev = mkEvents(Seq(
      (1L, 10L, 0L, "ad", 0.0),      // exactly conv − L: included
      (1L, 11L, 500L, "email", 0.0), // inside
      (1L, 12L, 1000L, "ad", 0.0),   // exactly at conv time: EXCLUDED
      (1L, 13L, 1000L, "buy", 5.0),  // the conversion
      (1L, 14L, 1500L, "email", 0.0) // after: ignored
    ))
    val out = run(ev, L)
    assert(out(13L) === ((Some("ad"), Some("email"), 2L)))
  }

  test("direct conversions have NULL channels and zero touches") {
    val ev = mkEvents(Seq(
      (2L, 20L, 0L, "ad", 0.0),
      (2L, 21L, 5000L, "buy", 3.0))) // ad is 5000 µs earlier, lookback 1000
    val out = run(ev, 1000L)
    assert(out(21L) === ((None, None, 0L)))
  }

  test("simultaneous touches tie-break by event id (deterministic, order-free)") {
    val ev = mkEvents(Seq(
      (3L, 31L, 100L, "email", 0.0), // same µs as 32
      (3L, 32L, 100L, "ad", 0.0),    // higher id at same µs -> the LAST touch
      (3L, 30L, 100L, "ad", 0.0),    // lowest id at same µs -> the FIRST touch
      (3L, 33L, 200L, "buy", 1.0)))
    val out = run(ev, 1000L)
    assert(out(33L) === ((Some("ad"), Some("ad"), 3L)))
    // first = min(us, id, ch) = id 30 (ad); last = max = id 32 (ad)
  }

  test("attribution is per-user: another user's touches never leak") {
    val ev = mkEvents(Seq(
      (4L, 40L, 0L, "ad", 0.0),
      (5L, 50L, 50L, "buy", 2.0)))
    val out = run(ev, 1000L)
    assert(out(50L) === ((None, None, 0L)))
  }

  test("two conversions share a touch stream but window independently") {
    val ev = mkEvents(Seq(
      (6L, 60L, 0L, "ad", 0.0),
      (6L, 61L, 100L, "buy", 1.0),  // sees ad@0
      (6L, 62L, 150L, "email", 0.0),
      (6L, 63L, 200L, "buy", 1.0))) // sees ad@0 and email@150
    val out = run(ev, 1000L)
    assert(out(61L) === ((Some("ad"), Some("ad"), 1L)))
    assert(out(63L) === ((Some("ad"), Some("email"), 2L)))
  }
}
