package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture loaders for the driver-generated corpus (/root/repo/TESTDATA.md).
  *
  * One parquet file per table under `dir`. These are plain columnar scans;
  * Catalyst pushes filters/projections into the parquet reader, so callers
  * should select/filter directly on the returned frame rather than caching.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped as two physical encodings across fixture
    * generations: parquet TIMESTAMP(NANOS) — which Spark's vectorized
    * reader rejects outright ([PARQUET_TYPE_ILLEGAL]), so it is read as a
    * long of nanos (legacy conf) and integer-divided down to microseconds
    * (floor division, matching how ns-capable readers like DuckDB/Arrow
    * truncate when converting to µs; double division would silently lose
    * precision at 1.7e18 ns) — and plain TIMESTAMP(MICROS) without UTC
    * adjustment, which Spark reads natively as TIMESTAMP_NTZ. Both are
    * normalized to the session-local TimestampType the engine uses
    * everywhere (session tz is pinned UTC, so the NTZ wall-clock cast is
    * value-preserving). */
  def events: DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long fixture generation
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ => // TIMESTAMP_NTZ (micros, isAdjustedToUTC=false)
        raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
