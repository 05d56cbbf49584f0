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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright ([PARQUET_TYPE_ILLEGAL]). Read it as a long of
    * nanos (legacy conf) and integer-divide down to microseconds — floor
    * division, matching how ns-capable readers (DuckDB/Arrow) truncate when
    * converting to µs. Double division would silently lose precision at
    * 1.7e18 ns. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn(
      "ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
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
