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

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def events: DataFrame     = t("events")
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
