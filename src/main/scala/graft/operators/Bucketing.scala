package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned) tables for co-located joins — the "repeated
  * big-join on the same key" answer at 100 TB (SURVEY.md §2.8 / the
  * builder's partitioning mandate).
  *
  * A join between two tables bucketed on the join key with the same bucket
  * count plans WITHOUT an Exchange on either side: the shuffle was paid
  * once at write time and amortizes over every subsequent join/aggregation
  * on that key. BucketingSpec asserts the exchange-free plan.
  */
object Bucketing {

  /** Write as a bucketed + sorted parquet table (registered in the session
    * catalog — bucketing metadata lives there). */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int,
                    cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "bucketing needs at least one column")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, cols.head, cols.tail: _*)
      .sortBy(cols.head, cols.tail: _*)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (plain catalog lookup; here for API
    * symmetry). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
