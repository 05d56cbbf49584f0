package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: simhash chunk-bucket concentration per fixture.
  *
  * The pigeonhole blocking in [[graft.llm.Dedup.simHashPairs]] generates
  * sum(bucketSize²)/2 candidate pairs per table, so bucket concentration
  * IS the operator's scale behavior. This probe prints, for the default
  * geometry (4 × 16-bit chunks), the total candidate-pair volume, the
  * largest bucket, and the bucket count — the numbers that motivated the
  * round-14 shingle-feature migration (unigram-vote signatures measured
  * 15% of the 500k-doc sf10 cut in ONE bucket / 11.8e9 candidates;
  * shingle votes hold the max bucket at true near-dup family size).
  *
  * Usage: runMain graft.BucketProbe <fixtureDir> [more dirs...]
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val sh = docs.select(graft.llm.Dedup.simHash(col("text")).as("sh"))
      val n = sh.count()
      val chunks = sh.select(explode(array((0 until 4).map(c =>
        struct(lit(c).as("c"),
          shiftrightunsigned(col("sh"), c * 16).bitwiseAND(lit(0xFFFFL)).as("v"))): _*)).as("ck"))
      val stats = chunks.groupBy("ck").count()
        .agg(sum(col("count") * (col("count") - 1) / 2).as("pairs"),
          max(col("count")).as("mx"), count(lit(1)).as("nb")).collect()(0)
      println(s"PROBE dir=$dir n=$n candPairs=${stats.get(0)} " +
        s"maxBucket=${stats.getLong(1)} nBuckets=${stats.getLong(2)}")
    }
    spark.stop()
  }
}
