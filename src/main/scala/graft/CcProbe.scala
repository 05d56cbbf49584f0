package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: connected-components round count + per-round wall time on
  * the image-dedup pair graph (round-14 optimization evidence). */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // rebuild the image pair graph via the registered query's edge leg
    val pairs = SparkEntry.queries("q_image_neardup")(spark, dir)
      .select(col("id_a"), col("id_b")).localCheckpoint()
    val nodes = Tables(spark, dir).documents.select(col("doc_id").as("id"))
      .localCheckpoint()
    println(s"[cc] edges=${pairs.count()} nodes=${nodes.count()}")
    def hist(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.groupBy(col("label")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz")).agg(count(lit(1)).as("n")).orderBy(col("sz"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val t0 = System.nanoTime()
    val lp = llm.Dedup.connectedComponents(nodes, pairs)
    val h1 = hist(lp)
    println(f"[cc] doubled-labelprop ${(System.nanoTime() - t0) / 1e9}%.2f s hist=$h1")
    val t1 = System.nanoTime()
    val star = llm.Dedup.connectedComponentsStar(nodes, pairs)
    val h2 = hist(star)
    println(f"[cc] star ${(System.nanoTime() - t1) / 1e9}%.2f s equal=${h1 == h2}")
    spark.stop()
  }
}
