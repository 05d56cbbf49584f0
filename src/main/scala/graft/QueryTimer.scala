package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time (or explain) a subset of SparkEntry queries without the
  * full Bench sweep. Usage:
  *   runMain graft.QueryTimer <sfDir> <query...> [--explain]
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val explain = args.contains("--explain")
    val rest = args.filterNot(_ == "--explain")
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.1")
    val names = rest.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (explain) fn(spark, sfDir).explain("formatted")
      // row count observed ON the timed execution (an extra count() run
      // would double tool runtime AND report rows from a different
      // execution than the timed one — visible for hash-seeded queries)
      val obs = org.apache.spark.sql.Observation()
      val t0 = System.nanoTime()
      // noop sink: full-plan execution (count() would prune projections)
      fn(spark, sfDir)
        .observe(obs, org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("rows"))
        .write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      val n = obs.get("rows")
      println(f"[timer] $name rows=$n time=$secs%.2f s")
      Caches.releaseAll()
    }
    spark.stop()
  }
}

