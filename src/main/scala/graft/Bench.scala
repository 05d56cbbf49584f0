package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. A query that throws is reported in "errors" (and
  * excluded from the total) instead of being swallowed as a fast timing —
  * a regression must look like a failure, not a speedup. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session before timing: JVM/codegen warmup and the first
    // parquet-footer reads otherwise land entirely on whichever query runs
    // first (alphabetical), skewing its number by several seconds. Best
    // effort — a missing table must not kill the whole report (per-query
    // failures are what the errors field is for).
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      Seq("lineitem", "orders", "events", "documents", "embeddings").foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet").count()
      }
      // token-pipeline warmup: JIT the split/filter/explode/agg codegen
      // shapes the text queries share, so the alphabetically-first text
      // query doesn't absorb all of Janino+JIT's first-compile cost
      locally {
        import org.apache.spark.sql.functions._
        spark.read.parquet(s"$sfDir/documents.parquet").limit(64)
          .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
          .groupBy(col("t")).count().agg(sum(col("count"))).collect()
      }
    } catch {
      case e: Throwable => System.err.println(s"[bench] warmup skipped: $e")
    }
    def esc(s: String): String =
      s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
    var errors = List.empty[(String, String)]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        Some(name -> (System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          errors ::= (name -> s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
          None
      } finally {
        // keep executor cache flat across the full query sweep
        graft.llm.Dedup.releasePersistedState()
        graft.llm.Similarity.releasePersistedState()
        graft.llm.TextRelevance.releasePersistedState()
        graft.llm.Boilerplate.releasePersistedState()
      }
    }
    val qs = results.map { case (k, v) => s"\"${esc(k)}\":$v" }.mkString("{", ",", "}")
    val errJson = errors.reverse.map { case (k, v) => s"\"${esc(k)}\":\"${esc(v)}\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"n_failed":${errors.size},"sf":"${esc(sfDir)}"}""")
    spark.stop()
  }
}
