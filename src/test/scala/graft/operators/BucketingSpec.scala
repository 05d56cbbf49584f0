package graft.operators

import graft.SparkSpec

/** The co-located-join contract: equal bucketing on the join key means the
  * join plans with NO Exchange — the write-once-shuffle-never-again
  * pattern that carries repeated big joins at scale. */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans without an Exchange") {
    val a = spark.range(1000).selectExpr("id as k", "id * 2 as va")
    val b = spark.range(1000).selectExpr("id as k", "id * 3 as vb")
    Bucketing.writeBucketed(a, "bkt_a", 4, Seq("k"))
    Bucketing.writeBucketed(b, "bkt_b", 4, Seq("k"))
    // force the sort-merge path so the assertion is about bucketing, not
    // about a broadcast hiding the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.readBucketed(spark, "bkt_a")
        .join(Bucketing.readBucketed(spark, "bkt_b"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("writer partitionBy → reads prune partitions at the source") {
    val out = java.nio.file.Files.createTempDirectory("graft-part-").toString
    spark.range(1000)
      .selectExpr("id", "CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END AS side")
      .write.mode("overwrite").partitionBy("side").parquet(out)
    val filtered = spark.read.parquet(out)
      .filter(org.apache.spark.sql.functions.col("side") === "even")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("side"),
      s"partition filter missing from scan:\n$plan")
    assert(filtered.count() == 500)
  }

  test("aggregation on the bucket key also skips the shuffle") {
    val a = spark.range(1000).selectExpr("id as k", "id * 2 as v")
    Bucketing.writeBucketed(a, "bkt_agg", 4, Seq("k"))
    try {
      val agg = Bucketing.readBucketed(spark, "bkt_agg")
        .groupBy("k").sum("v")
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed agg still shuffles:\n$plan")
      assert(agg.count() == 1000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_agg")
    }
  }
}
