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
