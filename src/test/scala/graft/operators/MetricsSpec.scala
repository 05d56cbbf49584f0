package graft.operators

import graft.SparkSpec
import graft.operators.ElementWise._

/** DoFn Aggregator counters ([U] T/Aggregator.java): bump inside a parDo,
  * read on the driver after the action — the reference's monitoring
  * counters re-expressed as Spark accumulators. */
class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("counter / min / max aggregators accumulate across bundles") {
    val words = Metrics.counter(spark, "words")
    val shortest = Metrics.minAggregator(spark, "shortestLen")
    val longest = Metrics.maxAggregator(spark, "longestLen")
    val ds = spark.createDataset(Seq("a", "bb", "ccc", "dddd", "ee"))
      .repartition(3) // multiple bundles
    val out = ds.parDo(new DoFn[String, Int] {
      def processElement(s: String): IterableOnce[Int] = {
        words.inc()
        shortest.add(s.length.toLong)
        longest.add(s.length.toLong)
        Iterator.single(s.length)
      }
    })
    assert(out.collect().sorted.toSeq == Seq(1, 2, 2, 3, 4))
    assert(words.value == 5L)
    assert(shortest.value.contains(1L))
    assert(longest.value.contains(4L))
  }

  test("distribution reports count/sum/min/max/mean") {
    val d = Metrics.distribution(spark, "lineLen")
    val ds = spark.createDataset(Seq(10L, 20L, 30L)).repartition(2)
    ds.parDo(new DoFn[Long, Long] {
      def processElement(n: Long): IterableOnce[Long] = {
        d.update(n); Iterator.single(n)
      }
    }).collect()
    val r = d.value.get
    assert(r == Metrics.DistributionResult(3L, 60L, 10L, 30L))
    assert(r.mean == 20.0)
  }

  test("unused aggregators read as zero/empty") {
    assert(Metrics.counter(spark, "nothing").value == 0L)
    assert(Metrics.minAggregator(spark, "noMin").value.isEmpty)
    assert(Metrics.distribution(spark, "noDist").value.isEmpty)
  }

  test("observed: metrics-only tap rides the main action, no second pass") {
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 100).toDF("i")
    val (tapped, obs) = Metrics.observed(df, "tap",
      count(lit(1)).as("n"), sum(col("i")).as("s"),
      max(col("i")).as("mx"))
    // main output unchanged; metrics appear after the action completes
    assert(tapped.count() == 100L)
    val m = obs.get
    assert(m("n") == 100L && m("s") == 4950L && m("mx") == 99L)
  }
}
