package graft.operators

import org.apache.spark.SparkContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.{AccumulatorV2, LongAccumulator}

/** DoFn Aggregator counters ([U] T/Aggregator.java + the createAggregator
  * surface in [U] T/DoFn.java:~560): named sum/min/max counters a user fn
  * bumps per element, aggregated across bundles and readable on the driver
  * — the reference surfaces them in the monitoring UI; we surface them as
  * Spark accumulators (the native distributed-counter primitive, visible in
  * the Spark UI stage metrics the same way).
  *
  * Scale posture: accumulator updates are merged per-task then per-stage on
  * the driver — no shuffle, no extra action; the cost model is identical to
  * the reference's per-bundle counter deltas. As in the reference (and
  * Spark), counters from retried/speculative tasks can double-count —
  * counters are monitoring data, not exactly-once results.
  *
  * Beam 2.x renamed this surface Metrics.counter/gauge/distribution; the
  * [[distribution]] shape (count/sum/min/max) is provided for parity with
  * pipelines that use it.
  */
object Metrics {

  /** Sum aggregator (Beam's Sum.ofLongs — the default counter). */
  final class Counter private[Metrics] (val name: String, acc: LongAccumulator)
      extends Serializable {
    def inc(): Unit = acc.add(1L)
    def add(n: Long): Unit = acc.add(n)
    /** Driver-side read (call after an action). */
    def value: Long = acc.value
  }

  /** Min/Max aggregators (Beam's Min.ofLongs / Max.ofLongs). */
  final class ExtremumAccumulator(isMin: Boolean)
      extends AccumulatorV2[Long, Option[Long]] {
    private var v: Option[Long] = None
    override def isZero: Boolean = v.isEmpty
    override def copy(): ExtremumAccumulator = {
      val c = new ExtremumAccumulator(isMin); c.v = v; c
    }
    override def reset(): Unit = v = None
    override def add(x: Long): Unit =
      v = Some(v.fold(x)(cur => if (isMin) math.min(cur, x) else math.max(cur, x)))
    override def merge(other: AccumulatorV2[Long, Option[Long]]): Unit =
      other.value.foreach(add)
    override def value: Option[Long] = v
  }

  final class Extremum private[Metrics] (val name: String,
                                         acc: ExtremumAccumulator)
      extends Serializable {
    def add(n: Long): Unit = acc.add(n)
    /** None until at least one element was observed. */
    def value: Option[Long] = acc.value
  }

  /** Distribution summary: (count, sum, min, max) in one accumulator —
    * Beam Metrics.distribution's reportable shape. */
  final case class DistributionResult(count: Long, sum: Long, min: Long, max: Long) {
    def mean: Double = if (count == 0) 0.0 else sum.toDouble / count
  }

  final class DistributionAccumulator
      extends AccumulatorV2[Long, Option[DistributionResult]] {
    private var v: Option[DistributionResult] = None
    override def isZero: Boolean = v.isEmpty
    override def copy(): DistributionAccumulator = {
      val c = new DistributionAccumulator; c.v = v; c
    }
    override def reset(): Unit = v = None
    override def add(x: Long): Unit = v = Some(v.fold(
      DistributionResult(1L, x, x, x))(d => DistributionResult(
      d.count + 1, d.sum + x, math.min(d.min, x), math.max(d.max, x))))
    override def merge(other: AccumulatorV2[Long, Option[DistributionResult]]): Unit =
      other.value.foreach { o =>
        v = Some(v.fold(o)(d => DistributionResult(d.count + o.count,
          d.sum + o.sum, math.min(d.min, o.min), math.max(d.max, o.max))))
      }
    override def value: Option[DistributionResult] = v
  }

  final class Distribution private[Metrics] (val name: String,
                                             acc: DistributionAccumulator)
      extends Serializable {
    def update(n: Long): Unit = acc.add(n)
    def value: Option[DistributionResult] = acc.value
  }

  private def sc(spark: SparkSession): SparkContext = spark.sparkContext

  /** createAggregator(name, Sum.ofLongs) — registered in the Spark UI
    * under `name`. */
  def counter(spark: SparkSession, name: String): Counter =
    new Counter(name, sc(spark).longAccumulator(name))

  /** createAggregator(name, Min.ofLongs). */
  def minAggregator(spark: SparkSession, name: String): Extremum = {
    val acc = new ExtremumAccumulator(isMin = true)
    sc(spark).register(acc, name)
    new Extremum(name, acc)
  }

  /** createAggregator(name, Max.ofLongs). */
  def maxAggregator(spark: SparkSession, name: String): Extremum = {
    val acc = new ExtremumAccumulator(isMin = false)
    sc(spark).register(acc, name)
    new Extremum(name, acc)
  }

  /** Metrics.distribution(name): count/sum/min/max of reported values. */
  def distribution(spark: SparkSession, name: String): Distribution = {
    val acc = new DistributionAccumulator
    sc(spark).register(acc, name)
    new Distribution(name, acc)
  }

  /** Metrics-only output tap (SURVEY §7 hard part 3: a multi-output DoFn
    * whose extra output is just counters): Spark's `Observation` attaches
    * named aggregate expressions to a plan WITHOUT a second pass, extra
    * action, or sink — the relational rendering of a DoFn that passes its
    * main output through while incrementing metrics. The aggregates are
    * computed inside the same job that materializes `df`; read them from
    * the returned Observation after the first action. Unlike
    * accumulators, observed metrics are exactly-once (they ride the
    * query's own execution, not task-retry side effects). */
  def observed(df: org.apache.spark.sql.DataFrame, name: String,
               aggs: org.apache.spark.sql.Column*): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.Observation) = {
    require(aggs.nonEmpty, "at least one aggregate expression required")
    val obs = new org.apache.spark.sql.Observation(name)
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }
}
