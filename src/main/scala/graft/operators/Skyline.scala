package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto-frontier (skyline) extraction — Börzsönyi, Kossmann &
  * Stocker, "The Skyline Operator", ICDE 2001. The warehouse form of
  * "best trade-offs per category": rows no other row beats on BOTH
  * objectives (price vs quality, cost vs recency, size vs score).
  *
  * Scale posture: the naive rendering is the O(n²) dominance self-join
  * (the oracle's NOT EXISTS — fine for a 2,000-row checker, fatal at
  * 100 TB) or a global sort + running max, which moves the whole input
  * through one unpartitioned window. This is the scale-correct shape
  * instead: collapse to one row per (group, x) (a hash aggregation),
  * then the EXCLUSIVE prefix max of ymax in x order via the
  * range-partition + per-partition window + broadcast per-partition
  * maxima device ([[Combine.prefixSum]] with MAX as the monoid) —
  * never an unpartitioned window, one range exchange of the distinct-x
  * frame, and the offsets frame is ≤ partitions × groups-per-partition
  * rows (broadcast sized).
  */
object Skyline {

  /** 2-D skyline per key group: the input rows q such that no row p in
    * the same group has p.x ≤ q.x AND p.y ≥ q.y with at least one
    * strict — x is MINIMIZED, y is MAXIMIZED (negate a column upstream
    * for other orientations). Duplicate (x, y) points are mutually
    * non-dominating: all copies survive, so the output is a filter of
    * the input (original columns, original rows).
    *
    * @param df   input rows
    * @param keys group columns (empty = one global skyline)
    * @param x    objective to minimize (cast to double)
    * @param y    objective to maximize (cast to double)
    */
  def skyline2d(df: DataFrame, keys: Seq[String], x: Column, y: Column): DataFrame = {
    val kc = keys.map(col)
    val d = df.withColumn("__x", x.cast("double")).withColumn("__y", y.cast("double"))
    // one row per (group, x): only the max-y point at each x can survive,
    // and dominance against the left neighborhood only needs that max
    val perX = d.groupBy(kc :+ col("__x"): _*).agg(max(col("__y")).as("__ymax"))
    val ranged = perX.repartitionByRange(kc :+ col("__x"): _*)
      .withColumn("__pid", spark_partition_id())
    // per-(partition, group) maxima → exclusive running max across
    // partitions per group. The first(__x) aggregate only keeps the two
    // exchange consumers' column sets identical so the range exchange is
    // planned once and reused (prefixSum's keepAll device).
    val offsets = ranged.groupBy(col("__pid") +: kc: _*)
      .agg(max(col("__ymax")).as("__pm"), first(col("__x")).as("__keep_x"))
      .withColumn("__om", max(col("__pm")).over(
        // constant-derived partition key: this frame is one row per
        // (partition, group) — bounded small — but an empty-keys call
        // must still not plan an unpartitioned window (prefixSum's
        // pmod device)
        Window.partitionBy(kc :+ pmod(col("__pid"), lit(1)): _*)
          .orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__pid") +: kc :+ col("__om"): _*)
    val wl = Window.partitionBy(col("__pid") +: kc: _*).orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // exclusive prefix max = max(everything in earlier partitions,
    // everything earlier in this partition); greatest() skips nulls
    val survivors = ranged.join(broadcast(offsets), ("__pid" +: keys).toSeq)
      .withColumn("__lm", max(col("__ymax")).over(wl))
      .withColumn("__em", greatest(col("__om"), col("__lm")))
      // strictly above every x-smaller point's best y ⇒ undominated
      .filter(col("__em").isNull || col("__ymax") > col("__em"))
      .select(kc :+ col("__x") :+ col("__ymax").as("__y"): _*)
    d.join(survivors, keys :+ "__x" :+ "__y").drop("__x", "__y")
  }
}
