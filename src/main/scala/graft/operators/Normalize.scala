package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-based quantile normalization — map every source value onto the
  * reference distribution's value at the same rank fraction (the
  * Bolstad et al. 2003 microarray device, routine in ML feature
  * pipelines for making score distributions comparable across
  * sources).
  *
  * Determinism contract (the TheilSen device, twice):
  *  - the source rank is row_number over (value, id) — the id tiebreak
  *    is REQUIRED, because tied source rows map to different reference
  *    ranks and an undetermined tie order would make the mapping
  *    nondeterministic;
  *  - the target is the reference value AT RANK ⌈r·m/n⌉ — selected by
  *    rank with exact integer arithmetic ((r·m + n − 1) div n), never
  *    interpolated; reference tie order is immaterial (whichever tied
  *    row wins a rank carries the same value).
  *
  * Scale posture: one window per side (per-key sort) and one equi-join
  * on (keys, target rank) — all shuffles on the keys, no broadcast of
  * data-sized frames, no crossing.
  *
  * @return source rows as (keys…, id, value, src_rank, normalized)
  */
object Normalize {

  def quantileNormalize(src: DataFrame, ref: DataFrame, keys: Seq[String],
                        value: Column, id: Column): DataFrame = {
    require(keys.nonEmpty, "quantileNormalize needs at least one key column")
    val wSrc = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("value"), col("id"))
    val wKey = Window.partitionBy(keys.map(col): _*)
    val s = src.filter(value.isNotNull)
      .select(keys.map(col) ++ Seq(id.as("id"),
        value.cast("double").as("value")): _*)
      .withColumn("src_rank", row_number().over(wSrc).cast("long"))
      .withColumn("__n", count(lit(1)).over(wKey))
    val wRef = Window.partitionBy(keys.map(col): _*).orderBy(col("__rv"))
    val r = ref.filter(value.isNotNull)
      .select(keys.map(col) :+ value.cast("double").as("__rv"): _*)
      .withColumn("__t", row_number().over(wRef).cast("long"))
      .withColumn("__m", count(lit(1)).over(wKey))
    val withTarget = s
      .join(broadcast(r.groupBy(keys.map(col): _*)
        .agg(max(col("__m")).as("__m"))), keys)
      // DECIMAL product: r·m in BIGINT would overflow past 2⁶³ at
      // n·m ≳ 10¹⁸ combined cardinalities
      .withColumn("__t",
        expr("(CAST(src_rank AS DECIMAL(38,0)) * __m + __n - 1) DIV __n"))
    withTarget
      .join(r.select(keys.map(col) ++ Seq(col("__t"), col("__rv")): _*),
        keys :+ "__t")
      .select(keys.map(col) ++ Seq(col("id"), col("value"),
        col("src_rank"), col("__rv").as("normalized")): _*)
  }
}
