package graft.spark

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Driver-side iteration helpers for convergence loops (PageRank, BFS,
  * k-core, connected components): each round must both MATERIALIZE its
  * iterate (localCheckpoint — lineage stays flat) and read a tiny
  * convergence fact about it (row count, any-changed flag, set
  * signature). Running those as two actions doubles the per-round job
  * count for no new computation — the fact is an aggregate of exactly
  * the rows the checkpoint already streamed past (guide §1.2: don't
  * recompute what one pass already produced). */
object CheckpointOps {

  /** localCheckpoint + named aggregate metrics in ONE action: the
    * metrics ride the checkpoint materialization as an Observation
    * (CollectMetrics node), so the convergence flag costs no second
    * job. Returns the checkpointed frame — its lineage starts at the
    * materialized RDD; the metric node is consumed by the checkpoint —
    * and the observed metric row as name → value. Metrics must be
    * aggregates over the whole frame (the observe contract); null-able
    * aggregates (sum over an empty frame) come back as null — coalesce
    * at the call site when that matters. */
  def checkpointObserved(df: DataFrame, metrics: Seq[Column]): (DataFrame, Map[String, Any]) = {
    val obs = Observation()
    val ck = df.observe(obs, metrics.head, metrics.tail: _*).localCheckpoint()
    (ck, obs.get)
  }

  /** localCheckpoint + row count in one action. */
  def checkpointCounted(df: DataFrame): (DataFrame, Long) = {
    val (ck, m) = checkpointObserved(df, Seq(count(lit(1)).as("n")))
    (ck, m("n").asInstanceOf[Long])
  }
}
