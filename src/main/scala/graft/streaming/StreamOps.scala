package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Unbounded-PCollection capabilities on Structured Streaming
  * (SURVEY.md §2.4/§2.5 streaming rows).
  *
  * Dataflow separates the pipeline shape from boundedness; so does Spark —
  * these helpers are the same Column expressions used in batch, plus the
  * watermark/dedup/output-mode surface that only exists on streams.
  */
object StreamOps {

  /** WithTimestamps + watermark: declare `tsCol` as event time with the
    * given allowed lateness (Beam: Window.withAllowedLateness; Spark drops
    * beyond-watermark rows in stateful ops — same contract, coarser clock). */
  def withEventTime(df: DataFrame, tsCol: String, lateness: String): DataFrame =
    df.withWatermark(tsCol, lateness)

  /** Streaming dedup by record id — PubsubIO.idLabel's capability
    * ([U] sdk/.../io/PubsubIO.java): exactly-once per id within the
    * watermark horizon, state GC'd automatically. */
  def dedupWithinWatermark(df: DataFrame, idCols: Seq[String]): DataFrame =
    df.dropDuplicatesWithinWatermark(idCols)

  /** Windowed combine on a stream: fixed/sliding/session window column +
    * aggregates; append mode emits once per window when the watermark
    * passes (Beam default trigger), update mode emits per batch (early
    * firings). */
  def windowedAgg(df: DataFrame, window: Column, keys: Seq[Column],
                  aggs: Seq[Column]): DataFrame =
    df.groupBy((window +: keys): _*).agg(aggs.head, aggs.tail: _*)

  /** Streaming exact-dedup by content fingerprint: drop documents whose
    * normalized text already arrived within the watermark horizon — the
    * streaming leg of the LLM dedup family (state GC'd by the watermark,
    * so memory is bounded by the horizon, not the stream). */
  def dedupByFingerprint(df: DataFrame, textCol: String, tsCol: String,
                         lateness: String): DataFrame =
    df.withColumn("__fp", graft.functions.TextFunctions.fingerprint(col(textCol)))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Stream-static broadcast join (side-input pattern on a stream). */
  def enrichWithStatic(stream: DataFrame, dim: DataFrame,
                       on: Seq[String]): DataFrame =
    stream.join(broadcast(dim), on, "left_outer")

  /** Global (GlobalWindows) running aggregate — requires update/complete
    * output mode downstream. */
  def globalAgg(df: DataFrame, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    if (keys.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
}
