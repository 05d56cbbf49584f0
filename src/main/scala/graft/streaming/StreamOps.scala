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

  /** Windowed CoGroupByKey over TWO unbounded streams — the reference's
    * canonical stream-stream join substrate ([U] T/join/CoGroupByKey.java
    * applied to unbounded PCollections inside a Window). Spark-first
    * rendering: tag each input, UNION them, and run ONE windowed stateful
    * aggregation collecting the per-tag value lists — one shuffle, one
    * state store keyed by (key, window), GC'd when the watermark passes
    * the window end. (A native stream-stream join would buffer BOTH sides
    * in separate state stores and pair rows; for per-window iterable
    * semantics the single union-side store is strictly cheaper.) Missing
    * tags come back as EMPTY arrays — exactly CoGbkResult's empty
    * iterables, not SQL nulls. Output: `window` struct + key cols +
    * `a_values` + `b_values`, each sort_array'd so the result is
    * arrival-order-independent. Append mode emits one final pane per
    * window at watermark passage (Beam default trigger). The identical
    * code runs on batch frames (withWatermark is a batch no-op) — the
    * batch ≡ stream spec leans on that. */
  def streamCoGroupByKey(a: DataFrame, b: DataFrame, on: Seq[String],
                         tsCol: String, size: String, lateness: String,
                         aValue: Column, bValue: Column,
                         slide: Option[String] = None,
                         latenessB: Option[String] = None): DataFrame = {
    require(on.nonEmpty, "streamCoGroupByKey needs at least one key column")
    val reserved = Seq("__ts", "__a", "__b", "window", "a_values", "b_values")
    require(!on.exists(reserved.contains),
      s"key columns may not use the reserved names ${reserved.mkString(", ")}")
    val aType = a.select(aValue).schema.head.dataType
    val bType = b.select(bValue).schema.head.dataType
    def tagged(df: DataFrame, av: Column, bv: Column) =
      df.select((on.map(col) :+ col(tsCol).as("__ts") :+
        av.as("__a") :+ bv.as("__b")): _*)
    // PER-SOURCE watermarks (Beam: each UnboundedSource reports its own;
    // downstream watermark = min over inputs). Spark tracks one watermark
    // per withWatermark node and combines them under
    // spark.sql.streaming.multipleWatermarkPolicy (default "min" — the
    // Beam propagation rule), so stamping each side BEFORE the union
    // makes the slowest source hold back window finalization exactly as
    // the reference's runner does. PerSourceWatermarkSpec proves the
    // hold. latenessB defaults to the a-side's lateness.
    val u = tagged(a, aValue, lit(null).cast(bType))
      .withWatermark("__ts", lateness)
      .unionByName(tagged(b, lit(null).cast(aType), bValue)
        .withWatermark("__ts", latenessB.getOrElse(lateness)))
    val win = slide match {
      case Some(period) => window(col("__ts"), size, period)
      case None         => window(col("__ts"), size)
    }
    u.groupBy((win.as("window") +: on.map(col)): _*)
      .agg(sort_array(collect_list(col("__a"))).as("a_values"),
        sort_array(collect_list(col("__b"))).as("b_values"))
  }

  /** N-way windowed CoGroupByKey over unbounded streams (the reference's
    * KeyedPCollectionTuple with N tags). Same union-side single-
    * aggregation design as [[streamCoGroupByKey]] — every input carries
    * its own per-source watermark (min-combined), one state store, one
    * shuffle — generalized to one `<tag>_values` list column per input.
    * Input tuples: (tag, frame, valueColumn, lateness). */
  def streamCoGroupByKeyN(inputs: Seq[(String, DataFrame, Column, String)],
                          on: Seq[String], tsCol: String, size: String,
                          slide: Option[String] = None): DataFrame = {
    require(inputs.nonEmpty, "streamCoGroupByKeyN needs at least one input")
    val tags = inputs.map(_._1)
    require(tags.distinct.size == tags.size, s"duplicate tags: $tags")
    val reserved = Seq("__ts", "window") ++ tags.map(t => s"__$t") ++
      tags.map(t => s"${t}_values") // output aliases collide too
    require(!on.exists(reserved.contains),
      s"key columns may not use the reserved names ${reserved.mkString(", ")}")
    val types = inputs.map { case (_, df, v, _) => df.select(v).schema.head.dataType }
    val sides = inputs.zipWithIndex.map { case ((_, df, v, lateness), i) =>
      df.select((on.map(col) :+ col(tsCol).as("__ts")) ++
          tags.indices.map { j =>
            (if (j == i) v else lit(null).cast(types(j))).as(s"__${tags(j)}")
          }: _*)
        .withWatermark("__ts", lateness)
    }
    val u = sides.reduce(_.unionByName(_))
    val win = slide match {
      case Some(period) => window(col("__ts"), size, period)
      case None         => window(col("__ts"), size)
    }
    u.groupBy((win.as("window") +: on.map(col)): _*)
      .agg(
        sort_array(collect_list(col(s"__${tags.head}"))).as(s"${tags.head}_values"),
        tags.tail.map(t =>
          sort_array(collect_list(col(s"__$t"))).as(s"${t}_values")): _*)
  }

  /** Watermarked stream-stream INTERVAL join: row pairs on equal keys
    * with the right row's event time inside [left − before, left + after].
    * The row-level complement of [[streamCoGroupByKey]] — Spark's native
    * stream-stream join, where the watermark PLUS the explicit time-range
    * condition is what lets both sides' buffered state be evicted (an
    * unconstrained stream-stream join would retain state forever). Right
    * columns come back prefixed `r_`; inner rows emit as matches arrive.
    * Identical code runs on batch frames for the equality spec. */
  def streamIntervalJoin(l: DataFrame, r: DataFrame, on: Seq[String],
                         lTs: String, rTs: String, lateness: String,
                         before: String, after: String): DataFrame = {
    require(on.nonEmpty, "streamIntervalJoin needs at least one key column")
    require(!l.columns.exists(_.startsWith("r_")),
      "left side may not have r_-prefixed columns (the right side is renamed to r_*)")
    val rp = r.columns.foldLeft(r)((d, c) => d.withColumnRenamed(c, s"r_$c"))
      .withWatermark(s"r_$rTs", lateness)
    val lw = l.withWatermark(lTs, lateness)
    val cond = on.map(k => col(k) === col(s"r_$k")).reduce(_ && _) &&
      col(s"r_$rTs") >= col(lTs) - expr(s"INTERVAL $before") &&
      col(s"r_$rTs") <= col(lTs) + expr(s"INTERVAL $after")
    lw.join(rp, cond, "inner")
  }

  /** Global (GlobalWindows) running aggregate — requires update/complete
    * output mode downstream. */
  def globalAgg(df: DataFrame, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    if (keys.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)

  /** Tag each record of a JSON payload stream as parsed-or-dead-letter
    * via PERMISSIVE `from_json` with corrupt-record capture (the struct
    * itself is NEVER null in PERMISSIVE mode — malformed input yields a
    * struct of nulls, so a struct-level null check cannot detect
    * corruption; the `columnNameOfCorruptRecord` side channel can, and
    * also distinguishes "corrupt" from "valid but missing fields").
    * The flag and both branches stay inside ONE stateless projection —
    * no shuffle, no state, append-mode safe. The same call works on a
    * batch frame (q_jsonl_quarantine is the oracle-checked batch twin).
    */
  def tagDeadLetters(df: DataFrame, payloadCol: String, ddl: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
      .add("_corrupt", org.apache.spark.sql.types.StringType)
    df.withColumn("parsed",
        from_json(col(payloadCol), schema,
          Map("columnNameOfCorruptRecord" -> "_corrupt").asJava))
      // a NULL payload must dead-letter too: from_json(null) yields a
      // null struct whose _corrupt extraction is null, which would read
      // as "no corruption" without the explicit payload null check
      .withColumn("ok",
        col(payloadCol).isNotNull && col("parsed._corrupt").isNull)
      .withColumn("parsed", col("parsed").dropFields("_corrupt"))
  }

  /** Route a tagged stream to a main sink and a dead-letter sink in one
    * streaming query: foreachBatch splits each micro-batch by the `ok`
    * flag. One query = one checkpoint/epoch lineage — two filtered
    * queries would read the source twice AND commit independently (a
    * record could be consumed by one and lost by the other on failure).
    *
    * Exactly-once despite foreachBatch's at-least-once contract: after
    * a crash the LAST micro-batch re-runs with the SAME batchId, so a
    * plain parquet append would duplicate its rows. Each batch instead
    * OVERWRITES its own `epoch=<batchId>` subdirectory — the replay is
    * idempotent, and readers just read the root (epoch is a normal
    * hive partition column). The batch frame persists across the two
    * writes so the source isn't recomputed. */
  def writeWithDeadLetterQueue(tagged: DataFrame, mainPath: String, dlqPath: String,
                               checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    tagged.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try {
          batch.filter(col("ok")).drop("ok")
            .write.mode("overwrite").parquet(s"$mainPath/epoch=$batchId")
          batch.filter(!col("ok")).drop("ok", "parsed")
            .write.mode("overwrite").parquet(s"$dlqPath/epoch=$batchId")
        } finally { batch.unpersist(); () }
      }
      .start()

  /** Continuous MERGE sink: every micro-batch of change rows (op 'U'
    * upsert / 'D' delete, plus an event-order column) lands in the
    * partitioned snapshot at `root` via
    * [[graft.operators.Upsert.mergeIntoPartitioned]] — only touched
    * partitions rewrite, per micro-batch. The streaming CDC-apply
    * shape: a correction feed maintains a 100 TB lake table without
    * ever rewriting cold partitions.
    *
    * Within one batch, several changes to one key collapse to the row
    * with the max `orderCol` (ties broken by preferring 'D' — a
    * delete-then-reinsert at the same timestamp has no well-defined
    * order, so the conservative read wins) BEFORE merging; without the
    * collapse, two same-key updates in one batch would both survive
    * the anti-join and duplicate the key. Failure-replay safe: a merge
    * of the same collapsed delta is idempotent (upserts re-replace,
    * deletes are already gone), which is exactly the guarantee
    * foreachBatch needs since a batch can be re-delivered after a
    * crash between the merge and the checkpoint commit. */
  def writeStreamMerge(changes: DataFrame, root: String, keyCols: Seq[String],
                       partCol: String, orderCol: String, checkpoint: String,
                       opCol: String = "op"): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val keyWindow = org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols.map(col): _*)
          .orderBy(col(orderCol).desc, when(col(opCol) === "D", 0).otherwise(1))
        // persist: the collapse window feeds isEmpty AND the merge's
        // several passes — without it each pass re-pulls the micro-batch
        // from the source and re-runs the rank shuffle (the same reason
        // writeWithDeadLetterQueue persists its batch)
        val collapsed = batch
          .withColumn("__rn", row_number().over(keyWindow))
          .filter(col("__rn") === 1).drop("__rn", orderCol)
          .persist()
        try {
          if (!collapsed.isEmpty) {
            graft.operators.Upsert.mergeIntoPartitioned(
              batch.sparkSession, root, collapsed, keyCols, partCol, opCol)
            ()
          }
        } finally { collapsed.unpersist(); () }
      }
      .start()
}
