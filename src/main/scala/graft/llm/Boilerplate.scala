package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style boilerplate removal: drop text segments (lines by default)
  * that recur across many distinct documents — navigation chrome, license
  * headers, templated footers (Raffel et al., "Exploring the Limits of
  * Transfer Learning", §2.2 cleans C4 with exactly this family of rules).
  * The reference SDK has no text operators at all (SURVEY.md §2.6); this
  * extends the mandated LLM text-cleaning family.
  *
  * Scale posture: one segment explode, one (hash → distinct-doc-count)
  * aggregation with map-side partials, one anti-join on 32-hex-char md5
  * keys — segment TEXT never rides the frequency shuffle — then one
  * grouped reassembly. No driver collect; every expression is a built-in
  * Column.
  */
object Boilerplate {

  // persisted-frame registry (same hygiene contract as Dedup/Similarity/
  // TextRelevance): the segment explode feeds both the frequency count and
  // the anti-join, so it is persisted and released per query
  private val persisted =
    scala.collection.mutable.ListBuffer.empty[DataFrame]

  private def track(df: DataFrame): DataFrame = persisted.synchronized {
    persisted += df
    df.persist()
  }

  /** Unpersist every cache this module created. */
  def releasePersistedState(): Unit = persisted.synchronized {
    persisted.foreach(_.unpersist())
    persisted.clear()
  }

  /** Documents with segments recurring in at least `minRepeats` distinct
    * documents removed. Returns (idCol, textCol) with segments rejoined by
    * `delimiter` in original order; documents whose every segment was
    * boilerplate come back with empty text (not dropped), and NULL text
    * stays NULL (distinguishable from fully-boilerplate). Whitespace-only
    * segments are never counted as boilerplate (structure is preserved).
    * Segments are matched by md5, so two segments collide only if the
    * 128-bit hash does. */
  def removeFrequentSegments(df: DataFrame, idCol: String, textCol: String,
                             delimiter: String = "\n",
                             minRepeats: Int = 2): DataFrame = {
    require(minRepeats >= 2, "minRepeats < 2 would remove every segment")
    // persisted: read by the frequency aggregation and by the anti-join —
    // one split+explode+md5 pass over the corpus, not two
    val segs = track(df.select(col(idCol).as("__id"),
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(delimiter))).as(Seq("__pos", "__seg")))
      .withColumn("__h", md5(col("__seg").cast("binary"))))
    val frequent = segs
      .filter(length(trim(col("__seg"))) > 0)
      .groupBy(col("__h"))
      .agg(count_distinct(col("__id")).as("__df"))
      .filter(col("__df") >= minRepeats)
      .select(col("__h"))
    val cleaned = segs.join(frequent, Seq("__h"), "left_anti")
      .groupBy(col("__id"))
      .agg(concat_ws(delimiter,
        transform(array_sort(collect_list(struct(col("__pos"), col("__seg")))),
          s => s.getField("__seg"))).as("__clean"))
    df.select(col(idCol), col(textCol).isNull.as("__textnull"))
      .join(cleaned, df(idCol) === cleaned("__id"), "left_outer")
      .select(col(idCol),
        when(col("__textnull"), lit(null).cast("string"))
          .otherwise(coalesce(col("__clean"), lit(""))).as(textCol))
  }

  /** The flagged segments themselves: (segment, n_docs) for segments in at
    * least `minRepeats` distinct documents — the audit view a curation
    * pipeline reviews before deleting content. */
  def frequentSegments(df: DataFrame, idCol: String, textCol: String,
                       delimiter: String = "\n",
                       minRepeats: Int = 2): DataFrame =
    df.select(col(idCol).as("__id"),
        explode(split(col(textCol),
          java.util.regex.Pattern.quote(delimiter))).as("segment"))
      .filter(length(trim(col("segment"))) > 0)
      .groupBy(col("segment"))
      .agg(count_distinct(col("__id")).as("n_docs"))
      .filter(col("n_docs") >= minRepeats)

  /** Re-segment running text into fixed-size token chunks joined by
    * newline — the preprocessing that turns unstructured text into
    * segment-removal units when the corpus has no natural line structure.
    * Tokens split on runs of ANY whitespace (newlines included, so input
    * line breaks can't masquerade as chunk boundaries downstream) and
    * empty tokens are dropped. Pure Column expression. */
  def chunkTokens(text: Column, tokensPerChunk: Int): Column = {
    require(tokensPerChunk > 0, "tokensPerChunk must be positive")
    val toks = filter(split(text, "\\s+"), t => length(t) > 0)
    concat_ws("\n",
      transform(sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(tokensPerChunk)),
        i => array_join(slice(toks, i + 1, lit(tokensPerChunk)), " ")))
  }
}
