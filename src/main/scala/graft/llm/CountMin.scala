package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan 2005, "An improved data
  * stream summary") — the point-frequency sibling of the Misra-Gries
  * heavy-hitters sketch and the reference's ApproximateUnique family
  * (SURVEY.md §2.3): a depth×width counter matrix where row i counts
  * `value` at `hash_i(value) mod width`, and a point estimate is the
  * minimum over rows. Guarantees (deterministic dataset + fixed hashes):
  * est ≥ true always (counters only overcount), and est ≤ true + εN with
  * ε = e/width for all but a δ = e^-depth fraction of items.
  *
  * Bridged to Spark as the survey prescribes for CombineFns: an
  * `Aggregator[String, Array[Long], Seq[Long]]` whose buffer is the flat
  * d·w counter array. Scale posture: the stream never shuffles — each
  * partition reduces into its own 64 KB array (Spark partial
  * aggregation = addInput) and only the d·w arrays move and element-wise
  * sum (mergeAccumulators). Unlike Misra-Gries, the summary answers
  * point queries for ANY value after the fact, which is why both live in
  * the toolbox: MG for "what is frequent", CMS for "how often is x".
  *
  * The row hashes are Spark's own XXH64 (seed 42) over "cms{i}|value", so
  * the sketch is relationally replicable: [[bucketCol]] builds the exact
  * same bucket index from `xxhash64(concat(...))` columns, letting the
  * correctness gate probe the sketch in pure SQL with no UDF on the
  * query side.
  */
object CountMin {
  private val Seed = 42L

  /** Row-i bucket of a value — XXH64(UTF-8("cms{row}|value"), seed 42)
    * mod width, identical to [[bucketCol]]. */
  def bucket(value: String, row: Int, width: Int): Int = {
    val b = UTF8String.fromString(s"cms$row|$value").getBytes
    val h = XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, Seed)
    ((h % width + width) % width).toInt
  }

  /** SQL replica of [[bucket]]: pmod(xxhash64('cms{row}|' || value), width). */
  def bucketCol(value: Column, row: Int, width: Int): Column =
    pmod(xxhash64(concat(lit(s"cms$row|"), value)), lit(width.toLong)).cast("int")

  /** The CombineFn: buffer = flat depth·width counter array, mutated in
    * place (Spark owns the buffer between reduce calls). */
  final case class CmsAggregator(depth: Int, width: Int)
      extends Aggregator[String, Array[Long], Seq[Long]] {
    require(depth > 0 && width > 0, "depth and width must be positive")

    def zero: Array[Long] = new Array[Long](depth * width)

    def reduce(b: Array[Long], v: String): Array[Long] = {
      var i = 0
      while (i < depth) { b(i * width + bucket(v, i, width)) += 1L; i += 1 }
      b
    }

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    def finish(r: Array[Long]): Seq[Long] = r.toSeq

    def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** The sketch as a reference-shaped CombineFn — pluggable into the
    * streaming TriggerEngine, so windowed per-key CMS panes get the full
    * trigger algebra (early/late firings, accumulation modes) for free. */
  def combineFn(depth: Int, width: Int)
      : graft.operators.Combine.CombineFn[String, Array[Long], Seq[Long]] =
    new graft.operators.Combine.CombineFn[String, Array[Long], Seq[Long]] {
      private val agg = CmsAggregator(depth, width)
      def createAccumulator(): Array[Long] = agg.zero
      def addInput(acc: Array[Long], in: String): Array[Long] = agg.reduce(acc, in)
      def mergeAccumulators(a: Array[Long], b: Array[Long]): Array[Long] = agg.merge(a, b)
      def extractOutput(acc: Array[Long]): Seq[Long] = agg.finish(acc)
    }

  /** One-pass sketch of `value`: a 1-row frame (sketch: array<bigint>,
    * n: total items) — broadcast it and probe with [[estimate]]. */
  def sketch(df: DataFrame, value: Column, depth: Int, width: Int): DataFrame = {
    val cms = udaf(CmsAggregator(depth, width), Encoders.STRING)
    // nulls are not countable items (SQL-aggregate convention, same as
    // HeavyHitters.candidates) — interpolating them would count the
    // literal string "null" and inflate its point estimates
    df.select(value.cast("string").as("__v"))
      .filter(col("__v").isNotNull)
      .agg(cms(col("__v")).as("sketch"), count(lit(1)).as("n"))
  }

  /** Relational point estimate: min over rows of the probed cells. */
  def estimate(sketchCol: Column, value: Column, depth: Int, width: Int): Column =
    least((0 until depth).map(i =>
      element_at(sketchCol, bucketCol(value, i, width) + lit(i * width) + 1)): _*)
}
