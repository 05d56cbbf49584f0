package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Approximate frequent-item detection (heavy hitters) over a key column —
  * the sketch sibling of the reference's ApproximateUnique /
  * ApproximateQuantiles family (SURVEY.md §2.3, [U] T/ApproximateUnique.java,
  * [U] T/ApproximateQuantiles.java): a bounded-memory CombineFn whose
  * summary merges associatively, bridged to Spark exactly as the survey
  * prescribes for custom CombineFns — an `Aggregator[IN,BUF,OUT]`
  * (SURVEY.md §2.6 CombineFn row).
  *
  * The sketch is Misra-Gries (Misra & Gries 1982, "Finding repeated
  * elements"; merge rule per Agarwal et al. 2012, "Mergeable summaries"):
  * a capacity-k counter map with the guarantee that after summarizing N
  * items, any item with true count > N/(k+1) is present, and each kept
  * count undercounts by at most N/(k+1).
  *
  * Scale posture: the corpus never shuffles — each partition reduces into
  * a ≤k-entry map (Spark's partial aggregation is the CombineFn's
  * addInput; the MG merge is mergeAccumulators), and only the k-entry
  * summaries move. The candidate set then drives an EXACT recount
  * restricted to candidates (broadcast semi-join, one grouped count of
  * only the matching rows), so the emitted counts are exact and the
  * output is a pure function of the data — the sketch only prunes the
  * long tail. That sketch-prune-then-exact-verify shape is the standard
  * way to keep frequent-token audits one-pass-cheap at 100 TB while
  * staying bit-reproducible for the correctness gate.
  */
object HeavyHitters {

  /** Misra-Gries summary of a string stream: capacity-bounded counter map.
    * reduce = MG update (decrement-all when full); merge = pointwise sum
    * then subtract the (capacity+1)-th largest count (the mergeable-
    * summaries rule, preserving the N/(k+1) error bound). */
  final case class MisraGries(capacity: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(capacity > 0, "capacity must be positive")

    def zero: Map[String, Long] = Map.empty

    def reduce(b: Map[String, Long], v: String): Map[String, Long] =
      b.get(v) match {
        case Some(c) => b.updated(v, c + 1L)
        case None if b.size < capacity => b.updated(v, 1L)
        case None =>
          // decrement every counter; drop zeros (the arriving item's own
          // +1 cancels against the global -1)
          b.flatMap { case (k, c) => if (c > 1L) Some(k -> (c - 1L)) else None }
      }

    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (m, (k, c)) =>
        m.updated(k, m.getOrElse(k, 0L) + c)
      }
      if (sum.size <= capacity) sum
      else {
        // subtract the (capacity+1)-th largest count from everything
        val cut = sum.valuesIterator.toArray.sortBy(-_).apply(capacity)
        sum.flatMap { case (k, c) => if (c > cut) Some(k -> (c - cut)) else None }
      }
    }

    def finish(r: Map[String, Long]): Map[String, Long] = r

    // buffer rides the partial-agg shuffle as opaque bytes; the OUTPUT must
    // be a real MapType column so callers can explode it relationally
    def bufferEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
    def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Candidate heavy hitters of `valueCol`: one MG pass, summary exploded
    * to (value, est) rows. `est` is the sketch's lower-bound count
    * (undercounts by ≤ N/(capacity+1)); complete for any item with true
    * count > N/(capacity+1). */
  def candidates(df: DataFrame, valueCol: Column, capacity: Int): DataFrame = {
    val mg = udaf(MisraGries(capacity), Encoders.STRING)
    // nulls are not countable items (and a null Map key breaks the
    // MapType output encoder) — SQL-aggregate convention: ignore them
    df.select(valueCol.cast("string").as("v"))
      .filter(col("v").isNotNull)
      .agg(mg(col("v")).as("mg"))
      .select(explode(col("mg")).as(Seq("value", "est")))
  }

  /** Exact frequent values: every `valueCol` value whose exact occurrence
    * count is ≥ ceil(minFrac · N), with its exact count. The MG pass
    * (capacity = ceil(slack/minFrac)) prunes the tail without a shuffle;
    * completeness is guaranteed because ceil(minFrac·N) ≥ minFrac·N >
    * N/(capacity+1). The exact recount touches only candidate rows via a
    * broadcast semi-join, so the full (value, count) aggregation over the
    * long tail — the expensive part at corpus scale — never runs. */
  /** The sketch as a reference-shaped CombineFn — pluggable into the
    * streaming TriggerEngine for windowed per-key heavy hitters with the
    * full trigger algebra (the streaming sibling of [[frequentValues]]'s
    * batch sketch-prune pass; the N/(k+1) guarantee holds per pane). */
  def combineFn(capacity: Int)
      : graft.operators.Combine.CombineFn[String, Map[String, Long], Map[String, Long]] =
    new graft.operators.Combine.CombineFn[String, Map[String, Long], Map[String, Long]] {
      private val mg = MisraGries(capacity)
      def createAccumulator(): Map[String, Long] = mg.zero
      def addInput(acc: Map[String, Long], in: String): Map[String, Long] =
        mg.reduce(acc, in)
      def mergeAccumulators(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
        mg.merge(a, b)
      def extractOutput(acc: Map[String, Long]): Map[String, Long] = acc
    }

  def frequentValues(df: DataFrame, valueCol: Column, minFrac: Double,
                     slack: Int = 2): DataFrame =
    frequentValuesWithTotal(df, valueCol, minFrac, slack)
      .select(col("value"), col("n"))

  /** [[frequentValues]] plus the non-null total each row was measured
    * against — the completeness-critical MG-prune/recount pipeline
    * lives HERE once; share-style consumers (`operators/Skew`) derive
    * ratios from the carried total instead of re-implementing it. */
  def frequentValuesWithTotal(df: DataFrame, valueCol: Column, minFrac: Double,
                              slack: Int = 2): DataFrame = {
    require(minFrac > 0.0 && minFrac <= 1.0, "minFrac must be in (0, 1]")
    require(slack >= 1, "slack must be >= 1")
    val capacity = math.ceil(slack / minFrac).toInt
    val vals = df.select(valueCol.cast("string").as("value"))
      .filter(col("value").isNotNull)
    val cand = candidates(vals, col("value"), capacity).select(col("value"))
    val total = vals.agg(count(lit(1)).as("total"))
    vals.join(broadcast(cand), Seq("value"), "left_semi")
      .groupBy(col("value")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .filter(col("n") >= ceil(lit(minFrac) * col("total")))
      .select(col("value"), col("n"), col("total"))
  }
}
