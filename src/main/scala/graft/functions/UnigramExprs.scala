package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftglue.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Viterbi segmentation for the unigram-LM tokenizer
  * ([[graft.llm.Unigram]]): given a piece→log-prob table (bounded —
  * vocabulary-sized, captured driver-side and shipped with the task like
  * [[ShingleExprs.ScrubSpansExpr]]'s probe set), segment each word into
  * the maximum-likelihood piece sequence by dynamic programming.
  *
  * Per row this is one O(len · maxPieceLen) DP loop with hash-map
  * lookups — the ShingleExprs custom-operator rationale (SURVEY.md §2
  * preference (b)); CodegenFallback for the reason documented there.
  *
  * Determinism: scores are exact-double sums of the table's log-probs;
  * on an EXACT score tie the longer last piece wins (the inner loop
  * scans piece lengths ascending and updates on >=), which totalizes
  * the argmax — the scalar reference in Unigram implements the
  * identical rule, and UnigramSpec brute-forces it on short words.
  *
  * Output struct: the segmentation plus three scores the correctness
  * gate compares (viterbi must dominate both heuristics):
  *   seg      array<string>  best piece sequence
  *   vscore   double         its log-likelihood
  *   gscore   double         greedy longest-match segmentation's score
  *   cscore   double         single-char segmentation's score
  * A word containing a character absent from the table cannot be
  * segmented: seg falls back to single chars and all scores are
  * [[UnigramViterbi.Unsegmentable]] (training always includes every
  * corpus char, so this only fires on out-of-corpus application). */
final case class UnigramViterbi(child: Expression,
                                logp: Map[String, Double],
                                maxPieceLen: Int,
                                heuristics: Boolean = true)
    extends UnaryExpression with CodegenFallback {
  require(maxPieceLen >= 1, "maxPieceLen must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected string, got ${child.dataType.catalogString}")

  override def dataType: DataType = StructType(Seq(
    StructField("seg", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("vscore", DoubleType, nullable = false),
    StructField("gscore", DoubleType, nullable = false),
    StructField("cscore", DoubleType, nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[UTF8String].toString
    val L = word.length
    if (L == 0)
      return InternalRow(new GenericArrayData(Array.empty[Any]), 0.0, 0.0, 0.0)
    val best = new Array[Double](L + 1)
    val back = new Array[Int](L + 1)
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    var i = 1
    while (i <= L) {
      var len = 1
      val maxL = math.min(maxPieceLen, i)
      while (len <= maxL) {
        val j = i - len
        if (best(j) != Double.NegativeInfinity) {
          logp.get(word.substring(j, i)) match {
            case Some(p) =>
              val cand = best(j) + p
              // >= : ties go to the longer piece (len scans ascending)
              if (cand >= best(i)) { best(i) = cand; back(i) = j }
            case None =>
          }
        }
        len += 1
      }
      i += 1
    }
    if (best(L) == Double.NegativeInfinity) {
      val chars = word.map(c => UTF8String.fromString(c.toString): Any).toArray
      return InternalRow(new GenericArrayData(chars),
        UnigramViterbi.Unsegmentable, UnigramViterbi.Unsegmentable,
        UnigramViterbi.Unsegmentable)
    }
    // walk back pointers
    val rev = scala.collection.mutable.ArrayBuffer[String]()
    var pos = L
    while (pos > 0) {
      val j = back(pos)
      rev += word.substring(j, pos)
      pos = j
    }
    val seg = rev.reverse.map(s => UTF8String.fromString(s): Any).toArray
    if (!heuristics)
      // E-step use: only seg/vscore are read — skip the heuristic legs
      // (their loops double the per-word cost); both mirror vscore so
      // the dominance invariants hold vacuously
      return InternalRow(new GenericArrayData(seg), best(L), best(L), best(L))
    // greedy longest-match. NOT unreachable after DP success: a table
    // without full char coverage can let greedy dead-end where the DP
    // found a different split (e.g. {aab, aa, ba} on "aaba") — that leg
    // reports the Unsegmentable sentinel, like the other fallbacks
    var gscore = 0.0
    pos = 0
    while (pos < L && gscore != UnigramViterbi.Unsegmentable) {
      var len = math.min(maxPieceLen, L - pos)
      var taken = false
      while (len >= 1 && !taken) {
        logp.get(word.substring(pos, pos + len)) match {
          case Some(p) => gscore += p; pos += len; taken = true
          case None => len -= 1
        }
      }
      if (!taken) gscore = UnigramViterbi.Unsegmentable
    }
    // single-char segmentation
    var cscore = 0.0
    var k = 0
    while (k < L && cscore != UnigramViterbi.Unsegmentable) {
      cscore += logp.getOrElse(word.substring(k, k + 1), UnigramViterbi.Unsegmentable)
      k += 1
    }
    if (cscore < UnigramViterbi.Unsegmentable) cscore = UnigramViterbi.Unsegmentable
    InternalRow(new GenericArrayData(seg), best(L), gscore, cscore)
  }

  override def prettyName: String = "unigram_viterbi"
  override protected def withNewChildInternal(newChild: Expression): UnigramViterbi =
    copy(child = newChild)
}

object UnigramViterbi {
  /** Score reported when a word has an out-of-vocabulary character. */
  val Unsegmentable: Double = -1e9

  def apply(word: Column, logp: Map[String, Double], maxPieceLen: Int,
            heuristics: Boolean): Column =
    GraftSqlBridge.column(
      new UnigramViterbi(GraftSqlBridge.expression(word), logp, maxPieceLen,
        heuristics))
}
