package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftglue.GraftSqlBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native probe expressions for pre-built sketches (SURVEY.md §2
  * custom-operator preference (b)).
  *
  * A Bloom probe is membership-test-per-row against a filter built once
  * over a reference key set — the classic "prune before the shuffle"
  * device for cross-corpus work at 100 TB: the filter (a few MB for 10^8
  * keys at 1% fpp) rides to every task; rows that fail the probe never
  * reach the anti-join's exchange. No false negatives by construction, so
  * pruning is sound: every true duplicate still reaches the exact check.
  *
  * The serialized filter is a constructor argument, not a child
  * expression — it is sketch state, not data; embedding it as a Literal
  * would push megabytes through constant folding and canonicalization.
  * Deserialization is once per executor-thread via a transient lazy val.
  * CodegenFallback per the module convention (ShingleExprs): the per-row
  * work is an opaque hash-and-test; codegen could only inline the call.
  */
object SketchExprs {

  /** Membership probe of a LONG key against a serialized
    * [[org.apache.spark.util.sketch.BloomFilter]] (xxhash64-keyed filters
    * pair with `functions.xxhash64` keys). TRUE means "maybe present"
    * (subject to the filter's fpp); FALSE means "definitely absent". */
  final case class BloomMightContainLong(child: Expression, filterBytes: Array[Byte])
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"expected bigint key, got ${child.dataType.catalogString}")
    override def dataType: DataType = BooleanType

    @transient private lazy val filter: BloomFilter =
      BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

    override def nullSafeEval(input: Any): Any =
      filter.mightContainLong(input.asInstanceOf[Long])

    override def prettyName: String = "bloom_might_contain"
    override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
      copy(child = newChild)
  }

  /** Column form of [[BloomMightContainLong]]. */
  def bloomMightContain(key: Column, filterBytes: Array[Byte]): Column =
    GraftSqlBridge.column(
      BloomMightContainLong(GraftSqlBridge.expression(key), filterBytes))
}
