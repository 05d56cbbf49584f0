package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftglue.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.llm.CountMin

/** Mergeable sketch columns as FIRST-CLASS Catalyst aggregates —
  * SURVEY.md §7's "custom Catalyst (optional)" tier, closed.
  *
  * [[graft.llm.CountMin.CmsAggregator]] already bridges the sketch as a
  * Dataset `Aggregator` (the CombineFn shape); this is the same sketch
  * as a `TypedImperativeAggregate`, which buys what the bridge cannot:
  * the function is SQL-registrable (`cms_sketch(value, d, w)` inside
  * `spark.sql` GROUP BY / CUBE / window frames), participates in
  * Catalyst's partial/final aggregation natively (partial sketches
  * build per partition, only d·w counter arrays cross the shuffle), and
  * its buffer serialization is an explicit little-endian long array
  * rather than an opaque JVM-serialized closure.
  *
  * Determinism contract: counters are sums, so the result is invariant
  * to partitioning and merge order — the gate asserts the native
  * aggregate equals the Aggregator bridge ELEMENT-FOR-ELEMENT, and that
  * per-group sketches merged relationally equal the directly-computed
  * global sketch.
  */
final case class CmsSketchAgg(
    child: Expression, depth: Int, width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && width > 0, "depth and width must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_sketch expects a string value, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var i = 0
      while (i < depth) {
        buffer(i * width + CountMin.bucket(s, i, width)) += 1L
        i += 1
      }
    }
    buffer
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val lb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer()
    val out = new Array[Long](lb.remaining())
    lb.get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketchAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "cms_sketch"
}

object SketchAgg {

  /** Column-API form of the native aggregate (usable anywhere `sum` is). */
  def cmsSketch(value: Column, depth: Int, width: Int): Column =
    GraftSqlBridge.column(
      CmsSketchAgg(GraftSqlBridge.expression(value), depth, width)
        .toAggregateExpression())

  /** Merge pre-computed sketch COLUMNS (arrays) relationally: the
    * element-wise sum across rows — how per-partition / per-group /
    * per-day sketches roll up without touching raw data again. */
  def mergeSketches(sketch: Column, depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions._
    aggregate(
      collect_list(sketch),
      array_repeat(lit(0L), depth * width),
      (acc, s) => zip_with(acc, s, (a, b) => a + b))
  }
}
