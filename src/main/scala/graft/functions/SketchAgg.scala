package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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

/** Merge PRE-COMPUTED sketch columns (long arrays) under a constant
  * aggregation buffer: update folds each input array into one d·w
  * buffer (sized from the first input), partial buffers merge
  * element-wise. A `collect_list`-then-fold would materialize ALL G
  * group sketches in one buffer (G × 64 KB — the thing that dies at a
  * million groups); this never holds more than one sketch. */
final case class CmsMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_merge expects array<bigint>, got ${other.catalogString}")
  }

  // empty = "no sketch seen yet"; sized lazily from the first input so
  // callers don't re-state depth/width the sketches already encode
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    child.eval(input) match {
      case null => buffer
      case arr: org.apache.spark.sql.catalyst.util.ArrayData =>
        val n = arr.numElements()
        val b = if (buffer.isEmpty) new Array[Long](n) else buffer
        require(b.length == n,
          s"cms_merge: mixed sketch sizes (${b.length} vs $n)")
        var i = 0
        while (i < n) { b(i) += arr.getLong(i); i += 1 }
        b
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a.length == b.length,
        s"cms_merge: mixed sketch sizes (${a.length} vs ${b.length})")
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

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsMergeAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "cms_merge"
}

/** Mergeable QUANTILE sketch column: `org.apache.datasketches.kll.
  * KllDoublesSketch` (Karnin-Lang-Liberty, FOCS'16; the library ships on
  * the Spark classpath — exactly the SURVEY §7 "TypedImperativeAggregate
  * wrapping datasketches-java" option) aggregated natively. Unlike
  * `percentile_approx`, whose GK summary lives only inside one
  * aggregation, this emits the sketch itself as a binary column:
  * per-shard/per-day sketches persist, merge relationally
  * ([[KllMergeAgg]]), and answer any quantile later without re-reading
  * data — completing the mergeable-sketch family (HLL distinct, CMS
  * frequency, MG heavy hitters, KLL quantiles).
  *
  * KLL is RANDOMIZED (sampling levels), so two runs' sketches differ in
  * bytes while both honor the rank-error guarantee (~1.65/√k normalized
  * rank error at 99% confidence per level; k=200 ⇒ <1%). Gate queries
  * therefore pin rank-error BOUNDS (with generous margins), never
  * sketch bytes.
  */
final case class KllSketchAgg(
    child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.kll.KllDoublesSketch] {

  require(k >= 8 && k <= 65535, "k out of KLL range")
  private type Kll = org.apache.datasketches.kll.KllDoublesSketch

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_sketch expects double, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Kll =
    org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: Kll, input: InternalRow): Kll = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(a: Kll, b: Kll): Kll = { a.merge(b); a }

  override def eval(buffer: Kll): Any = buffer.toByteArray

  override def serialize(buffer: Kll): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): Kll =
    org.apache.datasketches.kll.KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "kll_sketch"
}

/** Merge pre-built KLL sketch columns (binary) — the quantile sibling of
  * [[CmsMergeAgg]]: constant buffer, native partial/final. */
final case class KllMergeAgg(
    child: Expression,
    k: Int = 200,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.kll.KllDoublesSketch] {

  private type Kll = org.apache.datasketches.kll.KllDoublesSketch
  require(k >= 8, "k must be >= 8")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_merge expects a binary sketch, got ${other.catalogString}")
  }

  // the merge buffer's k must be >= the input sketches' k: KLL merge
  // adopts the SMALLER k, so a hardcoded 200 would silently degrade
  // sketches built at higher accuracy
  override def createAggregationBuffer(): Kll =
    org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: Kll, input: InternalRow): Kll = {
    child.eval(input) match {
      case null => buffer
      case bytes: Array[Byte] =>
        buffer.merge(org.apache.datasketches.kll.KllDoublesSketch.heapify(
          org.apache.datasketches.memory.Memory.wrap(bytes)))
        buffer
    }
  }

  override def merge(a: Kll, b: Kll): Kll = { a.merge(b); a }
  override def eval(buffer: Kll): Any = buffer.toByteArray
  override def serialize(buffer: Kll): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): Kll =
    org.apache.datasketches.kll.KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "kll_merge"
}

/** Scalar: quantile estimate from a serialized KLL sketch. */
final case class KllQuantile(sketch: Expression, rank: Double)
  extends UnaryExpression with CodegenFallback {
  require(rank >= 0.0 && rank <= 1.0, "rank must be in [0,1]")
  override def child: Expression = sketch
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  // an EMPTY sketch has no quantiles — the estimate is null even when
  // the sketch column itself is non-null
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = sketch.dataType match {
    case org.apache.spark.sql.types.BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_quantile expects a binary sketch, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any = {
    val sk = org.apache.datasketches.kll.KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(input.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null else sk.getQuantile(rank)
  }
  override def prettyName: String = "kll_quantile"
  override protected def withNewChildInternal(newChild: Expression): KllQuantile =
    copy(sketch = newChild)
}

/** Theta distinct sketch of a string column (compact binary output) —
  * the SET-ALGEBRA member of the sketch family. HLL answers |A| and
  * |A∪B|; intersections must go through inclusion–exclusion, whose
  * absolute error scales with |A∪B| — for a small overlap of two large
  * corpora the estimate drowns in the unions' noise. Theta sketches
  * keep a uniform hash SAMPLE of the set (the k smallest hashes), so
  * intersection and difference are first-class operations
  * ([[ThetaIntersect]]/[[ThetaAnotB]]) with error bounds from the
  * result sketch itself. The 100 TB shape: per-shard/per-snapshot
  * sketches persist as binary columns, set questions ("how much of
  * corpus B is already in A?") answer from sketches alone.
  *
  * The aggregation buffer is a theta Union (streaming updates and
  * sketch merges are both unions); serialization is the compact form. */
final case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.theta.Union] {

  private type TUnion = org.apache.datasketches.theta.Union
  require(lgK >= 4 && lgK <= 26, "lgK must be in [4, 26]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_sketch expects a string column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): TUnion =
    org.apache.datasketches.theta.SetOperation.builder()
      .setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: TUnion, input: InternalRow): TUnion = {
    child.eval(input) match {
      case null => buffer
      case s: UTF8String => buffer.update(s.toString); buffer
    }
  }

  override def merge(a: TUnion, b: TUnion): TUnion = {
    a.union(b.getResult); a
  }

  override def eval(buffer: TUnion): Any = buffer.getResult.toByteArray
  override def serialize(buffer: TUnion): Array[Byte] = buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): TUnion = {
    val u = createAggregationBuffer()
    u.union(org.apache.datasketches.theta.Sketches.heapifySketch(
      org.apache.datasketches.memory.Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "theta_sketch"
}

/** Union pre-built theta sketch columns (binary) relationally —
  * constant buffer, the [[CmsMergeAgg]]/[[KllMergeAgg]] shape. */
final case class ThetaMergeAgg(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.theta.Union] {

  private type TUnion = org.apache.datasketches.theta.Union

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_merge expects a binary sketch, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): TUnion =
    org.apache.datasketches.theta.SetOperation.builder()
      .setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: TUnion, input: InternalRow): TUnion = {
    child.eval(input) match {
      case null => buffer
      case bytes: Array[Byte] =>
        buffer.union(org.apache.datasketches.theta.Sketches.heapifySketch(
          org.apache.datasketches.memory.Memory.wrap(bytes)))
        buffer
    }
  }

  override def merge(a: TUnion, b: TUnion): TUnion = { a.union(b.getResult); a }
  override def eval(buffer: TUnion): Any = buffer.getResult.toByteArray
  override def serialize(buffer: TUnion): Array[Byte] = buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): TUnion = {
    val u = createAggregationBuffer()
    u.union(org.apache.datasketches.theta.Sketches.heapifySketch(
      org.apache.datasketches.memory.Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaMergeAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "theta_merge"
}

/** Scalar helpers shared by the theta set-operation expressions. */
private[functions] object ThetaOps {
  def heapify(bytes: Array[Byte]): org.apache.datasketches.theta.Sketch =
    org.apache.datasketches.theta.Sketches.heapifySketch(
      org.apache.datasketches.memory.Memory.wrap(bytes))
}

/** Scalar: |set| estimate (or an nStdDev bound) from a serialized theta
  * sketch. mode 0 = estimate, -1 = lower bound, +1 = upper bound. */
final case class ThetaEstimate(sketch: Expression, mode: Int, numStdDev: Int = 2)
  extends UnaryExpression with CodegenFallback {
  require(mode >= -1 && mode <= 1, "mode must be -1 (lb), 0 (est), or 1 (ub)")
  require(numStdDev >= 1 && numStdDev <= 3, "numStdDev must be in [1, 3]")
  override def child: Expression = sketch
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def checkInputDataTypes(): TypeCheckResult = sketch.dataType match {
    case org.apache.spark.sql.types.BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_estimate expects a binary sketch, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any = {
    val sk = ThetaOps.heapify(input.asInstanceOf[Array[Byte]])
    mode match {
      case -1 => sk.getLowerBound(numStdDev)
      case 0 => sk.getEstimate
      case 1 => sk.getUpperBound(numStdDev)
    }
  }
  override def prettyName: String = "theta_estimate"
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(sketch = newChild)
}

/** Scalar: theta set operation over two serialized sketches → compact
  * binary result sketch. op = "intersect" | "a_not_b". The result is a
  * real sketch, so it composes (chain intersections, then estimate with
  * bounds) — the property inclusion–exclusion does not have. */
final case class ThetaSetOp(a: Expression, b: Expression, op: String)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with CodegenFallback {
  require(op == "intersect" || op == "a_not_b", s"unknown theta set op $op")
  override def left: Expression = a
  override def right: Expression = b
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    (a.dataType, b.dataType) match {
      case (org.apache.spark.sql.types.BinaryType,
            org.apache.spark.sql.types.BinaryType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"theta_$op expects two binary sketches, got ${l.catalogString}, ${r.catalogString}")
    }
  override def nullSafeEval(la: Any, rb: Any): Any = {
    val sa = ThetaOps.heapify(la.asInstanceOf[Array[Byte]])
    val sb = ThetaOps.heapify(rb.asInstanceOf[Array[Byte]])
    val out =
      if (op == "intersect")
        org.apache.datasketches.theta.SetOperation.builder()
          .buildIntersection().intersect(sa, sb)
      else
        org.apache.datasketches.theta.SetOperation.builder()
          .buildANotB().aNotB(sa, sb)
    out.toByteArray
  }
  override def prettyName: String = s"theta_$op"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaSetOp =
    copy(a = newLeft, b = newRight)
}

object SketchAgg {

  /** Column-API form of the native aggregate (usable anywhere `sum` is). */
  def cmsSketch(value: Column, depth: Int, width: Int): Column =
    GraftSqlBridge.column(
      CmsSketchAgg(GraftSqlBridge.expression(value), depth, width)
        .toAggregateExpression())

  /** Merge pre-computed sketch COLUMNS (arrays) relationally via
    * [[CmsMergeAgg]] — constant aggregation buffer regardless of group
    * count (depth/width come from the sketches themselves; the
    * parameters are kept for call-site documentation). */
  def mergeSketches(sketch: Column, depth: Int, width: Int): Column =
    GraftSqlBridge.column(
      CmsMergeAgg(GraftSqlBridge.expression(sketch)).toAggregateExpression())

  /** Mergeable KLL quantile sketch of a double column (binary output). */
  def kllSketch(value: Column, k: Int = 200): Column =
    GraftSqlBridge.column(
      KllSketchAgg(GraftSqlBridge.expression(value), k).toAggregateExpression())

  /** Merge pre-built KLL sketch columns; `k` must be at least the k the
    * inputs were built with (KLL adopts the smaller k on merge). */
  def kllMerge(sketch: Column, k: Int = 200): Column =
    GraftSqlBridge.column(
      KllMergeAgg(GraftSqlBridge.expression(sketch), k).toAggregateExpression())

  /** Quantile estimate from a serialized KLL sketch column. */
  def kllQuantile(sketch: Column, rank: Double): Column =
    GraftSqlBridge.column(KllQuantile(GraftSqlBridge.expression(sketch), rank))

  /** Mergeable theta distinct sketch of a string column (binary). */
  def thetaSketch(value: Column, lgK: Int = 12): Column =
    GraftSqlBridge.column(
      ThetaSketchAgg(GraftSqlBridge.expression(value), lgK).toAggregateExpression())

  /** Union pre-built theta sketch columns. */
  def thetaMerge(sketch: Column, lgK: Int = 12): Column =
    GraftSqlBridge.column(
      ThetaMergeAgg(GraftSqlBridge.expression(sketch), lgK).toAggregateExpression())

  /** Estimate / bounds from a serialized theta sketch. */
  def thetaEstimate(sketch: Column): Column =
    GraftSqlBridge.column(ThetaEstimate(GraftSqlBridge.expression(sketch), 0))
  def thetaLowerBound(sketch: Column, numStdDev: Int = 2): Column =
    GraftSqlBridge.column(
      ThetaEstimate(GraftSqlBridge.expression(sketch), -1, numStdDev))
  def thetaUpperBound(sketch: Column, numStdDev: Int = 2): Column =
    GraftSqlBridge.column(
      ThetaEstimate(GraftSqlBridge.expression(sketch), 1, numStdDev))

  /** Sketch-level set intersection / difference (result is a sketch —
    * composes, and carries its own error bounds). */
  def thetaIntersect(a: Column, b: Column): Column =
    GraftSqlBridge.column(ThetaSetOp(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b), "intersect"))
  def thetaANotB(a: Column, b: Column): Column =
    GraftSqlBridge.column(ThetaSetOp(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b), "a_not_b"))

  /** The KLL sketch as a reference-shaped CombineFn — pluggable into the
    * streaming TriggerEngine (the CountMin.combineFn pattern), so
    * windowed per-key QUANTILE panes get the trigger algebra for free.
    * Accumulators are the serialized sketch (state stores persist plain
    * bytes; datasketches objects aren't java-serializable), so each
    * element pays a heapify/serialize round-trip — fine for pane-sized
    * windows, use the batch aggregate for bulk data. */
  def kllCombineFn(k: Int = 200)
      : graft.operators.Combine.CombineFn[Double, Array[Byte], Array[Byte]] =
    new graft.operators.Combine.CombineFn[Double, Array[Byte], Array[Byte]] {
      private def heapify(b: Array[Byte]) =
        org.apache.datasketches.kll.KllDoublesSketch.heapify(
          org.apache.datasketches.memory.Memory.wrap(b))
      def createAccumulator(): Array[Byte] =
        org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(k).toByteArray
      def addInput(acc: Array[Byte], in: Double): Array[Byte] = {
        val s = heapify(acc); s.update(in); s.toByteArray
      }
      def mergeAccumulators(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
        val sa = heapify(a); sa.merge(heapify(b)); sa.toByteArray
      }
      def extractOutput(acc: Array[Byte]): Array[Byte] = acc
    }

  /** Distinct-count sibling for the stream: datasketches HLL as a
    * CombineFn, so windowed per-key UNIQUE-COUNT panes (unique users
    * per window, unique shingles per session) ride the trigger algebra
    * too. Same serialized-state contract as [[kllCombineFn]]; merging
    * goes through `hll.Union` (sketch-vs-sketch union is only defined
    * on the union operator, not the sketch). Completes the streaming
    * sketch family: CMS frequency, KLL quantiles, HLL distincts. */
  def hllCombineFn(lgK: Int = 12)
      : graft.operators.Combine.CombineFn[String, Array[Byte], Long] =
    new graft.operators.Combine.CombineFn[String, Array[Byte], Long] {
      private def heapify(b: Array[Byte]) =
        org.apache.datasketches.hll.HllSketch.heapify(
          org.apache.datasketches.memory.Memory.wrap(b))
      def createAccumulator(): Array[Byte] =
        new org.apache.datasketches.hll.HllSketch(lgK).toCompactByteArray
      def addInput(acc: Array[Byte], in: String): Array[Byte] = {
        val s = heapify(acc); s.update(in); s.toCompactByteArray
      }
      def mergeAccumulators(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
        val u = new org.apache.datasketches.hll.Union(lgK)
        u.update(heapify(a)); u.update(heapify(b))
        u.getResult.toCompactByteArray
      }
      def extractOutput(acc: Array[Byte]): Long =
        math.round(heapify(acc).getEstimate)
    }
}
