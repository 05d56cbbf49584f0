package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The reference's Source framework re-expressed as a DataSource V2
  * connector ([U] IO/CountingInput.java + CountingSource.java is the
  * semantic model; [U] IO/Source.java / BoundedSource / UnboundedSource is
  * the framework being demonstrated — SURVEY.md §2.5 maps that whole
  * framework to DSv2 and this class is the existence proof).
  *
  * Correspondence, concept for concept:
  *  - `BoundedSource.split(desiredBundleSize)` → [[CountingBatch
  *    .planInputPartitions]]: the row range splits into `splits` input
  *    partitions, each read independently by an executor.
  *  - `BoundedSource.getEstimatedSizeBytes` → `SupportsReportStatistics`:
  *    the scan reports row count and byte size, which Catalyst uses the
  *    same way the Dataflow service used size estimates (parallelism,
  *    broadcast decisions).
  *  - `UnboundedSource.CheckpointMark` → streaming [[Offset]]s: the last
  *    emitted id, serialized into Spark's checkpoint log; recovery resumes
  *    from the committed offset exactly like a CheckpointMark ack.
  *  - `CountingInput.unbounded().withRate(...)` → `rowsPerBatch` option:
  *    each micro-batch advances the offset by a bounded step.
  *  - `.withMaxNumRecords(n)` → `maxRows` option: the offset stops
  *    advancing at `maxRows`, turning the unbounded source into a
  *    drainable one (how the reference's tests bound unbounded reads).
  *  - `.withTimestampFn` → the emitted `ts` column: `startMs + id·periodMs`
  *    event time, usable directly with `withWatermark`.
  *
  * Options: `n` (bounded row count), `splits` (input partitions),
  * `rowsPerBatch`, `maxRows`, `startMs`, `periodMs`.
  */
final class CountingSourceProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-counting"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CountingSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new CountingTable(CountingSource.Config(properties.asScala.toMap))
}

object CountingSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false)))

  final case class Config(options: Map[String, String]) {
    private def get(k: String, d: Long): Long =
      options.collectFirst { case (key, v) if key.equalsIgnoreCase(k) => v.toLong }
        .getOrElse(d)
    val n: Long = get("n", 1000L)
    val splits: Int = math.max(1, get("splits", 4L).toInt)
    val rowsPerBatch: Long = math.max(1L, get("rowsPerBatch", 100L))
    val maxRows: Long = get("maxRows", Long.MaxValue)
    val startMs: Long = get("startMs", 0L)
    val periodMs: Long = get("periodMs", 1000L)
    def tsMicrosOf(id: Long): Long = (startMs + id * periodMs) * 1000L
  }

  /** Split [start, end) into at most `splits` contiguous ranges —
    * BoundedSource.split's contract (non-empty, disjoint, covering). */
  def ranges(start: Long, end: Long, splits: Int): Seq[(Long, Long)] = {
    val total = math.max(0L, end - start)
    if (total == 0L) Seq.empty
    else {
      val k = math.min(splits.toLong, total).toInt
      val step = total / k
      val rem = total % k
      val bounds = (0 to k).map(i => start + i * step + math.min(i.toLong, rem))
      bounds.zip(bounds.tail)
    }
  }
}

final class CountingTable(config: CountingSource.Config) extends Table with SupportsRead {
  override def name(): String = s"graft-counting(${config.n})"
  override def schema(): StructType = CountingSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new CountingScan(config)
    }
}

final class CountingScan(config: CountingSource.Config)
    extends Scan with SupportsReportStatistics {
  override def readSchema(): StructType = CountingSource.Schema
  override def description(): String = s"graft-counting n=${config.n}"

  /** getEstimatedSizeBytes: 8-byte id + 8-byte micros per row. */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): util.OptionalLong = util.OptionalLong.of(config.n * 16L)
    override def numRows(): util.OptionalLong = util.OptionalLong.of(config.n)
  }

  override def toBatch: Batch = new CountingBatch(config)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new CountingMicroBatchStream(config)
}

final case class CountingInputPartition(start: Long, end: Long) extends InputPartition

final class CountingBatch(config: CountingSource.Config) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    CountingSource.ranges(0L, config.n, config.splits)
      .map { case (s, e) => CountingInputPartition(s, e): InputPartition }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new CountingReaderFactory(config)
}

final class CountingReaderFactory(config: CountingSource.Config)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CountingInputPartition]
    new PartitionReader[InternalRow] {
      private var cur = p.start - 1
      override def next(): Boolean = { cur += 1; cur < p.end }
      override def get(): InternalRow =
        InternalRow(cur, config.tsMicrosOf(cur))
      override def close(): Unit = ()
    }
  }
}

/** CheckpointMark ≡ Offset: the count of rows emitted so far. */
final case class CountingOffset(count: Long) extends Offset {
  override def json(): String = count.toString
}

final class CountingMicroBatchStream(config: CountingSource.Config)
    extends MicroBatchStream with SupportsAdmissionControl {
  override def initialOffset(): Offset = CountingOffset(0L)

  /** The recovery-safe stepping contract: Spark hands the source the
    * checkpointed start offset (SupportsAdmissionControl), so a fresh
    * instance after restart steps forward from where the log left off —
    * instance state here would regress the offset log and re-emit rows.
    * One bounded step per batch, never past maxRows (the
    * withMaxNumRecords drain). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[CountingOffset].count
    CountingOffset(math.min(s + config.rowsPerBatch, config.maxRows))
  }
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  /** Unused once SupportsAdmissionControl is implemented; Spark calls the
    * two-argument form. */
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the supported form")
  override def deserializeOffset(json: String): Offset =
    CountingOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CountingOffset].count
    val e = end.asInstanceOf[CountingOffset].count
    CountingSource.ranges(s, e, config.splits)
      .map { case (a, b) => CountingInputPartition(a, b): InputPartition }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new CountingReaderFactory(config)
  override def stop(): Unit = ()
}
