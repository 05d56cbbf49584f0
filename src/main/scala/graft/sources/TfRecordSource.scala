package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException, IOException}
import java.nio.{ByteBuffer, ByteOrder}
import java.util
import java.util.zip.CRC32C

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.{streaming => swrite}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** TFRecord file format — the de-facto training-shard container — as a
  * DataSource V2 connector, read AND write ([U] IO/Source.java +
  * IO/Write.java are the framework rows this completes; CountingSource
  * demonstrates the bounded/unbounded READ framework, this adds the
  * 3-phase Sink contract: per-task temp files → task commit messages →
  * job-level rename-into-place, exactly Write.to(Sink)'s
  * initialize/writeBundle/finalize).
  *
  * Wire format (public TFRecord spec, tensorflow/core/lib/io/record_writer):
  * each record is
  * {{{
  *   uint64 length          (little-endian)
  *   uint32 masked_crc32c(length bytes)
  *   byte   data[length]
  *   uint32 masked_crc32c(data)
  * }}}
  * with masked_crc = rotr15(crc32c(x)) + 0xa282ead8 (uint32 arithmetic).
  * CRC32C is in-JDK (`java.util.zip.CRC32C`, Java 9+). Both CRCs are
  * verified on read; a mismatch raises with file + record offset rather
  * than silently yielding torn bytes.
  *
  * Scale posture: TFRecord carries no block index, so files are NOT
  * splittable — the read parallelism unit is the file (one
  * InputPartition per file), the same contract TensorFlow's own readers
  * use. Parallelism therefore comes from sharding at write time
  * (`repartition(shards)` → one file per task), which is how training
  * shards are laid out in practice (many ~100 MB files). The reader
  * streams records through a small buffer; a file never needs to fit in
  * memory (unlike a `binaryFile` scan, which materializes whole files
  * as single rows).
  *
  * Schema: a single non-nullable `record: binary` column on read; the
  * write side requires exactly one binary column (use
  * [[TfRecordIO.write]] to cast/rename).
  */
object TfRecord {
  val Schema: StructType = StructType(Seq(
    StructField("record", BinaryType, nullable = false)))

  private val MaskDelta = 0xa282ead8

  /** rotr15(crc32c(x)) + delta, all uint32 — the published masking that
    * keeps CRCs of CRCs from colliding with data CRCs. */
  def maskedCrc32c(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new CRC32C()
    c.update(bytes, off, len)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + MaskDelta
  }

  def maskedCrc32c(bytes: Array[Byte]): Int = maskedCrc32c(bytes, 0, bytes.length)

  /** One framed record: length, masked len-CRC, payload, masked data-CRC. */
  def frame(payload: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + 4 + payload.length + 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(payload.length.toLong)
    buf.putInt(maskedCrc32c(buf.array(), 0, 8))
    buf.put(payload)
    buf.putInt(maskedCrc32c(payload))
    buf.array()
  }

  /** Streaming record iterator over an open stream. `name` is for error
    * messages only. Throws on CRC mismatch or a truncated tail. */
  def records(in: DataInputStream, name: String): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private var nextRec: Array[Byte] = _
      private var done = false
      private var offset = 0L

      private def advance(): Unit = {
        val header = new Array[Byte](12)
        val first = try { in.readFully(header, 0, 1); 1 } catch {
          case _: EOFException => done = true; return
        }
        try in.readFully(header, first, 12 - first) catch {
          case _: EOFException =>
            throw new IOException(
              s"$name: truncated record header at offset $offset")
        }
        val bb = ByteBuffer.wrap(header).order(ByteOrder.LITTLE_ENDIAN)
        val len = bb.getLong()
        val lenCrc = bb.getInt()
        if (lenCrc != maskedCrc32c(header, 0, 8))
          throw new IOException(
            s"$name: corrupt length CRC at offset $offset")
        if (len < 0 || len > Int.MaxValue - 16)
          throw new IOException(
            s"$name: implausible record length $len at offset $offset")
        val payload = new Array[Byte](len.toInt)
        val footer = new Array[Byte](4)
        try { in.readFully(payload); in.readFully(footer) } catch {
          case _: EOFException =>
            throw new IOException(
              s"$name: truncated record body at offset $offset")
        }
        val dataCrc = ByteBuffer.wrap(footer).order(ByteOrder.LITTLE_ENDIAN).getInt()
        if (dataCrc != maskedCrc32c(payload))
          throw new IOException(
            s"$name: corrupt data CRC at offset $offset")
        offset += 12L + len + 4L
        nextRec = payload
      }

      override def hasNext: Boolean = {
        if (!done && nextRec == null) advance()
        !done && nextRec != null
      }
      override def next(): Array[Byte] = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRec; nextRec = null; r
      }
    }

  final case class FileInfo(path: String, bytes: Long, mtimeMs: Long)

  /** Data files under `path` (a dir or a single file; a missing path is
    * an empty listing — the streaming source may start before the first
    * shard lands), hidden files skipped, name-sorted for deterministic
    * partition order. */
  def listDataFiles(fs: FileSystem, path: Path): Seq[FileInfo] = {
    if (!fs.exists(path)) return Seq.empty
    val st = fs.getFileStatus(path)
    val files =
      if (st.isFile) Seq(st)
      else fs.listStatus(path).toSeq.filter(_.isFile)
    files.map(s => FileInfo(s.getPath.toString, s.getLen, s.getModificationTime))
      .filterNot { f =>
        val n = new Path(f.path).getName
        n.startsWith("_") || n.startsWith(".")
      }
      .sortBy(_.path)
  }
}

/** User-facing helpers mirroring the other IO surfaces. */
object TfRecordIO {
  /** `record` is cast to binary; `shards` controls file count (the read
    * parallelism unit — see the format scaladoc). `compression` is
    * none|gzip (whole-file gzip, TF's own compressed-TFRecord layout;
    * extension-detected on read). */
  def write(df: DataFrame, record: Column, path: String, shards: Int,
            compression: String = "none"): Unit =
    df.select(record.cast("binary").as("record"))
      .repartition(shards)
      .write.format("graft-tfrecord").mode("overwrite")
      .option("compression", compression).save(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format("graft-tfrecord").load(path)
}

final class TfRecordProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-tfrecord"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TfRecord.Schema
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-tfrecord requires a path"))
    new TfRecordTable(path, schema)
  }
}

final class TfRecordTable(path: String, userSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-tfrecord($path)"
  override def schema(): StructType = TfRecord.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new TfRecordScan(path)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val s = info.schema()
    require(s.fields.length == 1 && s.fields(0).dataType == BinaryType,
      s"graft-tfrecord writes exactly one binary column, got ${s.simpleString}" +
        " — wrap with TfRecordIO.write or select a single binary column")
    val compression = Option(info.options().get("compression")).getOrElse("none")
    require(Seq("none", "gzip").contains(compression),
      s"graft-tfrecord compression must be none|gzip, got $compression")
    new TfRecordWriteBuilder(path, info.queryId(), truncate = false,
      gzip = compression == "gzip")
  }
}

// ---------------------------------------------------------------- read

final case class TfRecordInputPartition(file: String, bytes: Long)
    extends InputPartition

final class TfRecordScan(path: String) extends Scan with SupportsReportStatistics {
  // Resolved on the driver at planning time, like any file-source listing.
  private lazy val files: Seq[TfRecord.FileInfo] = {
    val spark = SparkSession.active
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    TfRecord.listDataFiles(p.getFileSystem(conf), p)
  }

  override def readSchema(): StructType = TfRecord.Schema
  override def description(): String = s"graft-tfrecord $path"

  /** Size is exact from the listing; row count is unknown (no index in
    * the format) — Catalyst still gets honest byte statistics. */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): util.OptionalLong =
      util.OptionalLong.of(files.map(_.bytes).sum)
    override def numRows(): util.OptionalLong = util.OptionalLong.empty()
  }

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      files.map(f => TfRecordInputPartition(f.path, f.bytes): InputPartition)
        .toArray
    override def createReaderFactory(): PartitionReaderFactory = {
      val conf = new SerializableConfiguration(
        SparkSession.active.sessionState.newHadoopConf())
      new TfRecordReaderFactory(conf)
    }
  }

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new TfRecordMicroBatchStream(path,
      new SerializableConfiguration(
        SparkSession.active.sessionState.newHadoopConf()))
}

/** High-watermark offset over the landing directory: the max
  * (modification time, name) pair of any consumed file. Files must land
  * immutably (write-then-rename, which the 3-phase sink does) — the
  * FileStreamSource contract. */
final case class TfFileOffset(mtimeMs: Long, name: String)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = s"$mtimeMs\n$name"
}

object TfFileOffset {
  val Zero: TfFileOffset = TfFileOffset(Long.MinValue, "")
  def parse(json: String): TfFileOffset = {
    val i = json.indexOf('\n')
    TfFileOffset(json.substring(0, i).toLong, json.substring(i + 1))
  }
  implicit val ord: Ordering[TfFileOffset] =
    Ordering.by(o => (o.mtimeMs, o.name))
}

/** Micro-batch tail of a shard landing directory — the unbounded-read
  * half of the connector (CheckpointMark ≡ the high-watermark offset;
  * recovery replans from the committed offset exactly like the
  * CountingSource demonstration). Each batch reads the files that
  * arrived since the last offset, one partition per file. */
final class TfRecordMicroBatchStream(path: String, conf: SerializableConfiguration)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import TfFileOffset.ord

  private def listing(): Seq[TfRecord.FileInfo] = {
    val p = new Path(path)
    TfRecord.listDataFiles(p.getFileSystem(conf.value), p)
  }

  override def initialOffset()
      : org.apache.spark.sql.connector.read.streaming.Offset = TfFileOffset.Zero

  override def latestOffset()
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val fs = listing()
    if (fs.isEmpty) TfFileOffset.Zero
    else fs.map(f => TfFileOffset(f.mtimeMs, new Path(f.path).getName)).max
  }

  override def planInputPartitions(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      end: org.apache.spark.sql.connector.read.streaming.Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[TfFileOffset]
    val e = end.asInstanceOf[TfFileOffset]
    listing()
      .filter { f =>
        val o = TfFileOffset(f.mtimeMs, new Path(f.path).getName)
        ord.gt(o, s) && ord.lteq(o, e)
      }
      .map(f => TfRecordInputPartition(f.path, f.bytes): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TfRecordReaderFactory(conf)
  override def deserializeOffset(json: String)
      : org.apache.spark.sql.connector.read.streaming.Offset =
    TfFileOffset.parse(json)
  override def commit(
      end: org.apache.spark.sql.connector.read.streaming.Offset): Unit = ()
  override def stop(): Unit = ()
}

final class TfRecordReaderFactory(conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TfRecordInputPartition]
    val hPath = new Path(p.file)
    val raw: java.io.InputStream = hPath.getFileSystem(conf.value).open(hPath)
    // codec is extension-detected, like Spark's own CompressedSource reads
    val in = new DataInputStream(
      if (p.file.endsWith(".gz")) new java.util.zip.GZIPInputStream(raw, 1 << 16)
      else new java.io.BufferedInputStream(raw, 1 << 16))
    val it = TfRecord.records(in, p.file)
    new PartitionReader[InternalRow] {
      private var cur: Array[Byte] = _
      override def next(): Boolean = {
        if (it.hasNext) { cur = it.next(); true } else false
      }
      override def get(): InternalRow = InternalRow(cur)
      override def close(): Unit = in.close()
    }
  }
}

// --------------------------------------------------------------- write

/** Task commit message: the committed temp file, renamed on job commit. */
final case class TfRecordCommit(tempFile: String, finalName: String)
    extends WriterCommitMessage

final class TfRecordWriteBuilder(path: String, queryId: String,
                                 truncate: Boolean, gzip: Boolean)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new TfRecordWriteBuilder(path, queryId, truncate = true, gzip)
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new TfRecordBatchWrite(path, queryId, truncate, gzip)
    override def toStreaming: swrite.StreamingWrite =
      new TfRecordStreamingWrite(path, queryId, gzip)
  }
}

/** Continuous shard production (writeStream → training shards): the same
  * temp-file + rename 3-phase contract as the batch sink, committed once
  * per epoch. Shard names carry the epoch (part-<epoch>-<partition>), so
  * every committed micro-batch is a durable, immutable set of files the
  * streaming READ side (or any TFRecord consumer) can tail. Epoch-retry
  * safe: a commit that finds its destination already present discards
  * the duplicate attempt's temp file instead of failing. */
final class TfRecordStreamingWrite(path: String, queryId: String, gzip: Boolean)
    extends swrite.StreamingWrite {
  private val tempDir = s"$path/_temporary-$queryId"

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): swrite.StreamingDataWriterFactory = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())
    val fs = new Path(path).getFileSystem(conf.value)
    fs.mkdirs(new Path(tempDir))
    val digits = math.max(5, info.numPartitions().toString.length)
    TfRecordStreamingWriterFactory(tempDir, digits, gzip, conf)
  }

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val target = new Path(path)
    val fs = target.getFileSystem(conf)
    messages.foreach { m =>
      val c = m.asInstanceOf[TfRecordCommit]
      val dest = new Path(target, c.finalName)
      if (fs.exists(dest)) fs.delete(new Path(c.tempFile), false)
      else if (!fs.rename(new Path(c.tempFile), dest))
        throw new IOException(s"epoch $epochId commit rename failed: " +
          s"${c.tempFile} -> $dest")
    }
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val fs = new Path(tempDir).getFileSystem(conf)
    messages.foreach { m =>
      val c = m.asInstanceOf[TfRecordCommit]
      fs.delete(new Path(c.tempFile), false)
    }
  }
}

final case class TfRecordStreamingWriterFactory(tempDir: String, digits: Int,
                                                gzip: Boolean,
                                                conf: SerializableConfiguration)
    extends swrite.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] = {
    val part = ("%0" + digits + "d").format(partitionId)
    new TfRecordDataWriter(tempDir,
      s"part-$epochId-$part.tfrecord" + (if (gzip) ".gz" else ""),
      taskId, gzip, conf)
  }
}

/** The 3-phase commit ([U] IO/Write.java): initialize ≡ temp dir under
  * the target, writeBundle ≡ per-task temp files (attempt-unique names,
  * so speculative/retried tasks never collide; the commit coordinator
  * admits exactly one attempt per partition), finalize ≡ job-level
  * rename-into-place + temp-dir cleanup + `_SUCCESS` marker. Abort
  * removes the temp dir and leaves any prior data untouched. */
final class TfRecordBatchWrite(path: String, queryId: String, truncate: Boolean,
                               gzip: Boolean)
    extends BatchWrite {
  private val tempDir = s"$path/_temporary-$queryId"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())
    val fs = new Path(path).getFileSystem(conf.value)
    fs.mkdirs(new Path(tempDir))
    val digits = math.max(5, info.numPartitions().toString.length)
    TfRecordWriterFactory(tempDir, digits, gzip, conf)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val target = new Path(path)
    val fs = target.getFileSystem(conf)
    if (truncate)
      TfRecord.listDataFiles(fs, target).foreach { f =>
        fs.delete(new Path(f.path), false)
      }
    messages.foreach { m =>
      val c = m.asInstanceOf[TfRecordCommit]
      val dest = new Path(target, c.finalName)
      if (!fs.rename(new Path(c.tempFile), dest))
        throw new IOException(s"commit rename failed: ${c.tempFile} -> $dest")
    }
    fs.delete(new Path(tempDir), true)
    fs.create(new Path(target, "_SUCCESS"), true).close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val fs = new Path(tempDir).getFileSystem(conf)
    fs.delete(new Path(tempDir), true)
  }
}

final case class TfRecordWriterFactory(tempDir: String, digits: Int, gzip: Boolean,
                                       conf: SerializableConfiguration)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val part = ("%0" + digits + "d").format(partitionId)
    new TfRecordDataWriter(tempDir,
      s"part-$part.tfrecord" + (if (gzip) ".gz" else ""), taskId, gzip, conf)
  }
}

final class TfRecordDataWriter(tempDir: String, val finalName: String,
                               taskId: Long, gzip: Boolean,
                               conf: SerializableConfiguration)
    extends DataWriter[InternalRow] {
  private val tempFile = s"$tempDir/attempt-$taskId-$finalName"
  private val out = {
    val p = new Path(tempFile)
    val raw: java.io.OutputStream = p.getFileSystem(conf.value).create(p, true)
    val wrapped = if (gzip) new java.util.zip.GZIPOutputStream(raw, 1 << 16)
      else new java.io.BufferedOutputStream(raw, 1 << 16)
    new DataOutputStream(wrapped)
  }

  override def write(row: InternalRow): Unit =
    out.write(TfRecord.frame(row.getBinary(0)))
  override def commit(): WriterCommitMessage = {
    out.close()
    TfRecordCommit(tempFile, finalName)
  }
  override def abort(): Unit = {
    out.close()
    val p = new Path(tempFile)
    p.getFileSystem(conf.value).delete(p, false)
  }
  override def close(): Unit = ()
}
