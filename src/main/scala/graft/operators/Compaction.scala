package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the table-maintenance half of a 100 TB lake.
  *
  * Streaming ingestion and fine-grained partitioned writes leave
  * thousands of tiny files per partition; every downstream scan then
  * pays one task + one footer read per file, and the NameNode/listing
  * layer pays the metadata. Compaction rewrites a directory into files
  * of a target size: file count is PLANNED from the actual on-disk
  * bytes (not guessed), the rewrite is one round-robin repartition (no
  * range shuffle needed — compaction must not change semantics, only
  * layout), and the write inherits the committer's 3-phase atomicity.
  *
  * Sort-preserving variant: pass `orderBy` to re-cluster while
  * compacting (e.g. the z-value from [[ZOrder]]) — then the rewrite is
  * a range partition + local sort, same cost shape as the original
  * clustered write.
  */
object Compaction {

  /** Total bytes and file count of the data files under `dir`
    * (ignores _SUCCESS/_committed markers and hidden files). */
  def dirStats(spark: SparkSession, dir: String): (Long, Int) = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new Path(dir)).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    (files.map(_.getLen).sum, files.length)
  }

  /** Compact every hive partition of a partitioned table independently
    * — the real 100 TB maintenance shape: `root/part=X/` each gets its
    * own byte-planned rewrite, partitions stay directory-pruned, and a
    * failed partition leaves the others' committed output intact (each
    * is its own 3-phase commit). Returns per-partition
    * (name, bytesIn, filesIn, filesPlanned). Driver-side work is one
    * directory listing; partitions could be dispatched concurrently,
    * but sequential keeps failure attribution per-partition. */
  def compactPartitioned(spark: SparkSession, inRoot: String, outRoot: String,
                         targetFileBytes: Long): Seq[(String, Long, Int, Int)] = {
    val fs = new Path(inRoot).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(new Path(inRoot))
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      .map(_.getPath.getName).sorted
    require(parts.nonEmpty, s"no hive partitions (name=value dirs) under $inRoot")
    parts.toSeq.map { p =>
      val (bytes, nIn, nOut) =
        compact(spark, s"$inRoot/$p", s"$outRoot/$p", targetFileBytes)
      (p, bytes, nIn, nOut)
    }
  }

  /** Rewrite `inDir` (parquet) into `outDir` targeting
    * `targetFileBytes` per output file. Returns (bytesIn, filesIn,
    * filesPlanned). Layout-only: the row multiset is untouched. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetFileBytes: Long,
              orderBy: Seq[org.apache.spark.sql.Column] = Nil): (Long, Int, Int) = {
    require(targetFileBytes > 0)
    val (bytes, nIn) = dirStats(spark, inDir)
    // a hive-partitioned root has no top-level data files — compacting it
    // flat would lose the directory layout AND plan from 0 bytes; route
    // those through compactPartitioned
    require(nIn > 0,
      s"no data files directly under $inDir — for a partitioned table use compactPartitioned")
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(inDir)
    val shaped =
      if (orderBy.nonEmpty)
        df.repartitionByRange(nOut, orderBy: _*).sortWithinPartitions(orderBy: _*)
      else df.repartition(nOut)
    shaped.write.mode("overwrite").parquet(outDir)
    (bytes, nIn, nOut)
  }
}
