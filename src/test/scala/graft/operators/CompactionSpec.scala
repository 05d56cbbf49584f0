package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Compaction: file counts follow the byte-planned arithmetic, the row
  * multiset is untouched, and the sort-preserving variant keeps the
  * clustering property. */
class CompactionSpec extends SparkSpec {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-compact-").toString

  test("fragmented directory compacts to the planned file count; rows survive") {
    val base = freshDir()
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src.repartition(37).write.mode("overwrite").parquet(s"$base/frag")

    val (bytes, nIn, _) = Compaction.compact(spark, s"$base/frag", s"$base/out",
      targetFileBytes = 64L << 20)
    assert(nIn == 37, s"fragmentation setup wrote $nIn files")
    // tiny corpus, huge target: everything fits one file
    val (_, nOut) = Compaction.dirStats(spark, s"$base/out")
    assert(nOut == 1, s"expected 1 compacted file, got $nOut")
    assert(bytes > 0)

    // multiset equality via a total order
    val a = src.orderBy("doc_id").collect().toSeq
    val b = spark.read.parquet(s"$base/out").orderBy("doc_id").collect().toSeq
    assert(a == b, "compaction changed the data")
  }

  test("file count scales with the byte budget") {
    val base = freshDir()
    val src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    src.repartition(16).write.mode("overwrite").parquet(s"$base/frag")
    val (bytes, _, planned) = Compaction.compact(spark, s"$base/frag", s"$base/out",
      targetFileBytes = math.max(1L, {
        val (b, _) = Compaction.dirStats(spark, s"$base/frag"); b / 4
      }))
    val (_, nOut) = Compaction.dirStats(spark, s"$base/out")
    assert(planned >= 4 && planned <= 5, s"planned $planned files from $bytes bytes")
    assert(nOut == planned, s"wrote $nOut, planned $planned")
  }

  test("partitioned table: each hive partition compacts independently; pruning survives") {
    val base = freshDir()
    val src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"))
    src.repartition(9).write.mode("overwrite")
      .partitionBy("event_type").parquet(s"$base/frag")

    val results = Compaction.compactPartitioned(
      spark, s"$base/frag", s"$base/out", targetFileBytes = 64L << 20)
    assert(results.nonEmpty && results.forall(_._1.startsWith("event_type=")))
    results.foreach { case (p, bytes, nIn, planned) =>
      assert(nIn > 1, s"$p was not fragmented ($nIn files)")
      assert(planned == 1 && bytes > 0, s"$p planned $planned files")
      val (_, nOut) = Compaction.dirStats(spark, s"$base/out/$p")
      assert(nOut == 1, s"$p compacted to $nOut files")
    }
    // the flat entry point must refuse the partitioned root rather than
    // silently flatten it from a 0-byte plan
    val e = intercept[IllegalArgumentException] {
      Compaction.compact(spark, s"$base/frag", s"$base/flat", 64L << 20)
    }
    assert(e.getMessage.contains("compactPartitioned"))

    // partition column survives (directory structure is the schema)
    val back = spark.read.parquet(s"$base/out")
    assert(back.columns.toSet == src.columns.toSet)
    val a = src.orderBy("event_id").collect().toSeq
    val b = back.select(src.columns.map(col): _*).orderBy("event_id").collect().toSeq
    assert(a == b, "partitioned compaction changed the data")
  }

  test("sort-preserving compaction keeps clustering (file-level ranges stay disjoint)") {
    val base = freshDir()
    val src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"))
    src.repartition(16).write.mode("overwrite").parquet(s"$base/frag")
    val (frBytes, _) = Compaction.dirStats(spark, s"$base/frag")
    Compaction.compact(spark, s"$base/frag", s"$base/out", frBytes / 4,
      orderBy = Seq(col("l_orderkey")))
    val ranges = spark.read.parquet(s"$base/out")
      .groupBy(input_file_name().as("f"))
      .agg(min("l_orderkey").as("lo"), max("l_orderkey").as("hi"))
      .orderBy(col("lo"))
      .collect()
    assert(ranges.length >= 2, "need multiple files to check disjointness")
    ranges.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("hi") <= b.getAs[Long]("lo"),
        s"file ranges overlap: ${a} vs ${b}")
    }
  }
}
