package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions
import graft.queries.QueryUtil._

/** IO surface demonstrations (SURVEY.md §2.5).
  *
  * The reference's IO framework (TextIO [U] IO/TextIO.java, AvroIO
  * [U] IO/AvroIO.java, XmlSource [U] IO/XmlSource.java, CountingInput
  * [U] IO/CountingInput.java, Write 3-phase commit [U] IO/Write.java) maps
  * to Spark built-in DataSources; these queries PROVE each mapping with a
  * write→read round-trip whose final aggregate an oracle checks against the
  * source-of-truth parquet. The round-trip exercises the FileCommitProtocol
  * (temp dir + rename-into-place + _SUCCESS), i.e. the same 3-phase commit
  * contract as the reference's Write.to(Sink).
  */
object IoQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Fresh scratch dir per call under one per-JVM base that a shutdown
    * hook deletes recursively — repeated Bench/Verify runs must not
    * accumulate table copies in the temp filesystem. */
  private lazy val scratchBase: java.nio.file.Path = {
    val base = Files.createTempDirectory("graft_io_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files => F}
      import scala.jdk.CollectionConverters._
      try F.walk(base).iterator().asScala.toSeq.reverse.foreach(F.deleteIfExists(_))
      catch { case _: Throwable => () }
    }))
    base
  }

  private def tmp(prefix: String): String =
    Files.createTempDirectory(scratchBase, prefix).toString

  val defs: Map[String, Q] = Map(

    // §2.5 TextIO.Read/Write: documents → sharded line files → read back →
    // wordcount. Newlines inside a document change line boundaries but not
    // the token multiset, so the aggregate equals wordcount on the source.
    "q_textio_roundtrip" -> { (s, dir) =>
      val out = tmp("graft_textio")
      Tables(s, dir).documents.select(col("text"))
        .repartition(4) // sharded output, TextIO-style -0000N-of-0000M
        .write.mode("overwrite").text(out)
      s.read.text(out)
        .select(explode(TextFunctions.tokens(col("value"))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .orderBy(col("word"))
    },

    // §2.5 TextIO + CompressedSource: same round-trip through gzip — the
    // codec is transparent to the read path (extension-detected).
    "q_textio_gzip" -> { (s, dir) =>
      val out = tmp("graft_textio_gz")
      Tables(s, dir).documents.select(col("text"))
        .repartition(2)
        .write.mode("overwrite").option("compression", "gzip").text(out)
      s.read.text(out)
        .select(explode(TextFunctions.tokens(col("value"))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .orderBy(col("word"))
    },

    // §2.5 columnar-binary round-trip (ORC): Spark's second native
    // columnar format, same FileFormat write/read path as parquet —
    // predicate pushdown and column pruning apply on the read side.
    "q_orcio_roundtrip" -> { (s, dir) =>
      val out = tmp("graft_orc")
      Tables(s, dir).part
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
        .write.mode("overwrite").orc(out)
      s.read.orc(out)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), dsum(col("p_retailprice")).as("sum_price"))
        .orderBy(col("p_brand"))
    },

    // §2.5 AvroIO: orders subset → avro → read back → per-priority agg.
    // (The short name "avro" has no DataSourceRegister entry in this
    // distribution; the FileFormat class itself ships in spark-sql.)
    "q_avro_roundtrip" -> { (s, dir) =>
      val out = tmp("graft_avro")
      val avro = "org.apache.spark.sql.avro.AvroFileFormat"
      Tables(s, dir).orders
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .write.mode("overwrite").format(avro).save(out)
      s.read.format(avro).load(out)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderpriority"))
    },

    // §2.5 TextIO-with-schema (CSV): numeric columns survive the
    // text→typed round-trip exactly (Double.toString round-trips).
    "q_csvio_roundtrip" -> { (s, dir) =>
      val out = tmp("graft_csv")
      Tables(s, dir).customer
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
        .write.mode("overwrite").option("header", "true").csv(out)
      s.read.option("header", "true")
        .schema("c_custkey BIGINT, c_nationkey BIGINT, c_acctbal DOUBLE")
        .csv(out)
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("sum_bal"))
        .orderBy(col("c_nationkey"))
    },

    // §2.5 JSON lines round-trip (TableRow-ish semi-structured path).
    "q_jsonio_roundtrip" -> { (s, dir) =>
      val out = tmp("graft_json")
      Tables(s, dir).events
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .write.mode("overwrite").json(out)
      s.read
        .schema("event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE")
        .json(out)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("event_type"))
    },

    // §2.5 XmlIO: nation → XML files (rowTag) → read back → verbatim rows.
    "q_xmlio_roundtrip" -> { (s, dir) =>
      val out = tmp("graft_xml")
      Tables(s, dir).nation
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .write.mode("overwrite").option("rowTag", "nation").format("xml").save(out)
      s.read.option("rowTag", "nation")
        .schema("n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT")
        .format("xml").load(out)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .orderBy(col("n_nationkey"))
    },

    // §2.5 CountingInput/CountingSource: dense sequence source → transform
    // → aggregate. spark.range is a splittable parallel source, the direct
    // analogue of CountingInput.upTo.
    "q_counting_input" -> { (s, _) =>
      s.range(0, 100000).toDF("i")
        .groupBy(pmod(col("i"), lit(7)).as("m"))
        .agg(count(lit(1)).as("n"), sum(col("i")).as("s"))
        .orderBy(col("m"))
    },

    // §2.5 partitioned-table layout + dynamic partition pruning: write
    // events hive-partitioned by event_type (the 100 TB layout: partition
    // columns become directories, scans prune by directory), then join the
    // partitioned fact against a filtered aggregate dim on the partition
    // column. The dim's predicate is NOT statically inferable (it's over
    // an aggregate), so only DPP can prune — the scan's PartitionFilters
    // gains a dynamicpruning subquery fed by the broadcast dim
    // (IoPruningSpec asserts it). Read-back aggregate equals the same
    // rule replayed on the source of truth.
    "q_partitioned_prune" -> { (s, dir) =>
      val out = tmp("graft_partitioned")
      Tables(s, dir).events
        .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
        .write.mode("overwrite").partitionBy("event_type").parquet(out)
      val fact = s.read.parquet(out)
      val dim = Tables(s, dir).events
        .groupBy(col("event_type"))
        .agg(davg(col("value")).as("avg_value"))
        .filter(col("avg_value") > 50.0)
        .select(col("event_type"))
      fact.join(broadcast(dim), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("event_type"))
    },

    // §1 row 8 semi-structured path (TableRowJsonCoder ≡ JSON columns):
    // parse the events.props JSON string relationally (from_json — a
    // codegen'd expression, no UDF) and aggregate by an extracted field.
    "q_json_props" -> { (s, dir) =>
      Tables(s, dir).events
        .select(
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k"),
          col("value"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("k"))
    },

    // Training-shard export format: JSONL with a nested metadata struct
    // ({id, text, meta:{lang, source, n_chars}} — the shape tokenizer
    // pipelines consume), written and read back with an explicit schema.
    // Proves the nested-struct JSON round-trip, not just flat columns.
    "q_export_jsonl" -> { (s, dir) =>
      val out = tmp("graft_export_jsonl")
      Tables(s, dir).documents
        .select(col("doc_id"), col("text"),
          struct(col("lang"), col("source"), col("n_chars")).as("meta"))
        .write.mode("overwrite").json(out)
      s.read
        .schema("doc_id BIGINT, text STRING, meta STRUCT<lang: STRING, source: STRING, n_chars: BIGINT>")
        .json(out)
        .groupBy(col("meta.source").as("source"))
        .agg(count(lit(1)).as("n"), sum(col("meta.n_chars")).as("sum_chars"))
        .orderBy(col("source"))
    },

    // §2.5 Source framework (BoundedSource.split + getEstimatedSizeBytes):
    // the graft.sources DSv2 connector — split-planned parallel read with
    // scan statistics, per-minute event-time aggregation over the emitted
    // timestamp column.
    "q_counting_source" -> { (s, _) =>
      s.read.format("graft-counting")
        .option("n", 10000).option("splits", 8)
        .option("startMs", 0).option("periodMs", 1000)
        .load()
        .groupBy(date_trunc("minute", col("ts")).as("minute"))
        .agg(count(lit(1)).as("n"), sum(col("id")).as("s"))
        .orderBy(col("minute"))
    },

    // §2.5 Sink framework (Write.to(Sink) 3-phase commit) + TFRecord
    // training shards: every document rides a CRC32C-framed TFRecord
    // through the graft-tfrecord DSv2 connector (write → 4 shard files →
    // streamed read), and the per-doc md5 proves each payload came back
    // byte-exact — corruption anywhere in the framing would either flip
    // the hash or raise a CRC error.
    "q_tfrecordio_roundtrip" -> { (s, dir) =>
      val out = tmp("graft_tfrecord")
      graft.sources.TfRecordIO.write(
        Tables(s, dir).documents,
        to_json(struct(col("doc_id"), col("text"))),
        out, shards = 4)
      graft.sources.TfRecordIO.read(s, out)
        .select(from_json(decode(col("record"), "UTF-8"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "doc_id BIGINT, text STRING")).as("r"))
        .select(col("r.doc_id").as("doc_id"), md5(col("r.text")).as("text_md5"))
        .orderBy(col("doc_id"))
    },

    // §2.5 the full training-shard pipeline as TF tooling writes it:
    // every document serialized as a tf.train.Example (hand-rolled
    // protobuf wire format, golden-vector-pinned in TfExampleSpec)
    // inside gzip-compressed TFRecord shards, read back, parsed, and
    // proven field-exact against the source of truth.
    "q_tfexample_roundtrip" -> { (s, dir) =>
      import graft.sources.{TfExample, TfRecordIO}
      val out = tmp("graft_tfexample")
      val enc = udf((id: Long, text: String, lang: String) =>
        TfExample.encode(Map(
          "doc_id" -> TfExample.Feature.of(id),
          "text" -> TfExample.Feature.of(text),
          "lang" -> TfExample.Feature.of(lang))))
      TfRecordIO.write(Tables(s, dir).documents,
        enc(col("doc_id"), col("text"), col("lang")), out, shards = 4,
        compression = "gzip")
      val dec = udf((b: Array[Byte]) => {
        val m = TfExample.decode(b)
        (TfExample.long(m, "doc_id").get, TfExample.string(m, "text").get,
          TfExample.string(m, "lang").get)
      })
      TfRecordIO.read(s, out)
        .select(dec(col("record")).as("r"))
        .select(col("r._1").as("doc_id"), md5(col("r._2")).as("text_md5"),
          col("r._3").as("lang"))
        .orderBy(col("doc_id"))
    },

    // Capstone export: the q_pipeline_e2e curation chain (Gopher filter →
    // exact dedup → quantile trim) feeding REAL training shards —
    // tf.Example payloads in gzip TFRecords — then the per-source report
    // recomputed from the DECODED shard content. The oracle is literally
    // q_pipeline_e2e's: if the Example codec, the CRC framing, the gzip
    // codec, or the 3-phase commit dropped/duplicated/corrupted anything,
    // the aggregates would not survive the round-trip.
    "q_shard_export" -> { (s, dir) =>
      import graft.llm.{Curation, Dedup}
      import graft.sources.{TfExample, TfRecordIO}
      val docs = Tables(s, dir).documents
      val flags = Curation.gopherQualityFlags(docs, "doc_id", "text",
        minWords = 20)
      val kept = docs.join(flags.filter(col("keep")).select(col("doc_id")),
        Seq("doc_id"))
      val keepers = Dedup.exactByKey(kept, "doc_id",
          TextFunctions.fingerprintPortable(col("text")))
        .select(col("keeper").as("doc_id"))
      val deduped = kept.join(keepers, Seq("doc_id"))
      val trimmed = Curation.trimByQuantiles(deduped, "doc_id",
        col("n_chars"), lo = 0.05, hi = 0.95)
      val fin = deduped.join(trimmed.select(col("doc_id")), Seq("doc_id"))
      val out = tmp("graft_shard_export")
      val enc = udf((id: Long, src: String, text: String) =>
        TfExample.encode(Map(
          "doc_id" -> TfExample.Feature.of(id),
          "source" -> TfExample.Feature.of(src),
          "text" -> TfExample.Feature.of(text))))
      TfRecordIO.write(fin, enc(col("doc_id"), col("source"), col("text")),
        out, shards = 4, compression = "gzip")
      val dec = udf((b: Array[Byte]) => {
        val m = TfExample.decode(b)
        (TfExample.long(m, "doc_id").get, TfExample.string(m, "source").get,
          TfExample.string(m, "text").get)
      })
      TfRecordIO.read(s, out)
        .select(dec(col("record")).as("r"))
        .select(col("r._1").as("doc_id"), col("r._2").as("source"),
          col("r._3").as("text"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text")).cast("long"))
            .as("total_tokens"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy(col("source"))
    },

    // Z-order (Morton) clustering — the multi-dimension layout tool: the
    // 32-bit interleave of two 16-bit keys, bucketed by leading bits.
    // Each z-bucket is a small hyper-rectangle in (x, y) space — that is
    // the file-skipping property, and the per-bucket min/max PROVE it
    // (bucket spans are oracle-checked exactly: the same magic-mask
    // arithmetic replays bit-for-bit in DuckDB). ZOrderSpec measures the
    // actual file-pruning win on a written layout.
    "q_zorder" -> { (s, dir) =>
      import graft.operators.ZOrder
      val x = col("l_partkey").bitwiseAND(lit(65535L))
      val y = col("l_suppkey").bitwiseAND(lit(65535L))
      Tables(s, dir).lineitem
        .select(x.as("x"), y.as("y"))
        .select(col("x"), col("y"),
          ZOrder.zValue(col("x"), col("y")).as("z"))
        .groupBy(shiftright(col("z"), 12).as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("x_min"), max(col("x")).as("x_max"),
          min(col("y")).as("y_min"), max(col("y")).as("y_max"))
        .orderBy(col("bucket"))
    },

    // The z-order PAYOFF under the gate (ZOrderSpec measures it in the
    // suite; this query makes it oracle-visible): write the SAME rows
    // z-clustered and x-clustered, count files a box predicate must
    // touch via per-file min/max (the footer-stats arithmetic), and pin
    // the pruning relations as booleans — z never worse on a 2-D box,
    // strictly better on a y-only predicate (which x-clustering cannot
    // prune), and actually pruning (not reading every file). Exact
    // companion: total row count, proving the rewrites lost nothing.
    //
    // DETERMINISM: the layouts use VALUE-PREFIX buckets — the top 4
    // bits of the clustering key (z-value / x), one file per bucket via
    // a pinned 16-way hash repartition + partitionBy — NOT the
    // production clusterByZ / repartitionByRange: range partitioning
    // samples its boundaries with an RDD-id-seeded sampler, so file
    // bounding boxes (and the pinned booleans) would depend on session
    // history. A bucket here is a pure function of the row's VALUES
    // (stronger than the r13 exact-rank ntile cut, which was a
    // single-task global-sort WindowExec — the textbook scale-killer
    // this round removes, VERDICT r14 item 4): no sort, no single
    // task, and every file's bounding box is fixture-determined. The
    // sampled production path stays exercised by ZOrderSpec.
    "q_zorder_prune" -> { (s, dir) =>
      import graft.operators.ZOrder
      val bounds = Tables(s, dir).lineitem
        .agg(max(col("l_partkey")).as("xm"), max(col("l_suppkey")).as("ym")).head()
      val (xMax, yMax) = (bounds.getLong(0), bounds.getLong(1))
      val li = Tables(s, dir).lineitem.select(
        ZOrder.scaleTo16(col("l_partkey"), 0L, xMax).as("x"),
        ZOrder.scaleTo16(col("l_suppkey"), 0L, yMax).as("y"))
      val zDir = tmp("graft_zorder_z")
      val kDir = tmp("graft_zorder_k")
      // top-4-bits of the clustering key: z-value is 32 bits (two
      // interleaved 16-bit coords) → shift 28; x is 16 bits → shift 12.
      // The explicit 16-way hash repartition pins each bucket's rows to
      // one task (AQE never splits a user-pinned exchange), so
      // partitionBy writes exactly one file per populated bucket.
      def writeClustered(bucket: org.apache.spark.sql.Column, out: String): Unit =
        li.withColumn("__b", bucket)
          .repartition(16, col("__b"))
          .write.partitionBy("__b").mode("overwrite").parquet(out)
      writeClustered(shiftright(ZOrder.zValue(col("x"), col("y")), 28), zDir)
      writeClustered(shiftright(col("x"), 12), kDir)
      val zRead = s.read.parquet(zDir)
      val kRead = s.read.parquet(kDir)
      // one stats collect per layout; every box probe is driver-side
      val zStats = ZOrder.fileStats(zRead, col("x"), col("y"))
      val kStats = ZOrder.fileStats(kRead, col("x"), col("y"))
      val zTotal = zStats.length
      val zBox = ZOrder.touched(zStats, 10000, 20000, 20000, 30000)
      val kBox = ZOrder.touched(kStats, 10000, 20000, 20000, 30000)
      val zY = ZOrder.touched(zStats, 0, 65535, 14000, 15000)
      val kY = ZOrder.touched(kStats, 0, 65535, 14000, 15000)
      zRead.agg(count(lit(1)).as("n_rows"))
        .select(col("n_rows"),
          lit(zBox <= kBox).as("box_z_le_x"),
          lit(zBox < zTotal).as("box_z_prunes"),
          lit(zY < kY).as("yonly_z_lt_x"))
    },

    // The 3-dimension Morton sibling: box predicates on ANY of three
    // columns prune files. Same exact-replay oracle discipline — the
    // 3-spacing magic-mask network replays bit-for-bit in SQL.
    "q_zorder3" -> { (s, dir) =>
      import graft.operators.ZOrder
      Tables(s, dir).lineitem
        .select(col("l_partkey").bitwiseAND(lit(2097151L)).as("x"),
          col("l_suppkey").bitwiseAND(lit(2097151L)).as("y"),
          col("l_orderkey").bitwiseAND(lit(2097151L)).as("z"))
        .select(col("x"), col("y"), col("z"),
          ZOrder.zValue3(col("x"), col("y"), col("z")).as("morton"))
        .groupBy(shiftright(col("morton"), 30).as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("x_min"), max(col("x")).as("x_max"),
          min(col("y")).as("y_min"), max(col("y")).as("y_max"),
          min(col("z")).as("z_min"), max(col("z")).as("z_max"))
        .orderBy(col("bucket"))
    },

    // Schema evolution on a 100 TB table: old shards lack a column newer
    // shards carry. Write both generations into one directory, read with
    // mergeSchema (schema union at footer level; old files yield nulls),
    // and aggregate by the evolved column with an explicit legacy
    // fallback. The oracle replays the generation split from the source
    // of truth.
    "q_schema_evolution" -> { (s, dir) =>
      val out = tmp("graft_evolve")
      val orders = Tables(s, dir).orders
      orders.filter(pmod(col("o_orderkey"), lit(2)) === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
        .write.mode("overwrite").parquet(out)
      orders.filter(pmod(col("o_orderkey"), lit(2)) === 1)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .write.mode("append").parquet(out)
      s.read.option("mergeSchema", "true").parquet(out)
        .groupBy(coalesce(col("o_orderstatus"), lit("LEGACY")).as("status"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("status"))
    },

    // Small-file compaction: fragment documents into 64 tiny files (the
    // streaming-ingestion pathology), rewrite at a byte-planned target
    // size, and prove the row multiset survived via a content aggregate
    // the oracle replays from the source of truth. CompactionSpec
    // additionally asserts the file-count arithmetic; the aggregate here
    // is what guards the data.
    "q_compaction" -> { (s, dir) =>
      import graft.operators.Compaction
      val frag = tmp("graft_frag")
      val compacted = tmp("graft_compacted")
      Tables(s, dir).documents
        .repartition(64)
        .write.mode("overwrite").parquet(frag)
      Compaction.compact(s, frag, compacted, targetFileBytes = 4L << 20)
      s.read.parquet(compacted)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy(col("source"))
    },

    // Partition-scoped MERGE: upsert + delete a delta into a
    // directory-partitioned snapshot, rewriting ONLY the touched
    // partitions. The oracle replays the merge semantics relationally
    // (kept ∪ updated ∪ inserted); the untouched_intact boolean pins
    // the 100 TB property — the two untouched partitions' data files
    // are byte-for-byte identical (name, length, mtime) after the
    // merge, proving the rewrite never opened them.
    "q_upsert_partitioned" -> { (s, dir) =>
      import graft.operators.Upsert
      val root = tmp("graft_upsert")
      val orders = Tables(s, dir).orders
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      orders.write.partitionBy("o_orderpriority").mode("overwrite").parquet(root)
      val updates = orders
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          pmod(col("o_orderkey"), lit(7)) === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000)
        .withColumn("op", lit("U"))
      val deletes = orders
        .filter(col("o_orderpriority") === "3-MEDIUM" &&
          pmod(col("o_orderkey"), lit(5)) === 0)
        .withColumn("op", lit("D"))
      val inserts = orders
        .filter(col("o_orderpriority") === "2-HIGH" &&
          pmod(col("o_orderkey"), lit(11)) === 0)
        .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
          lit("2-HIGH").as("o_orderpriority"), lit(123.45).as("o_totalprice"))
        .withColumn("op", lit("U"))
      val delta = updates.unionByName(deletes).unionByName(inserts)
      val untouched = Seq("o_orderpriority=4-NOT SPECIFIED", "o_orderpriority=5-LOW")
      val before = untouched.map(d => Upsert.partitionFileSignature(s, root, d))
      Upsert.mergeIntoPartitioned(s, root, delta, Seq("o_orderkey"), "o_orderpriority")
      val after = untouched.map(d => Upsert.partitionFileSignature(s, root, d))
      val intact = before == after && before.forall(_.nonEmpty)
      s.read.parquet(root)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .withColumn("rewritten",
          col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM"))
        .withColumn("untouched_intact", lit(intact))
        .orderBy(col("o_orderpriority"))
    },

    // Incremental JOIN-VIEW maintenance under a one-sided CDC delta:
    // the materialized view V = orders ⋈ customer refreshes from
    // ΔV = ΔA ⋈ B through the partition-scoped MERGE (delete-then-
    // reinsert by delta keys, only touched partitions rewrite) — the
    // classic delta-rule specialization for a dimension-stable join.
    // Consistency is PROVEN in-query: refreshed ≡ from-scratch A′ ⋈ B
    // via the one-pass symmetric-diff audit.
    "q_ivm_join" -> { (s, dir) =>
      import graft.operators.Upsert
      val root = tmp("graft_ivm")
      val orders = Tables(s, dir).orders
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
          col("o_totalprice"))
      val cust = Tables(s, dir).customer
        .select(col("c_custkey"), col("c_mktsegment"))
      val view0 = orders
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .drop("c_custkey")
      view0.write.partitionBy("o_orderpriority").mode("overwrite").parquet(root)
      val updates = orders
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          pmod(col("o_orderkey"), lit(7)) === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000)
        .withColumn("op", lit("U"))
      val dels = orders
        .filter(col("o_orderpriority") === "3-MEDIUM" &&
          pmod(col("o_orderkey"), lit(5)) === 0)
        .withColumn("op", lit("D"))
      val ins = orders
        .filter(col("o_orderpriority") === "2-HIGH" &&
          pmod(col("o_orderkey"), lit(11)) === 0)
        .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
          col("o_custkey"), lit("2-HIGH").as("o_orderpriority"),
          lit(123.45).as("o_totalprice"))
        .withColumn("op", lit("U"))
      val deltaA = updates.unionByName(dels).unionByName(ins)
      // the delta rule for a static right side: ΔV = ΔA ⋈ B
      val deltaV = deltaA
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left")
        .drop("c_custkey")
      Upsert.mergeIntoPartitioned(s, root, deltaV, Seq("o_orderkey"),
        "o_orderpriority")
      val cols = Seq("o_orderkey", "o_custkey", "o_orderpriority",
        "o_totalprice", "c_mktsegment")
      val refreshed = s.read.parquet(root).select(cols.map(col): _*)
      // from-scratch replay of A′ ⋈ B for the consistency proof
      val aPrime = orders
        .join(deltaA.select(col("o_orderkey")).distinct(),
          Seq("o_orderkey"), "left_anti")
        .unionByName(deltaA.filter(col("op") === "U").drop("op"))
      val scratch = aPrime
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .drop("c_custkey").select(cols.map(col): _*)
      refreshed.groupBy(col("o_orderpriority"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .crossJoin(broadcast(symmetricDiffCount(refreshed, scratch)))
        .withColumn("ivm_consistent", col("__mismatch") === 0)
        .drop("__mismatch")
        .orderBy(col("o_orderpriority"), col("c_mktsegment"))
    },

    // Right-to-erasure (GDPR art. 17) over a partitioned lake table:
    // delete every record of the requesting subjects (doc_id % 17 = 0)
    // via the partition-scoped MERGE — only partitions holding a
    // subject's rows rewrite — then PROVE absence from the post-state
    // itself (the join-derived boolean, folded into the same
    // aggregation pass that the oracle replays relationally).
    "q_gdpr_erase" -> { (s, dir) =>
      import graft.operators.Upsert
      val root = tmp("graft_gdpr")
      val docs = Tables(s, dir).documents
        .select(col("doc_id"), col("source"), col("n_chars"))
      docs.write.partitionBy("source").mode("overwrite").parquet(root)
      val erase = docs.filter(pmod(col("doc_id"), lit(17)) === 0)
        .withColumn("op", lit("D"))
      Upsert.mergeIntoPartitioned(s, root, erase, Seq("doc_id"), "source")
      val post = s.read.parquet(root)
      val perSource = post.groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("sum_chars"),
          sum(when(pmod(col("doc_id"), lit(17)) === 0, 1L).otherwise(0L))
            .as("__left"))
      perSource
        .crossJoin(broadcast(perSource.agg(sum(col("__left")).as("__tot"))))
        .select(col("source"), col("n"), col("sum_chars"),
          (col("__tot") === 0).as("erased_absent"))
        .orderBy(col("source"))
    },

    // The incremental-ingest flagship: a new shard arrives at an
    // already-ingested partitioned corpus and flows through the whole
    // engine — quality gate → intra-shard exact dedup → cross-corpus
    // fingerprint anti-join against the snapshot → partition-scoped
    // merge. Post-ingest state is read back from DISK and gated: per-
    // source totals replayed relationally by the oracle, plus a
    // no_cross_dup boolean recomputed from the final table (no new doc
    // shares a fingerprint with a pre-existing one — the invariant the
    // anti-join exists to enforce).
    "q_incremental_ingest" -> { (s, dir) =>
      import graft.functions.TextFunctions
      import graft.operators.Upsert
      val root = tmp("graft_ingest")
      val docs = Tables(s, dir).documents
        .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      val base = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
      base.write.partitionBy("source").mode("overwrite").parquet(root)
      val quality = docs.filter(pmod(col("doc_id"), lit(3)) === 0 &&
        col("n_chars").between(100, 20000))
      val shardDeduped = graft.llm.Dedup.exactRows(quality, "doc_id", "text")
      val baseFps = s.read.parquet(root)
        .select(TextFunctions.fingerprintPortable(col("text")).as("__k")).distinct()
      val fresh = shardDeduped
        .withColumn("__k", TextFunctions.fingerprintPortable(col("text")))
        .join(baseFps, Seq("__k"), "left_anti").drop("__k")
      Upsert.mergeIntoPartitioned(s, root,
        fresh.withColumn("op", lit("U")), Seq("doc_id"), "source")
      // the cross-dup invariant folds into the SAME aggregation pass as
      // a join-derived flag (a separate .count() action would re-read
      // the merged table for one boolean — one whole job at 100 TB)
      val post = s.read.parquet(root)
        .withColumn("__k", TextFunctions.fingerprintPortable(col("text")))
        .withColumn("__new", pmod(col("doc_id"), lit(3)) === 0)
      val baseKeys = post.filter(!col("__new"))
        .select(col("__k")).distinct().withColumn("__in_base", lit(true))
      val perSource = post.join(baseKeys, Seq("__k"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("__new"), 1L).otherwise(0L)).as("n_new"),
          sum(when(col("__new") && col("__in_base").isNotNull, 1L)
            .otherwise(0L)).as("__cds"))
      perSource
        .crossJoin(broadcast(perSource.agg(sum(col("__cds")).as("__tot"))))
        .select(col("source"), col("n_docs"), col("n_new"),
          (col("__tot") === 0).as("no_cross_dup"))
        .orderBy(col("source"))
    },

    // Incremental report maintenance: after the same partition-scoped
    // merge as q_upsert_partitioned, the per-partition summary is
    // refreshed by recomputing ONLY touched partitions (untouched rows
    // carry over from the pre-merge summary) — and the incremental
    // result must equal a from-scratch recompute EXACTLY
    // (incremental_consistent: one-pass multiset equality). The
    // oracle replays the merged per-partition counts/sums.
    "q_incremental_report" -> { (s, dir) =>
      import graft.operators.Upsert
      val root = tmp("graft_increport")
      val orders = Tables(s, dir).orders
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      orders.write.partitionBy("o_orderpriority").mode("overwrite").parquet(root)
      def summarize(df: DataFrame): DataFrame = df
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      // the pre-merge summary lives ON DISK, as a real report table
      // would (also sidesteps plan-identity cache aliasing: a persisted
      // summary plan would be plan-equal to the post-merge recompute
      // and hijack it via the cache manager)
      val summaryPath = tmp("graft_increport_sum")
      summarize(s.read.parquet(root)).write.mode("overwrite").parquet(summaryPath)
      val before = s.read.parquet(summaryPath)
      val updates = orders
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          pmod(col("o_orderkey"), lit(7)) === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000)
        .withColumn("op", lit("U"))
      val deletes = orders
        .filter(col("o_orderpriority") === "3-MEDIUM" &&
          pmod(col("o_orderkey"), lit(5)) === 0)
        .withColumn("op", lit("D"))
      val stats = Upsert.mergeIntoPartitioned(s, root,
        updates.unionByName(deletes), Seq("o_orderkey"), "o_orderpriority")
      val incremental = Upsert.refreshPartitionSummaries(s, root,
        "o_orderpriority", stats.touchedValues, before, summarize)
      val scratch = summarize(s.read.parquet(root))
      // one-pass multiset equality (±1 tag + |net| sum) folded into the
      // result as a broadcast boolean — no separate driver actions
      incremental
        .withColumn("refreshed",
          col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM"))
        .crossJoin(broadcast(symmetricDiffCount(incremental, scratch)))
        .withColumn("incremental_consistent", col("__mismatch") === 0)
        .drop("__mismatch")
        .orderBy(col("o_orderpriority"))
    },

    // CDC read side: diff two snapshot generations into a change-sized
    // U/D delta, then CLOSE THE LOOP — merge the delta into generation
    // A on disk and assert the result equals generation B exactly
    // (roundtrip_ok: one-pass multiset equality). The oracle
    // replays the delta's op/partition counts from the same mutation
    // arithmetic.
    "q_snapshot_diff" -> { (s, dir) =>
      import graft.operators.Upsert
      val root = tmp("graft_diff")
      val a = Tables(s, dir).orders
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      val b = a
        .filter(!(col("o_orderpriority") === "3-MEDIUM" &&
          pmod(col("o_orderkey"), lit(5)) === 0))
        .withColumn("o_totalprice",
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
            pmod(col("o_orderkey"), lit(7)) === 0,
            col("o_totalprice") + 1000).otherwise(col("o_totalprice")))
        .unionByName(a
          .filter(col("o_orderpriority") === "2-HIGH" &&
            pmod(col("o_orderkey"), lit(11)) === 0)
          .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
            lit("2-HIGH").as("o_orderpriority"), lit(123.45).as("o_totalprice")))
      val delta = Upsert.diffSnapshots(a, b, Seq("o_orderkey"))
      a.write.partitionBy("o_orderpriority").mode("overwrite").parquet(root)
      Upsert.mergeIntoPartitioned(s, root, delta, Seq("o_orderkey"), "o_orderpriority")
      val merged = s.read.parquet(root)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      // one-pass multiset equality instead of two exceptAll jobs
      delta.groupBy(col("op"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .crossJoin(broadcast(symmetricDiffCount(merged, b)))
        .withColumn("roundtrip_ok", col("__mismatch") === 0)
        .drop("__mismatch")
        .orderBy(col("op"), col("o_orderpriority"))
    },

    // Malformed-record quarantine at ingestion: corrupt JSON payloads
    // (a deterministic 1-in-7 mangle) must route to a dead-letter
    // branch, never poison the batch. The tag is StreamOps.
    // tagDeadLetters — PERMISSIVE from_json with corrupt-record capture
    // (a struct-level null check can NOT detect corruption; the
    // _corrupt side channel can) — the IDENTICAL call that routes the
    // unbounded stream in DlqStreamSpec. Oracle replays validity via
    // json_valid.
    "q_jsonl_quarantine" -> { (s, dir) =>
      val payload = when(pmod(col("event_id"), lit(7)) === 0,
        expr("substring(props, 1, length(props)-1)")).otherwise(col("props"))
      graft.streaming.StreamOps.tagDeadLetters(
          Tables(s, dir).events.select(col("event_id"), payload.as("payload")),
          "payload", "k INT")
        .select(col("event_id"), col("ok"), col("parsed.k").as("k"))
        .orderBy(col("event_id"))
    },
  )

  val oracles: Map[String, String] = Map(
    "q_textio_roundtrip" ->
      """SELECT word, COUNT(*) AS n FROM (
           SELECT unnest(string_split_regex(lower(text), '[^a-z'']+')) AS word
           FROM documents)
         WHERE word <> ''
         GROUP BY word ORDER BY word""",
    "q_textio_gzip" ->
      """SELECT word, COUNT(*) AS n FROM (
           SELECT unnest(string_split_regex(lower(text), '[^a-z'']+')) AS word
           FROM documents)
         WHERE word <> ''
         GROUP BY word ORDER BY word""",
    "q_orcio_roundtrip" ->
      """SELECT p_brand, count(*) AS n,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
         FROM part GROUP BY p_brand ORDER BY p_brand""",
    "q_avro_roundtrip" ->
      """SELECT o_orderpriority, count(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_csvio_roundtrip" ->
      """SELECT c_nationkey, count(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
         FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""",
    "q_jsonio_roundtrip" ->
      """SELECT event_type, count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_xmlio_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey""",
    "q_partitioned_prune" ->
      """WITH d AS (
           SELECT event_type FROM events GROUP BY event_type
           HAVING CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                    / COUNT(*) > 50.0)
         SELECT e.event_type, count(*) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events e JOIN d USING (event_type)
         GROUP BY e.event_type ORDER BY e.event_type""",
    "q_json_props" ->
      """SELECT CAST(json_extract(props, '$.k') AS INTEGER) AS k,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1 ORDER BY 1""",
    "q_export_jsonl" ->
      """SELECT source, count(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM documents GROUP BY source ORDER BY source""",
    "q_counting_input" ->
      """SELECT CAST(range % 7 AS BIGINT) AS m, count(*) AS n,
           CAST(SUM(range) AS BIGINT) AS s
         FROM range(0, 100000) GROUP BY 1 ORDER BY 1""",
    "q_counting_source" ->
      """SELECT CAST(date_trunc('minute', to_timestamp(range)) AS TIMESTAMP) AS minute,
           count(*) AS n, CAST(SUM(range) AS BIGINT) AS s
         FROM range(0, 10000) GROUP BY 1 ORDER BY 1""",
    // Byte-exact per-document round-trip through the TFRecord framing.
    "q_tfrecordio_roundtrip" ->
      """SELECT doc_id, md5(text) AS text_md5 FROM documents ORDER BY doc_id""",
    // Field-exact round-trip through tf.Example-in-gzip-TFRecord shards.
    "q_tfexample_roundtrip" ->
      """SELECT doc_id, md5(text) AS text_md5, lang
         FROM documents ORDER BY doc_id""",
    // The export IS q_pipeline_e2e plus transparent IO legs, so the
    // oracle is the same SQL by construction.
    "q_shard_export" -> LlmQueries.oracles("q_pipeline_e2e"),

    // Morton interleave replayed with the same magic-mask network
    // (decimal masks: 0x00FF00FF, 0x0F0F0F0F, 0x33333333, 0x55555555).
    "q_zorder" ->
      """WITH base AS (SELECT l_partkey & 65535 AS x, l_suppkey & 65535 AS y FROM lineitem),
         s1 AS (SELECT x, y, (x | (x << 8)) & 16711935 AS xa, (y | (y << 8)) & 16711935 AS ya FROM base),
         s2 AS (SELECT x, y, (xa | (xa << 4)) & 252645135 AS xb, (ya | (ya << 4)) & 252645135 AS yb FROM s1),
         s3 AS (SELECT x, y, (xb | (xb << 2)) & 858993459 AS xc, (yb | (yb << 2)) & 858993459 AS yc FROM s2),
         s4 AS (SELECT x, y, (xc | (xc << 1)) & 1431655765 AS xd, (yc | (yc << 1)) & 1431655765 AS yd FROM s3),
         zt AS (SELECT x, y, (xd | (yd << 1)) AS z FROM s4)
         SELECT z >> 12 AS bucket, COUNT(*) AS n,
                MIN(x) AS x_min, MAX(x) AS x_max,
                MIN(y) AS y_min, MAX(y) AS y_max
         FROM zt GROUP BY 1 ORDER BY 1""",

    "q_zorder_prune" ->
      """SELECT COUNT(*) AS n_rows, TRUE AS box_z_le_x,
                TRUE AS box_z_prunes, TRUE AS yonly_z_lt_x
         FROM lineitem""",

    "q_zorder3" ->
      """WITH base AS (
  SELECT l_partkey & 2097151 AS x, l_suppkey & 2097151 AS y,
         l_orderkey & 2097151 AS z FROM lineitem),
s1 AS (SELECT x,y,z,
  (x | (x << 32)) & 8725724278095871 AS xa,
  (y | (y << 32)) & 8725724278095871 AS ya,
  (z | (z << 32)) & 8725724278095871 AS za FROM base),
s2 AS (SELECT x,y,z,
  (xa | (xa << 16)) & 8725728556220671 AS xb,
  (ya | (ya << 16)) & 8725728556220671 AS yb,
  (za | (za << 16)) & 8725728556220671 AS zb FROM s1),
s3 AS (SELECT x,y,z,
  (xb | (xb << 8)) & 1157144660301377551 AS xc,
  (yb | (yb << 8)) & 1157144660301377551 AS yc,
  (zb | (zb << 8)) & 1157144660301377551 AS zc FROM s2),
s4 AS (SELECT x,y,z,
  (xc | (xc << 4)) & 1207822528635744451 AS xd,
  (yc | (yc << 4)) & 1207822528635744451 AS yd,
  (zc | (zc << 4)) & 1207822528635744451 AS zd FROM s3),
s5 AS (SELECT x,y,z,
  (xd | (xd << 2)) & 1317624576693539401 AS xe,
  (yd | (yd << 2)) & 1317624576693539401 AS ye,
  (zd | (zd << 2)) & 1317624576693539401 AS ze FROM s4),
m AS (SELECT x,y,z, xe | (ye << 1) | (ze << 2) AS morton FROM s5)
SELECT morton >> 30 AS bucket, COUNT(*) AS n,
       MIN(x) AS x_min, MAX(x) AS x_max,
       MIN(y) AS y_min, MAX(y) AS y_max,
       MIN(z) AS z_min, MAX(z) AS z_max
FROM m GROUP BY 1 ORDER BY 1""",

    "q_schema_evolution" ->
      """SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus ELSE 'LEGACY' END AS status,
                COUNT(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY 1 ORDER BY 1""",

    "q_compaction" ->
      """SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
         FROM documents GROUP BY source ORDER BY source""",

    // MERGE semantics replayed relationally: rows kept (key untouched)
    // ∪ updated rows ∪ inserted rows; deletes vanish. The rewritten
    // flag replays the touched-partition set; untouched_intact is the
    // file-level no-rewrite assertion, pinned TRUE.
    "q_upsert_partitioned" ->
      """WITH upd AS (SELECT o_orderkey FROM orders
             WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderkey % 7 = 0),
         dels AS (SELECT o_orderkey FROM orders
             WHERE o_orderpriority = '3-MEDIUM' AND o_orderkey % 5 = 0),
         ins AS (SELECT o_orderkey + 100000000 AS o_orderkey,
               '2-HIGH' AS o_orderpriority, 123.45 AS o_totalprice
             FROM orders WHERE o_orderpriority = '2-HIGH' AND o_orderkey % 11 = 0),
         kept AS (SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
             WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
               AND o_orderkey NOT IN (SELECT o_orderkey FROM dels)),
         updnew AS (SELECT o_orderkey, o_orderpriority, o_totalprice + 1000 AS o_totalprice
             FROM orders WHERE o_orderkey IN (SELECT o_orderkey FROM upd)),
         merged AS (SELECT * FROM kept UNION ALL SELECT * FROM updnew
                    UNION ALL SELECT * FROM ins)
         SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
           (o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')) AS rewritten,
           TRUE AS untouched_intact
         FROM merged GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    // the maintained join view replayed relationally (kept ∪ updated ∪
    // inserted, deletes gone, customer segment joined); the in-query
    // incremental-vs-scratch proof is structural → TRUE.
    "q_ivm_join" ->
      """WITH upd AS (SELECT o_orderkey FROM orders
             WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderkey % 7 = 0),
         dels AS (SELECT o_orderkey FROM orders
             WHERE o_orderpriority = '3-MEDIUM' AND o_orderkey % 5 = 0),
         ins AS (SELECT o_orderkey + 100000000 AS o_orderkey, o_custkey,
               '2-HIGH' AS o_orderpriority, 123.45 AS o_totalprice
             FROM orders WHERE o_orderpriority = '2-HIGH' AND o_orderkey % 11 = 0),
         kept AS (SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice
             FROM orders
             WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
               AND o_orderkey NOT IN (SELECT o_orderkey FROM dels)),
         updnew AS (SELECT o_orderkey, o_custkey, o_orderpriority,
               o_totalprice + 1000 AS o_totalprice
             FROM orders WHERE o_orderkey IN (SELECT o_orderkey FROM upd)),
         a2 AS (SELECT * FROM kept UNION ALL SELECT * FROM updnew
                UNION ALL SELECT * FROM ins)
         SELECT o_orderpriority, c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
           TRUE AS ivm_consistent
         FROM a2 JOIN customer ON o_custkey = c_custkey
         GROUP BY 1, 2 ORDER BY o_orderpriority, c_mktsegment""",

    // erasure replayed relationally: everything but the subjects'
    // rows; absence is structural post-delete → TRUE.
    "q_gdpr_erase" ->
      """SELECT source, COUNT(*) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           TRUE AS erased_absent
         FROM documents WHERE doc_id % 17 <> 0
         GROUP BY source ORDER BY source""",

    // the whole ingest replayed relationally: base ∪ (quality-gated,
    // intra-shard-min-id-deduped, base-fingerprint-anti-joined shard);
    // the cross-dup invariant is structural post-anti-join → TRUE.
    "q_incremental_ingest" ->
      """WITH fp AS (
           SELECT doc_id, source, n_chars,
             md5(trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS k
           FROM documents),
         base AS (SELECT * FROM fp WHERE doc_id % 3 <> 0),
         q AS (SELECT * FROM fp
           WHERE doc_id % 3 = 0 AND n_chars BETWEEN 100 AND 20000),
         sd AS (SELECT q.* FROM q
           JOIN (SELECT k, min(doc_id) AS keep FROM q GROUP BY k) m
             ON q.k = m.k AND q.doc_id = m.keep),
         survivors AS (SELECT * FROM sd
           WHERE k NOT IN (SELECT k FROM base)),
         final AS (SELECT doc_id, source FROM base
                   UNION ALL SELECT doc_id, source FROM survivors)
         SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
           TRUE AS no_cross_dup
         FROM final GROUP BY source ORDER BY source""",

    // merged per-partition summary replayed relationally (kept ∪
    // updated, deletes gone); refreshed replays the touched set,
    // consistency boolean pinned TRUE.
    "q_incremental_report" ->
      """WITH upd AS (SELECT o_orderkey FROM orders
             WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderkey % 7 = 0),
         dels AS (SELECT o_orderkey FROM orders
             WHERE o_orderpriority = '3-MEDIUM' AND o_orderkey % 5 = 0),
         merged AS (
           SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
             WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
               AND o_orderkey NOT IN (SELECT o_orderkey FROM dels)
           UNION ALL
           SELECT o_orderkey, o_orderpriority, o_totalprice + 1000 FROM orders
             WHERE o_orderkey IN (SELECT o_orderkey FROM upd))
         SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
           (o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')) AS refreshed,
           TRUE AS incremental_consistent
         FROM merged GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    // the delta replayed from the same mutation arithmetic: updates are
    // 'U' with the NEW price, inserts 'U' with the synthetic row,
    // deletes 'D' with the original row; roundtrip_ok pinned TRUE.
    "q_snapshot_diff" ->
      """WITH upd AS (SELECT o_orderkey, o_orderpriority,
               o_totalprice + 1000 AS o_totalprice FROM orders
             WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderkey % 7 = 0),
         ins AS (SELECT o_orderkey + 100000000 AS o_orderkey,
               '2-HIGH' AS o_orderpriority, 123.45 AS o_totalprice
             FROM orders WHERE o_orderpriority = '2-HIGH' AND o_orderkey % 11 = 0),
         dels AS (SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
             WHERE o_orderpriority = '3-MEDIUM' AND o_orderkey % 5 = 0),
         delta AS (
           SELECT 'U' AS op, * FROM upd
           UNION ALL SELECT 'U' AS op, * FROM ins
           UNION ALL SELECT 'D' AS op, * FROM dels)
         SELECT op, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
           TRUE AS roundtrip_ok
         FROM delta GROUP BY op, o_orderpriority
         ORDER BY op, o_orderpriority""",

    "q_jsonl_quarantine" ->
      """WITH raw AS (
           SELECT event_id,
             CASE WHEN event_id % 7 = 0 THEN substring(props, 1, length(props)-1)
                  ELSE props END AS payload
           FROM events)
         SELECT event_id, json_valid(payload) AS ok,
           CASE WHEN json_valid(payload) THEN CAST(payload->>'$.k' AS INTEGER) END AS k
         FROM raw ORDER BY event_id""",
  )
}
