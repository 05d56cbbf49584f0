package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences: contiguous shard-local stream, exact placement math") {
    // Single shard (shards=1) so the layout is fully determined by id order.
    val docs = Seq(
      (1L, "a b c d e"),      // 5 tokens → [0, 5)
      (2L, "f g h i j k"),    // 6 tokens → [5, 11): straddles the 8-boundary
      (3L, ""),               // 0 tokens → dropped
      (4L, "l m")             // 2 tokens → [11, 13)
    ).toDF("doc_id", "text")
    val out = Packing.packSequences(docs, "doc_id", "text", seqLen = 8, shards = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // (id, tokens, start_seq, end_seq, seq_offset)
    assertInAnyOrder(out.toSeq, Seq(
      (1L, 5L, 0L, 0L, 0L),
      (2L, 6L, 0L, 1L, 5L),  // starts mid-seq 0, ends in seq 1
      (4L, 2L, 1L, 1L, 3L)))
  }

  test("packSequences: stream is gap-free and order-preserving per shard") {
    val docs = (1L to 200L).map(i => (i, ("w " * (i % 7 + 1).toInt).trim)).toDF("doc_id", "text")
    val packed = Packing.packSequences(docs, "doc_id", "text", seqLen = 16, shards = 4)
    assertNoCartesian(packed)
    val rows = packed.collect().map(r =>
      (r.getLong(1), r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(5)))
    rows.groupBy(_._1).foreach { case (_, docs0) =>
      val inOrder = docs0.sortBy(_._2)
      // successive docs tile the stream: next start == previous end
      inOrder.foldLeft(0L) { case (pos, (_, _, toks, startSeq, off)) =>
        assert(startSeq * 16 + off === pos, "gap or overlap in packed stream")
        pos + toks
      }
    }
    // every doc with tokens appears exactly once across shards
    assert(rows.length === 200)
  }

  test("packingStats: seq count and tail waste") {
    val docs = Seq((1L, "a b c d e"), (2L, "f g h")).toDF("doc_id", "text") // 8 tokens
    val packed = Packing.packSequences(docs, "doc_id", "text", seqLen = 5, shards = 1)
    val stats = Packing.packingStats(packed, seqLen = 5).collect()
    assert(stats.length === 1)
    val r = stats.head
    assert(r.getAs[Long]("n_docs") === 2L && r.getAs[Long]("n_tokens") === 8L)
    assert(r.getAs[Long]("n_seqs") === 2L) // ceil(8/5)
    assert(r.getAs[Double]("tail_waste") === 2.0 / 10.0)
  }

  test("assignShardsBySize: serpentine deal, deterministic, balanced") {
    // weights 16..1 over 4 shards; serpentine passes:
    //   pass0 → shards 0,1,2,3 get 16,15,14,13
    //   pass1 ← shards 3,2,1,0 get 12,11,10,9 …
    val docs = (1L to 16L).map(i => (i, i)).toDF("doc_id", "w")
    val out = Packing.assignShardsBySize(docs, "doc_id", col("w"), shards = 4)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("weight"),
        r.getAs[Long]("rank"), r.getAs[Int]("shard")))
    // rank 1 = heaviest (weight 16, doc 16)
    assert(out.find(_._3 == 1L).get._2 === 16L)
    val totals = out.groupBy(_._4).view.mapValues(_.map(_._2).sum).toMap
    // serpentine over a linear sequence balances exactly: every shard = 34
    assert(totals === Map(0 -> 34L, 1 -> 34L, 2 -> 34L, 3 -> 34L), s"$totals")
    // deterministic under repartitioning
    val again = Packing.assignShardsBySize(docs.repartition(7), "doc_id",
        col("w"), shards = 4)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("shard"))).toSet
    assert(again === out.map(t => (t._1, t._4)).toSet)
  }

  test("epoch shuffle: valid permutation per shard, deterministic, epochs decorrelate") {
    val docs = spark.range(0, 500).toDF("doc_id")
    def epoch(seed: Long) =
      Packing.epochShuffleAssign(docs, "doc_id", seed, shards = 8)
        .collect().map(r => (r.getAs[Long]("doc_id"),
          r.getAs[Int]("shard"), r.getAs[Long]("pos")))
    val e0 = epoch(0)
    // positions are a contiguous 1..n permutation inside every shard
    e0.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $shard positions not contiguous")
    }
    // every shard populated, roughly balanced (binomial around 62.5)
    val sizes = e0.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet == (0 until 8).toSet && sizes.values.forall(n => n > 20 && n < 120),
      sizes.toString)
    // deterministic under repartitioning
    val again = Packing.epochShuffleAssign(docs.repartition(7), "doc_id", 0, 8)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Int]("shard"), r.getAs[Long]("pos"))).toSet
    assert(again == e0.toSet)
    // epochs decorrelate: global read order (shard-major) rank correlation ~ 0
    val e1 = epoch(1)
    def globalRank(rows: Array[(Long, Int, Long)]): Map[Long, Double] = {
      val sorted = rows.sortBy(t => (t._2, t._3)).map(_._1)
      sorted.zipWithIndex.map { case (id, i) => id -> i.toDouble }.toMap
    }
    val (g0, g1) = (globalRank(e0), globalRank(e1))
    val pairs = g0.keys.toSeq.map(id => (g0(id), g1(id)))
    val n = pairs.length
    val (mx, my) = (pairs.map(_._1).sum / n, pairs.map(_._2).sum / n)
    val cov = pairs.map { case (x, y) => (x - mx) * (y - my) }.sum
    val sx = math.sqrt(pairs.map(p => (p._1 - mx) * (p._1 - mx)).sum)
    val sy = math.sqrt(pairs.map(p => (p._2 - my) * (p._2 - my)).sum)
    val corr = cov / (sx * sy)
    assert(math.abs(corr) < 0.15, f"epoch order correlation $corr%.3f too high")
  }

  test("chunkWithOverlap: stride windows, short tail, no redundant chunks") {
    // 10 tokens, chunk 4, stride 3 → starts 0,3,6 (6 ≥ 10−4, so no start 9)
    val d = Seq((1L, "ta tb tc td te tf tg th ti tj")).toDF("doc_id", "text")
    val out = Packing.chunkWithOverlap(d, "doc_id", "text", 4, 3)
      .as[(Long, Int, Int, String)].collect().sortBy(_._2)
    assert(out.map(_._2).toSeq == Seq(0, 1, 2))
    assert(out(0)._4 == "ta tb tc td")
    assert(out(1)._4 == "td te tf tg")
    assert(out(2)._4 == "tg th ti tj")
    assert(out.forall(_._3 == 4))
  }

  test("chunkWithOverlap: short tail chunk, sub-size and empty docs") {
    // 11 tokens, chunk 4, stride 3 → starts 0,3,6,9; last chunk 2 tokens
    val d = Seq(
      (1L, "a b c d e f g h i j k"),
      (2L, "x y"),                       // below chunkSize → one chunk
      (3L, ""),                          // no tokens → no chunks
      (4L, null.asInstanceOf[String])    // null → no chunks
    ).toDF("doc_id", "text")
    val out = Packing.chunkWithOverlap(d, "doc_id", "text", 4, 3)
      .as[(Long, Int, Int, String)].collect()
    val byDoc = out.groupBy(_._1)
    assert(byDoc(1L).length == 4)
    assert(byDoc(1L).maxBy(_._2)._4 == "j k")
    assert(byDoc(2L).toSeq == Seq((2L, 0, 2, "x y")))
    assert(!byDoc.contains(3L) && !byDoc.contains(4L))
  }

  test("chunkWithOverlap: stride == chunkSize degrades to disjoint chunks") {
    val d = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val out = Packing.chunkWithOverlap(d, "doc_id", "text", 3, 3)
      .as[(Long, Int, Int, String)].collect().sortBy(_._2)
    assert(out.map(_._4).toSeq == Seq("a b c", "d e f", "g"))
  }
}
