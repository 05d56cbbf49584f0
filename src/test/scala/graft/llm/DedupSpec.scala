package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 0
    (2L, "completely different text about spark engines and shuffles"),
    (3L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 0
    (4L, "unrelated short doc")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id per normalized text") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(out(0L) == 2L) // docs 0 and 3 collapse to keeper 0
    assert(out.keySet == Set(0L, 1L, 2L, 4L))
  }

  test("minhash signature is stable and position-wise minimal") {
    val sigs = docs.select(Dedup.minHashSignature(col("text"), 16, 3).as("s"))
      .as[Seq[Long]].collect()
    assert(sigs.forall(_.length == 16))
    val again = docs.select(Dedup.minHashSignature(col("text"), 16, 3).as("s"))
      .as[Seq[Long]].collect()
    assert(sigs.toSeq == again.toSeq)
  }

  test("minHashPairs finds near and exact dups, not unrelated docs") {
    val pairs = Dedup.minHashPairs(docs, "doc_id", "text",
      numHashes = 64, shingleK = 3, bands = 32, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L))) // exact dup: always found
    assert(pairs.contains((0L, 1L)) || pairs.contains((1L, 3L))) // near-dup
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minHashPairs maxBucket drops every pair-bearing bucket at cap 1") {
    // every candidate pair rides a bucket of ≥ 2 rows, so a cap of 1
    // deterministically suppresses all candidates — the recall trade the
    // cap documents (and the same output contract as before the cap moved
    // from a window count to the skew-safe groupBy + semi-join-back)
    val none = Dedup.minHashPairs(docs, "doc_id", "text",
      numHashes = 64, shingleK = 3, bands = 32, threshold = 0.5, maxBucket = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(none.isEmpty)
  }

  test("estJaccard is 1 for identical signatures, ~0 for disjoint") {
    val df = Seq((Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 3L, 4L), Seq(9L, 8L, 7L, 6L)))
      .toDF("a", "b", "c")
    val (same, diff) = df.select(
      Dedup.estJaccard(col("a"), col("b"), 4),
      Dedup.estJaccard(col("a"), col("c"), 4)).as[(Double, Double)].head()
    assert(same == 1.0 && diff == 0.0)
  }

  test("simHash: identical texts agree; hamming 0; unrelated text differs") {
    val sh = docs.select(col("doc_id"), Dedup.simHash(col("text")).as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(sh(0L) == sh(3L))
    assert(sh(0L) != sh(2L))
    val d = Seq((sh(0L), sh(1L))).toDF("a", "b")
      .select(Dedup.hamming(col("a"), col("b"))).as[Long].head()
    assert(d < 32) // near-dup texts land below the ~width/2 random floor
  }

  test("ngramJaccardPairs exact baseline") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L)))
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("prefix-filtered ngramJaccardPairs ≡ all-pairs ground truth") {
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val blocked = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, t)
        .as[(Long, Long, Double)].collect().toSet
      val truth = Dedup.ngramJaccardPairsAllPairs(docs, "doc_id", "text", 3, t)
        .as[(Long, Long, Double)].collect().toSet
      assert(blocked == truth, s"threshold $t: prefix filter lost/added pairs")
    }
  }

  test("candidate-generating joins are real equi-joins, not cartesians") {
    assertNoCartesian(Dedup.minHashPairs(docs, "doc_id", "text", 64, 3, 16, 0.5))
    assertNoCartesian(Dedup.simHashPairs(docs, "doc_id", "text", 3))
    assertNoCartesian(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8))
  }

  test("simHashPairs is complete for the configured maxDist") {
    // brute-force hamming pairs vs blocked output, several maxDist values
    val sh = docs.select(col("doc_id"), Dedup.simHash(col("text")).as("sh"))
      .as[(Long, Long)].collect()
    for (maxDist <- Seq(0, 3, 7)) {
      val truth = (for {
        (ia, ha) <- sh; (ib, hb) <- sh if ia < ib
        if java.lang.Long.bitCount(ha ^ hb) <= maxDist
      } yield (ia, ib)).toSet
      val got = Dedup.simHashPairs(docs, "doc_id", "text", maxDist)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == truth, s"maxDist $maxDist")
      // generalized multi-block geometries emit the identical set:
      // C(blocks, blocks−maxDist) tables on wider combination keys
      for (blocks <- Seq(maxDist + 2, maxDist + 4)) {
        val wide = Dedup.simHashPairs(docs, "doc_id", "text", maxDist,
          blocks = blocks)
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet
        assert(wide == truth, s"maxDist $maxDist blocks $blocks")
      }
    }
  }

  test("connectedComponents labels all cluster members with the min id") {
    val nodes = Seq(0L, 1L, 2L, 3L, 4L, 5L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 0L, 4L -> 4L, 5L -> 4L))
  }

  test("connectedComponentsStar ≡ label propagation on random graphs") {
    val rng = new scala.util.Random(4242)
    for (trial <- 0 until 6) {
      val n = 12 + rng.nextInt(24)
      val nodes = (0L until n.toLong).toDF("id")
      val edgePairs = Seq.fill(rng.nextInt(2 * n))(
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      val edges = if (edgePairs.isEmpty) Seq((0L, 0L)).toDF("id_a", "id_b").limit(0)
                  else edgePairs.toDF("id_a", "id_b")
      val star = Dedup.connectedComponentsStar(nodes, edges)
        .as[(Long, Long)].collect().toMap
      val prop = Dedup.connectedComponents(nodes, edges, maxIter = 50)
        .as[(Long, Long)].collect().toMap
      assert(star == prop, s"trial $trial (n=$n, edges=${edgePairs.size})")
    }
  }

  test("connectedComponentsStar handles a long chain (propagation's worst case)") {
    val n = 60
    val nodes = (0L until n.toLong).toDF("id")
    val chain = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponentsStar(nodes, chain)
      .as[(Long, Long)].collect().toMap
    assert(labels.values.toSet == Set(0L), "chain must collapse to root 0")
  }

  test("dedupNearDuplicates keeps one representative per cluster") {
    val kept = Dedup.dedupNearDuplicates(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(0L) && kept.contains(2L) && kept.contains(4L))
    assert(!kept.contains(3L)) // exact dup of 0 must go
    assert(kept.size <= 4)
    val keptStar = Dedup.dedupNearDuplicates(docs, "doc_id", "text",
      threshold = 0.5, useStarCC = true)
      .select("doc_id").as[Long].collect().toSet
    assert(keptStar == kept) // CC implementations are interchangeable
  }

  test("dedupAgainstReference: exact and containment dups drop, fresh docs survive") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val ref = Seq(
      (0L, base),
      (2L, "reference corpus filler text entirely unlike anything else here"))
      .toDF("doc_id", "text")
    val nw = Seq(
      (1L, base),                                  // exact dup of ref 0 → drop
      (3L, base + " extra"),                       // high containment → drop
      (5L, "completely novel content with no overlap whatsoever to speak of"))
      .toDF("doc_id", "text")
    val kept = Dedup.dedupAgainstReference(nw, ref, "doc_id", "text",
        n = 4, containment = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(5L), s"kept=$kept")
    assertNoCartesian(Dedup.dedupAgainstReference(nw, ref, "doc_id", "text",
      n = 4, containment = 0.5))
  }

  test("dedupAgainstReference: maxDf cap only lowers recall, never scores") {
    // a shingle present in > maxDf ref docs stops generating candidates;
    // docs whose overlap rode only on that shingle now survive
    val boiler = "shared boilerplate header row one two three four"
    val ref = (0L until 4L).map(i => (i * 2, s"$boiler unique$i tail$i words$i"))
      .toDF("doc_id", "text")
    val nw = Seq((9L, boiler)).toDF("doc_id", "text")
    val keptCapped = Dedup.dedupAgainstReference(nw, ref, "doc_id", "text",
        n = 4, containment = 0.3, maxDf = 2L)
      .select("doc_id").as[Long].collect().toSet
    val keptUncapped = Dedup.dedupAgainstReference(nw, ref, "doc_id", "text",
        n = 4, containment = 0.3, maxDf = 1000L)
      .select("doc_id").as[Long].collect().toSet
    assert(keptUncapped.isEmpty, "without the cap the boilerplate doc must drop")
    assert(keptCapped == Set(9L), "the df cap must suppress the boilerplate match")
  }

  test("crossDocDuplicationStats: shared spans counted, unique docs at 0") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),  // shares 4-gram prefix w/ 2
      (2L, "alpha beta gamma delta other words"),
      (3L, "totally unrelated content nothing shared here"))
      .toDF("doc_id", "text")
    val out = Dedup.crossDocDuplicationStats(d, "doc_id", "text", n = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Double]("dup_shingle_frac"))).toMap
    // 6 tokens, n=4 → 3 shingles each; docs 1/2 share exactly one
    // ("alpha beta gamma delta")
    assert(out(1L) === ((3L, 1.0 / 3.0)))
    assert(out(2L) === ((3L, 1.0 / 3.0)))
    assert(out(3L) === ((3L, 0.0)))
  }

  test("removeDuplicateSpans keeps the globally-first span occurrence only") {
    val d = Seq(
      (0L, "alpha beta gamma delta tail zero"),  // canonical (min doc, pos)
      (1L, "head one alpha beta gamma delta tail two"), // dup span at pos 2
      (2L, "totally different words here entirely")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(d, "doc_id", "text", n = 4)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 0 keeps everything: it holds the first occurrence
    assert(out(0L) === ((6L, 0L, "alpha beta gamma delta tail zero")))
    // doc 1 loses the 4 tokens of "alpha beta gamma delta"; note
    // "beta gamma delta tail" also duplicates (cnt 2) and its doc-1
    // occurrence is non-canonical, extending removal through "tail"
    assert(out(1L)._2 === 5L)
    assert(out(1L)._3 === "head one two")
    assert(out(2L) === ((5L, 0L, "totally different words here entirely")))
  }

  test("removeDuplicateSpans dedups within a single document too") {
    val d = Seq((7L, "x y z w q x y z w r")).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(d, "doc_id", "text", n = 4)
      .as[(Long, Long, Long, String)].collect().head
    // second "x y z w" (pos 5) is non-canonical: tokens 5-8 removed
    assert(out === ((7L, 10L, 4L, "x y z w q r")))
  }

  test("removeDuplicateSpans merges overlapping duplicate runs positionally") {
    // "a a a a a" with n=3: grams at pos 0,1,2 identical; pos 1,2 are
    // non-canonical, covering tokens 1-4 — only token 0 survives
    val d = Seq((1L, "a a a a a"), (2L, "b c d")).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(d, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((5L, 4L, "a")))
    assert(out(2L) === ((3L, 0L, "b c d")))
  }

  test("removeDuplicateSpans: short, empty, and null docs pass through") {
    val d = Seq(
      (1L, "one two three"),             // fewer than n tokens: no grams
      (2L, "one two three"),             // exact dup but below gram size
      (3L, ""),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(d, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(out(1L) === ((Some(3L), Some(0L), Some("one two three"))))
    assert(out(2L) === ((Some(3L), Some(0L), Some("one two three"))))
    assert(out(3L) === ((Some(0L), Some(0L), Some(""))))
    assert(out(4L) === ((None, None, None)))
  }

  test("trainBloomFilter: no false negatives over every inserted key") {
    val keys = spark.range(0, 10000).select((col("id") * 7919L).as("k"))
    val bytes = Dedup.trainBloomFilter(keys, col("k"), 10000L, 0.01)
    // probe distributed, through the native expression
    val misses = keys.filter(
      !graft.functions.SketchExprs.bloomMightContain(col("k"), bytes)).count()
    assert(misses == 0L, "a Bloom filter can never miss an inserted key")
    // false-positive rate on a disjoint probe set stays near fpp (generous
    // 5x bound: 10k probes at 1% expect ~100, σ ≈ 10)
    val probes = spark.range(0, 10000).select((col("id") * 7919L + 1L).as("k"))
    val fps = probes.filter(
      graft.functions.SketchExprs.bloomMightContain(col("k"), bytes)).count()
    assert(fps <= 500L, s"false-positive rate implausibly high: $fps / 10000")
  }

  test("exactSurvivorsViaBloom ≡ plain fingerprint anti-join") {
    // fixture with exact dups (normalized), near-dups (must NOT drop), and
    // fresh docs, across a ref/new split
    val ref = Seq(
      (0L, "The Quick   Brown Fox"),
      (2L, "shared reference document body"),
      (4L, "another reference only document")
    ).toDF("doc_id", "text")
    val newd = Seq(
      (1L, "the quick brown fox"),            // exact dup of 0 after norm
      (3L, "shared reference document body"), // exact dup of 2
      (5L, "shared reference document bodies"), // near-dup: survives
      (7L, "entirely new material here")
    ).toDF("doc_id", "text")
    val viaBloom = Dedup.exactSurvivorsViaBloom(newd, ref, "text", fpp = 0.01)
      .select("doc_id").as[Long].collect().toSet
    assert(viaBloom == Set(5L, 7L))
    // and at an absurd fpp (dense false positives) the output is unchanged:
    // FPs fall through to the exact join
    val denseFp = Dedup.exactSurvivorsViaBloom(newd, ref, "text", fpp = 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(denseFp == viaBloom)
  }
}
