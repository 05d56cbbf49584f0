package graft.llm

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // 4-dim toy corpus with an obvious neighborhood structure
  private def corpus = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),   // closest to 0
    (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
    (3L, Seq(0.0f, 0.9f, 0.1f, 0.0f)),   // closest to 2
    (4L, Seq(0.0f, 0.0f, 0.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("vector functions: dot/norm/cosine") {
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    val (d, n, c) = df.select(
      VectorFunctions.dot(col("a"), col("b")),
      VectorFunctions.norm(col("a")),
      VectorFunctions.cosine(col("a"), col("a"))).as[(Double, Double, Double)].head()
    assert(d == 11.0)
    assert(math.abs(n - math.sqrt(5)) < 1e-12)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("bruteForceTopK returns the true nearest neighbors") {
    val top = Similarity.bruteForceTopK(corpus, corpus.filter(col("vec_id") === 0), 2)
      .select("probe_id", "cand_id").as[(Long, Long)].collect()
    assert(top.head == (0L, 1L)) // rank 1 is the near-identical vector
    assert(top.length == 2)
  }

  test("srpBucket groups near-identical vectors together") {
    val planes = VectorFunctions.makePlanes(4, 4)
    val buckets = corpus
      .select(col("vec_id"), VectorFunctions.srpBucket(col("embedding"), planes).as("b"))
      .as[(Long, Int)].collect().toMap
    assert(buckets(0L) == buckets(1L)) // ~same direction → same bucket
    assert(buckets(2L) == buckets(3L))
  }

  test("srpTopK finds the in-bucket nearest neighbor") {
    val top = Similarity.srpTopK(corpus, corpus.filter(col("vec_id") === 0), 1,
      nPlanes = 2, dim = 4)
      .select("probe_id", "cand_id").as[(Long, Long)].collect()
    assert(top.nonEmpty && top.head._2 == 1L)
  }

  test("ivfAssign assigns every vector to exactly one centroid") {
    val assigned = Similarity.ivfAssign(corpus, nCentroids = 2)
    assert(assigned.count() == 5)
    assert(assigned.select("centroid_id").distinct().count() <= 2)
  }

  test("kMeans converges to the cluster structure") {
    // two tight clusters + the distant lone vector; k=2 init lands both
    // seeds inside cluster 1, so convergence must MOVE a centroid out
    val km = Similarity.kMeans(corpus, k = 2, iters = 5)
    val assigned = Similarity.assignToCentroids(corpus, km)
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    assert(assigned(0L) == assigned(1L)) // x-direction cluster together
    assert(assigned(2L) == assigned(3L)) // y-direction cluster together
    assert(assigned(0L) != assigned(2L)) // and apart from each other
  }

  test("cosinePairs finds only the genuinely close pairs") {
    val pairs = Similarity.cosinePairs(corpus, 0.9)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L), (2L, 3L)))
  }

  test("cosinePairsBlocked: subset of exact pairs, equi-join plan, finds in-bucket dups") {
    val blocked = Similarity.cosinePairsBlocked(corpus, 0.9, nPlanes = 2, dim = 4)
    assertNoCartesian(blocked)
    val got = blocked.as[(Long, Long)].collect().toSet
    val truth = Similarity.cosinePairs(corpus, 0.9).as[(Long, Long)].collect().toSet
    assert(got.subsetOf(truth)) // blocking may miss cross-bucket pairs, never invents
    assert(got.nonEmpty)        // near-identical vectors share a bucket
  }

  test("constructing srpTopK / cosinePairsBlocked runs zero Spark jobs") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    // the listener bus is async: wait until the delivered-event count is
    // stable so stragglers from earlier tests don't pollute the window
    def drain(): Unit = {
      var prev = -1
      val deadline = System.currentTimeMillis() + 10000
      while (prev != jobs.get() && System.currentTimeMillis() < deadline) {
        prev = jobs.get(); Thread.sleep(150)
      }
    }
    // sentinel = a raw RDD action: exactly ONE job always (an SQL count
    // under AQE can run two — shuffle stage + result — and fake a miss)
    def sentinel(): Unit = { spark.sparkContext.parallelize(Seq(1), 1).count(); () }
    spark.sparkContext.addSparkListener(l)
    try {
      sentinel(); drain(); jobs.set(0)
      Similarity.srpTopK(corpus, corpus.filter(col("vec_id") === 0), 1,
        nPlanes = 2, dim = 4)
      Similarity.cosinePairsBlocked(corpus, 0.9, nPlanes = 2, dim = 4)
      // sentinel job: events deliver in order, so once the count moves any
      // earlier construction-time job would already have been counted
      sentinel(); drain()
      assert(jobs.get() == 1,
        s"plan construction ran ${jobs.get() - 1} hidden Spark job(s)")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("PQ: codebook shape, code range, and exact reconstruction of codebook vectors") {
    // 4-dim corpus, m=2 subspaces of 2 dims, ksub=2 codewords each
    val cb = Similarity.pqTrain(corpus, m = 2, ksub = 2, dim = 4, iters = 3)
      .collect()
    assert(cb.length == 4) // m × ksub rows
    val enc = Similarity.pqEncode(corpus, cb2(), m = 2, dim = 4)
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    assert(enc.size == 5)
    assert(enc.values.forall(c => c.length == 2 && c.forall(i => i >= 0 && i < 2)))
  }

  /** Hand-built codebook: subspace 0 separates x-heavy from y-heavy halves;
    * subspace 1 separates zero tail from z/w tail. */
  private def cb2() = Seq(
    (0, 0, Seq(0.95, 0.05)), (0, 1, Seq(0.0, 0.0)),
    (1, 0, Seq(0.0, 0.0)), (1, 1, Seq(0.05, 0.95))
  ).toDF("sub_id", "code_id", "code_emb")

  test("PQ: encode picks the argmin codeword and ADC ranks the true neighbor first") {
    val enc = Similarity.pqEncode(corpus, cb2(), m = 2, dim = 4)
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    // vec 0 = (1,0,0,0): sub0 → codeword 0 (x-heavy), sub1 → codeword 0 (zero)
    assert(enc(0L) == Seq(0, 0))
    // vec 4 = (0,0,0,1): sub0 → codeword 1 (zero), sub1 → codeword 1 (w-heavy)
    assert(enc(4L) == Seq(1, 1))
    val top = Similarity.pqTopK(
      Similarity.pqEncode(corpus, cb2(), m = 2, dim = 4), cb2(),
      corpus.filter(col("vec_id") === 0), k = 2, m = 2, dim = 4)
      .select("probe_id", "cand_id").as[(Long, Long)].collect()
    // vec 1 shares vec 0's codes, so ADC must rank it at distance-min
    assert(top.head == (0L, 1L))
  }

  test("IVFPQ: full-probe equals plain PQ; pruned probe is a subset with identical ADC distances") {
    val cb = cb2()
    val enc = Similarity.pqEncode(corpus, cb, m = 2, dim = 4)
    val cents = Similarity.kMeans(corpus, k = 2, iters = 3)
    val assigned = Similarity.assignToCentroids(corpus, cents)
      .select("vec_id", "centroid_id")
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "cand_id", "adc_dist")
        .as[(Long, Long, Double)].collect().toSet
    val full = shape(Similarity.pqTopK(enc, cb, corpus, k = 5, m = 2, dim = 4))
    // nProbe = all centroids → no pruning → identical to plain PQ
    val ivfFull = shape(Similarity.ivfPqTopK(assigned, enc, cents, cb,
      corpus, k = 5, m = 2, dim = 4, nProbe = 2))
    assert(ivfFull == full)
    // nProbe = 1 → candidates only from the probe's own list, distances
    // unchanged where pairs survive
    val pruned = shape(Similarity.ivfPqTopK(assigned, enc, cents, cb,
      corpus, k = 5, m = 2, dim = 4, nProbe = 1))
    assert(pruned.subsetOf(full))
    assert(pruned.nonEmpty && pruned.size < full.size)
  }

  test("PQ finds planted near-duplicates on the real embeddings fixture") {
    // The sf fixture's vectors are near-structureless (best cosine ~0.33,
    // neighbor gaps ~0.05 in sqdist), which NO m=4/ksub=16 quantizer can
    // rank — so, as with the dedup fixtures, plant the structure: each
    // probe gets a near-twin (every 5th coordinate nudged 1%). The twin
    // quantizes to the probe's own codes, making its ADC distance the
    // MINIMUM achievable for that probe — it must appear in the top-k.
    // L2-normalize first: on the unit sphere ||a−b||² = 2 − 2·cos, the
    // standard way to serve cosine ANN from an L2 index.
    val dir = "/root/testdata/sf0.001"
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val twins = base.filter(col("vec_id") < 5)
      .select((col("vec_id") + 10000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i % 5 === 0, x * 1.01f).otherwise(x)).as("embedding"))
    val emb = base.unionByName(twins)
      .withColumn("embedding",
        graft.functions.VectorFunctions.normalized(col("embedding")))
    val probes = emb.filter(col("vec_id") < 5)
    val cb = Similarity.pqTrain(emb, m = 4, ksub = 16, dim = 64, iters = 2)
    val enc = Similarity.pqEncode(emb, cb, m = 4, dim = 64)
    val ann = Similarity.pqTopK(enc, cb, probes, k = 3, m = 4, dim = 64)
      .select("probe_id", "cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    (0L until 5L).foreach { p =>
      assert(ann(p).contains(p + 10000L),
        s"planted twin of probe $p missing from PQ top-3: ${ann(p)}")
    }
  }

  test("PQ: trained quantization cost is monotone vs init in every subspace") {
    val m = 2; val dim = 4
    def cost(cb: org.apache.spark.sql.DataFrame): Double = {
      val subs = corpus.select(col("vec_id"),
          posexplode(array((0 until m).map(i =>
            slice(col("embedding").cast("array<double>"), i * 2 + 1, 2)): _*)))
        .select(col("vec_id"), col("pos").as("sub_id"), col("col").as("sub_emb"))
      subs.join(broadcast(cb), Seq("sub_id"))
        .withColumn("d", VectorFunctions.sqDist(col("sub_emb"), col("code_emb")))
        .groupBy(col("vec_id"), col("sub_id")).agg(min(col("d")).as("dm"))
        .agg(sum(col("dm"))).as[Double].head()
    }
    val init = Similarity.pqTrain(corpus, m, ksub = 2, dim = dim, iters = 0)
    val trained = Similarity.pqTrain(corpus, m, ksub = 2, dim = dim, iters = 3)
    assert(cost(trained) <= cost(init) + 1e-9)
  }

  test("dim mismatch raises a descriptive error at execution time") {
    val ex = intercept[Exception] {
      Similarity.srpTopK(corpus, corpus.filter(col("vec_id") === 0), 1,
        nPlanes = 2, dim = 8).collect()
    }
    val messages = Iterator.iterate[Throwable](ex)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString("\n")
    assert(messages.contains("pass dim = 4"), s"unexpected error: $messages")
  }

  test("semDedup caps oversized clusters deterministically (members kept)") {
    // cluster A (centroid 0): 2 near-identical vectors — under any cap;
    // cluster B (centroid 10): 4 near-identical vectors — oversized at
    // maxCluster = 3, so the pairwise verify must skip it and keep ALL
    // members (recall trade, never false drops), while A still dedups.
    val data = Seq(
      (0L,  Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L,  Seq(0.99f, 0.01f, 0.0f, 0.0f)),
      (10L, Seq(0.0f, 0.0f, 0.0f, 1.0f)),
      (11L, Seq(0.0f, 0.0f, 0.01f, 0.99f)),
      (12L, Seq(0.0f, 0.0f, 0.02f, 0.98f)),
      (13L, Seq(0.0f, 0.0f, 0.03f, 0.97f))
    ).toDF("vec_id", "embedding")
    val cents = data.filter(col("vec_id").isin(0L, 10L))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cent_emb"))
    val capped = Similarity.semDedup(data, cents, threshold = 0.9, maxCluster = 3)
      .select("vec_id").as[Long].collect().toSet
    assert(capped == Set(0L, 10L, 11L, 12L, 13L))
    // the default cap is far above this scale — full dedup in both clusters
    val uncapped = Similarity.semDedup(data, cents, threshold = 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(uncapped == Set(0L, 10L))
  }

  test("null embeddings get a null bucket and drop out of SRP blocking") {
    // failed decodes / absent embeddings must not pile into one bucket
    // (whose self-join would be quadratic): MULTIPLE null rows must not
    // even pair with each other — struct join keys treat null fields as
    // equal, so nulls are filtered before bucketing
    val withNull = corpus.unionByName(
      Seq((98L, null: Seq[Float]), (99L, null: Seq[Float]))
        .toDF("vec_id", "embedding"))
    val planes = VectorFunctions.makePlanes(2, 4)
    val buckets = withNull.select(col("vec_id"),
        VectorFunctions.srpBucket(col("embedding"), planes).as("b"))
      .as[(Long, Option[Int])].collect().toMap
    assert(buckets(99L).isEmpty, "null vector must bucket to null")
    assert(buckets.filter(_._1 < 98L).values.forall(_.nonEmpty))
    val pairs = Similarity.cosinePairsBlocked(withNull, 0.9, nPlanes = 2, dim = 4)
      .as[(Long, Long)].collect().toSet
    assert(!pairs.exists(p => p._1 >= 98L || p._2 >= 98L),
      "null rows must not pair — not even with each other")
    assert(pairs.nonEmpty)
  }

  test("recallReport: 1.0 against itself, counts misses per probe") {
    val exact = Similarity.bruteForceTopK(corpus, corpus.filter(col("vec_id") < 2), 2)
    val full = Similarity.recallReport(exact, exact)
      .select("probe_id", "n_exact", "n_hit", "recall")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(full.nonEmpty && full.forall(r => r._4 == 1.0 && r._2 == r._3))
    // drop one probe's rows entirely from the "ann" side: that probe's
    // recall must be 0, the others stay 1.0
    val crippled = exact.filter(col("probe_id") =!= 0L)
    val rep = Similarity.recallReport(crippled, exact)
      .select("probe_id", "recall").as[(Long, Double)].collect().toMap
    assert(rep(0L) == 0.0)
    assert(rep.filter(_._1 != 0L).values.forall(_ == 1.0))
  }

  test("autoPlanes keeps the candidate set subquadratic as the corpus grows") {
    // ceil(log2 n) with the floor
    assert(Similarity.autoPlanes(1) == 8)
    assert(Similarity.autoPlanes(256) == 8)
    assert(Similarity.autoPlanes(257) == 9)
    assert(Similarity.autoPlanes(500) == 9)
    assert(Similarity.autoPlanes(2000) == 11)
    assert(Similarity.autoPlanes(1L << 20) == 20)
    // threshold −1 keeps every verified candidate: the result size IS the
    // distinct candidate-pair count the bucket join materializes
    def cands(df: org.apache.spark.sql.DataFrame, planes: Int): Long =
      Similarity.cosinePairsBlocked(df, threshold = -1.0,
        nPlanes = planes, nTables = 2, dim = 64).count()
    val small = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") // 500
    val big = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")     // 2000
    val fixedRatio = cands(big, 4).toDouble / cands(small, 4)
    val autoRatio = cands(big, Similarity.autoPlanes(2000)).toDouble /
      cands(small, Similarity.autoPlanes(500))
    // 4× corpus: a fixed shallow code goes ~quadratic (ratio → 16);
    // log-scaled planes hold the candidate volume ~linear
    assert(autoRatio < fixedRatio,
      s"autoPlanes did not beat fixed planes: $autoRatio vs $fixedRatio")
    assert(autoRatio <= 8.0,
      s"candidate growth $autoRatio exceeds 2× linear for 4× corpus")
    // the auto entry point is exactly the explicit call at the derived depth
    val viaAuto = Similarity.cosinePairsBlockedAuto(small, 0.4, nTables = 4)
      .as[(Long, Long)].collect().toSet
    val explicit = Similarity.cosinePairsBlocked(small, 0.4,
      nPlanes = 9, nTables = 4).as[(Long, Long)].collect().toSet
    assert(viaAuto == explicit)
  }

  test("autoTables holds recall as autoPlanes deepens (ADVICE r12)") {
    // at the plane floor, the base table count is unchanged
    assert(Similarity.autoTables(8, 0.4) == 4)
    assert(Similarity.autoTables(4, 0.4) == 4)
    // deeper codes scale tables by 1/p^Δ (p = 1 − arccos θ / π): the
    // designed recall 1−(1−p^planes)^tables must not DROP as n grows
    def recall(planes: Int, tables: Int, theta: Double): Double = {
      val p = 1.0 - math.acos(theta) / math.Pi
      1.0 - math.pow(1.0 - math.pow(p, planes.toDouble), tables.toDouble)
    }
    val base = recall(8, 4, 0.4)
    Seq(9, 10, 12).foreach { planes =>
      val t = Similarity.autoTables(planes, 0.4)
      assert(t > 4, s"tables did not rise with depth $planes")
      assert(recall(planes, t, 0.4) >= base * 0.999,
        s"recall decayed at depth $planes with $t tables")
    }
    // monotone in depth, capped
    assert(Similarity.autoTables(30, 0.4) == 64)
    assert(Similarity.autoTables(10, 0.4) >= Similarity.autoTables(9, 0.4))
    // the default auto entry point uses the derived table count
    val small = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val viaAuto = Similarity.cosinePairsBlockedAuto(small, 0.4)
      .as[(Long, Long)].collect().toSet
    val explicit = Similarity.cosinePairsBlocked(small, 0.4,
      nPlanes = 9, nTables = Similarity.autoTables(9, 0.4))
      .as[(Long, Long)].collect().toSet
    assert(viaAuto == explicit)
  }

  test("cosinePairsBlocked recall on the embeddings fixture") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val truth = Similarity.cosinePairs(emb, 0.4).as[(Long, Long)].collect().toSet
    val got = Similarity.cosinePairsBlocked(emb, 0.4, nPlanes = 4, nTables = 4, dim = 64)
      .as[(Long, Long)].collect().toSet
    assert(got.subsetOf(truth))
    // θ(0.4) ≈ 66°: expected recall 1-(1-p⁴)⁴ ≈ 0.5 for p = 1-θ/π — assert
    // the multi-table OR actually buys over a single table's ~0.15
    assert(got.size >= (truth.size * 0.3).toInt,
      s"recall ${got.size}/${truth.size} below floor")
  }

  test("srpTopKMultiProbe: nProbes=0 ≡ srpTopK; probing only improves recall") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = emb.filter(col("vec_id") < 15)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("probe_id"), col("cand_id"),
          round(col("score"), 9).as("score"))
        .as[(Long, Long, Double)].collect().toSet
    val plain = Similarity.srpTopK(emb, probes, k = 5, nPlanes = 6, dim = 64)
    val zero = Similarity.srpTopKMultiProbe(emb, probes, k = 5,
      nPlanes = 6, dim = 64, nProbes = 0)
    assert(rows(zero) == rows(plain),
      "nProbes=0 must degenerate to plain single-bucket SRP")
    val truth = Similarity.bruteForceTopK(emb, probes, k = 5)
    def recallSum(ann: org.apache.spark.sql.DataFrame): Double =
      Similarity.recallReport(ann, truth)
        .agg(sum(col("n_hit")).cast("double")).as[Double].head()
    val multi = Similarity.srpTopKMultiProbe(emb, probes, k = 5,
      nPlanes = 6, dim = 64, nProbes = 3)
    val (rPlain, rMulti) = (recallSum(plain), recallSum(multi))
    // candidate superset ⇒ recall can only rise; on 6 planes / 3 probes
    // it must ACTUALLY rise on this fixture, not just tie
    assert(rMulti > rPlain,
      s"multi-probe recall $rMulti must beat single-bucket $rPlain")
  }

  test("SQ8: codes in range, dequantization error bounded by half a bin, probe ranking sane") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bounds = Similarity.sqTrain(emb)
    val enc = Similarity.sqEncode(emb, bounds)
    // every code in [0, 255]
    val codeOk = enc.select(
      org.apache.spark.sql.functions.forall(col("codes"),
        c => c >= 0 && c <= 255).as("ok"))
      .agg(bool_and(col("ok"))).head.getBoolean(0)
    assert(codeOk)
    // |x - xhat| <= binWidth/2 per coordinate (bin-center dequantization)
    val b = bounds.orderBy("pos").collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val half = b.map { case (mn, mx) => (mx - mn) / 255.0 / 2.0 + 1e-9 }
    val rows = enc.join(emb, "vec_id")
      .select(col("embedding").cast("array<double>"), col("deq"))
      .collect()
    rows.foreach { r =>
      val x = r.getSeq[Double](0); val xh = r.getSeq[Double](1)
      x.indices.foreach { i =>
        assert(math.abs(x(i) - xh(i)) <= half(i),
          s"coordinate $i off by ${math.abs(x(i) - xh(i))} > ${half(i)}")
      }
    }
    // asymmetric-distance ranking approximates brute force: the true
    // nearest neighbor of each probe appears in SQ8's top-5
    val probes = emb.filter(col("vec_id") < 5)
    val sq = Similarity.sqTopK(enc, probes, k = 5)
      .select(col("probe_id"), col("cand_id"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val truth = Similarity.bruteForceTopK(emb, probes, k = 1)
      .select(col("probe_id"), col("cand_id"))
      .as[(Long, Long)].collect()
    truth.foreach { case (p, c) =>
      assert(sq(p).contains(c), s"probe $p: true NN $c missing from SQ8 top-5")
    }
  }
}
