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
}
