package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Combine

/** Diversity-aware data selection over embedding columns — the two
  * canonical greedy algorithms a training-data pipeline runs after
  * similarity search has produced candidates:
  *
  *  - MMR re-ranking (Carbonell & Goldstein, "The Use of MMR,
  *    Diversity-Based Reranking", SIGIR 1998): per query, trade
  *    relevance against redundancy when picking the k results that
  *    actually get used (RAG context windows, eval panels).
  *  - k-center greedy / farthest-point coreset (Gonzalez 1985; Sener &
  *    Savarese, "Active Learning for CNNs: A Core-Set Approach", ICLR
  *    2018): pick k corpus exemplars that 2-approximate the optimal
  *    covering radius — the standard diverse-subset seed for
  *    clustering, labeling budgets, and curriculum anchors.
  *
  * Both are SEQUENTIAL greedy algorithms; the Spark form unrolls the
  * (small, fixed) k selection steps into k relational stages instead of
  * collecting vectors to the driver. Every stage is an equi-join /
  * aggregation over the candidate frame, so the corpus-sized input is
  * scanned once (to build candidates or the initial distance column)
  * and each greedy step moves only candidate-sized or 1-row frames.
  * All scoring goes through the proven [[VectorFunctions]] kernels, so
  * every double is bit-reproducible against the DuckDB oracle.
  */
object Selection {

  // persisted-frame registry (same hygiene contract as Dedup/Similarity)
  private val persisted =
    scala.collection.mutable.ListBuffer.empty[DataFrame]

  private def track(df: DataFrame): DataFrame = persisted.synchronized {
    persisted += df
    df.persist()
  }

  /** Unpersist every cache this module created. */
  def releasePersistedState(): Unit = persisted.synchronized {
    persisted.foreach(_.unpersist())
    persisted.clear()
  }

  /** MMR re-rank: per probe, greedily select `k` of the `topN`
    * cosine candidates maximizing
    * `lambda·rel(c) − (1−lambda)·max_{s∈selected} sim(c, s)`
    * (first pick: the pure-relevance argmax; ties → lower cand_id).
    *
    * Scale posture: candidates come from [[Similarity.bruteForceTopK]]
    * (swap in srpTopK for the ANN path — same contract); the pairwise
    * candidate-candidate sim table is |probes|·topN² rows built with
    * ONE corpus join (candidate ids broadcast into the embedding scan),
    * and each of the k greedy stages joins only probe-keyed
    * candidate-sized frames. Nothing corpus-sized ever re-shuffles.
    *
    * @param lambda use values whose complement is IEEE-exact (0.75,
    *               0.5) when oracle parity matters — `1−lambda` is
    *               computed here and inlined in the oracle SQL
    * @return (probe_id, rank ∈ 1..k, cand_id, rel, mmr)
    */
  def mmrRerank(corpus: DataFrame, probes: DataFrame, topN: Int, k: Int,
                lambda: Double): DataFrame = {
    require(k >= 1 && topN >= k, s"need topN >= k >= 1, got topN=$topN k=$k")
    val cands = track(
      Similarity.bruteForceTopK(corpus, probes, topN)
        .withColumnRenamed("score", "rel"))
    // candidate embeddings: broadcast the (small) id set into the corpus
    // scan — the corpus is filtered, never shuffled
    val ce = corpus
      .select(col("vec_id").as("cand_id"), col("embedding").as("__emb"))
      .join(broadcast(cands.select(col("probe_id"), col("cand_id"), col("rel"))),
        Seq("cand_id"))
    val pairSims = track(ce.as("a")
      .join(ce.as("b"),
        col("a.probe_id") === col("b.probe_id") &&
          col("a.cand_id") =!= col("b.cand_id"))
      .select(col("a.probe_id").as("probe_id"),
        col("a.cand_id").as("cand_id"),
        col("b.cand_id").as("other_id"),
        VectorFunctions.cosine(col("a.__emb"), col("b.__emb")).as("sim")))

    val lam = lit(lambda)
    val oneMinusLam = lit(1.0 - lambda)
    // each stage's pick is localCheckpointed: stage i's anti-join and
    // max-sim reference EVERY prior pick, so an unmaterialized union
    // tree would re-execute stage j 2^(i-j) times (measured 15 s → 2 s
    // at sf0.1 for k=5); checkpointed picks are |probes|-row frames
    var selected = Combine.topPerKey(cands, Seq("probe_id"), 1,
        col("rel").desc, col("cand_id"))
      .select(col("probe_id"), lit(1L).as("rank"), col("cand_id"),
        col("rel"), (lam * col("rel")).as("mmr"))
      .localCheckpoint()
    for (i <- 2 to k) {
      val maxSim = pairSims
        .join(selected.select(col("probe_id"), col("cand_id").as("other_id")),
          Seq("probe_id", "other_id"))
        .groupBy(col("probe_id"), col("cand_id"))
        .agg(max(col("sim")).as("__maxsim"))
      val scored = cands
        .join(selected.select(col("probe_id"), col("cand_id")),
          Seq("probe_id", "cand_id"), "left_anti")
        .join(maxSim, Seq("probe_id", "cand_id"))
        .withColumn("mmr", lam * col("rel") - oneMinusLam * col("__maxsim"))
      val pick = Combine.topPerKey(scored, Seq("probe_id"), 1,
          col("mmr").desc, col("cand_id"))
        .select(col("probe_id"), lit(i.toLong).as("rank"), col("cand_id"),
          col("rel"), col("mmr"))
      selected = selected.unionByName(pick).localCheckpoint()
    }
    selected
  }

  /** k-center greedy (farthest-point traversal): start from the lowest
    * vec_id, then k−1 times add the point farthest (squared L2) from
    * the current center set (ties → lower vec_id). 2-approximates the
    * optimal k-center covering radius (Gonzalez 1985).
    *
    * Scale posture: the min-distance column is maintained
    * INCREMENTALLY — each stage is one narrow `least(mind, dist(·, c))`
    * map over the point set with the new 1-row center broadcast in,
    * plus one TakeOrdered(1) argmax; no shuffle at any stage, total
    * work k·n distance evaluations. The per-stage 1-row center frames
    * are localCheckpointed so stage i does not re-execute stages 1..i−1
    * through the broadcast subtrees (the Graph.pageRank device).
    *
    * @return one row per selected center: (rank ∈ 1..k, vec_id, gain =
    *         its min-distance to the prior centers — null for the seed,
    *         the nonincreasing farthest-point sequence otherwise) plus
    *         `radius`: the final covering radius max_p min_c d(p,c),
    *         identical on every row
    */
  def kCenterGreedy(points: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val pts0 = track(points.select(col("vec_id"), col("embedding")))
    val seed = pts0.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id"), col("embedding").as("__cemb"))
      .localCheckpoint()
    var selected = seed.select(lit(1L).as("rank"), col("vec_id"),
      lit(null).cast("double").as("gain"))
    var pts = pts0
      .crossJoin(broadcast(seed.select(col("__cemb"))))
      .withColumn("__mind",
        VectorFunctions.sqDist(col("embedding"), col("__cemb")))
      .drop("__cemb")
    for (i <- 2 to k) {
      val c = pts.orderBy(col("__mind").desc, col("vec_id")).limit(1)
        .select(col("vec_id"), col("embedding").as("__cemb"),
          col("__mind").as("gain"))
        .localCheckpoint()
      selected = selected.unionByName(
        c.select(lit(i.toLong).as("rank"), col("vec_id"), col("gain")))
      // checkpoint the POINT frame too, not just the 1-row centers:
      // without it stage i's TakeOrdered re-executes all i prior
      // least(mind, dist) maps over the full point set — O(k²·n)
      // distance work instead of the k·n this loop promises
      pts = pts
        .crossJoin(broadcast(c.select(col("__cemb"))))
        .withColumn("__mind", least(col("__mind"),
          VectorFunctions.sqDist(col("embedding"), col("__cemb"))))
        .drop("__cemb")
        .localCheckpoint()
    }
    val radius = pts.agg(max(col("__mind")).as("radius"))
    selected.crossJoin(broadcast(radius))
  }
}
