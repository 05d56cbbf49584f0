package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Combine

/** Approximate-nearest-neighbor similarity search over an embedding column
  * (builder mandate; SURVEY.md §7 Phase 4).
  *
  * Layers:
  *  - [[bruteForceTopK]] — exact cosine top-k: the correctness baseline.
  *    Probes are broadcast; the corpus is scanned once. Cost O(|corpus|·|probes|).
  *  - [[srpTopK]] — signed-random-projection (hyperplane LSH) bucketing:
  *    only same-bucket candidates are scored. The 100 TB path: bucket count
  *    grows 2^planes, each probe touches one bucket's partition.
  *  - [[ivfTopK]] — inverted-file index: one-pass assignment to sampled
  *    centroids; probes search the nProbe nearest centroid lists.
  */
object Similarity {

  // persisted-frame registry (same hygiene contract as Dedup)
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

  /** Default [[semDedup]] cluster-size cap — the recall/robustness trade
    * analogous to [[Dedup.DefaultMaxBucket]]. */
  val DefaultMaxCluster: Int = 10000

  /** In-plan dimension guard. Without it a dim mismatch fails SILENTLY:
    * DotProduct returns NULL on length mismatch, every SRP sign test then
    * yields bit 0, and all rows land in bucket 0 — the blocked join
    * degenerates to all-pairs with no error. The guard passes the
    * embedding through unchanged when its width matches (nulls pass too —
    * they carry no signal and bucket to null) and raises a descriptive
    * error from inside the first stage that evaluates it. Checking
    * lazily, in-plan, means constructing an operator runs ZERO Spark jobs
    * — the former eager take(1) probe executed the whole upstream plan
    * once per construction, a hidden extra job for expensive upstreams. */
  private def dimChecked(emb: org.apache.spark.sql.Column, dim: Int,
                         who: String): org.apache.spark.sql.Column =
    when(emb.isNull, emb)
      .when(size(emb) === dim, emb)
      .otherwise(raise_error(concat(
        lit(s"$who: planes are $dim-dimensional but embedding vectors have "),
        size(emb).cast("string"),
        lit(" elements - pass dim = "), size(emb).cast("string"))))

  /** Exact cosine top-k per probe. `corpus`/`probes`: (id, embedding). */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"))
    val p = probes.select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
    val scored = c.join(broadcast(p), col("cand_id") =!= col("probe_id"))
      .withColumn("score", VectorFunctions.cosine(col("p_emb"), col("c_emb")))
    Combine.topPerKey(
      scored.select(col("probe_id"), col("cand_id"), col("score")),
      Seq("probe_id"), k, col("score").desc, col("cand_id"))
  }

  /** LSH-bucketed cosine top-k: candidates limited to the probe's SRP
    * bucket. Misses across bucket boundaries are the ANN trade; raise
    * recall with fewer planes or multi-probe. */
  def srpTopK(corpus: DataFrame, probes: DataFrame, k: Int,
              nPlanes: Int = 8, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = VectorFunctions.makePlanes(nPlanes, dim, seed)
    // BOTH sides are guarded: probes from a different embedder than the
    // corpus (the realistic mismatch) must fail loudly too
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"),
      VectorFunctions.srpBucket(
        dimChecked(col("embedding"), dim, "srpTopK"), planes).as("bucket"))
    val p = probes.select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"),
      VectorFunctions.srpBucket(
        dimChecked(col("embedding"), dim, "srpTopK probes"), planes).as("bucket"))
    val scored = c.join(broadcast(p), Seq("bucket"))
      .filter(col("cand_id") =!= col("probe_id"))
      .withColumn("score", VectorFunctions.cosine(col("p_emb"), col("c_emb")))
    Combine.topPerKey(
      scored.select(col("probe_id"), col("cand_id"), col("score")),
      Seq("probe_id"), k, col("score").desc, col("cand_id"))
  }

  /** Multi-probe SRP top-k (Lv et al. 2007, "Multi-Probe LSH: Efficient
    * Indexing for High-Dimensional Similarity Search", VLDB): each probe
    * searches its own SRP bucket PLUS the `nProbes` buckets reached by
    * flipping the sign bit of its lowest-|margin| hyperplanes — the
    * hyperplanes the vector sits closest to, i.e. the boundaries its true
    * neighbors most plausibly fell across. Recall rises toward the
    * multi-table OR-LSH level while indexing ONE table: the classic
    * memory/recall trade at 100 TB, where every extra table is another
    * corpus-wide signature column.
    *
    * Scale shape is [[srpTopK]]'s: the corpus is bucketed once (one scan,
    * no index structure), the probe side explodes to 1+nProbes bucket
    * rows per probe and broadcasts, and candidates arrive through the
    * same equi-join — never a similarity scan. A candidate found via two
    * probed buckets is deduplicated BEFORE scoring (its bucket rows are
    * identical after the bucket column drops, so the dedup is exact),
    * keeping top-k heaps duplicate-free. The candidate set is a strict
    * superset of [[srpTopK]]'s (same planes; bucket list includes the
    * base), so per-probe recall can only improve — asserted in
    * SimilaritySpec against the brute-force truth. */
  def srpTopKMultiProbe(corpus: DataFrame, probes: DataFrame, k: Int,
                        nPlanes: Int = 8, dim: Int = 64, seed: Long = 42L,
                        nProbes: Int = 2): DataFrame = {
    require(nProbes >= 0 && nProbes <= nPlanes,
      s"nProbes must be in [0, nPlanes=$nPlanes], got $nProbes")
    val planes = VectorFunctions.makePlanes(nPlanes, dim, seed)
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"),
      VectorFunctions.srpBucket(
        dimChecked(col("embedding"), dim, "srpTopKMultiProbe"), planes).as("bucket"))
    val emb = dimChecked(col("embedding"), dim, "srpTopKMultiProbe probes")
    // per-probe hyperplane margins, in plane order — the same dots the
    // bucket's sign tests evaluate, kept as magnitudes
    val margins = array(planes.map(p => abs(VectorFunctions.dot(emb, typedlit(p)))): _*)
    val p0 = probes.select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"),
      VectorFunctions.srpBucket(emb, planes).as("bucket0"),
      margins.as("__m"))
    // flip indices: the nProbes planes with the smallest |margin|
    // (ties by plane index — array_sort on (margin, index) structs)
    val ranked = array_sort(transform(sequence(lit(0), lit(nPlanes - 1)),
      i => struct(element_at(col("__m"), i + 1).as("a"), i.as("i"))))
    val flips = transform(slice(ranked, 1, nProbes), s => s.getField("i"))
    val buckets = concat(array(col("bucket0")),
      transform(flips, i => col("bucket0")
        .bitwiseXOR(call_function("shiftleft", lit(1), i))))
    val p = p0.withColumn("bucket", explode(buckets))
      .select(col("probe_id"), col("p_emb"), col("bucket"))
    val cand = c.join(broadcast(p), Seq("bucket"))
      .filter(col("cand_id") =!= col("probe_id"))
      .drop("bucket")
      .dropDuplicates("probe_id", "cand_id")
    val scored = cand
      .withColumn("score", VectorFunctions.cosine(col("p_emb"), col("c_emb")))
    Combine.topPerKey(
      scored.select(col("probe_id"), col("cand_id"), col("score")),
      Seq("probe_id"), k, col("score").desc, col("cand_id"))
  }

  /** IVF index build: deterministic centroid sample (first nCentroids by
    * id — the cheap default; see [[kMeans]] for trained centroids with the
    * same output shape), then one-pass nearest-centroid assignment.
    * Returns the corpus with a `centroid_id` column — write it partitioned
    * by centroid_id to make probe-side reads partition-pruned. */
  def ivfAssign(corpus: DataFrame, nCentroids: Int): DataFrame = {
    val cents = corpus.orderBy(col("vec_id")).limit(nCentroids)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cent_emb"))
    assignToCentroids(corpus, cents)
  }

  /** Nearest-centroid assignment against an explicit (broadcast) centroid
    * table: one corpus scan, one bounded comparison fan-out per row. */
  def assignToCentroids(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = corpus.crossJoin(broadcast(centroids))
      .withColumn("d", VectorFunctions.sqDist(col("embedding"), col("cent_emb")))
    Combine.topPerKey(
      scored.select(col("vec_id"), col("embedding"), col("centroid_id"), col("d")),
      Seq("vec_id"), 1, col("d").asc, col("centroid_id"))
      .drop("d")
  }

  /** Lloyd's k-means over the embedding column — the trained-centroid path
    * for [[ivfAssign]]. Deterministic: init = first k by id; each
    * iteration is assign (broadcast centroids, one scan) + recompute
    * (posexplode to (centroid, dim) cells, per-cell mean, rebuild vectors
    * — two shuffles of k·dim rows, independent of corpus size). Empty
    * clusters keep their previous centroid. Returns (centroid_id,
    * cent_emb) ready for [[assignToCentroids]]/[[ivfTopK]]. */
  def kMeans(corpus: DataFrame, k: Int, iters: Int = 5): DataFrame = {
    var cents = corpus.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").cast("array<double>").as("cent_emb"))
      .localCheckpoint()
    var it = 0
    while (it < iters) {
      val assigned = assignToCentroids(corpus, cents)
      val means = assigned
        .select(col("centroid_id"), posexplode(col("embedding").cast("array<double>")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("centroid_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("cells"))
        .select(col("centroid_id"),
          transform(col("cells"), c => c.getField("m")).as("new_emb"))
      val next = cents.join(means, Seq("centroid_id"), "left_outer")
        .select(col("centroid_id"),
          coalesce(col("new_emb"), col("cent_emb")).as("cent_emb"))
        .localCheckpoint()
      cents.unpersist() // release the superseded iterate's blocks
      cents = next
      it += 1
    }
    cents
  }

  /** IVF probe: score each probe against the nProbe nearest centroids'
    * lists only. */
  def ivfTopK(assigned: DataFrame, centroids: DataFrame, probes: DataFrame,
              k: Int, nProbe: Int = 2): DataFrame = {
    val p = probes.select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
    val probeCents = Combine.topPerKey(
      p.crossJoin(broadcast(centroids))
        .withColumn("d", VectorFunctions.sqDist(col("p_emb"), col("cent_emb")))
        .select(col("probe_id"), col("p_emb"), col("centroid_id"), col("d")),
      Seq("probe_id"), nProbe, col("d").asc, col("centroid_id"))
      .drop("d")
    val cands = assigned.join(broadcast(probeCents), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("score", VectorFunctions.cosine(col("p_emb"), col("embedding")))
    Combine.topPerKey(
      cands.select(col("probe_id"), col("vec_id").as("cand_id"), col("score")),
      Seq("probe_id"), k, col("score").desc, col("cand_id"))
  }

  // -------------------------------------------------- product quantization

  /** Sub-vector explosion shared by the PQ train/encode/probe paths: each
    * d-dim embedding becomes m rows (id, sub_id, sub_emb[d/m]) of
    * contiguous slices. */
  private def subVectors(df: DataFrame, idCol: String, m: Int,
                         dim: Int): DataFrame = {
    val len = dim / m
    require(m * len == dim, s"dim $dim not divisible into $m subspaces")
    df.select(col(idCol),
        posexplode(array((0 until m).map(i =>
          slice(col("embedding").cast("array<double>"), i * len + 1, len)): _*)))
      .select(col(idCol), col("pos").as("sub_id"), col("col").as("sub_emb"))
  }

  /** Product-quantization codebook training (Jégou, Douze, Schmid: "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011): split each
    * d-dim embedding into m contiguous sub-vectors of d/m and run Lloyd's
    * k-means independently per subspace. Relational rendering mirrors
    * [[kMeans]] but keys every step by (sub_id, code_id), so ALL m
    * subspaces train in the same two shuffles per iteration (the recompute
    * shuffles m·ksub·(d/m) = ksub·d cells — independent of corpus size).
    * Deterministic init: the first ksub vectors by id donate their
    * sub-vectors; code ids are their 0-based rank. Empty codewords keep
    * their previous value. Returns (sub_id, code_id, code_emb[d/m]). */
  def pqTrain(corpus: DataFrame, m: Int, ksub: Int, dim: Int,
              iters: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val subs = track(subVectors(corpus, "vec_id", m, dim))
    // constant partition key: the frame is ksub rows by construction, and
    // the literal keeps the single-partition Window audit-visible as
    // intentional (same pattern as Combine.prefixSum)
    val initIds = corpus.orderBy(col("vec_id")).limit(ksub)
      .select(col("vec_id"),
        (row_number().over(
          Window.partitionBy(lit(0)).orderBy(col("vec_id"))) - 1).as("code_id"))
    var codebook = subs.join(broadcast(initIds), Seq("vec_id"))
      .select(col("sub_id"), col("code_id"), col("sub_emb").as("code_emb"))
      .localCheckpoint()
    var it = 0
    while (it < iters) {
      val assigned = pqAssign(subs, codebook)
      // no join-back needed: pqAssign's (sub_id, code_id) come FROM the
      // codebook, so a filtering join against its key set is a no-op that
      // only costs a distinct + broadcast per iteration
      val means = assigned
        .select(col("sub_id"), col("code_id"), posexplode(col("sub_emb")))
        .groupBy(col("sub_id"), col("code_id"), col("pos"))
        .agg(avg(col("col")).as("mn"))
        .groupBy(col("sub_id"), col("code_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("mn")))).as("cells"))
        .select(col("sub_id"), col("code_id"),
          transform(col("cells"), c => c.getField("mn")).as("new_emb"))
      val nextBook = codebook.join(means, Seq("sub_id", "code_id"), "left_outer")
        .select(col("sub_id"), col("code_id"),
          coalesce(col("new_emb"), col("code_emb")).as("code_emb"))
        .localCheckpoint()
      codebook.unpersist()
      codebook = nextBook
      it += 1
    }
    codebook
  }

  /** Nearest-codeword assignment per (id, sub_id) against a broadcast
    * codebook: one pass over the exploded sub-vectors, fan-out bounded by
    * ksub. Input frame needs (idCol, sub_id, sub_emb). */
  private def pqAssign(subs: DataFrame, codebook: DataFrame,
                       idCol: String = "vec_id"): DataFrame =
    Combine.topPerKey(
      subs.join(broadcast(codebook), Seq("sub_id"))
        .withColumn("d", VectorFunctions.sqDist(col("sub_emb"), col("code_emb")))
        .select(col(idCol), col("sub_id"), col("sub_emb"), col("code_id"), col("d")),
      Seq(idCol, "sub_id"), 1, col("d").asc, col("code_id"))
      .drop("d")

  /** PQ encode: each vector becomes an m-byte-ish code array — codes(i) is
    * the nearest codeword of subspace i. THE compact representation for
    * 100 TB embedding stores: m ints per vector instead of d floats (64-d
    * float → 4-int codes is 64× smaller), scanned without touching raw
    * vectors. Returns (vec_id, codes[m]). */
  def pqEncode(corpus: DataFrame, codebook: DataFrame, m: Int,
               dim: Int): DataFrame =
    pqAssign(subVectors(corpus, "vec_id", m, dim), codebook)
      .groupBy(col("vec_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub_id"), col("code_id")))),
        c => c.getField("code_id")).as("codes"))

  /** PQ probe via asymmetric distance computation (ADC): per probe,
    * precompute the (m × ksub) table of squared distances from the probe's
    * sub-vectors to every codeword — a TINY frame (probes × m × ksub),
    * broadcast — then score each encoded vector with m array lookups
    * (zip_with + aggregate, all codegen'd HOFs): approx_dist(v) =
    * Σᵢ table[i][codes(v)(i)]. One scan of the CODES (not the raw
    * vectors), no shuffle of the corpus. Returns per-probe k nearest
    * (probe_id, cand_id, adc_dist). */
  def pqTopK(encoded: DataFrame, codebook: DataFrame, probes: DataFrame,
             k: Int, m: Int, dim: Int): DataFrame = {
    val scored = encoded.crossJoin(broadcast(adcTable(probes, codebook, m, dim)))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("adc_dist", adcLookup(col("codes"), col("dt")))
    Combine.topPerKey(
      scored.select(col("probe_id"), col("vec_id").as("cand_id"), col("adc_dist")),
      Seq("probe_id"), k, col("adc_dist").asc, col("cand_id"))
  }

  /** Per-probe ADC distance table: (probe_id, dt) where dt(sub)(code) is
    * the squared distance from the probe's sub-vector to that codeword —
    * probes × m × ksub doubles, broadcast-sized by construction. */
  private def adcTable(probes: DataFrame, codebook: DataFrame, m: Int,
                       dim: Int): DataFrame =
    subVectors(probes.select(col("vec_id").as("probe_id"), col("embedding")),
        "probe_id", m, dim)
      .join(broadcast(codebook), Seq("sub_id"))
      .withColumn("d", VectorFunctions.sqDist(col("sub_emb"), col("code_emb")))
      .groupBy(col("probe_id"), col("sub_id"))
      .agg(array_sort(collect_list(struct(col("code_id"), col("d")))).as("r0"))
      .select(col("probe_id"), col("sub_id"),
        transform(col("r0"), c => c.getField("d")).as("row"))
      .groupBy(col("probe_id"))
      .agg(array_sort(collect_list(struct(col("sub_id"), col("row")))).as("t0"))
      .select(col("probe_id"),
        transform(col("t0"), c => c.getField("row")).as("dt"))

  /** Σᵢ dt(i)(codes(i)) — m array lookups, codegen'd HOFs. */
  private def adcLookup(codes: Column, dt: Column): Column =
    aggregate(
      zip_with(codes, dt, (c, row) => element_at(row, c.cast("int") + 1)),
      lit(0.0), (acc, x) => acc + x)

  /** Scalar quantization bounds (SQ8): per-dimension exact min/max over
    * the corpus — the trained state. One posexplode + hash-agg; partial
    * min/max reduce map-side, so only d rows per partition shuffle.
    * Unlike PQ's sampled k-means, the bounds are DETERMINISTIC exact
    * aggregates, which is what lets the whole SQ encode/probe path
    * replay cross-engine as a full value oracle. Output: (pos, mn, mx),
    * pos 1-based (posexplode + 1) to match SQL list indexing. */
  def sqTrain(corpus: DataFrame): DataFrame =
    corpus.select(posexplode(col("embedding").cast("array<double>")))
      .groupBy((col("pos") + 1).as("pos"))
      .agg(min(col("col")).as("mn"), max(col("col")).as("mx"))

  /** SQ8 encode: each coordinate → one byte code
    * q = clamp(floor((x−mn)·255/(mx−mn)), 0, 255) (4× smaller than
    * float32 — per-dimension fidelity, vs PQ's 64× with subspace loss —
    * the standard FAISS SQ8 rung between brute force and PQ). The
    * dequantized bin centers x̂ = mn + (q+0.5)·(mx−mn)/255 and their
    * self-dot ride along so probe scoring is pure arithmetic over the
    * codes. Bounds (≤ a few thousand dims) ship as array literals.
    * Output: (vec_id, codes, deq, self_dot). */
  def sqEncode(corpus: DataFrame, bounds: DataFrame): DataFrame = {
    val b = bounds.orderBy(col("pos")).collect()
    require(b.nonEmpty, "empty bounds — train on a non-empty corpus")
    val mns = array(b.map(r => lit(r.getDouble(1))).toIndexedSeq: _*)
    val mxs = array(b.map(r => lit(r.getDouble(2))).toIndexedSeq: _*)
    val v = col("embedding").cast("array<double>")
    val codes = transform(v, (x, i) => {
      val mn = element_at(mns, i + 1)
      val mx = element_at(mxs, i + 1)
      when(mx === mn, lit(0)).otherwise(
        least(lit(255.0), greatest(lit(0.0),
          floor((x - mn) * lit(255.0) / (mx - mn)))).cast("int"))
    })
    corpus.select(col("vec_id"), codes.as("codes"))
      .withColumn("deq", transform(col("codes"), (q, i) => {
        val mn = element_at(mns, i + 1)
        val mx = element_at(mxs, i + 1)
        mn + (q.cast("double") + lit(0.5)) * (mx - mn) / lit(255.0)
      }))
      .withColumn("self_dot", VectorFunctions.dot(col("deq"), col("deq")))
  }

  /** SQ8 probe via asymmetric distance: raw probe vs dequantized codes,
    * decomposed as ‖p−x̂‖² = p·p − 2·p·x̂ + x̂·x̂ so every term is a
    * sequential inner product (the established cross-engine-exact form;
    * the corpus's x̂·x̂ is precomputed at encode time). Probes broadcast;
    * the code table is scanned once, raw corpus vectors never touched. */
  def sqTopK(encoded: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val p = probes.select(col("vec_id").as("probe_id"),
        col("embedding").cast("array<double>").as("pv"))
      .withColumn("pp", VectorFunctions.dot(col("pv"), col("pv")))
    val scored = encoded.crossJoin(broadcast(p))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("adist",
        col("pp") - lit(2.0) * VectorFunctions.dot(col("pv"), col("deq"))
          + col("self_dot"))
    Combine.topPerKey(
      scored.select(col("probe_id"), col("vec_id").as("cand_id"), col("adist")),
      Seq("probe_id"), k, col("adist").asc, col("cand_id").asc)
  }

  /** IVF + PQ composed (the FAISS-style IVFPQ shape): candidates come
    * from the nProbe nearest centroids' inverted lists (corpus never
    * scanned whole — write `encoded ⋈ assigned` partitioned by
    * centroid_id and the probe read is partition-pruned), and scoring is
    * ADC over the codes (no raw vectors touched). `assigned` is
    * [[assignToCentroids]]/[[ivfAssign]] output (vec_id, centroid_id),
    * `encoded` is [[pqEncode]] output (vec_id, codes). Returns per-probe
    * k nearest (probe_id, cand_id, adc_dist). */
  def ivfPqTopK(assigned: DataFrame, encoded: DataFrame, centroids: DataFrame,
                codebook: DataFrame, probes: DataFrame, k: Int, m: Int,
                dim: Int, nProbe: Int = 2): DataFrame = {
    val p = probes.select(col("vec_id").as("probe_id"), col("embedding"))
    val probeCents = Combine.topPerKey(
      p.crossJoin(broadcast(centroids))
        .withColumn("d", VectorFunctions.sqDist(col("embedding"), col("cent_emb")))
        .select(col("probe_id"), col("centroid_id"), col("d")),
      Seq("probe_id"), nProbe, col("d").asc, col("centroid_id"))
      .drop("d")
    val cands = encoded
      .join(assigned.select(col("vec_id"), col("centroid_id")), Seq("vec_id"))
      .join(broadcast(probeCents), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("probe_id"))
      .join(broadcast(adcTable(probes, codebook, m, dim)), Seq("probe_id"))
      .withColumn("adc_dist", adcLookup(col("codes"), col("dt")))
    Combine.topPerKey(
      cands.select(col("probe_id"), col("vec_id").as("cand_id"), col("adc_dist")),
      Seq("probe_id"), k, col("adc_dist").asc, col("cand_id"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    * embedding similarity WITHIN clusters — cluster the corpus (k-means or
    * any deterministic centroid table), then inside each cluster drop
    * every vector that has a smaller-id neighbor at cosine ≥ `threshold`,
    * keeping the min-id representative of each similar group. Clustering
    * confines the quadratic comparison to cluster-sized blocks — the
    * published recipe's answer to all-pairs cosine at corpus scale; with
    * balanced clusters the work is n²/k per cluster and the join is a
    * shuffled equi-join on centroid_id, never a cartesian.
    *
    * Deterministic: given a deterministic centroid table (first-k by id,
    * or [[kMeans]] with its fixed init) the kept set is a pure function of
    * the data — reproducible across engines, auditable in SQL.
    *
    * `maxCluster` bounds the quadratic: "n²/k per cluster" holds only with
    * balanced clusters, and near-dup-heavy corpora — the very thing
    * SemDeDup targets — produce one dense mega-cluster whose single join
    * key blows up in one task. Clusters larger than `maxCluster` are
    * excluded from the pairwise verify, so ALL their members are kept —
    * a deterministic recall trade (dedup misses, never false drops),
    * mirroring [[Dedup.DefaultMaxBucket]]. Oversized clusters signal the
    * centroid table is too coarse: raise k (more centroids) rather than
    * the cap. */
  def semDedup(corpus: DataFrame, centroids: DataFrame,
               threshold: Double,
               maxCluster: Int = DefaultMaxCluster): DataFrame = {
    // assignment runs on the RAW vectors (sq-distance semantics); the
    // pairwise verify runs on unit-normalized copies so each pair costs
    // ONE dot instead of dot + two norms — 3× fewer array folds on the
    // within-cluster quadratic, the operator's hot loop.
    // persisted: read by the cluster-size count and BOTH sides of the
    // self-join — without the cache the centroid assignment (cross join +
    // per-vector top-1) would run three times
    val assigned = track(assignToCentroids(corpus, centroids)
      .withColumn("__ne", VectorFunctions.normalized(col("embedding"))))
    // cluster-size cap via groupBy + semi-join-back (map-side partials,
    // AQE-skew-splittable) — NOT a per-cluster window, which would
    // materialize the mega-cluster in one task, the exact skew the cap
    // exists to defuse
    val okClusters = assigned.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("cn"))
      .filter(col("cn") <= maxCluster)
      .select(col("centroid_id"))
    val capped = assigned.join(okClusters, Seq("centroid_id"), "left_semi")
    // per-side renames keep the self-join a real equi-join (a shared
    // attribute would make the condition trivially true → cross join)
    val a = capped.select(col("centroid_id").as("cid_a"),
      col("vec_id").as("id_a"), col("__ne").as("e_a"))
    val b = capped.select(col("centroid_id").as("cid_b"),
      col("vec_id").as("id_b"), col("__ne").as("e_b"))
    val drops = a.join(b, col("cid_a") === col("cid_b") && col("id_a") < col("id_b"))
      .filter(VectorFunctions.dot(col("e_a"), col("e_b")) >= threshold)
      .select(col("id_b").as("vec_id")).distinct()
    corpus.join(drops, Seq("vec_id"), "left_anti")
  }

  /** Per-probe recall@k of an ANN result against an exact baseline — the
    * operational "is my index any good" audit every ANN deployment needs.
    * Inputs are two (probe_id, cand_id, …) top-k frames (e.g. [[srpTopK]]
    * vs [[bruteForceTopK]]); output is (probe_id, n_exact, n_hit, recall)
    * per probe. Two grouped counts plus one semi-join on ids only —
    * audit cost is independent of embedding width, and both inputs being
    * deterministic makes the report fully oracle-checkable. */
  def recallReport(ann: DataFrame, exact: DataFrame): DataFrame = {
    val a = ann.select(col("probe_id"), col("cand_id"))
    val e = exact.select(col("probe_id"), col("cand_id"))
    val hits = e.join(a, Seq("probe_id", "cand_id"), "left_semi")
      .groupBy(col("probe_id")).agg(count(lit(1)).as("n_hit"))
    val totals = e.groupBy(col("probe_id")).agg(count(lit(1)).as("n_exact"))
    totals.join(hits, Seq("probe_id"), "left")
      .select(col("probe_id"), col("n_exact"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_exact"), 4)
          .as("recall"))
  }

  /** Embedding-cosine near-duplicate pairs (threshold variant, exact
    * all-pairs). O(n²) — ground truth for [[cosinePairsBlocked]]'s recall;
    * never register it on a bench path. */
  def cosinePairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("id_a"), col("embedding").as("e_a"))
    val b = corpus.select(col("vec_id").as("id_b"), col("embedding").as("e_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("score", VectorFunctions.cosine(col("e_a"), col("e_b")))
      .filter(col("score") >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** SRP-blocked cosine near-dup pairs — the scale path. Multi-table
    * OR-LSH: nTables independent signatures of nPlanes hyperplanes each;
    * a pair is a candidate if it collides in ANY table (recall
    * 1-(1-p^nPlanes)^nTables for p = 1-θ/π), then exact-verified against
    * the threshold. Embeddings are unit-normalized once so verification is
    * a single dot per pair. Pairs colliding in no table are missed — the
    * documented ANN recall trade; the oracle replicates the same blocking
    * so the correctness check stays exact. */
  /** nPlanes that keeps expected SRP bucket occupancy O(1) as the corpus
    * grows: ceil(log2 n) with a floor — 2^nPlanes buckets ≈ n, so
    * in-bucket candidate pairs stay ~linear instead of quadratic (the
    * sf1 sweep note: a FIXED nPlanes means buckets thicken ∝ n and
    * in-bucket pairs ∝ n²). The recall trade is explicit: per-table
    * collision is p^nPlanes (p = 1 − θ/π), so a deeper code needs more
    * OR-tables — raise nTables ~∝ 1/p^Δplanes to hold recall. */
  def autoPlanes(n: Long, floor: Int = 8): Int =
    math.max(floor,
      64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n - 1)))

  /** nTables that HOLDS per-pair recall as [[autoPlanes]] deepens the
    * code (ADVICE r12: deepening planes with tables fixed silently
    * decays recall ∝ p^Δplanes): per-table collision at the threshold
    * angle is p^nPlanes (p = 1 − arccos θ / π), so going Δ planes past
    * the floor divides it by p^Δ and the OR-table count must rise by
    * the same factor to keep 1−(1−p^planes)^tables level. Capped —
    * past the cap the trade flips to candidate-volume cost and the
    * caller should raise the threshold or accept the documented decay
    * (the cap is reported by the plan, not silent: tables scale the
    * bucketed explode size linearly). */
  def autoTables(nPlanes: Int, threshold: Double, floor: Int = 8,
                 baseTables: Int = 4, cap: Int = 64): Int = {
    val t = math.min(1.0, math.max(-1.0, threshold))
    val p = 1.0 - math.acos(t) / math.Pi
    val delta = math.max(0, nPlanes - floor)
    val scaled = math.ceil(baseTables / math.pow(p, delta.toDouble))
    math.min(cap.toDouble, math.max(baseTables.toDouble, scaled)).toInt
  }

  /** [[cosinePairsBlocked]] with nPlanes derived from the corpus size
    * (one count job) per [[autoPlanes]] — the form to reach for when the
    * corpus size is not known at call-authoring time. `nTables = 0`
    * (the default) derives the table count from the plane depth per
    * [[autoTables]], so recall holds as the corpus grows instead of
    * silently decaying with the deeper code; pass an explicit count to
    * pin it (accepting the decay past the plane floor). */
  def cosinePairsBlockedAuto(corpus: DataFrame, threshold: Double,
                             nTables: Int = 0, dim: Int = 64,
                             seed: Long = 42L): DataFrame = {
    val planes = autoPlanes(corpus.count())
    val tables = if (nTables > 0) nTables else autoTables(planes, threshold)
    cosinePairsBlocked(corpus, threshold, planes, tables, dim, seed)
  }

  def cosinePairsBlocked(corpus: DataFrame, threshold: Double,
                         nPlanes: Int = 4, nTables: Int = 4,
                         dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = VectorFunctions.makePlanes(nPlanes * nTables, dim, seed)
    // persist: read by the bucket explode and both verify join-backs
    val base = track(corpus.select(col("vec_id").as("id"),
      VectorFunctions.normalized(
        dimChecked(col("embedding"), dim, "cosinePairsBlocked")).as("e")))
    val tables = (0 until nTables).map { t =>
      struct(lit(t).as("t"),
        VectorFunctions.srpBucket(col("e"),
          planes.slice(t * nPlanes, (t + 1) * nPlanes)).as("b"))
    }
    // drop null embeddings BEFORE bucketing: the bucket rides inside a
    // struct join key, and Spark's struct equality treats null FIELDS as
    // equal — null-embedding rows would all collide pairwise (the
    // quadratic null bucket), only to be rejected by the null-dot verify
    val bucketed = base.filter(col("e").isNotNull)
      .select(col("id"), explode(array(tables: _*)).as("tb"))
    // per-side key rename keeps the self-join a real equi-join (a shared
    // attribute would make the condition trivially true → cross join)
    val a = bucketed.select(col("tb").as("tb_a"), col("id").as("id_a"))
    val b = bucketed.select(col("tb").as("tb_b"), col("id").as("id_b"))
    a.join(b, col("tb_a") === col("tb_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .join(base.select(col("id").as("id_a"), col("e").as("e_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("e").as("e_b")), Seq("id_b"))
      .filter(VectorFunctions.dot(col("e_a"), col("e_b")) >= threshold)
      .select(col("id_a"), col("id_b"))
  }
}
