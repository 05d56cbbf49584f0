package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Document deduplication for pretraining-data pipelines — exact,
  * MinHash+LSH, SimHash, and n-gram-Jaccard near-dup (builder mandate;
  * SURVEY.md §7 Phase 4).
  *
  * Scale posture: every path is a constant number of shuffles with
  * map-side partial aggregation; the only quadratic step (candidate
  * verification) is confined to LSH buckets, whose size is capped to guard
  * against degenerate buckets (boilerplate shingles at 100 TB WILL produce
  * them).
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup: keep the smallest id per normalized-text group. One
    * hash-aggregate shuffle (min_by partial-aggregates map-side — cheaper
    * than a window sort at scale). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    exactByKey(df, idCol, TextFunctions.fingerprint(col(textCol)))

  /** Exact dedup with a caller-supplied grouping key (e.g. md5 of the
    * normalized text when the key must be portable across engines). */
  def exactByKey(df: DataFrame, idCol: String, key: Column): DataFrame =
    df.groupBy(key.as("fp"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_dups"))
      .select(col("keeper"), col("n_dups"))

  /** Exact dedup keeping whole rows: semi-structured variant of [[exact]]
    * (min_by over the full row struct). */
  def exactRows(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = TextFunctions.fingerprint(col(textCol))
    val cols = df.columns.map(col)
    df.groupBy(fp.as("fp"))
      .agg(min_by(struct(cols: _*), col(idCol)).as("row"))
      .select(col("row.*"))
  }

  // -------------------------------------------------------------- MinHash

  /** MinHash signature: position j holds min over shingles of a j-salted
    * 64-bit hash — the standard permutation approximation. Pure Column
    * expr; one pass over the shingle array per row. */
  def minHashSignature(text: Column, numHashes: Int, shingleK: Int): Column = {
    val sh = TextFunctions.shingleHashes(text, shingleK)
    array((0 until numHashes).map { j =>
      array_min(transform(sh, h => xxhash64(lit(j), h)))
    }: _*)
  }

  /** LSH banding: split the signature into `bands`, hash each band →
    * array of (band, bucket) structs. Docs sharing any band-bucket are
    * candidates. */
  def lshBandBuckets(sig: Column, numHashes: Int, bands: Int): Column = {
    require(numHashes % bands == 0, "numHashes must divide into bands evenly")
    val r = numHashes / bands
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(b.as("band"), xxhash64(b, slice(sig, b * lit(r) + 1, lit(r))).as("bucket")))
  }

  /** Estimated Jaccard from two signatures: fraction of agreeing
    * positions. */
  def estJaccard(sigA: Column, sigB: Column, numHashes: Int): Column =
    size(array_compact(zip_with(sigA, sigB, (x, y) => when(x === y, 1)))).cast("double") / numHashes

  /** MinHash+LSH near-duplicate pairs: shingle → minhash → band →
    * bucket-join → verify estimated Jaccard ≥ threshold.
    *
    * `maxBucket` drops pathological buckets (a bucket of m docs yields
    * m²/2 candidates; boilerplate text at corpus scale makes m huge).
    * Dropped buckets are the standard recall/robustness trade.
    */
  def minHashPairs(df: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 64, shingleK: Int = 3, bands: Int = 16,
                   threshold: Double = 0.7, maxBucket: Int = 1000): DataFrame = {
    val sig = df.select(
      col(idCol).as("id"),
      minHashSignature(col(textCol), numHashes, shingleK).as("sig"))
    val exploded = sig
      .select(col("id"), col("sig"),
        explode(lshBandBuckets(col("sig"), numHashes, bands)).as("bk"))
    // guard: cap bucket size before the self-join
    val bucketSizes = exploded.groupBy(col("bk")).agg(count(lit(1)).as("bn"))
    val bounded = exploded.join(
      bucketSizes.filter(col("bn") <= maxBucket).select(col("bk")), Seq("bk"))
    val a = bounded.select(col("bk"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = bounded.select(col("bk"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, a("bk") === b("bk") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("est_jaccard", estJaccard(col("sig_a"), col("sig_b"), numHashes))
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  // -------------------------------------------------------------- SimHash

  /** 32-bit SimHash: per-bit vote over murmur3 token hashes, single pass
    * via zip_with (bit extraction by exact power-of-two division — hashes
    * are masked non-negative so the arithmetic matches bit shifts). */
  def simHash(text: Column): Column = {
    val hs = transform(TextFunctions.tokens(text),
      t => hash(t).cast("long").bitwiseAND(lit(0xFFFFFFFFL)))
    val bitsOf = (h: Column) =>
      transform(sequence(lit(0), lit(31)), i =>
        when(pmod(floor(h / pow(lit(2.0), i)).cast("long"), lit(2L)) === 1L, 1).otherwise(-1))
    val votes = aggregate(hs, array_repeat(lit(0), 32),
      (acc, h) => zip_with(acc, bitsOf(h), (a, v) => a + v))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(31)),
        (v, i) => when(v > 0, pow(lit(2.0), i).cast("long")).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Hamming distance between two simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on 8-bit chunks (pigeonhole: hamming ≤ 3
    * ⇒ some chunk of 4 equal; we use 4×8-bit chunks for hamming ≤ maxDist
    * with chunk-equality candidate generation), verify with bit_count. */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"), simHash(col(textCol)).as("sh"))
    val chunks = sh.select(col("id"), col("sh"),
      explode(transform(sequence(lit(0), lit(3)), c =>
        struct(c.as("chunk"),
          pmod(floor(col("sh") / pow(lit(2.0), c * lit(8))).cast("long"), lit(256L)).as("v")))).as("ck"))
    val a = chunks.select(col("ck"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = chunks.select(col("ck"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, a("ck") === b("ck") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("dist", hamming(col("sh_a"), col("sh_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  // ------------------------------------------------------ n-gram Jaccard

  /** Exact n-gram Jaccard similarity between two shingle-hash arrays
    * treated as sets. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Exact-Jaccard near-dup pairs. All-pairs — the verification oracle for
    * small corpora and for LSH recall measurement; at scale use
    * [[minHashPairs]] (this is its ground truth, not its replacement). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleK: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      array_distinct(TextFunctions.shingleHashes(col(textCol), shingleK)).as("sh"))
    val a = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("jac", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jac"), 4).as("jac"))
  }

  // ------------------------------------------- cluster & representative

  /** Min-label propagation connected components over an undirected edge
    * list (id_a, id_b): every node ends with its component's min id.
    * Near-dup clusters are tiny, so this converges in a few iterations;
    * maxIter bounds the worst case. */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxIter: Int = 10): DataFrame = {
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
    var labels = nodes.select(col("id"), col("id").as("label"))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val neighborMin = sym
        .join(labels, sym("src") === labels("id"))
        .groupBy(col("dst")).agg(min(col("label")).as("nlabel"))
      val next = labels
        .join(neighborMin, labels("id") === neighborMin("dst"), "left_outer")
        .select(col("id"), least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .cache()
      converged = next.join(labels.withColumnRenamed("label", "old"), Seq("id"))
        .filter(col("label") =!= col("old")).isEmpty
      labels = next
      iter += 1
    }
    labels
  }

  /** End-to-end near-dedup: MinHash pairs → components → keep each
    * cluster's min-id row. */
  def dedupNearDuplicates(df: DataFrame, idCol: String, textCol: String,
                          numHashes: Int = 64, shingleK: Int = 3,
                          bands: Int = 16, threshold: Double = 0.7): DataFrame = {
    val pairs = minHashPairs(df, idCol, textCol, numHashes, shingleK, bands, threshold)
    val nodes = df.select(col(idCol).as("id"))
    val labels = connectedComponents(nodes, pairs)
    df.join(labels, df(idCol) === labels("id"))
      .filter(col(idCol) === col("label"))
      .select(df.columns.map(col): _*)
  }
}
