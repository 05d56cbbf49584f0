package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextFunctions, VectorFunctions}
import graft.queries.QueryUtil.davg
import graft.llm.{Boilerplate, Bpe, Contamination, CountMin, Curation, Dedup, HeavyHitters, Mixture, Multimodal, Packing, Repetition, Similarity, TextClassifier, TextRelevance, Unigram}

/** LLM-data-pipeline operator inventory (SURVEY.md §7 Phase 4): dedup,
  * similarity search, text analysis, multimodal plumbing. Oracles exist
  * wherever the computation is portable SQL (jaccard over shingle strings,
  * cosine in double math, token stats); hash-seeded ops (MinHash/SimHash/
  * SRP/k-means) are engine-specific by construction → their gate entries
  * use the self-asserting form (exact oracle companions + engine-computed
  * invariant booleans pinned TRUE, the q_approx_sketches pattern) plus
  * ScalaTest coverage.
  */
object LlmQueries {

  type Q = (SparkSession, String) => DataFrame

  /** The q_sql_surface_audit statement — public so EntryContractSpec can
    * assert every GraftExtensions-registered name is invoked in it. One
    * (fn, ok) row per registered native; each ok recomputes an invariant
    * of the function inside pure SQL: identity/idempotence (jaro_winkler,
    * canonicalize_url, normalize_text, clean_text), size laws against
    * ngram_strings (shingle_hash's whole-text fallback, minhash_sig's
    * signature width, consecutive_pairs' n−1), the single-feature law
    * simhash64(token) = xxhash64(token) (below k tokens the shingle
    * fallback is ONE whole-text hash, so every bit's lone vote's sign
    * is the hash bit), range bounds (quality_score), exact constants
    * (dot_product), and sketch-vs-exact
    * agreement (kll median within [min,max] length; theta union within 5%
    * of the exact id count, disjoint intersect and self-A\\B exactly 0 —
    * exact at gate scale, sketch-bounded beyond). */
  val sqlSurfaceAuditSql: String =
    """WITH d AS (SELECT doc_id, text FROM graft_docs_sql),
       base AS (
         SELECT
           bool_and(jaro_winkler(text, text) = CAST(1.0 AS DOUBLE)) AS jaro_winkler_ok,
           bool_and(canonicalize_url(canonicalize_url('HTTP://EXample.com:80/a/../b?b=2&a=1'))
             = canonicalize_url('HTTP://EXample.com:80/a/../b?b=2&a=1')) AS canonicalize_url_ok,
           bool_and(endswith('www.news.example.com',
             registrable_domain('www.news.example.com'))) AS registrable_domain_ok,
           bool_and(size(shingle_hash(text, 5))
             = greatest(1, size(ngram_strings(text, 5)))) AS shingle_hash_ok,
           bool_and(size(minhash_sig(text, 5, 16)) = 16) AS minhash_sig_ok,
           bool_and(simhash64(text) IS NOT NULL)
             AND bool_and(simhash64('graft') = xxhash64('graft')) AS simhash64_ok,
           bool_and(dot_product(
             array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE), CAST(3.0 AS DOUBLE)),
             array(CAST(4.0 AS DOUBLE), CAST(5.0 AS DOUBLE), CAST(6.0 AS DOUBLE)))
             = CAST(32.0 AS DOUBLE)) AS dot_product_ok,
           bool_and(size(ngram_strings(text, 2))
             = greatest(0, size(ngram_strings(text, 1)) - 1)) AS ngram_strings_ok,
           bool_and(size(consecutive_pairs(ngram_strings(text, 1)))
             = greatest(0, size(ngram_strings(text, 1)) - 1)) AS consecutive_pairs_ok,
           bool_and(quality_score(text)
             BETWEEN CAST(0.0 AS DOUBLE) AND CAST(1.0 AS DOUBLE)) AS quality_score_ok,
           bool_and(gopher_flags(text, 50, 100000) IS NOT NULL) AS gopher_flags_ok,
           bool_and(lang_id(text) IN ('de', 'en', 'es', 'fr', 'und')) AS lang_id_ok,
           bool_and(normalize_text(normalize_text(text, 'NFKC'), 'NFKC')
             = normalize_text(text, 'NFKC')) AS normalize_text_ok,
           bool_and(clean_text(clean_text(text)) = clean_text(text)) AS clean_text_ok,
           bool_and(strip_html('<p>hello <b>w</b></p>') NOT LIKE '%<%') AS strip_html_ok,
           bool_and(deflate_size(text) > 0) AS deflate_size_ok,
           CAST(min(length(text)) AS DOUBLE) AS min_len,
           CAST(max(length(text)) AS DOUBLE) AS max_len,
           count(DISTINCT doc_id) AS n_ids
         FROM d),
       cms AS (SELECT cms_sketch(text, 5, 256) AS sk FROM d GROUP BY doc_id % 4),
       cmsok AS (SELECT bool_and(size(sk) > 0) AS cms_sketch_ok,
                        size(cms_merge(sk)) > 0 AS cms_merge_ok FROM cms),
       kll AS (SELECT kll_sketch(CAST(length(text) AS DOUBLE), 128) AS sk
               FROM d GROUP BY doc_id % 4),
       kllok AS (SELECT bool_and(octet_length(sk) > 0) AS kll_sketch_ok,
                        kll_quantile(kll_merge(sk), 0.5) AS med FROM kll),
       th AS (SELECT doc_id % 2 AS g, theta_sketch(CAST(doc_id AS STRING), 12) AS sk
              FROM d GROUP BY doc_id % 2),
       thok AS (SELECT bool_and(octet_length(sk) > 0) AS theta_sketch_ok,
                       theta_estimate(theta_merge(sk, 12)) AS est_union FROM th),
       thp AS (SELECT
           theta_estimate(theta_intersect((SELECT sk FROM th WHERE g = 0),
                                          (SELECT sk FROM th WHERE g = 1))) AS est_int,
           theta_estimate(theta_a_not_b((SELECT sk FROM th WHERE g = 0),
                                        (SELECT sk FROM th WHERE g = 0))) AS est_anb)
       SELECT fn, ok FROM (
         SELECT 'jaro_winkler' AS fn, jaro_winkler_ok AS ok FROM base
         UNION ALL SELECT 'canonicalize_url', canonicalize_url_ok FROM base
         UNION ALL SELECT 'registrable_domain', registrable_domain_ok FROM base
         UNION ALL SELECT 'shingle_hash', shingle_hash_ok FROM base
         UNION ALL SELECT 'minhash_sig', minhash_sig_ok FROM base
         UNION ALL SELECT 'simhash64', simhash64_ok FROM base
         UNION ALL SELECT 'dot_product', dot_product_ok FROM base
         UNION ALL SELECT 'ngram_strings', ngram_strings_ok FROM base
         UNION ALL SELECT 'consecutive_pairs', consecutive_pairs_ok FROM base
         UNION ALL SELECT 'quality_score', quality_score_ok FROM base
         UNION ALL SELECT 'gopher_flags', gopher_flags_ok FROM base
         UNION ALL SELECT 'lang_id', lang_id_ok FROM base
         UNION ALL SELECT 'normalize_text', normalize_text_ok FROM base
         UNION ALL SELECT 'clean_text', clean_text_ok FROM base
         UNION ALL SELECT 'strip_html', strip_html_ok FROM base
         UNION ALL SELECT 'deflate_size', deflate_size_ok FROM base
         UNION ALL SELECT 'cms_sketch', cms_sketch_ok FROM cmsok
         UNION ALL SELECT 'cms_merge', cms_merge_ok FROM cmsok
         UNION ALL SELECT 'kll_sketch', kll_sketch_ok FROM kllok
         UNION ALL SELECT 'kll_merge', med IS NOT NULL FROM kllok
         UNION ALL SELECT 'kll_quantile', k.med BETWEEN b.min_len AND b.max_len
           FROM kllok k CROSS JOIN base b
         UNION ALL SELECT 'theta_sketch', theta_sketch_ok FROM thok
         UNION ALL SELECT 'theta_merge', abs(t.est_union - b.n_ids) <= 0.05 * b.n_ids
           FROM thok t CROSS JOIN base b
         UNION ALL SELECT 'theta_estimate', est_union > CAST(0.0 AS DOUBLE) FROM thok
         UNION ALL SELECT 'theta_intersect', est_int = CAST(0.0 AS DOUBLE) FROM thp
         UNION ALL SELECT 'theta_a_not_b', est_anb = CAST(0.0 AS DOUBLE) FROM thp
       ) ORDER BY fn"""

  /** Shared dHash near-dup pipeline for the two image queries (the SQL
    * twin is [[imageDHashCte]] — ONE definition per engine so the pair
    * semantics cannot drift between the near-dup and dedup gates).
    * Fixture: every doc a real 36×32 PNG; odd docs repeat the previous
    * even doc's image with the red channel shifted (+2 mod 256). The
    * seed MULTIPLIES position (an additive seed would shift every pixel
    * by a constant, and dHash — brightness-invariant by design — would
    * collide corpus-wide), and the seed/256 term keeps the pattern
    * period above any corpus size (channel values are mod 256, so a
    * single seed residue would cycle into accidental exact duplicates);
    * the corpus is still deliberately near-dup DENSE beyond the planted
    * pairs. Hashes go through the REAL decode path (PNG lossless, the
    * gray/box/compare chain exact-integer); candidates come from
    * SimHash-style 16-bit band pigeonholes; survivors verify
    * bit_count hamming ≤ 10. Output: (id_a, id_b, hamming). */
  /** The doc_id spine feeding every REAL-codec synthetic-media pipeline,
    * spread across the session's full parallelism BEFORE the codec map:
    * the fixture tables are single-row-group parquet files, so their
    * scan is ONE task, and a codec-bound map chain (PNG/JPEG/WAV/AVI
    * encode + decode per row) would otherwise run on one core with the
    * rest idle (guide §2.5 — "one huge unsplittable file: repartition
    * immediately after the read"). Only the 8-byte ids shuffle; the
    * heavy bytes are synthesized and decoded AFTER the spread. The same
    * holds at any scale: media payloads are orders of magnitude larger
    * than their ids, so spreading the id spine first is the
    * shuffle-bytes-minimal layout (guide §2.3/§8). */
  private def docIdSpine(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[Long] = {
    import s.implicits._
    Tables(s, dir).documents.select(col("doc_id"))
      .repartition(s.sparkContext.defaultParallelism).as[Long]
  }

  private def imageDHashPairs(s: SparkSession, dir: String): DataFrame = {
    implicit val sp: SparkSession = s
    import s.implicits._
    val pngs = docIdSpine(s, dir)
      .map { id =>
        val seed = id - id % 2
        val bump = (id % 2) * 2
        def idx(x: Int, y: Int) = (y * 36 + x).toLong
        (id, Multimodal.ImageIoCodec.encodePng(36, 32, (x, y) => (
          ((((seed + 11) * (idx(x, y) + 17) * (idx(x, y) + 29)
             + (seed / 256) * (idx(x, y) + 41) * (idx(x, y) + 53)) % 256 + bump) % 256).toInt,
          (((seed + 23) * (idx(x, y) + 31) * (idx(x, y) + 7)
             + (seed / 256) * (idx(x, y) + 59) * (idx(x, y) + 3)) % 256).toInt,
          (((seed + 5) * (idx(x, y) + 13) * (idx(x, y) + 37)
             + (seed / 256) * (idx(x, y) + 43) * (idx(x, y) + 19)) % 256).toInt)))
      }
    // one codec pass: the hash table feeds the band self-join AND both
    // verify legs — unpersisted, the 5,000-image decode runs per leg
    val hashed = Multimodal.trackPersisted(Multimodal.dHash64(pngs).toDF())
    val bands = hashed.select(col("id"), explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"), col(s"h$b").as("v"))): _*)).as("e"))
      .select(col("id"), col("e.band").as("band"), col("e.v").as("v"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.v") === col("b.v") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    val ha = hashed.toDF("id_a", "a0", "a1", "a2", "a3")
    val hb = hashed.toDF("id_b", "b0", "b1", "b2", "b3")
    cand.join(ha, Seq("id_a")).join(hb, Seq("id_b"))
      .withColumn("hamming", (
        bit_count(col("a0").bitwiseXOR(col("b0"))) +
        bit_count(col("a1").bitwiseXOR(col("b1"))) +
        bit_count(col("a2").bitwiseXOR(col("b2"))) +
        bit_count(col("a3").bitwiseXOR(col("b3")))).cast("long"))
      .filter(col("hamming") <= 10)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  val defs: Map[String, Q] = Map(

    // Exact dedup with a portable key (md5 of normalized text).
    "q_dedup_exact" -> { (s, dir) =>
      Dedup.exactByKey(
        Tables(s, dir).documents, "doc_id",
        TextFunctions.fingerprintPortable(col("text")))
        .orderBy(col("keeper"))
    },

    // Dedup audit: cluster-size histogram (how many groups of k exact
    // copies exist) — the first chart a dedup report shows.
    "q_dedup_clusters" -> { (s, dir) =>
      Dedup.exactByKey(
        Tables(s, dir).documents, "doc_id",
        TextFunctions.fingerprintPortable(col("text")))
        .groupBy(col("n_dups"))
        .agg(count(lit(1)).as("n_clusters"))
        .orderBy(col("n_dups"))
    },

    // Whole-ROW exact dedup: keep the min-id row of each normalized-text
    // group with every column intact (Dedup.exactRows — one min_by
    // hash-aggregate, no window sort). The engine groups on xxhash64 of
    // the normalization; the oracle groups on md5 of the SAME
    // normalization — identical partitions absent a 64-bit collision.
    "q_dedup_exact_rows" -> { (s, dir) =>
      Dedup.exactRows(Tables(s, dir).documents, "doc_id", "text")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    },

    // Policy dedup: group near-identical docs (shared 64-char prefix) and
    // keep the HIGHEST-QUALITY representative (ties → min id) — the
    // "representative value fn" dedup with a real data-curation policy.
    // quality lands on exact quarters, so the oracle replicates it.
    "q_dedup_keep_best" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
        .withColumn("grp", md5(substring(col("text"), 1, 64).cast("binary")))
        .withColumn("quality", TextFunctions.qualityScore(col("text")))
      graft.operators.Combine.topPerKey(
        docs.select(col("grp"), col("doc_id"), col("quality")),
        Seq("grp"), 1, col("quality").desc, col("doc_id"))
        .select(col("doc_id"), col("quality"))
        .orderBy(col("doc_id"))
    },

    // Exact n-gram Jaccard near-dup pairs — the verification baseline the
    // generator's planted near-dups must show up in.
    "q_ngram_jaccard" -> { (s, dir) =>
      Dedup.ngramJaccardPairs(Tables(s, dir).documents, "doc_id", "text",
        shingleK = 3, threshold = 0.8)
        .orderBy(col("id_a"), col("id_b"))
    },

    // MinHash+LSH near-dup pairs, self-asserting form (the engine-seeded
    // hashes themselves can't be oracle-replayed; what CAN be is the
    // statistical contract they must satisfy). Output rows are the
    // DETERMINISTIC exact-Jaccard pairs at >= 0.9 (oracle replays them
    // via shingle strings, same as q_ngram_jaccard), each pinned with
    // lsh_found = TRUE: at j >= 0.9 with 16 bands of 4 the per-pair LSH
    // miss probability is (1 - 0.9^4)^16 ~ 4e-8, so "the blocked plan
    // found every strong pair" is a safe deterministic assertion. est_ok
    // is the per-emitted-pair estimator bound — |est - exact| <= 5
    // binomial sigmas + 1/64 discretization — aggregated over ALL pairs
    // the LSH emitted (not just the strong ones) and pinned TRUE. A
    // broken signature, banding, or verify filter flips one of the
    // booleans; a broken candidate join drops a row.
    "q_dedup_minhash" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val emitted = Dedup.minHashPairs(docs, "doc_id", "text",
        numHashes = 64, shingleK = 3, bands = 16, threshold = 0.6)
      val sh = docs
        .select(col("doc_id"), TextFunctions.shingleHashes(col("text"), 3).as("s"))
        .filter(size(col("s")) > 0)
      val exact = emitted
        .join(sh.select(col("doc_id").as("id_a"), col("s").as("s_a")), Seq("id_a"))
        .join(sh.select(col("doc_id").as("id_b"), col("s").as("s_b")), Seq("id_b"))
        .withColumn("exact_j", Dedup.jaccard(col("s_a"), col("s_b")))
      val estOk = exact.agg(
        coalesce(bool_and(
          abs(col("est_jaccard") - col("exact_j")) <=
            sqrt(col("exact_j") * (lit(1.0) - col("exact_j")) / 64.0) * 5.0
              + lit(1.0 / 64)), lit(true)).as("est_ok"))
      val hi = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleK = 3, threshold = 0.9)
      hi.join(emitted.select(col("id_a"), col("id_b"), lit(true).as("found")),
          Seq("id_a", "id_b"), "left_outer")
        .crossJoin(broadcast(estOk))
        .select(col("id_a"), col("id_b"), col("jac"),
          coalesce(col("found"), lit(false)).as("lsh_found"), col("est_ok"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // SimHash near-dup pairs, self-asserting form. Three independent
    // engine-side checks, all pinned TRUE by the oracle: (1) dist_ok —
    // every emitted pair's distance equals the Hamming distance of
    // signatures RE-DERIVED fresh from the raw text (exercises the
    // expression + join-back end to end) and respects maxDist; (2)
    // rotation_agree_ok — the pigeonhole blocking is complete for ANY
    // 64-bit rotation of the signatures, so a second run blocked on
    // rotated chunks (zero shared bucket keys with the first) must emit
    // the IDENTICAL pair set; (3) blocks_agree_ok — the generalized
    // Manku multi-block blocking (blocks = 6 → C(6,3) = 20 tables on
    // ~32-bit keys) is a THIRD disjoint execution that must also emit
    // the identical pair set. n_docs is the exact oracle companion
    // (documents with at least one token).
    "q_dedup_simhash" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val emitted = Dedup.simHashPairs(docs, "doc_id", "text", maxDist = 3)
      val rotated = Dedup.simHashPairs(docs, "doc_id", "text", maxDist = 3,
        rotation = 13)
      // third cross-check: the generalized Manku blocking (6 blocks →
      // C(6,3) = 20 tables on ~32-bit combination keys — the geometry a
      // 100 TB corpus needs) must emit the identical pair set
      val wide = Dedup.simHashPairs(docs, "doc_id", "text", maxDist = 3,
        blocks = 6)
      val sig = docs
        .filter(size(TextFunctions.tokens(col("text"))) > 0)
        .select(col("doc_id"), Dedup.simHash(col("text")).as("sh"))
      val joined = emitted
        .join(sig.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(sig.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      val consist = joined.agg(
        coalesce(bool_and(
          Dedup.hamming(col("sh_a"), col("sh_b")) === col("dist") &&
            col("dist") <= 3), lit(true)).as("pairs_ok"),
        count(lit(1)).as("n_joined"))
      val nEmitted = emitted.agg(count(lit(1)).as("n_emitted"))
      val agree = emitted.select(col("id_a"), col("id_b"), col("dist").as("d1"))
        .join(rotated.select(col("id_a"), col("id_b"), col("dist").as("d2")),
          Seq("id_a", "id_b"), "full_outer")
        .agg(coalesce(bool_and(
          col("d1").isNotNull && col("d2").isNotNull && col("d1") === col("d2")),
          lit(true)).as("rotation_agree_ok"))
      val agreeWide = emitted.select(col("id_a"), col("id_b"), col("dist").as("d1"))
        .join(wide.select(col("id_a"), col("id_b"), col("dist").as("d3")),
          Seq("id_a", "id_b"), "full_outer")
        .agg(coalesce(bool_and(
          col("d1").isNotNull && col("d3").isNotNull && col("d1") === col("d3")),
          lit(true)).as("blocks_agree_ok"))
      sig.agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(consist))
        .crossJoin(broadcast(nEmitted))
        .crossJoin(broadcast(agree))
        .crossJoin(broadcast(agreeWide))
        .select(col("n_docs"),
          (col("pairs_ok") && col("n_joined") === col("n_emitted")).as("dist_ok"),
          col("rotation_agree_ok"), col("blocks_agree_ok"))
    },

    // End-to-end near-dedup, self-asserting form over the exposed
    // component labels ([[Dedup.nearDupComponents]]). Exact oracle
    // companions: n_docs and n_exact_groups (normalized-text groups of
    // >= 2 tokenized docs). Engine-computed booleans pinned TRUE:
    // keeper_min_ok (every label <= its doc id), canonical_ok (labels
    // are fixed points: label's own label == label, and every label is a
    // real doc id), exact_dedup_ok (each exact-duplicate group collapses
    // to ONE representative — identical normalized text forces identical
    // signatures, an est=1 pair, one component), hi_merge_ok (every
    // exact-Jaccard >= 0.9 pair lands in one component; LSH miss odds
    // ~4e-8 per pair, see q_dedup_minhash). NOTE deliberately absent:
    // "dropped doc has est >= theta to its keeper" — components merge
    // via PATHS, so a dropped doc is only transitively similar to its
    // representative; asserting direct similarity would be wrong.
    "q_dedup_pipeline" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      // no persist: the expensive part (minhash pairs -> CC labels) is
      // localCheckpointed inside nearDupComponents, so each re-read below
      // only replays the cheap docs-to-labels join
      val lab = Dedup.nearDupComponents(docs, "doc_id", "text", threshold = 0.6)
        .select(col("doc_id"), col("label"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val canon = lab
        .join(lab.select(col("doc_id").as("label"), col("label").as("label2")),
          Seq("label"))
        .agg(
          coalesce(bool_and(col("label2") === col("label")), lit(true)).as("fixed_point_ok"),
          coalesce(bool_and(col("label") <= col("doc_id")), lit(true)).as("keeper_min_ok"),
          count(lit(1)).as("n_labeled"))
      val grp = docs
        .filter(size(TextFunctions.tokens(col("text"))) > 0)
        .select(col("doc_id"),
          TextFunctions.fingerprintPortable(col("text")).as("fp"))
        .join(lab, Seq("doc_id"))
        .groupBy(col("fp"))
        .agg(count(lit(1)).as("n"), countDistinct(col("label")).as("nl"))
        .filter(col("n") >= 2)
        .agg(count(lit(1)).as("n_exact_groups"),
          coalesce(bool_and(col("nl") === 1), lit(true)).as("exact_dedup_ok"))
      val hiOk = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          shingleK = 3, threshold = 0.9)
        .join(lab.select(col("doc_id").as("id_a"), col("label").as("l_a")), Seq("id_a"))
        .join(lab.select(col("doc_id").as("id_b"), col("label").as("l_b")), Seq("id_b"))
        .agg(coalesce(bool_and(col("l_a") === col("l_b")), lit(true)).as("hi_merge_ok"))
      nDocs
        .crossJoin(broadcast(canon))
        .crossJoin(broadcast(grp))
        .crossJoin(broadcast(hiOk))
        .select(col("n_docs"), col("n_exact_groups"),
          col("keeper_min_ok"),
          // every doc got a label AND every label is itself labeled
          (col("fixed_point_ok") && col("n_labeled") === col("n_docs")).as("canonical_ok"),
          col("exact_dedup_ok"), col("hi_merge_ok"))
    },

    // Brute-force cosine top-k (exact ANN baseline; double math matches the
    // oracle's bit-for-bit).
    "q_similarity_topk" -> { (s, dir) =>
      val emb = Tables(s, dir).embeddings
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 3)
        .select(col("probe_id"), col("cand_id"), round(col("score"), 4).as("score"))
        .orderBy(col("probe_id"), col("score").desc, col("cand_id"))
    },

    // The vector-math kernels DIRECTLY under the gate (they were only
    // exercised through the similarity gates before): dot / L2 norm /
    // cosine / squared distance / unit normalization against a fixed
    // reference vector, each rounded to the established 4 dp so the
    // float→double widening and sequential summation replay in DuckDB's
    // list kernels.
    "q_vector_ops" -> { (s, dir) =>
      val emb = Tables(s, dir).embeddings
      val ref = emb.filter(col("vec_id") === 0).select(col("embedding").as("ref"))
      emb.filter(col("vec_id") < 50).crossJoin(broadcast(ref))
        .select(col("vec_id"),
          round(VectorFunctions.dot(col("embedding"), col("ref")), 4).as("dot_ref"),
          round(VectorFunctions.norm(col("embedding")), 4).as("l2"),
          round(VectorFunctions.cosine(col("embedding"), col("ref")), 4).as("cos_ref"),
          round(VectorFunctions.sqDist(col("embedding"), col("ref")), 4).as("sqdist_ref"),
          round(VectorFunctions.norm(
            VectorFunctions.normalized(col("embedding"))), 4).as("unit_norm"))
        .orderBy(col("vec_id"))
    },

    // SRP/LSH-bucketed ANN (the scale path). The seeded hyperplanes are
    // deterministic Scala values, so the oracle replicates the exact same
    // blocking with the plane vectors inlined as SQL literals.
    "q_similarity_srp" -> { (s, dir) =>
      val emb = Tables(s, dir).embeddings
      Similarity.srpTopK(emb, emb.filter(col("vec_id") < 20), k = 3,
        nPlanes = 4, dim = 64)
        .select(col("probe_id"), col("cand_id"), round(col("score"), 4).as("score"))
        .orderBy(col("probe_id"), col("score").desc, col("cand_id"))
    },

    // Multi-probe SRP (Lv et al. 2007): same single table as
    // q_similarity_srp, but each probe also searches the nProbes=2
    // buckets across its lowest-|margin| hyperplanes. The margin sort,
    // XOR bucket perturbation, candidate dedup, and scoring all replay
    // in SQL with the plane literals inlined.
    "q_similarity_multiprobe" -> { (s, dir) =>
      val emb = Tables(s, dir).embeddings
      Similarity.srpTopKMultiProbe(emb, emb.filter(col("vec_id") < 20), k = 3,
        nPlanes = 4, dim = 64, nProbes = 2)
        .select(col("probe_id"), col("cand_id"), round(col("score"), 4).as("score"))
        .orderBy(col("probe_id"), col("score").desc, col("cand_id"))
    },

    // Cluster-balanced diversity sample: assign every embedding to its
    // nearest deterministic centroid, keep n per cluster by md5 order —
    // the "subsample without collapsing onto the dominant mode" curation
    // op. Composes the proven IVF-argmin and hash-sample oracles.
    "q_cluster_sample" -> { (s, dir) =>
      val emb = Tables(s, dir).embeddings
      val assigned = Similarity.ivfAssign(emb, nCentroids = 8)
        .select(col("vec_id"), col("centroid_id"))
      graft.operators.Combine.samplePerKeyByHash(assigned,
          Seq("centroid_id"), 5, Seq("centroid_id", "vec_id"))
        .orderBy(col("centroid_id"), col("vec_id"))
    },

    // Hard-negative mining (contrastive-training data prep): per probe,
    // the most-similar candidates that live in a DIFFERENT cluster —
    // near in embedding space, different by the cluster proxy — exactly
    // the negatives a bi-encoder trains against. Brute-force truth +
    // argmin clusters + anti-cluster filter, all under one oracle.
    "q_hard_negatives" -> { (s, dir) =>
      val emb = Tables(s, dir).embeddings
      val assigned = Similarity.ivfAssign(emb, nCentroids = 8)
        .select(col("vec_id"), col("centroid_id"))
      val probes = emb.filter(col("vec_id") < 10)
      val topk = Similarity.bruteForceTopK(emb, probes, k = 10)
      val negs = topk
        .join(assigned.toDF("probe_id", "p_cluster"), Seq("probe_id"))
        .join(assigned.toDF("cand_id", "neg_cluster"), Seq("cand_id"))
        .filter(col("p_cluster") =!= col("neg_cluster"))
      graft.operators.Combine.topPerKey(
          negs.select(col("probe_id"), col("cand_id"), col("neg_cluster"),
            col("score")),
          Seq("probe_id"), 3, col("score").desc, col("cand_id"))
        .select(col("probe_id"), col("cand_id"), col("neg_cluster"),
          round(col("score"), 4).as("score"))
        .orderBy(col("probe_id"), col("score").desc, col("cand_id"))
    },

    // ANN recall audit: srpTopK vs the exact brute-force baseline, per
    // probe — the "is my index any good" loop. Both inputs deterministic,
    // so the whole report (including the SRP side's misses) replays in
    // SQL and oracle-checks exactly.
    "q_similarity_recall" -> { (s, dir) =>
      val emb = Tables(s, dir).embeddings
      val probes = emb.filter(col("vec_id") < 20)
      val ann = Similarity.srpTopK(emb, probes, k = 3, nPlanes = 4, dim = 64)
      val exact = Similarity.bruteForceTopK(emb, probes, k = 3)
      Similarity.recallReport(ann, exact)
        .orderBy(col("probe_id"))
    },

    // IVF ANN: deterministic centroids (first 8 by id), nProbe=2. The
    // whole index build + probe is replicated in SQL — assignment argmin,
    // probe-centroid selection, and in-list cosine scoring all use the
    // same deterministic double arithmetic.
    "q_similarity_ivf" -> { (s, dir) =>
      val emb = Tables(s, dir).embeddings
      val assigned = Similarity.ivfAssign(emb, nCentroids = 8)
      val cents = emb.orderBy(col("vec_id")).limit(8)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cent_emb"))
      Similarity.ivfTopK(assigned, cents, emb.filter(col("vec_id") < 10), k = 3, nProbe = 2)
        .select(col("probe_id"), col("cand_id"), round(col("score"), 4).as("score"))
        .orderBy(col("probe_id"), col("score").desc, col("cand_id"))
    },

    // IVF with TRAINED centroids (Lloyd's k-means, deterministic init),
    // self-asserting form: iterative float training isn't SQL-replicable,
    // but its invariants are. Output = one row per trained centroid
    // (centroid ids are the k smallest vec_ids — kMeans preserves them —
    // so the ROW SET is exact-oracle). Booleans pinned TRUE: assign_ok
    // (every member of the centroid's list is at its argmin-distance
    // centroid — recomputed against the full centroid table), and
    // cost_ok (Lloyd's is monotone: the trained clustering's total
    // squared distance <= the deterministic-init clustering's, the
    // property that distinguishes "trained" from "shuffled"). NOTE: we
    // deliberately do NOT assert "centroid == mean of its final cluster"
    // — Lloyd's only guarantees that against the PENULTIMATE assignment;
    // at finite iters the final reassignment may differ.
    "q_similarity_ivf_trained" -> { (s, dir) =>
      val emb = Tables(s, dir).embeddings
      val cents = Similarity.kMeans(emb, k = 8, iters = 3)
      val assigned = Similarity.assignToCentroids(emb, cents)
      val scored = emb.crossJoin(broadcast(cents))
        .select(col("vec_id"),
          VectorFunctions.sqDist(col("embedding"), col("cent_emb")).as("d"))
      val minD = scored.groupBy(col("vec_id")).agg(min(col("d")).as("d_min"))
      val dAssigned = assigned.join(broadcast(cents), Seq("centroid_id"))
        .select(col("vec_id"), col("centroid_id"),
          VectorFunctions.sqDist(col("embedding"), col("cent_emb")).as("d_a"))
      val perCent = dAssigned.join(minD, Seq("vec_id"))
        .groupBy(col("centroid_id"))
        .agg(bool_and(col("d_a") <= col("d_min") + 1e-9).as("assign_ok_raw"))
      val costT = minD.agg(sum(col("d_min")).as("cost_trained"))
      val init = emb.orderBy(col("vec_id")).limit(8)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cent_emb"))
      val costI = emb.crossJoin(broadcast(init))
        .select(col("vec_id"),
          VectorFunctions.sqDist(col("embedding"), col("cent_emb")).as("d"))
        .groupBy(col("vec_id")).agg(min(col("d")).as("d0"))
        .agg(sum(col("d0")).as("cost_init"))
      val costOk = costT.crossJoin(broadcast(costI))
        .select((col("cost_trained") <= col("cost_init") * 1.000001 + 1e-6)
          .as("cost_ok"))
      cents.select(col("centroid_id"))
        .join(perCent, Seq("centroid_id"), "left_outer")
        .crossJoin(broadcast(costOk))
        .select(col("centroid_id"),
          coalesce(col("assign_ok_raw"), lit(true)).as("assign_ok"), col("cost_ok"))
        .orderBy(col("centroid_id"))
    },

    // Product quantization (train → encode → ADC top-k), self-asserting
    // form. Iterative per-subspace k-means isn't SQL-replicable; its
    // invariants are. Output = one row per probe (probe ids exact-oracle)
    // with n_vecs the exact corpus-count companion. Booleans pinned TRUE:
    // encode_ok (every code in every encoded vector is at argmin distance
    // to its sub-vector — re-derived by exploding raw embeddings against
    // the full codebook, independent of the encode path), adc_ok (each
    // emitted pair's zip_with/aggregate table-lookup distance equals the
    // sum of per-subspace distances recomputed through explode-joins —
    // proves the lookup indexing end to end), cost_ok (per-subspace Lloyd
    // monotonicity: trained quantization cost <= deterministic-init cost
    // in EVERY subspace).
    // Scalar quantization (SQ8) ANN — the FAISS rung between brute force
    // and PQ: per-dimension exact min/max bounds (deterministic, unlike
    // PQ's seeded k-means), byte codes, asymmetric probe distance over
    // dequantized bin centers. That determinism buys the quantization
    // family its only FULL value oracle: bounds, codes, dequantization,
    // and the p·p − 2·p·x̂ + x̂·x̂ decomposition all replay in SQL
    // exactly (sequential inner products, the established parity form).
    "q_similarity_sq8" -> { (s, dir) =>
      val emb = Tables(s, dir).embeddings
      val bounds = Similarity.sqTrain(emb)
      val enc = Similarity.sqEncode(emb, bounds)
      val probes = emb.filter(col("vec_id") < 10)
      Similarity.sqTopK(enc, probes, k = 5)
        .select(col("probe_id"), col("cand_id"), round(col("adist"), 6).as("adist"))
        .orderBy(col("probe_id"), col("cand_id"))
    },

    "q_similarity_pq" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val m = 4; val ksub = 16; val dim = 64; val len = dim / m
      val emb = Tables(s, dir).embeddings
      val cb = Similarity.pqTrain(emb, m, ksub, dim, iters = 2)
      val enc = Similarity.pqEncode(emb, cb, m, dim)
      val probes = emb.filter(col("vec_id") < 5)
      val top = Similarity.pqTopK(enc, cb, probes, k = 3, m = m, dim = dim)
      // independent sub-vector re-derivation (slice, not the library path)
      def subs(df: DataFrame, id: String): DataFrame = df.select(col(id),
          posexplode(array((0 until m).map(i =>
            slice(col("embedding").cast("array<double>"), i * len + 1, len)): _*)))
        .select(col(id), col("pos").as("sub_id"), col("col").as("sub_emb"))
      val vSubs = subs(emb, "vec_id")
      val dMin = vSubs.join(broadcast(cb), Seq("sub_id"))
        .withColumn("d", VectorFunctions.sqDist(col("sub_emb"), col("code_emb")))
        .groupBy(col("vec_id"), col("sub_id")).agg(min(col("d")).as("d_min"))
      val encExp = enc.select(col("vec_id"), posexplode(col("codes")))
        .select(col("vec_id"), col("pos").as("sub_id"), col("col").as("code_id"))
      val encodeOk = encExp.join(vSubs, Seq("vec_id", "sub_id"))
        .join(broadcast(cb), Seq("sub_id", "code_id"))
        .withColumn("d_a", VectorFunctions.sqDist(col("sub_emb"), col("code_emb")))
        .join(dMin, Seq("vec_id", "sub_id"))
        .agg(coalesce(bool_and(col("d_a") <= col("d_min") + 1e-9), lit(true))
          .as("encode_ok"))
      val pSubs = subs(
        probes.select(col("vec_id").as("probe_id"), col("embedding")), "probe_id")
      val adcOk = top
        .join(encExp.select(col("vec_id").as("cand_id"), col("sub_id"),
          col("code_id")), Seq("cand_id"))
        .join(pSubs, Seq("probe_id", "sub_id"))
        .join(broadcast(cb), Seq("sub_id", "code_id"))
        .withColumn("dd", VectorFunctions.sqDist(col("sub_emb"), col("code_emb")))
        .groupBy(col("probe_id"), col("cand_id"), col("adc_dist"))
        .agg(sum(col("dd")).as("direct_dist"))
        .agg(coalesce(bool_and(
          abs(col("adc_dist") - col("direct_dist")) <= lit(1e-9)), lit(true))
          .as("adc_ok"))
      // per-subspace Lloyd monotonicity vs the deterministic init codebook
      val initIds = emb.orderBy(col("vec_id")).limit(ksub)
        .select(col("vec_id"), (row_number().over(
          Window.partitionBy(lit(0)).orderBy(col("vec_id"))) - 1).as("code_id"))
      val cb0 = vSubs.join(broadcast(initIds), Seq("vec_id"))
        .select(col("sub_id"), col("code_id"), col("sub_emb").as("code_emb"))
      val cost0 = vSubs.join(broadcast(cb0), Seq("sub_id"))
        .withColumn("d", VectorFunctions.sqDist(col("sub_emb"), col("code_emb")))
        .groupBy(col("vec_id"), col("sub_id")).agg(min(col("d")).as("d0"))
        .groupBy(col("sub_id")).agg(sum(col("d0")).as("c0"))
      val costOk = dMin.groupBy(col("sub_id")).agg(sum(col("d_min")).as("ct"))
        .join(cost0, Seq("sub_id"))
        .agg(coalesce(bool_and(col("ct") <= col("c0") * 1.000001 + 1e-6),
          lit(true)).as("cost_ok"))
      probes.select(col("vec_id").as("probe_id"))
        .crossJoin(broadcast(emb.agg(count(lit(1)).as("n_vecs"))))
        .crossJoin(broadcast(encodeOk))
        .crossJoin(broadcast(adcOk))
        .crossJoin(broadcast(costOk))
        .orderBy(col("probe_id"))
    },

    // IVF+PQ composition (the FAISS IVFPQ shape), self-asserting form.
    // Output = one row per probe (ids exact-oracle) with the exact corpus
    // count companion. Booleans pinned TRUE:
    //   full_eq_ok    — ivfPqTopK probing ALL centroids equals plain pqTopK
    //                   pair-for-pair with identical ADC distances (the
    //                   composition adds pruning, never changes arithmetic);
    //   pruned_dist_ok — every pruned-probe pair's adc_dist equals the
    //                   per-subspace distance sum recomputed through
    //                   independent explode-joins (no zip_with lookup);
    //   pruned_block_ok — every pruned-probe candidate's centroid is one of
    //                   the probe's nProbe nearest centroids, re-ranked
    //                   independently (proves the inverted-list pruning
    //                   selects exactly the promised lists).
    "q_similarity_ivfpq" -> { (s, dir) =>
      val m = 4; val ksub = 16; val dim = 64; val len = dim / m
      val kc = 8; val nProbe = 2
      val emb = Tables(s, dir).embeddings
      val cb = Similarity.pqTrain(emb, m, ksub, dim, iters = 2)
      val enc = Similarity.pqEncode(emb, cb, m, dim)
      val cents = Similarity.kMeans(emb, k = kc, iters = 2)
      val assigned = Similarity.assignToCentroids(emb, cents)
        .select(col("vec_id"), col("centroid_id"))
      val probes = emb.filter(col("vec_id") < 5)
      val plain = Similarity.pqTopK(enc, cb, probes, k = 3, m = m, dim = dim)
      val full = Similarity.ivfPqTopK(assigned, enc, cents, cb, probes,
        k = 3, m = m, dim = dim, nProbe = kc)
      val pruned = Similarity.ivfPqTopK(assigned, enc, cents, cb, probes,
        k = 3, m = m, dim = dim, nProbe = nProbe)
      val fullEqOk = plain.select(col("probe_id"), col("cand_id"),
          col("adc_dist").as("d_plain"))
        .join(full.select(col("probe_id"), col("cand_id"),
          col("adc_dist").as("d_full")), Seq("probe_id", "cand_id"), "full_outer")
        .agg(coalesce(bool_and(col("d_plain").isNotNull &&
          col("d_full").isNotNull &&
          abs(col("d_plain") - col("d_full")) <= lit(1e-9)), lit(true))
          .as("full_eq_ok"))
      // independent per-subspace re-derivation of the pruned distances
      val pSubs = probes
        .select(col("vec_id").as("probe_id"), posexplode(array((0 until m).map(i =>
          slice(col("embedding").cast("array<double>"), i * len + 1, len)): _*)))
        .select(col("probe_id"), col("pos").as("sub_id"), col("col").as("sub_emb"))
      val encExp = enc.select(col("vec_id").as("cand_id"), posexplode(col("codes")))
        .select(col("cand_id"), col("pos").as("sub_id"), col("col").as("code_id"))
      val prunedDistOk = pruned
        .join(encExp, Seq("cand_id"))
        .join(pSubs, Seq("probe_id", "sub_id"))
        .join(broadcast(cb), Seq("sub_id", "code_id"))
        .withColumn("dd", VectorFunctions.sqDist(col("sub_emb"), col("code_emb")))
        .groupBy(col("probe_id"), col("cand_id"), col("adc_dist"))
        .agg(sum(col("dd")).as("direct_dist"))
        .agg(coalesce(bool_and(
          abs(col("adc_dist") - col("direct_dist")) <= lit(1e-9)), lit(true))
          .as("pruned_dist_ok"))
      // independent re-rank of each probe's nProbe nearest centroids
      val probeCents = graft.operators.Combine.topPerKey(
        probes.select(col("vec_id").as("probe_id"), col("embedding"))
          .crossJoin(broadcast(cents))
          .withColumn("d", VectorFunctions.sqDist(col("embedding"), col("cent_emb")))
          .select(col("probe_id"), col("centroid_id"), col("d")),
        Seq("probe_id"), nProbe, col("d").asc, col("centroid_id"))
        .select(col("probe_id"), col("centroid_id"), lit(true).as("in_block"))
      val prunedBlockOk = pruned
        .join(assigned.select(col("vec_id").as("cand_id"), col("centroid_id")),
          Seq("cand_id"))
        .join(probeCents, Seq("probe_id", "centroid_id"), "left_outer")
        .agg(coalesce(bool_and(col("in_block")), lit(true)).as("pruned_block_ok"))
      probes.select(col("vec_id").as("probe_id"))
        .crossJoin(broadcast(emb.agg(count(lit(1)).as("n_vecs"))))
        .crossJoin(broadcast(fullEqOk))
        .crossJoin(broadcast(prunedDistOk))
        .crossJoin(broadcast(prunedBlockOk))
        .orderBy(col("probe_id"))
    },

    // Embedding-cosine near-dup pairs, SRP-blocked (the scale path: equi-
    // join on (table, bucket), no cartesian). Oracle replicates the
    // blocking, so the check stays exact; recall vs the all-pairs truth is
    // SimilaritySpec's concern.
    "q_embedding_neardup" -> { (s, dir) =>
      Similarity.cosinePairsBlocked(Tables(s, dir).embeddings, threshold = 0.4,
        nPlanes = 4, nTables = 4, dim = 64)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Text stats per stored language tag: counts + exact integer-sum
    // averages of chars and whitespace tokens.
    "q_text_stats" -> { (s, dir) =>
      Tables(s, dir).documents
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n"),
          (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
          (sum(TextFunctions.tokenCount(col("text")).cast("long")).cast("double") /
            count(lit(1))).as("avg_tokens"))
        .orderBy(col("lang"))
    },

    // Language-ID heuristic distribution (oracle replicates the argmax).
    "q_lang_id" -> { (s, dir) =>
      Tables(s, dir).documents
        .select(TextFunctions.langId(col("text")).as("detected"))
        .groupBy(col("detected")).agg(count(lit(1)).as("n"))
        .orderBy(col("detected"))
    },

    // The pure-SQL surface under the gate: the same native kernels, but
    // invoked through spark.sql over the SQL-registered names
    // (GraftExtensions) instead of the Column API — proving the SQL
    // registration path end-to-end in the driver's oracle, not just in
    // specs. Same replay semantics as q_lang_id + q_token_counts.
    "q_sql_surface" -> { (s, dir) =>
      graft.GraftExtensions.register(s)
      Tables(s, dir).documents.createOrReplaceTempView("graft_docs_sql")
      s.sql("""SELECT lang_id(text) AS detected,
                 COUNT(*) AS n,
                 SUM(size(ngram_strings(text, 1))) AS total_tokens
               FROM graft_docs_sql GROUP BY lang_id(text) ORDER BY detected""")
    },

    // EVERY SQL-registered native exercised through pure spark.sql
    // (VERDICT r10 task 8): one (fn, ok) row per GraftExtensions entry,
    // each ok a self-asserting invariant of that function recomputed
    // inside the query (identity/idempotence, size laws, range bounds,
    // sketch-vs-exact agreement). The oracle pins one TRUE row per
    // REGISTERED name — generated from GraftExtensions.functions itself,
    // so a newly registered native that is not added here fails the
    // row-count compare instead of silently drifting out of coverage
    // (EntryContractSpec additionally asserts each name is invoked).
    "q_sql_surface_audit" -> { (s, dir) =>
      graft.GraftExtensions.register(s)
      Tables(s, dir).documents.createOrReplaceTempView("graft_docs_sql")
      s.sql(sqlSurfaceAuditSql)
    },

    // Per-document token/shingle accounting.
    "q_token_counts" -> { (s, dir) =>
      Tables(s, dir).documents.select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_ws_tokens"),
        length(col("text")).as("n_chars_actual"),
        size(TextFunctions.shingleHashes(col("text"), 3)).as("n_shingles"))
        .orderBy(col("doc_id"))
    },

    // C4-style boilerplate removal over 10-token segments (the fixture has
    // no natural lines): segments recurring in >= 2 docs — the planted
    // near-dups' shared prefixes — are dropped, docs reassembled in order.
    // Output is (len, md5) of the cleaned text so the compare stays compact.
    "q_boilerplate" -> { (s, dir) =>
      val chunked = Tables(s, dir).documents
        .select(col("doc_id"), Boilerplate.chunkTokens(col("text"), 10).as("text"))
      Boilerplate.removeFrequentSegments(chunked, "doc_id", "text", "\n", 2)
        .select(col("doc_id"), length(col("text")).as("clean_len"),
          md5(col("text").cast("binary")).as("clean_md5"))
        .orderBy(col("doc_id"))
    },

    // The audit view: which segments got flagged, in how many docs.
    "q_boilerplate_segments" -> { (s, dir) =>
      val chunked = Tables(s, dir).documents
        .select(col("doc_id"), Boilerplate.chunkTokens(col("text"), 10).as("text"))
      Boilerplate.frequentSegments(chunked, "doc_id", "text", "\n", 2)
        .orderBy(col("segment"))
    },

    // PII redaction: the fixture has no PII, so each doc gets a synthetic
    // email/IP/phone suffix built from its id; the scrub must remove
    // exactly those. Output is md5 + removed-char count per doc.
    "q_pii_scrub" -> { (s, dir) =>
      val pii = Tables(s, dir).documents.select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@mail.example from 10.0."),
          (col("doc_id") % 256), lit(".7 or call +1 555 01"),
          lpad((col("doc_id") % 100).cast("string"), 2, "0")).as("pii_text"))
      pii.select(col("doc_id"),
        md5(TextFunctions.scrubPii(col("pii_text")).cast("binary")).as("scrubbed_md5"),
        (length(col("pii_text")) - length(TextFunctions.scrubPii(col("pii_text"))))
          .as("removed_chars"))
        .orderBy(col("doc_id"))
    },

    // Deterministic 80/10/10 train/val/test split: membership is a pure
    // function of doc_id (portable md5 bucket), replicated by the oracle.
    "q_hash_split" -> { (s, dir) =>
      val parts = graft.operators.Combine.hashSplit(
        Tables(s, dir).documents, "doc_id", Seq(0.8, 0.1, 0.1))
      parts.zipWithIndex.map { case (p, i) =>
        p.select(lit(i).as("split"), col("doc_id"))
      }.reduce(_ union _)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy(col("split"))
    },

    // Deterministic weighted sampling: 200 docs ∝ length via
    // hash-derandomized A-Res reservoir keys — the oracle recomputes
    // the exact same exponential keys and takes the same bottom-k, so
    // the SAMPLE MEMBERSHIP itself is oracle-checked, not just its
    // size (the derandomization is what makes that possible; an RNG
    // reservoir could only be rows-counted).
    "q_weighted_sample" -> { (s, dir) =>
      graft.operators.Combine.weightedSampleByHash(
        Tables(s, dir).documents, "doc_id", col("n_chars"), k = 200)
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))
    },

    // Per-key weighted sampling: 5 exemplar docs per source, length-
    // weighted, same derandomized A-Res keys — membership replayed
    // exactly per key by the oracle's windowed rank.
    "q_weighted_sample_perkey" -> { (s, dir) =>
      graft.operators.Combine.weightedSamplePerKeyByHash(
        Tables(s, dir).documents, Seq("source"), "doc_id", col("n_chars"), k = 5)
        .select(col("source"), col("doc_id"), col("n_chars"))
        .orderBy(col("source"), col("doc_id"))
    },

    // Leakage-safe split: near-dup CLUSTERS (normalized-text groups, the
    // q_dedup_clusters fingerprint) are the split unit, so soft copies of
    // a training document can never land in the eval split. Assignment
    // hashes each cluster's min doc id through the q_hash_split bucket
    // scheme — fully replayable; the no_leakage boolean is recomputed
    // from the OUTPUT assignment (max splits-per-cluster == 1), pinned
    // TRUE by the oracle.
    "q_split_leakage_safe" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
        .withColumn("fp",
          TextFunctions.fingerprintPortable(col("text")))
      val assigned =
        graft.operators.Combine.splitByGroup(docs, "doc_id", "fp", Seq(0.8, 0.1, 0.1))
      val leak = assigned.groupBy(col("fp"))
        .agg(countDistinct(col("split")).as("ns"))
        .agg(max(col("ns")).as("mx"))
      assigned.groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), countDistinct(col("fp")).as("n_clusters"))
        .crossJoin(broadcast(leak))
        .withColumn("no_leakage", col("mx") === 1).drop("mx")
        .orderBy(col("split"))
    },

    // Benchmark-contamination checks: probes are spans of the first three
    // documents (an eval set stand-in, derived lazily — no collect).
    // Exact-substring form: verbatim containment.
    "q_contamination_exact" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val probes = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("probe_id"), substring(col("text"), 1, 40).as("ptext"))
      Contamination.exactOverlap(docs, "doc_id", "text", probes, "probe_id", "ptext")
        .orderBy(col("probe_id"), col("doc_id"))
    },

    // N-gram form (GPT-3 style; n=5 here so the fixture's planted shared
    // prefixes surface as cross-document hits). Pairs come from a 64-bit
    // shingle-hash join; the oracle joins the same n-gram STRINGS, so the
    // check is exact barring a 64-bit collision.
    "q_contamination_ngram" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val probes = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("probe_id"), substring(col("text"), 1, 120).as("ptext"))
      Contamination.ngramOverlap(docs, "doc_id", "text", probes, "probe_id", "ptext", n = 5)
        .orderBy(col("probe_id"), col("doc_id"))
    },

    // Decontamination APPLY step: spans matching any probe 5-gram are
    // scrubbed from every document (no canonical keeper — eval text must
    // not survive anywhere); text rebuilt from kept tokens. Probe fixture
    // matches q_contamination_ngram's.
    "q_decontam_scrub" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val probes = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("probe_id"),
          substring(col("text"), 1, 120).as("ptext"))
      Contamination.scrubOverlaps(docs, "doc_id", "text",
          probes, "probe_id", "ptext", n = 5)
        .orderBy(col("doc_id"))
    },

    // The STREAM-SAFE scrub (collected probe set + one native projection,
    // no shuffle/state) run on the batch frame — must hash-match the same
    // oracle as the relational q_decontam_scrub: two implementations, one
    // contract. The streaming leg itself is proven in StreamingSpec.
    "q_decontam_stream" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val probes = docs.filter(col("doc_id") < 3)
        .select(substring(col("text"), 1, 120).as("ptext"))
      Contamination.scrubOverlapsStreaming(docs, "doc_id", "text",
          probes, "ptext", n = 5)
        .orderBy(col("doc_id"))
    },

    // Unigram log-perplexity against the corpus's own LM — the CCNet-style
    // quality signal, rounded so engine sum-order ulps can't drift the hash.
    "q_perplexity" -> { (s, dir) =>
      TextRelevance.unigramLogPerplexity(Tables(s, dir).documents, "doc_id", "text")
        .select(col("doc_id"), round(col("log_ppl"), 4).as("log_ppl"))
        .orderBy(col("doc_id"))
    },

    // Cross-corpus LM quality scoring (CCNet shape): bigram model trained
    // on even doc_ids scores the odd ones. λ=0.75 so 1−λ is exactly
    // representable and the oracle interpolates with identical weights.
    "q_bigram_ppl" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val ref = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      val tgt = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
      TextRelevance.bigramLogPerplexity(ref, tgt, "doc_id", "text", lambda = 0.75)
        .select(col("doc_id"), round(col("log_ppl"), 4).as("log_ppl"))
        .orderBy(col("doc_id"))
    },

    // Distinct-1/2/3 diversity ratios per source slice — low ratios
    // flag templated/looping corpora at the slice level.
    "q_distinct_n" -> { (s, dir) =>
      Repetition.distinctNgramRatios(Tables(s, dir).documents,
          col("source"), col("text"))
        .withColumnRenamed("group", "source")
        .orderBy(col("source"), col("n"))
    },

    // Per-document 5-gram novelty of the odd-id shard against the
    // even-id reference corpus — the acquisition-value inverse of
    // contamination; md5 gram identity, never gram-text shuffles.
    "q_ngram_novelty" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      Contamination.noveltyReport(
          docs.filter(pmod(col("doc_id"), lit(2)) === 1), "doc_id", "text",
          docs.filter(pmod(col("doc_id"), lit(2)) === 0), "text", n = 5)
        .orderBy(col("doc_id"))
    },

    // Pairwise Jensen-Shannon divergence between per-source token
    // distributions — the symmetric, smoothing-free corpus-drift matrix
    // next to q_psi_drift; rounded-then-DECIMAL term sums.
    "q_js_divergence" -> { (s, dir) =>
      graft.llm.Divergence.jsDivergenceMatrix(Tables(s, dir).documents,
          col("source"), col("text"))
        .orderBy(col("group_a"), col("group_b"))
    },

    // Kneser-Ney smoothed bigram table (D = 0.75, observed bigrams with
    // count >= 5): every input is an exact integer count, P(w|v) is one
    // IEEE tree — full oracle parity with no rounding device.
    "q_kneser_ney" -> { (s, dir) =>
      TextRelevance.kneserNeyBigram(Tables(s, dir).documents,
          "doc_id", "text", discount = 0.75, minCount = 5L)
        .orderBy(col("v"), col("w"))
    },

    // Zipf's-law fit over the top-100 word frequencies — the corpus
    // health one-liner (natural text ~ slope -1; templated/duplicated
    // corpora flatten). ln terms round to 9 dp then sum as DECIMAL.
    "q_zipf" -> { (s, dir) =>
      TextRelevance.zipfFit(Tables(s, dir).documents, "doc_id", "text",
        topK = 100)
    },

    // Corpus-statistics relevance: top-3 TF-IDF terms per document.
    // Ranking uses the ROUNDED weight (ties broken by term) so the oracle
    // ranks identically — raw doubles can differ by an ulp across engines.
    "q_tfidf" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = TextRelevance.tfIdf(Tables(s, dir).documents, "doc_id", "text")
        .withColumn("tfidf", round(col("tfidf"), 4))
      val rn = row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term")))
      w.withColumn("rn", rn).filter(col("rn") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("tfidf"))
        .orderBy(col("doc_id"), col("term"))
    },

    // Positional inverted index over the documents table, stopword-capped
    // at df <= 80% of the corpus (the scale-consistent skew guard a
    // 100 TB index needs for corpus-wide terms); postings carry doc_freq,
    // tf, and sorted 1-based positions.
    "q_inverted_index" -> { (s, dir) =>
      // positions leave the gate as a comma-joined string: the driver's
      // pandas hash cannot sort/hash list columns (output contract:
      // scalar columns only — see EntryContractSpec).
      TextRelevance.invertedIndex(Tables(s, dir).documents,
          "doc_id", "text", maxDfFrac = 0.8)
        .withColumn("positions", array_join(col("positions"), ","))
        .orderBy(col("term"), col("doc_id"))
    },

    // Positional phrase search: exact token-sequence match via per-term
    // posting frames — the phrase-term filter runs BEFORE the shuffle,
    // so only phrase-term occurrences leave the scan.
    "q_phrase_search" -> { (s, dir) =>
      TextRelevance.phraseSearch(Tables(s, dir).documents,
          "doc_id", "text", Seq("value", "table"))
        .orderBy(col("doc_id"))
    },

    // BM25 query scoring over the corpus (k1=1.2, b=0.75).
    "q_bm25" -> { (s, dir) =>
      TextRelevance.bm25(Tables(s, dir).documents, "doc_id", "text",
        Seq("query", "stream", "vector"))
        .select(col("doc_id"), round(col("score"), 4).as("score"), col("n_matched"))
        .orderBy(col("doc_id"))
    },

    // Hybrid retrieval via reciprocal rank fusion (the Elastic/vector-DB
    // hybrid-search standard): the BM25 lexical leg and the cosine
    // vector leg each rank their candidates, fused as
    // Σ 1/(60 + rank) over the union. Ranks come from the range-
    // partitioned prefix sum (never a single-partition window); scores
    // are 9-dp-quantized before ranking so near-ties rank identically
    // cross-engine; exact ties break on doc_id. FULL oracle: both legs
    // and the fusion arithmetic replay in SQL.
    "q_hybrid_rrf" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val lex0 = TextRelevance.bm25(docs, "doc_id", "text",
          Seq("query", "stream", "vector"))
        .select(col("doc_id"), round(col("score"), 9).as("s"))
      val lex = graft.operators.Combine.prefixRank(lex0,
          Seq(col("s").desc, col("doc_id").asc), "lex_rank")
        .select(col("doc_id"), col("lex_rank"))
      val emb = Tables(s, dir).embeddings
      val probe = emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>").as("pv"))
      val vec0 = emb.filter(col("vec_id") > 0 && col("vec_id") < 500)
        .crossJoin(broadcast(probe))
        .select(col("vec_id").as("doc_id"),
          round(VectorFunctions.cosine(col("embedding"), col("pv")), 9).as("c"))
      val vec = graft.operators.Combine.prefixRank(vec0,
          Seq(col("c").desc, col("doc_id").asc), "vec_rank")
        .select(col("doc_id"), col("vec_rank"))
      lex.join(vec, Seq("doc_id"), "full_outer")
        .withColumn("rrf", round(
          coalesce(lit(1.0) / (lit(60.0) + col("lex_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60.0) + col("vec_rank")), lit(0.0)), 6))
        .orderBy(desc("rrf"), col("doc_id"))
        .limit(20)
        .select(col("doc_id"), col("lex_rank"), col("vec_rank"), col("rrf"))
        .orderBy(col("doc_id"))
    },

    // Quality scoring + BPE-ish token estimate + portable (md5) fingerprint
    // — every component replicable in the oracle's SQL.
    "q_quality_scores" -> { (s, dir) =>
      Tables(s, dir).documents.select(
        col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("quality"),
        TextFunctions.approxBpeTokenCount(col("text")).as("bpe_tokens"),
        TextFunctions.fingerprintPortable(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    },

    // REAL image decode end-to-end: synthesize genuine binary PPM (P6)
    // payloads from a deterministic pixel function, parse them with the
    // dependency-free PpmCodec, reduce to exact per-channel means. The
    // oracle replays the pixel arithmetic without touching bytes — the
    // decode path is the thing under test.
    "q_multimodal_ppm" -> { (s, dir) =>
      implicit val sp: SparkSession = s
      import s.implicits._
      val imgs = docIdSpine(s, dir)
        .map { id =>
          (id, Multimodal.PpmCodec.encode(8, 6, (x, y) => {
            val p = y * 8 + x
            (((id * 31 + p * 7) % 256).toInt,
             ((id * 17 + p * 5) % 256).toInt,
             ((id * 13 + p * 3) % 256).toInt)
          }))
        }
      Multimodal.decodeImageStats(imgs)
        .select(col("id").as("doc_id"), col("width"), col("height"),
          col("mean_r"), col("mean_g"), col("mean_b"))
        .orderBy(col("doc_id"))
    },

    // REAL compressed-codec decode, lossless leg: synthesize genuine PNG
    // payloads from a deterministic pixel function via the in-JDK
    // javax.imageio, decode them back partition-parallel, reduce to exact
    // per-channel means. PNG round-trips pixels bit-for-bit, so the
    // oracle replays the pixel arithmetic without touching bytes — a FULL
    // oracle through a real compressed image format (the q_multimodal_ppm
    // shape, but the payload is a real zlib-compressed PNG, not raw P6).
    "q_multimodal_png" -> { (s, dir) =>
      implicit val sp: SparkSession = s
      import s.implicits._
      val imgs = docIdSpine(s, dir)
        .map { id =>
          (id, Multimodal.ImageIoCodec.encodePng(16, 8, (x, y) => {
            val p = y * 16 + x
            (((id * 31 + p * 7) % 256).toInt,
             ((id * 17 + p * 5) % 256).toInt,
             ((id * 13 + p * 3) % 256).toInt)
          }))
        }
      Multimodal.decodeImageStatsIo(imgs)
        .select(col("id").as("doc_id"), col("width"), col("height"),
          col("mean_r"), col("mean_g"), col("mean_b"))
        .orderBy(col("doc_id"))
    },

    // Fourth image container under a FULL oracle: BMP (uncompressed
    // 24-bit, lossless) — with PPM, PNG, and WAV this pins the decode
    // matrix across raw, zlib-compressed, DCT-lossy, and
    // uncompressed-container formats, all through the same
    // partition-parallel decodeImageStatsIo path.
    "q_multimodal_bmp" -> { (s, dir) =>
      implicit val sp: SparkSession = s
      import s.implicits._
      val imgs = docIdSpine(s, dir)
        .map { id =>
          (id, Multimodal.ImageIoCodec.encodeBmp(12, 10, (x, y) => {
            val p = y * 12 + x
            (((id * 31 + p * 7) % 256).toInt,
             ((id * 17 + p * 5) % 256).toInt,
             ((id * 13 + p * 3) % 256).toInt)
          }))
        }
      Multimodal.decodeImageStatsIo(imgs)
        .select(col("id").as("doc_id"), col("width"), col("height"),
          col("mean_r"), col("mean_g"), col("mean_b"))
        .orderBy(col("doc_id"))
    },

    // REAL compressed-codec decode, lossy leg: deterministic JPEGs
    // (quality 0.9, smooth gradient + per-doc constant blue — JPEG's DCT
    // DC coefficients preserve block means, so channel means survive
    // compression to well under 1/255 on smooth content). Geometry is
    // exact; the decoded means self-assert against encode-time ground
    // truth computed from the same pixel function, tolerance 3/255,
    // booleans pinned TRUE by the oracle. A decoder that silently
    // mis-parses geometry, channel order, or pixel values flips a column.
    "q_multimodal_jpeg" -> { (s, dir) =>
      implicit val sp: SparkSession = s
      import s.implicits._
      val w = 16; val h = 12
      val imgs = docIdSpine(s, dir)
        .map { id =>
          (id, Multimodal.ImageIoCodec.encodeJpeg(w, h, 0.9f, (x, y) =>
            (32 + x * 192 / (w - 1), 32 + y * 192 / (h - 1),
             (32 + (id * 7) % 192).toInt)))
        }
      // encode-time ground-truth means from the same integer arithmetic
      val trueR = (0 until w).map(x => 32 + x * 192 / (w - 1)).sum / w.toDouble
      val trueG = (0 until h).map(y => 32 + y * 192 / (h - 1)).sum / h.toDouble
      Multimodal.decodeImageStatsIo(imgs)
        .select(col("id").as("doc_id"), col("width"), col("height"),
          (abs(col("mean_r") - lit(trueR)) <= 3.0).as("r_ok"),
          (abs(col("mean_g") - lit(trueG)) <= 3.0).as("g_ok"),
          (abs(col("mean_b") - (pmod(col("id") * 7, lit(192)) + 32L).cast("double"))
            <= 3.0).as("b_ok"))
        .orderBy(col("doc_id"))
    },

    // REAL audio decode end-to-end: synthesize genuine WAV containers
    // (PCM_SIGNED 16-bit little-endian stereo, per-doc sample rate and
    // frame count, deterministic integer waveform) via the in-JDK
    // javax.sound.sampled, decode them back partition-parallel, reduce
    // to exact per-channel integer sums. PCM is lossless, so the oracle
    // replays the waveform arithmetic without touching bytes — a FULL
    // oracle through a real audio format (the q_multimodal_png shape
    // for sound). Varying sample rate AND frame count per doc proves
    // the header parse; stereo proves channel interleaving; the exact
    // sums prove byte order and sign handling.
    "q_multimodal_wav" -> { (s, dir) =>
      implicit val sp: SparkSession = s
      import s.implicits._
      val wavs = docIdSpine(s, dir)
        .map { id =>
          val sr = (8000 + id % 3 * 4000).toInt
          val nf = (600 + id % 5 * 37).toInt
          (id, Multimodal.WavCodec.encode(sr, 2, nf,
            (ch, i) => ((id * 31 + ch * 17 + i * 7) % 65536 - 32768).toShort))
        }
      Multimodal.decodeAudioStats(wavs)
        .select(col("id").as("doc_id"), col("sample_rate"), col("channels"),
          col("n_frames"), col("sum_l"), col("sum_r"), col("rms_l"), col("rms_r"))
        .orderBy(col("doc_id"))
    },

    // Winnowing copy-detection (Schleimer et al. 2003, MOSS) under the
    // gate: from every doc build a PAIR — the tokenized text, and a
    // copy whose first 5 tokens are replaced — so each pair shares a
    // long token run. The winnowing guarantee (any shared run of
    // w+k−1 = 6 tokens yields ≥1 shared fingerprint) is pinned TRUE
    // per pair, with the rigorous size bounds for VALUE-deduplicated
    // fingerprints: 1 ≤ n_fps ≤ windows (the ⌈windows/w⌉ lower bound
    // holds only for positional fingerprints — a repeated shingle's
    // value can be the min of many non-consecutive windows, so value
    // dedup can legitimately go below it on repetitive text). n_tokens
    // is the exact oracle column.
    "q_winnow_copydetect" -> { (s, dir) =>
      val toks = TextFunctions.tokens(col("text"))
      val base = Tables(s, dir).documents
        .withColumn("__t", toks).filter(size(col("__t")) >= 11)
      val a = array_join(col("__t"), " ")
      val b = concat(lit("zq1 zq2 zq3 zq4 zq5 "),
        array_join(slice(col("__t"), lit(6), size(col("__t"))), " "))
      val fpA = TextFunctions.winnowingFingerprints(a, 3, 4)
      val fpB = TextFunctions.winnowingFingerprints(b, 3, 4)
      val windows = size(col("__t")) - lit(2) - lit(3) // shingles − w + 1
      base.select(col("doc_id"), size(col("__t")).cast("long").as("n_tokens"),
          fpA.as("__fa"), fpB.as("__fb"), windows.as("__w"))
        .select(col("doc_id"), col("n_tokens"),
          (size(array_intersect(col("__fa"), col("__fb"))) >= 1).as("shared_ok"),
          (size(col("__fa")) <= col("__w")).as("density_hi_ok"),
          (size(col("__fa")) >= 1).as("density_lo_ok"))
        .orderBy(col("doc_id"))
    },

    // IMAGE near-dup via perceptual dHash — the image-modality leg of
    // the dedup family (text: MinHash/SimHash; embeddings: cosine
    // blocking; images: THIS). Pipeline + fixture: [[imageDHashPairs]].
    // FULL oracle: grid arithmetic, band join, and bit_count hamming
    // replay in SQL from the closed-form pixel function. Planted-pair
    // recall is pinned on controlled data in MultimodalSpec (this
    // corpus recalls 226/~250 — wrap-heavy pairs legitimately exceed
    // the cut).
    "q_image_neardup" -> { (s, dir) =>
      imageDHashPairs(s, dir)
        .select(col("id_a"), col("id_b"), col("hamming"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // Image DEDUP clusters: the dHash near-dup pairs feed min-label
    // connected components, and the component-size histogram is checked
    // against a DuckDB RECURSIVE CTE computing the same transitive
    // closure — the strongest cross-engine gate the CC operator has
    // (elsewhere it is pinned by exact-group collapse and spec
    // equivalence; here an independent engine derives the components).
    "q_image_dedup" -> { (s, dir) =>
      val nodes = Tables(s, dir).documents.select(col("doc_id").as("id"))
      val labels = Dedup.connectedComponents(nodes,
        imageDHashPairs(s, dir).select(col("id_a"), col("id_b")))
      labels.groupBy(col("label")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz")).agg(count(lit(1)).as("n_components"))
        .orderBy(col("sz"))
    },

    // REAL frequency-domain audio DSP: per-doc pure tones (one of four
    // candidate frequencies, chosen by doc_id) synthesized into genuine
    // WAV containers, decoded, and DETECTED by Goertzel single-bin DFT
    // power. Frame counts are multiples of 16 so every candidate lands
    // exactly on a DFT bin. The detected index is an ORACLE-EXACT value
    // (= doc_id % 4) — a mis-parsed stream, wrong channel stride, or a
    // broken recurrence misses the bin; margin_ok additionally pins
    // that the winning bin dominates by >100× (a pure tone
    // concentrates its energy; noise does not).
    "q_multimodal_tone" -> { (s, dir) =>
      implicit val sp: SparkSession = s
      import s.implicits._
      val cands = Seq(500.0, 1000.0, 1500.0, 2000.0)
      val wavs = docIdSpine(s, dir)
        .map { id =>
          val nf = (800 + id % 3 * 80).toInt
          val f = cands((id % 4).toInt)
          (id, Multimodal.WavCodec.encode(8000, 1, nf,
            (_, i) => (12000.0 * math.sin(2.0 * math.Pi * f * i / 8000.0)).toShort))
        }
      Multimodal.detectTones(wavs, cands)
        .select(col("id").as("doc_id"), col("sample_rate"), col("n_frames"),
          col("best_idx"),
          (col("best_idx") === pmod(col("id"), lit(4)).cast("int")).as("tone_ok"),
          (col("margin") > 100.0).as("margin_ok"))
        .orderBy(col("doc_id"))
    },

    // REAL video decode end-to-end: synthesize genuine AVI/MJPEG
    // containers (RIFF chunks written byte-by-byte, every frame a real
    // JPEG) with per-doc frame count and frame rate, parse them back
    // partition-parallel, decode every JPEG frame. Container metadata
    // (geometry, frame count, per-frame microseconds) is exact — a
    // mis-parsed header, chunk pad, or frame boundary flips those
    // columns; frame pixel content is JPEG-lossy, so per-frame channel
    // means self-assert against encode-time ground truth (tolerance
    // 3/255, the q_multimodal_jpeg contract per frame). The per-frame
    // blue constant varies with (doc, frame), so a decoder that
    // returned frames out of order or reused one frame flips b_ok.
    "q_multimodal_video" -> { (s, dir) =>
      implicit val sp: SparkSession = s
      import s.implicits._
      val w = 16; val h = 12
      val vids = docIdSpine(s, dir)
        .map { id =>
          val fps = if (id % 2 == 0) 10 else 25
          val nf = (3 + id % 3).toInt
          (id, Multimodal.AviMjpegCodec.encode(w, h, fps, nf, 0.9f,
            (f, x, y) => (32 + x * 192 / (w - 1), 32 + y * 192 / (h - 1),
              (32 + (id * 7 + f * 11) % 192).toInt)))
        }
      val trueR = (0 until w).map(x => 32 + x * 192 / (w - 1)).sum / w.toDouble
      val trueG = (0 until h).map(y => 32 + y * 192 / (h - 1)).sum / h.toDouble
      Multimodal.decodeVideoStats(vids)
        .select(col("id").as("doc_id"), col("frame_idx"), col("width"),
          col("height"), col("n_frames"), col("us_per_frame"),
          (abs(col("mean_r") - lit(trueR)) <= 3.0).as("r_ok"),
          (abs(col("mean_g") - lit(trueG)) <= 3.0).as("g_ok"),
          (abs(col("mean_b") -
            (pmod(col("id") * 7 + col("frame_idx") * 11, lit(192)) + 32L)
              .cast("double")) <= 3.0).as("b_ok"))
        .orderBy(col("doc_id"), col("frame_idx"))
    },

    // REAL resize through real codecs, FULL oracle: PNG in (lossless),
    // exact-integer box filter (each output pixel = floor mean of its
    // 4×4 block), PNG back out (lossless), decode AGAIN and reduce —
    // so the checked numbers went through decode → resample → encode →
    // decode of genuine compressed payloads, and the whole chain
    // replays exactly in SQL.
    "q_multimodal_resize_real" -> { (s, dir) =>
      implicit val sp: SparkSession = s
      import s.implicits._
      val imgs = docIdSpine(s, dir)
        .map { id =>
          (id, Multimodal.ImageIoCodec.encodePng(32, 24, (x, y) => {
            val p = y * 32 + x
            (((id * 31 + p * 7) % 256).toInt,
             ((id * 17 + p * 5) % 256).toInt,
             ((id * 13 + p * 3) % 256).toInt)
          }))
        }
      val resized = Multimodal.resizeImages(imgs, fx = 4, fy = 4)
      Multimodal.decodeImageStatsIo(resized.map(r => (r.id, r.bytes)))
        .select(col("id").as("doc_id"), col("width"), col("height"),
          col("mean_r"), col("mean_g"), col("mean_b"))
        .orderBy(col("doc_id"))
    },

    // Multimodal plumbing: synthetic media structs → partition-parallel
    // stub decode → feature rows. FakeCodec's bounded integer arithmetic
    // (position-weighted byte sum + LCG mod a small prime) replays
    // exactly in DuckDB over hex(encode(text)) — full oracle.
    // double cast BEFORE round: the raw feature is a FLOAT, and the
    // driver's compare stringifies values, so both engines must round the
    // same double.
    "q_multimodal_features" -> { (s, dir) =>
      implicit val sp: SparkSession = s
      import s.implicits._
      val docs = Tables(s, dir).documents
      val media = Multimodal.attachSyntheticMedia(docs, "doc_id", "text")
        .select(col("doc_id"), col("media.bytes")).as[(Long, Array[Byte])]
      Multimodal.decodeFeatures(media, dim = 8)
        .select(col("id").as("doc_id"),
          round(element_at(col("features"), 1).cast("double"), 4).as("f0"),
          round(element_at(col("features"), 8).cast("double"), 4).as("f7"))
        .orderBy(col("doc_id"))
    },

    // Multimodal frame sampling: one row per sampled frame. Frame lengths
    // are pure integer functions of the payload byte count — full oracle.
    "q_multimodal_frames" -> { (s, dir) =>
      implicit val sp: SparkSession = s
      import s.implicits._
      val docs = Tables(s, dir).documents
      val media = Multimodal.attachSyntheticMedia(docs, "doc_id", "text")
        .select(col("doc_id"), col("media.bytes")).as[(Long, Array[Byte])]
      Multimodal.sampleFrames(media, n = 3)
        .select(col("id").as("doc_id"), col("frameIdx"), length(col("frame")).as("frame_len"))
        .orderBy(col("doc_id"), col("frameIdx"))
    },

    // Multimodal resize: geometry + output size are deterministic functions
    // of the payload, so this leg of the stub IS oracle-checkable.
    "q_multimodal_resize" -> { (s, dir) =>
      implicit val sp: SparkSession = s
      import s.implicits._
      val docs = Tables(s, dir).documents
      val media = Multimodal.attachSyntheticMedia(docs, "doc_id", "text")
        .select(col("doc_id"), col("media.bytes")).as[(Long, Array[Byte])]
      Multimodal.resizeMedia(media, targetW = 75, targetH = 75)
        .select(col("id").as("doc_id"), col("width"), col("height"),
          length(col("bytes")).as("out_len"))
        .orderBy(col("doc_id"))
    },

    // End-to-end multimodal pipeline: thumbnail payload (clipped text
    // bytes) → decoded embedding → SRP-blocked near-dup pairs. The stub
    // codec only matches identical payloads, so the clip is what lets the
    // fixture's planted near-dups (shared prefixes) surface as identical
    // thumbnails → cosine-1 pairs. Full oracle: the codec arithmetic,
    // normalization, and seeded SRP blocking all replay in SQL.
    "q_multimodal_pipeline" -> { (s, dir) =>
      implicit val sp: SparkSession = s
      import s.implicits._
      val docs = Tables(s, dir).documents
        .withColumn("thumb", substring(col("text"), 1, 64))
      val media = Multimodal.attachSyntheticMedia(docs, "doc_id", "thumb")
        .select(col("doc_id"), col("media.bytes")).as[(Long, Array[Byte])]
      val feats = Multimodal.decodeFeatures(media, dim = 64)
        .select(col("id").as("vec_id"), col("features").as("embedding"))
      Similarity.cosinePairsBlocked(feats, threshold = 0.999,
        nPlanes = 8, nTables = 2, dim = 64)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Gopher-style within-document repetition stats (word bigrams):
    // heaviest-gram and duplicated-gram character fractions.
    "q_repetition_ngrams" -> { (s, dir) =>
      Repetition.ngramRepetitionStats(Tables(s, dir).documents,
        "doc_id", "text", n = 2)
        .orderBy(col("doc_id"))
    },

    // Duplicate-line stats over deterministically constructed multi-line
    // text (the corpus has no newlines): each doc gets its own 50-char
    // prefix appended twice, so every doc has at least one repeated line
    // and the oracle replicates the construction exactly.
    "q_repetition_lines" -> { (s, dir) =>
      val lined = Tables(s, dir).documents.select(
        col("doc_id"),
        concat_ws("\n", col("text"),
          substring(col("text"), 1, 50),
          substring(col("text"), 1, 50)).as("text"))
      Repetition.duplicateLineStats(lined, "doc_id", "text")
        .orderBy(col("doc_id"))
    },

    // Deterministic stratified downsample: keep 50% of English, 25% of
    // German/French, all other languages — membership a pure md5 function
    // of doc_id, replicated by the oracle.
    "q_stratified_sample" -> { (s, dir) =>
      graft.operators.Combine.stratifiedSampleByHash(
        Tables(s, dir).documents, "lang", col("doc_id"),
        Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25), defaultFraction = 1.0)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy(col("lang"))
    },

    // Quality-quartile binning per language (curriculum/mix design):
    // equal-count quartiles over (quality, doc_id) — fully deterministic,
    // and quality lands on exact quarters, so the oracle reproduces it
    // bit-for-bit with a plain ntile window (single-node DuckDB). The
    // engine side uses the scale-safe prefix-sum ntile: a per-lang window
    // would sort each language's ENTIRE corpus in one task at 100 TB.
    "q_quality_bins" -> { (s, dir) =>
      val scored = Tables(s, dir).documents
        .withColumn("quality", TextFunctions.qualityScore(col("text")))
      graft.operators.Combine.ntilePerKey(scored, Seq("lang"),
          Seq(col("quality"), col("doc_id")), 4)
        .groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), min(col("quality")).as("min_q"),
          max(col("quality")).as("max_q"))
        .orderBy(col("lang"), col("bin"))
    },

    // Blocked edit-distance near-dup pairs: length-banded equi-join +
    // Levenshtein over 48-char prefixes (portable: DuckDB's levenshtein
    // is the same classic edit distance).
    "q_editdist_neardup" -> { (s, dir) =>
      Repetition.editDistancePairs(Tables(s, dir).documents,
        "doc_id", "text", prefixLen = 48, maxDist = 8, bandWidth = 64)
        .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // Sequence packing: per-document placement in the shard-local packed
    // token stream (concat-then-chunk, 1024-token sequences, 8 shards).
    // Pure integer math over a portable hash shard → full DuckDB oracle.
    "q_seq_packing" -> { (s, dir) =>
      graft.llm.Packing.packSequences(Tables(s, dir).documents,
        "doc_id", "text", seqLen = 1024, shards = 8)
        .orderBy(col("doc_id"))
    },

    // Overlapping token chunking (retrieval-index layout): 6-token
    // windows every 4 tokens, final short chunk, no fully-redundant
    // tails. Pure per-row HOFs; the explode IS the output — no shuffle.
    "q_chunk_overlap" -> { (s, dir) =>
      graft.llm.Packing.chunkWithOverlap(Tables(s, dir).documents,
          "doc_id", "text", chunkSize = 6, stride = 4)
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    // Domain-mixture sampling: rebalance the lang mix toward uniform
    // shares at half the corpus size, with deterministic md5-threshold
    // membership — thresholds are fixed-order IEEE doubles, so the oracle
    // reproduces them bit-exactly.
    "q_mixture_sample" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val langs = Seq("de", "en", "es", "fr", "zh")
      val rates = graft.llm.Mixture.rebalanceRates(
        docs, "lang", langs.map(_ -> 0.2).toMap, outFraction = 0.5)
      graft.llm.Mixture.sampleByRates(docs, "doc_id", "lang", rates,
          defaultRate = 0.0)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy(col("lang"))
    },

    // TOKEN-denominated mixture: rates solved on whitespace-token MASS
    // (integer-valued, so the driver sums replay exactly in any order),
    // realized by the same row-atomic md5 sampling. The oracle re-derives
    // the per-lang masses, the rate arithmetic, and the kept set.
    "q_mixture_tokens" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val langs = Seq("de", "en", "es", "fr", "zh")
      val rates = graft.llm.Mixture.rebalanceRatesByWeight(
        docs, "lang", TextFunctions.tokenCount(col("text")),
        langs.map(_ -> 0.2).toMap, outFraction = 0.5)
      graft.llm.Mixture.sampleByRates(docs, "doc_id", "lang", rates,
          defaultRate = 0.0)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          sum(TextFunctions.tokenCount(col("text")).cast("long"))
            .as("kept_tokens"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy(col("lang"))
    },

    // Deterministic UPsampling — the other half of temperature mixing:
    // rare domains repeat (rate > 1: floor guaranteed copies + one md5-
    // fraction extra), tagged with an epoch index. Fixed literal rates so
    // the oracle replays the exact thresholds.
    "q_mixture_epochs" -> { (s, dir) =>
      graft.llm.Mixture.sampleByRatesWithRepeats(
        Tables(s, dir).documents, "doc_id", "lang",
        Map("de" -> 2.5, "fr" -> 1.25, "en" -> 0.4), defaultRate = 1.0)
        .select(col("doc_id"), col("lang"), col("epoch"))
        .orderBy(col("doc_id"), col("epoch"))
    },

    // Vocabulary coverage: top-100 tokens by frequency with rank and
    // cumulative share of the token stream (the Zipf head a tokenizer/
    // stopword audit reads). Window runs over the 100-row top-k, not the
    // corpus; the total comes from a 1-row broadcast.
    "q_vocab_coverage" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val counts = Tables(s, dir).documents
        .select(explode(TextFunctions.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      val total = counts.agg(sum(col("cnt")).as("total"))
      // constant partition key: the window input is the 100-row top-k,
      // bounded by construction. pmod(cnt, 1) ≡ 0 but is column-derived,
      // so the optimizer can't fold it back to an unpartitioned window
      // (see Combine.prefixSum for the same idiom).
      val ord = Window.partitionBy(pmod(col("cnt"), lit(1)))
        .orderBy(col("cnt").desc, col("token"))
      counts.orderBy(col("cnt").desc, col("token")).limit(100)
        .withColumn("rank", row_number().over(ord))
        .withColumn("cum", sum(col("cnt")).over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(total))
        .select(col("token"), col("cnt"), col("rank"),
          (col("cum").cast("double") / col("total").cast("double"))
            .as("coverage"))
        .orderBy(col("rank"))
    },

    // Trained text classifier (the fastText recipe: hashed bag-of-token
    // features → ml.classification logistic regression, distributed
    // L-BFGS, deterministic 80/20 hash split), self-asserting form. The
    // fixture's lang tag is label NOISE by construction (identical word
    // soup in every language — a classifier tops out at AUC ≈ 0.59 ≈
    // chance, measured), so per the repo's planted-structure pattern
    // (see the PQ planted-twin spec) the gate target is a real
    // content-derived label: does the doc use the join/merge/hash/group
    // token family more than scan/filter/sort/order. That target is
    // linearly recoverable from unigram features, so the metric floors
    // are stable invariants of working machinery: held-out accuracy ≥
    // 0.9, held-out AUROC ≥ 0.95 — a broken feature hash, a diverged
    // optimizer, or a leaky split smashes them. Exact oracle
    // companions: per-label document counts (SQL-replicated label).
    // Exact filter evaluation (Mann-Whitney AUC + threshold-at-recall
    // via range-partitioned prefix sums — never a corpus-wide rank
    // window): grade the English-stopword-fraction score against the
    // fixture's lang labels and pick the 0.9-recall cut. Every number
    // is exact integer arithmetic until one final division, so the
    // whole report replays in SQL. On THIS fixture the text is
    // lang-independent, so the report correctly grades the filter as
    // useless (AUC ≈ 0.47, cut collapses to 0) — which is precisely the
    // deploy/don't-deploy answer the operator exists to give; the
    // hand-computed AUC/threshold math is pinned in TextClassifierSpec.
    "q_filter_eval" -> { (s, dir) =>
      val en = TextFunctions.LanguageMarkers("en")
      val toks = TextFunctions.tokens(col("text"))
      val docs = Tables(s, dir).documents
        .withColumn("__t", toks).filter(size(col("__t")) > 0)
        .withColumn("__score",
          size(filter(col("__t"), t => t.isInCollection(en))).cast("double") /
            size(col("__t")))
      TextClassifier.evalReport(docs, col("lang") === "en", col("__score"),
          targetRecall = 0.9)
        .select(col("n_pos"), col("n_neg"), round(col("auc"), 4).as("auc"),
          round(col("threshold"), 4).as("threshold"),
          round(col("precision"), 4).as("precision"),
          round(col("recall"), 4).as("recall"))
    },

    // Per-SOURCE AUC for the same filter — the bias audit: a filter
    // that separates well overall but poorly on one source silently
    // under-curates it. Window partitioned by source (never corpus-wide).
    "q_filter_bias" -> { (s, dir) =>
      val en = TextFunctions.LanguageMarkers("en")
      val toks = TextFunctions.tokens(col("text"))
      val docs = Tables(s, dir).documents
        .withColumn("__t", toks).filter(size(col("__t")) > 0)
        .withColumn("__score",
          size(filter(col("__t"), t => t.isInCollection(en))).cast("double") /
            size(col("__t")))
      TextClassifier.evalReportPerGroup(docs, col("source"),
          col("lang") === "en", col("__score"))
        .select(col("group"), col("n_pos"), col("n_neg"),
          round(col("auc"), 4).as("auc"))
        .orderBy(col("group"))
    },

    // Calibration table for the same filter: does the score behave like
    // a probability (per-bin observed positive rate ≈ mean score)? One
    // groupBy over 10 bins; decimal-sum means keep it order-free.
    "q_calibration" -> { (s, dir) =>
      val en = TextFunctions.LanguageMarkers("en")
      val toks = TextFunctions.tokens(col("text"))
      val docs = Tables(s, dir).documents
        .withColumn("__t", toks).filter(size(col("__t")) > 0)
        .withColumn("__score",
          size(filter(col("__t"), t => t.isInCollection(en))).cast("double") /
            size(col("__t")))
      TextClassifier.calibrationTable(docs, col("lang") === "en",
          col("__score"), bins = 10)
        .select(col("bin"), col("n"), round(col("frac_pos"), 4).as("frac_pos"),
          round(col("mean_score"), 4).as("mean_score"))
        .orderBy(col("bin"))
    },

    "q_quality_classifier" -> { (s, dir) =>
      val famA = Seq("join", "merge", "hash", "group")
      val famB = Seq("scan", "filter", "sort", "order")
      def famCount(fam: Seq[String]) = size(filter(
        TextFunctions.tokens(col("text")), t => t.isInCollection(fam)))
      val labelled = Tables(s, dir).documents
        .withColumn("label_b", famCount(famA) > famCount(famB))
      val res = TextClassifier.trainEvaluate(labelled, "doc_id",
        TextFunctions.tokens(col("text")), col("label_b").cast("double"))
      labelled
        .select(when(col("label_b"), "join_heavy").otherwise("scan_heavy")
          .as("label"))
        .groupBy(col("label")).agg(count(lit(1)).as("n_docs"))
        .withColumn("acc_ok", lit(res.testAccuracy >= 0.9))
        .withColumn("auc_ok", lit(res.testAuc >= 0.95))
        .orderBy(col("label"))
    },

    // Count-Min sketch point-frequency estimates, self-asserting form.
    // The top-50 tokens and their EXACT counts are the oracle-checked
    // companions (the sketch only rides alongside); booleans pinned TRUE:
    // lower_ok — the CMS estimate never undercounts (counters only ever
    // add); bound_ok — est ≤ exact + ⌈e·N/width⌉, the published ε-N
    // guarantee evaluated on this dataset + fixed hashes. The sketch is
    // probed RELATIONALLY (xxhash64 columns replicate the aggregator's
    // bucket function), so the whole check is one broadcast of a 1-row
    // 16 KB summary against the exact counts.
    "q_cms_counts" -> { (s, dir) =>
      val depth = 4; val width = 4096
      val toks = Tables(s, dir).documents
        .select(explode(TextFunctions.tokens(col("text"))).as("token"))
      val sk = CountMin.sketch(toks, col("token"), depth, width)
      toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token")).limit(50)
        .crossJoin(broadcast(sk))
        .withColumn("est", CountMin.estimate(col("sketch"), col("token"), depth, width))
        .select(col("token"), col("cnt"),
          (col("est") >= col("cnt")).as("lower_ok"),
          (col("est") <= col("cnt") +
            ceil(lit(math.E) * col("n") / lit(width)).cast("long")).as("bound_ok"))
        .orderBy(col("cnt").desc, col("token"))
    },

    // The CMS as a NATIVE Catalyst TypedImperativeAggregate (SURVEY §7's
    // optional custom-Catalyst tier): per-source sketches built by the
    // native aggregate, rolled up relationally into the global sketch,
    // which must equal the directly-aggregated one ELEMENT-FOR-ELEMENT
    // (counters are sums — merge order and grouping cannot matter).
    // Exact companion: top-20 token counts; booleans: merge_ok (rollup ≡
    // direct), lower_ok/bound_ok (CMS guarantees on the rolled-up
    // sketch). SketchAggSpec additionally pins native ≡ Aggregator
    // bridge and the SQL-registry path.
    "q_cms_native" -> { (s, dir) =>
      import graft.functions.SketchAgg
      val depth = 4; val width = 4096
      val toks = Tables(s, dir).documents
        .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("token"))
      val perSource = toks.groupBy(col("source"))
        .agg(SketchAgg.cmsSketch(col("token"), depth, width).as("sk"))
      val rolled = perSource
        .agg(SketchAgg.mergeSketches(col("sk"), depth, width).as("sketch"))
      val direct = toks
        .agg(SketchAgg.cmsSketch(col("token"), depth, width).as("sketch_direct"),
          count(lit(1)).as("n"))
      val both = direct.crossJoin(broadcast(rolled))
        .withColumn("merge_ok", col("sketch") === col("sketch_direct"))
      toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token")).limit(20)
        .crossJoin(broadcast(both))
        .withColumn("est", CountMin.estimate(col("sketch"), col("token"), depth, width))
        .select(col("token"), col("cnt"),
          col("merge_ok"),
          (col("est") >= col("cnt")).as("lower_ok"),
          (col("est") <= col("cnt") +
            ceil(lit(math.E) * col("n") / lit(width)).cast("long")).as("bound_ok"))
        .orderBy(col("cnt").desc, col("token"))
    },

    // Distributed BPE tokenizer training (Sennrich et al. 2016), self-
    // asserting form. The 20-merge trajectory is engine-derived (argmax
    // over pair counts isn't SQL-replicable), so the gate rides the
    // established pattern: exact companions (merge ranks 0..19, distinct
    // word count, freq-weighted initial symbol count) plus booleans pinned
    // TRUE by an INDEPENDENT scalar replay (plain Scala loops, no shared
    // code with the relational trainer): count_ok — each rank's winning
    // positional pair count re-derived by replaying the merge sequence
    // word-by-word equals the trainer's recorded count; applied_ok — same
    // for the non-overlapping applied-merge counts. Together they pin the
    // full training trajectory given the merge sequence; argmax selection
    // itself is pinned against the scalar reference trainer in BpeSpec.
    "q_bpe_train" -> { (s, dir) =>
      val words = Bpe.wordFreqs(Tables(s, dir).documents, col("text"))
      // localThreshold = 0: THIS query's gate is the relational-trainer
      // vs scalar-replay cross-check — the small-state cutover would
      // route training through the same scalar machinery the replay
      // uses and make applied_ok compare a function with itself. The
      // cutover stays default everywhere merges are an INPUT
      // (q_bpe_encode's gates check encode, which is independent).
      val merges = Bpe.train(words, numMerges = 20, localThreshold = 0)
      val pairs = merges.map(m => (m.left, m.right))
      val replayUdf = udf((w: String) => Bpe.replay(w, pairs))
      val rep = words
        .select(col("freq"), explode(replayUdf(col("word"))).as("r"))
        .groupBy(col("r._1").as("rep_rank"))
        .agg(sum(col("r._2") * col("freq")).as("pos_cnt"),
          sum(col("r._3") * col("freq")).as("applied_rep"))
      val companions = Tables(s, dir).documents
        .select(explode(TextFunctions.tokens(col("text"))).as("word"))
        .agg(countDistinct(col("word")).as("n_distinct_words"),
          sum(length(col("word")).cast("long")).as("n_init_symbols"))
      s.createDataFrame(merges)
        .join(rep, col("rank") === col("rep_rank"))
        .crossJoin(broadcast(companions))
        .select(col("rank").cast("long").as("rank"),
          col("n_distinct_words"), col("n_init_symbols"),
          (col("pos_cnt") === col("pairCount")).as("count_ok"),
          (col("applied_rep") === col("applied")).as("applied_ok"))
        .orderBy(col("rank"))
    },

    // Corpus-scale BPE ENCODE with a trained vocab (the production
    // tokenize step), self-asserting form. The scale shape is the point:
    // the 20 chained merge rewrites run once per DISTINCT word, and the
    // corpus gets its tokens by joining exploded tokens back to that
    // vocabulary table. Exact companions: per-source doc counts.
    // Booleans pinned TRUE: encode_ok — the relational HOF encode of
    // every distinct word equals the independent scalar encoder;
    // conservation_ok — per-source BPE token totals computed through the
    // doc-level join-back equal the freq-weighted totals computed on the
    // word table alone (the join dropped or duplicated nothing).
    "q_bpe_encode" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val words = Bpe.wordFreqs(docs, col("text"))
      val merges = Bpe.train(words, numMerges = 20)
      val pairs = merges.map(m => (m.left, m.right))
      // vocabulary-sized: materialize once, three legs read plain rows
      // (unmaterialized, the interpreted rewrite chain re-evaluates per leg)
      val enc = Bpe.encodeWords(words, pairs)
        .withColumn("n_syms", size(col("syms")))
        .localCheckpoint(true)
      val scalarUdf = udf((w: String) => {
        var syms = w.map(_.toString).toList
        pairs.foreach { case (l, r) => syms = Bpe.scalarMergeOnce(syms, l, r)._1 }
        syms
      })
      val encodeOk = enc
        .agg(coalesce(bool_and(col("syms") === scalarUdf(col("word"))), lit(true))
          .as("encode_ok"))
      val perSourceDocs = docs
        .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("word"))
        .join(enc.select(col("word"), col("n_syms")), Seq("word"))
        .groupBy(col("source"))
        .agg(sum(col("n_syms").cast("long")).as("bpe_tokens_docs"))
      val perSourceWords = docs
        .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("word"))
        .groupBy(col("source"), col("word")).agg(count(lit(1)).as("f"))
        .join(enc.select(col("word"), col("n_syms")), Seq("word"))
        .groupBy(col("source"))
        .agg(sum(col("f") * col("n_syms")).as("bpe_tokens_words"))
      val conservation = perSourceDocs
        .join(perSourceWords, Seq("source"), "full_outer")
        .agg(coalesce(bool_and(col("bpe_tokens_docs") === col("bpe_tokens_words")),
          lit(true)).as("conservation_ok"))
      docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(encodeOk))
        .crossJoin(broadcast(conservation))
        .orderBy(col("source"))
    },

    // Unigram-LM tokenizer TRAINING (Kudo 2018, the SentencePiece
    // unigram model) as deterministic hard-EM — the second tokenizer
    // family next to BPE. State lives on the distinct-word table (one
    // corpus shuffle total); each EM round is one vocab-sized
    // aggregation with the piece table shipped inside the native
    // Viterbi expression. Exact companions: distinct words + freqs +
    // lengths. Booleans pinned TRUE per word: recon_ok (pieces
    // concatenate back to the word), opt_vs_greedy_ok / opt_vs_chars_ok
    // (the DP dominates both heuristic segmentations), score_xpath_ok
    // (the expression's DP score equals an independent relational
    // re-derivation — seg exploded against a map literal of the learned
    // log-probs, summed left-to-right, bit-exact). UnigramSpec pins the
    // whole training loop against a scalar reference EM.
    "q_unigram_train" -> { (s, dir) =>
      val words = Bpe.wordFreqs(Tables(s, dir).documents, col("text"))
      val vocab = Unigram.train(words, vocabSize = 60, rounds = 3,
        maxPieceLen = 6, maxSeed = 2000)
      val logpMap = map(vocab.flatMap(p => Seq(lit(p.piece), lit(p.logp))): _*)
      // own projection: the non-cheap DP struct must evaluate once per row
      val segd = words
        .select(col("word"), col("freq"),
          Unigram.segment(col("word"), vocab, maxPieceLen = 6).as("sg"))
      segd.select(col("word"), col("freq"),
          length(col("word")).cast("long").as("word_len"),
          (concat_ws("", col("sg.seg")) === col("word")).as("recon_ok"),
          (col("sg.vscore") >= col("sg.gscore")).as("opt_vs_greedy_ok"),
          (col("sg.vscore") >= col("sg.cscore")).as("opt_vs_chars_ok"),
          (col("sg.vscore") === aggregate(
            transform(col("sg.seg"), p => element_at(logpMap, p)),
            lit(0.0), (a, x) => a + x)).as("score_xpath_ok"))
        .orderBy(col("word"))
    },

    // Corpus-scale unigram ENCODE with a trained vocab — the unigram
    // twin of q_bpe_encode, same scale shape: the Viterbi DP runs once
    // per DISTINCT word, docs get their piece counts by joining exploded
    // tokens back to that vocabulary-sized table. Booleans pinned TRUE:
    // encode_ok (the native DP segmentation of every distinct word
    // equals the independent scalar Viterbi), conservation_ok (per-
    // source piece totals through the doc join-back equal freq-weighted
    // totals from the word table alone).
    "q_unigram_encode" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val words = Bpe.wordFreqs(docs, col("text"))
      val vocab = Unigram.train(words, vocabSize = 60, rounds = 3,
        maxPieceLen = 6, maxSeed = 2000)
      val logp = vocab.map(p => p.piece -> p.logp).toMap
      val enc = words
        .select(col("word"), col("freq"),
          Unigram.segment(col("word"), vocab, maxPieceLen = 6)
            .getField("seg").as("seg"))
        .withColumn("n_pieces", size(col("seg")))
        .localCheckpoint(true)
      val scalarUdf = udf((w: String) => Unigram.scalarViterbi(w, logp, 6)._1)
      val encodeOk = enc
        .agg(coalesce(bool_and(col("seg") === scalarUdf(col("word"))), lit(true))
          .as("encode_ok"))
      val perSourceDocs = docs
        .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("word"))
        .join(enc.select(col("word"), col("n_pieces")), Seq("word"))
        .groupBy(col("source"))
        .agg(sum(col("n_pieces").cast("long")).as("pieces_docs"))
      val perSourceWords = docs
        .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("word"))
        .groupBy(col("source"), col("word")).agg(count(lit(1)).as("f"))
        .join(enc.select(col("word"), col("n_pieces")), Seq("word"))
        .groupBy(col("source"))
        .agg(sum(col("f") * col("n_pieces")).as("pieces_words"))
      val conservation = perSourceDocs
        .join(perSourceWords, Seq("source"), "full_outer")
        .agg(coalesce(bool_and(col("pieces_docs") === col("pieces_words")),
          lit(true)).as("conservation_ok"))
      docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(encodeOk))
        .crossJoin(broadcast(conservation))
        .orderBy(col("source"))
    },

    // Deterministic per-epoch shuffle: every doc re-dealt to a shard and
    // an in-shard position by the salted md5 hash of "seed|doc_id" — one
    // hash shuffle + shard-local sorts, no corpus-wide range exchange.
    // Pure function of (seed, id), so the full assignment of TWO epochs
    // is replayed exactly in SQL; PackingSpec measures the epoch-to-epoch
    // rank decorrelation.
    "q_epoch_shuffle" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val e0 = Packing.epochShuffleAssign(docs, "doc_id", seed = 0, shards = 8)
        .select(col("doc_id"), col("shard").as("shard_e0"), col("pos").as("pos_e0"))
      val e1 = Packing.epochShuffleAssign(docs, "doc_id", seed = 1, shards = 8)
        .select(col("doc_id"), col("shard").as("shard_e1"), col("pos").as("pos_e1"))
      e0.join(e1, Seq("doc_id")).orderBy(col("doc_id"))
    },

    // Packing shard summary: sequences per shard and tail waste — the
    // metric a packing strategy is judged on. Same portable arithmetic
    // as q_seq_packing.
    "q_packing_stats" -> { (s, dir) =>
      val packed = Packing.packSequences(Tables(s, dir).documents,
        "doc_id", "text", seqLen = 1024, shards = 8)
      Packing.packingStats(packed, seqLen = 1024).orderBy(col("shard"))
    },

    // Temperature-scaled mixture (share ∝ n^0.5): the multilingual-LM
    // sampling rule, deterministic md5-threshold membership. Oracle
    // replays the rate arithmetic in SQL.
    "q_mixture_temperature" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val rates = Mixture.temperatureRates(docs, "lang", alpha = 0.5,
        outFraction = 0.5)
      Mixture.sampleByRates(docs, "doc_id", "lang", rates, defaultRate = 0.0)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy(col("lang"))
    },

    // Gopher-rule quality flags: one boolean column per rule + keep —
    // the audit view of rule-based filtering. Pure Column arithmetic,
    // RE2-portable regexes → full DuckDB oracle.
    "q_gopher_rules" -> { (s, dir) =>
      Curation.gopherQualityFlags(Tables(s, dir).documents, "doc_id", "text",
        minWords = 20)
        .orderBy(col("doc_id"))
    },

    // Budget-bounded greedy selection: best-quality docs first until a
    // 20k-token budget is spent. Runs on the distributed prefix sum
    // (range-partitioned cumsum — no single-partition window).
    "q_token_budget" -> { (s, dir) =>
      Curation.selectByTokenBudget(Tables(s, dir).documents, "doc_id",
        TextFunctions.qualityScore(col("text")),
        TextFunctions.tokenCount(col("text")), budget = 20000L)
        .orderBy(col("doc_id"))
    },

    // SemDeDup: semantic dedup within embedding clusters (deterministic
    // first-8 centroids). Cluster assignment + within-cluster cosine
    // threshold + min-id representative are all SQL-replicable.
    "q_semdedup" -> { (s, dir) =>
      val emb = Tables(s, dir).embeddings
      val cents = emb.orderBy(col("vec_id")).limit(8)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cent_emb"))
      Similarity.semDedup(emb, cents, threshold = 0.4)
        .select(col("vec_id"), col("label"))
        .orderBy(col("vec_id"))
    },

    // Heavy hitters: Misra-Gries sketch prunes the token tail without a
    // shuffle, then an exact recount over candidates only — emitted counts
    // are exact, so the full (value,count) SQL answer is the oracle. The
    // ApproximateUnique-family CombineFn bridge (Aggregator via udaf).
    "q_heavy_hitters" -> { (s, dir) =>
      val toks = Tables(s, dir).documents
        .select(explode(TextFunctions.tokens(col("text"))).as("token"))
      HeavyHitters.frequentValues(toks, col("token"), minFrac = 0.01)
        .withColumnRenamed("value", "token")
        .orderBy(col("token"))
    },

    // Quantile outlier trim: drop docs outside the exact [p05, p95]
    // length band. Exact interpolated percentiles ((n-1)*q definition,
    // identical in DuckDB's quantile_cont) ride a 1-row broadcast.
    "q_length_trim" -> { (s, dir) =>
      Curation.trimByQuantiles(Tables(s, dir).documents, "doc_id",
          col("n_chars"), lo = 0.05, hi = 0.95)
        .withColumnRenamed("value", "n_chars")
        .orderBy(col("doc_id"))
    },

    // Cross-corpus (incremental-ingestion) dedup: even doc_ids are the
    // already-ingested reference, odd ids the new delta; new docs that
    // duplicate the reference exactly (md5) or by 8-gram shingle
    // containment ≥ 0.5 are dropped. Both legs equi-joins; shingles
    // travel as 64-bit hashes, replayed as n-gram strings in the oracle.
    "q_crosscorpus_dedup" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val refd = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      val newd = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
      Dedup.dedupAgainstReference(newd, refd, "doc_id", "text",
          n = 8, containment = 0.5)
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))
    },

    // Bloom-accelerated exact cross-corpus dedup: byte-identical to the
    // plain fingerprint anti-join (no false negatives; false positives
    // fall through to the exact join), but only the bloom-passing sliver
    // of the new corpus reaches the join exchange — the FULL oracle
    // proves the acceleration is lossless.
    "q_bloom_dedup" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val refd = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      val newd = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
      Dedup.exactSurvivorsViaBloom(newd, refd, "text", fpp = 0.01)
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))
    },

    // Size-balanced training shards: serpentine LPT deal over the
    // distributed rank; per-shard totals are the checkable output.
    "q_shard_assign" -> { (s, dir) =>
      Packing.assignShardsBySize(Tables(s, dir).documents, "doc_id",
          TextFunctions.tokenCount(col("text")), shards = 8)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("weight")).as("total_weight"))
        .orderBy(col("shard"))
    },

    // Cross-document duplication audit: per doc, the fraction of its
    // distinct 8-gram shingles occurring in ≥1 other doc — the span-level
    // stat suffix-array dedup thresholds on, via shingle-hash df counts.
    "q_crossdoc_dup" -> { (s, dir) =>
      Dedup.crossDocDuplicationStats(Tables(s, dir).documents,
          "doc_id", "text", n = 8)
        .orderBy(col("doc_id"))
    },

    // Exact substring-span dedup (ExactSubstr APPLY step): every 5-gram
    // occurrence duplicated anywhere in the corpus loses its 5 token
    // positions except the globally-first occurrence; text rebuilt from
    // the kept tokens. Real pipelines run n≈50; n=5 gives the fixture a
    // ~5% duplicate-occurrence rate at both verify and bench scale.
    "q_span_dedup" -> { (s, dir) =>
      Dedup.removeDuplicateSpans(Tables(s, dir).documents,
          "doc_id", "text", n = 5)
        .orderBy(col("doc_id"))
    },

    // End-to-end curation pipeline — the operators composed the way a
    // real pretraining run chains them: Gopher-rule filter → exact dedup
    // (min-id representative among survivors) → quantile length trim
    // (bounds computed POST-dedup; stage order is part of the contract)
    // → per-source summary. Every stage is individually oracle-proven;
    // this query proves they compose bit-reproducibly.
    "q_pipeline_e2e" -> { (s, dir) =>
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
      fin.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text")).cast("long"))
            .as("total_tokens"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy(col("source"))
    },

    // The pipeline's decision trace: every document labeled with the
    // FIRST stage that drops it (gopher → dedup → trim) or kept — the
    // "where did my documents go" funnel per source, all three stage
    // decisions deterministic and replayed by the oracle.
    "q_curation_funnel" -> { (s, dir) =>
      Curation.pipelineFunnel(Tables(s, dir).documents, "doc_id", "text",
          col("n_chars"), minWords = 20, lo = 0.05, hi = 0.95)
        .groupBy(col("source"), col("stage"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("source"), col("stage"))
    },

    // Length-complete contamination: short probes (< n tokens) route
    // through the exact-substring scan, long probes through the n-gram
    // hash join — closes the short-probe false-negative of the pure
    // n-gram leg. Oracle replays the routing decision by token count.
    "q_contamination_full" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val probes = docs.filter(col("doc_id") < 2)
        .select(col("doc_id").as("pid"), substring(col("text"), 1, 40).as("ptext"))
        .unionByName(docs.filter(col("doc_id") === 2)
          .select(col("doc_id").as("pid"), substring(col("text"), 1, 200).as("ptext")))
      Contamination.overlapComplete(docs, "doc_id", "text",
          probes, "pid", "ptext", n = 13)
        .orderBy(col("probe_id"), col("doc_id"))
    },

    // Head+tail token truncation: cap long docs at 64 tokens (48 head +
    // 16 tail) — pure array slice, replayed exactly in SQL.
    "q_truncate_tokens" -> { (s, dir) =>
      Curation.truncateTokens(Tables(s, dir).documents, "doc_id", "text",
          maxTokens = 64, headFrac = 0.75)
        .orderBy(col("doc_id"))
    },

    // Corpus report card: the per-source audit summary a curation run
    // ends with — volume, token mass, mean quality, exact-dup count.
    // Every component is an already-oracle-proven portable expression.
    "q_corpus_report" -> { (s, dir) =>
      Tables(s, dir).documents
        .select(col("source"),
          TextFunctions.tokenCount(col("text")).as("tok"),
          TextFunctions.qualityScore(col("text")).as("q"),
          TextFunctions.fingerprintPortable(col("text")).as("fp"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tok")).as("total_tokens"),
          davg(col("q")).as("avg_quality"),
          (count(lit(1)) - countDistinct(col("fp"))).as("n_dup_docs"))
        .orderBy(col("source"))
    },
  )

  private val markers = TextFunctions.LanguageMarkers
  private def inList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Shared DuckDB dHash chain (through `pairs`: id_a, id_b, hamming)
    * — the SQL twin of [[imageDHashPairs]], one definition for both
    * image oracles. */
  private val imageDHashCte: String =
    """g AS (
           SELECT doc_id,
             list_transform(range(0, 9), gx ->
               list_transform(range(0, 8), gy ->
                 list_sum(list_transform(range(0, 16), k ->
                   (((((doc_id - doc_id % 2) + 11)
                        * ((gy*4 + k//4) * 36 + gx*4 + k%4 + 17)
                        * ((gy*4 + k//4) * 36 + gx*4 + k%4 + 29)
                      + ((doc_id - doc_id % 2) // 256)
                        * ((gy*4 + k//4) * 36 + gx*4 + k%4 + 41)
                        * ((gy*4 + k//4) * 36 + gx*4 + k%4 + 53)) % 256
                      + (doc_id % 2) * 2) % 256
                    + (((doc_id - doc_id % 2) + 23)
                        * ((gy*4 + k//4) * 36 + gx*4 + k%4 + 31)
                        * ((gy*4 + k//4) * 36 + gx*4 + k%4 + 7)
                      + ((doc_id - doc_id % 2) // 256)
                        * ((gy*4 + k//4) * 36 + gx*4 + k%4 + 59)
                        * ((gy*4 + k//4) * 36 + gx*4 + k%4 + 3)) % 256
                    + (((doc_id - doc_id % 2) + 5)
                        * ((gy*4 + k//4) * 36 + gx*4 + k%4 + 13)
                        * ((gy*4 + k//4) * 36 + gx*4 + k%4 + 37)
                      + ((doc_id - doc_id % 2) // 256)
                        * ((gy*4 + k//4) * 36 + gx*4 + k%4 + 43)
                        * ((gy*4 + k//4) * 36 + gx*4 + k%4 + 19)) % 256) // 3
                 )) // 16
               )) AS grid
           FROM documents),
         h AS (
           SELECT doc_id,
             list_transform(range(0, 4), b ->
               list_sum(list_transform(range(0, 16), k2 ->
                 CASE WHEN grid[(k2%8) + 2][2*b + k2//8 + 1] > grid[(k2%8) + 1][2*b + k2//8 + 1]
                      THEN 1 << ((k2//8)*8 + k2%8) ELSE 0 END))) AS hs
           FROM g),
         hbl AS (SELECT doc_id, b, hs[b + 1] AS v
           FROM h, unnest(range(0, 4)) AS u(b)),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b
           FROM hbl a JOIN hbl bb
             ON a.b = bb.b AND a.v = bb.v AND a.doc_id < bb.doc_id),
         pairs AS (SELECT id_a, id_b,
             bit_count(xor(CAST(ha.hs[1] AS BIGINT), CAST(h2.hs[1] AS BIGINT))) +
             bit_count(xor(CAST(ha.hs[2] AS BIGINT), CAST(h2.hs[2] AS BIGINT))) +
             bit_count(xor(CAST(ha.hs[3] AS BIGINT), CAST(h2.hs[3] AS BIGINT))) +
             bit_count(xor(CAST(ha.hs[4] AS BIGINT), CAST(h2.hs[4] AS BIGINT))) AS hamming
           FROM cand
           JOIN h ha ON ha.doc_id = cand.id_a
           JOIN h h2 ON h2.doc_id = cand.id_b)"""

  /** DuckDB expression computing the same SRP bucket as
    * [[VectorFunctions.srpBucket]]: the seeded planes are deterministic, so
    * they inline as double literals (Double.toString round-trips exactly)
    * and both engines do the identical double arithmetic. */
  private def srpBucketSqlFrom(embExpr: String, planes: Seq[Seq[Double]]): String =
    planes.zipWithIndex.map { case (p, i) =>
      val lits = p.map(_.toString).mkString("[", ", ", "]")
      s"CASE WHEN list_inner_product($embExpr, $lits) >= 0 THEN ${1 << i} ELSE 0 END"
    }.mkString("(", " + ", ")")

  private def srpBucketSql(embExpr: String, nPlanes: Int, dim: Int): String =
    srpBucketSqlFrom(embExpr, VectorFunctions.makePlanes(nPlanes, dim))

  /** DuckDB list of |⟨emb, plane_i⟩| magnitudes in plane order — the
    * multi-probe perturbation margins, same inlined-literal convention
    * as [[srpBucketSqlFrom]]. */
  private def srpMarginsSql(embExpr: String, nPlanes: Int, dim: Int): String =
    VectorFunctions.makePlanes(nPlanes, dim).map { p =>
      val lits = p.map(_.toString).mkString("[", ", ", "]")
      s"abs(list_inner_product($embExpr, $lits))"
    }.mkString("[", ", ", "]")

  /** UNION ALL of per-table (vec_id, ne, tbl, bucket) selects replicating
    * [[Similarity.cosinePairsBlocked]]'s multi-table bucketing. */
  private def srpTablesSql(nPlanes: Int, nTables: Int, dim: Int): String = {
    val planes = VectorFunctions.makePlanes(nPlanes * nTables, dim)
    (0 until nTables).map { t =>
      val bucket = srpBucketSqlFrom("ne", planes.slice(t * nPlanes, (t + 1) * nPlanes))
      s"SELECT vec_id, ne, $t AS tbl, $bucket AS bucket FROM e"
    }.mkString(" UNION ALL ")
  }

  /** DuckDB expression replaying [[Multimodal.FakeCodec.payloadHash]]:
    * UTF-8 bytes recovered from a hex encoding (`hxCol` must bind
    * `hex(encode(<text>))`; two hex chars per byte), folded through the
    * same base-256 rolling hash mod M (list_reduce with a prepended 0
    * seed — the fold is sequential on both engines). Every intermediate
    * is < M·256 — i64-safe by the same bound the Scala loop relies on. */
  private def fakeCodecH0Sql(hxCol: String): String = {
    val m = Multimodal.FakeCodec.M
    s"""CAST(list_reduce(list_prepend(0, list_transform(range(0, len($hxCol) // 2),
         i -> (strpos('0123456789ABCDEF', substr($hxCol, 2*i+1, 1)) - 1) * 16
            + (strpos('0123456789ABCDEF', substr($hxCol, 2*i+2, 1)) - 1))),
         (acc, b) -> (acc * 256 + b) % $m) AS BIGINT)"""
  }

  /** LCG jump constants (A^d mod M, C·(A^(d−1)+…+1) mod M) for d = 1…64:
    * [[Multimodal.FakeCodec]] feature d is ((a_d·h0 + b_d) mod M mod
    * 1000)/1000 in closed form, so the oracle computes any feature
    * without iterating the LCG. */
  private val lcgJump: IndexedSeq[(Long, Long)] = {
    import Multimodal.FakeCodec.{A, C, M}
    Iterator.iterate((A % M, C % M)) { case (a, b) =>
      ((a * A) % M, (b * A + C) % M)
    }.take(64).toIndexedSeq
  }

  /** Scalar SQL for stub-codec feature `d` (1-based) as an UNROUNDED
    * double with exactly three decimal digits in [-1, 1]. a_d·h0 can
    * reach ~10^24, so the multiply routes through HUGEINT before the
    * mod brings it back to i64 range. */
  private def fakeFeatureSql(h0Expr: String, d: Int): String = {
    val (a, b) = lcgJump(d - 1)
    s"""((CAST((CAST($a AS HUGEINT) * $h0Expr + $b)
         % ${Multimodal.FakeCodec.M} AS BIGINT) % 2001 - 1000) / 1000.0)"""
  }

  /** SQL for the full `dim`-wide stub-codec feature vector, with each
    * element routed through FLOAT then DOUBLE — the exact value chain of
    * the engine (Array[Float] features cast to array<double>), so
    * normalization and dot products agree bit-for-bit. */
  private def fakeEmbSql(h0Col: String, dim: Int): String = {
    val m = Multimodal.FakeCodec.M
    val as = (1 to dim).map(d => lcgJump(d - 1)._1).mkString("[", ", ", "]")
    val bs = (1 to dim).map(d => lcgJump(d - 1)._2).mkString("[", ", ", "]")
    s"""list_transform(range(1, ${dim + 1}), d ->
         CAST(CAST((CAST((CAST(($as)[d] AS HUGEINT) * $h0Col + ($bs)[d]) % $m
              AS BIGINT) % 2001 - 1000) / 1000.0
            AS FLOAT) AS DOUBLE))"""
  }

  // Shared by q_decontam_scrub (relational) and q_decontam_stream (native
  // projection): one output contract, two execution strategies, one oracle.
  private val decontamScrubSql: String =
    """WITH tk AS (
           SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '') AS toks
           FROM documents),
         pk AS (
           SELECT list_filter(string_split_regex(lower(substr(text, 1, 120)), '[^a-z'']+'), x -> x <> '') AS ptoks
           FROM documents WHERE doc_id < 3),
         pg AS (
           SELECT DISTINCT array_to_string(ptoks[i : i + 4], ' ') AS g
           FROM (SELECT ptoks, unnest(range(1, len(ptoks) - 3)) AS i
                 FROM pk WHERE len(ptoks) >= 5)),
         occ AS (
           SELECT doc_id, i - 1 AS pos, array_to_string(toks[i : i + 4], ' ') AS g
           FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 3)) AS i
                 FROM tk WHERE len(toks) >= 5)),
         hit AS (SELECT o.doc_id, o.pos FROM occ o JOIN pg USING (g)),
         tok AS (
           SELECT doc_id, unnest(toks) AS t, unnest(range(0, len(toks))) AS i
           FROM tk),
         removedpos AS (
           SELECT DISTINCT t.doc_id, t.i
           FROM tok t JOIN hit d
             ON t.doc_id = d.doc_id AND t.i >= d.pos AND t.i < d.pos + 5),
         kept AS (
           SELECT t.doc_id, t.i, t.t
           FROM tok t LEFT JOIN removedpos r
             ON t.doc_id = r.doc_id AND t.i = r.i
           WHERE r.i IS NULL),
         agg AS (
           SELECT doc_id, count(*) AS n_kept,
             string_agg(t, ' ' ORDER BY i) AS scrubbed_text
           FROM kept GROUP BY doc_id)
         SELECT k.doc_id,
           CAST(len(k.toks) AS BIGINT) AS n_tokens,
           CAST(len(k.toks) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
           coalesce(a.scrubbed_text, '') AS scrubbed_text
         FROM tk k LEFT JOIN agg a USING (doc_id)
         ORDER BY k.doc_id"""

  val oracles: Map[String, String] = Map(
    "q_dedup_exact_rows" ->
      """WITH k AS (
           SELECT doc_id, lang, source, n_chars,
             md5(trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS fp
           FROM documents),
         m AS (SELECT fp, min(doc_id) AS keep FROM k GROUP BY fp)
         SELECT k.doc_id, k.lang, k.source, k.n_chars
         FROM k JOIN m ON k.fp = m.fp AND k.doc_id = m.keep
         ORDER BY k.doc_id""",
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keeper, count(*) AS n_dups FROM documents
         GROUP BY md5(trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')))
         ORDER BY keeper""",
    "q_dedup_clusters" ->
      """WITH g AS (
           SELECT count(*) AS n_dups FROM documents
           GROUP BY md5(trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))))
         SELECT n_dups, count(*) AS n_clusters FROM g
         GROUP BY n_dups ORDER BY n_dups""",
    // Self-asserting minhash gate: the deterministic row set is the exact
    // shingle-Jaccard pairs at >= 0.9 (same replay as q_ngram_jaccard);
    // the engine-computed LSH-recall and estimator-bound booleans are
    // pinned TRUE.
    "q_dedup_minhash" ->
      """WITH tok AS (
           SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), t -> t <> '') AS ts
           FROM documents),
         sh AS (
           SELECT doc_id,
             CASE WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
                  ELSE list_transform(range(1, len(ts) - 1), i -> array_to_string(ts[i:i+2], ' '))
             END AS s
           FROM tok
           WHERE len(ts) > 0),
         d AS (SELECT doc_id, list_distinct(s) AS s FROM sh)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.s, b.s))::DOUBLE /
                 len(list_distinct(list_concat(a.s, b.s))), 4) AS jac,
           TRUE AS lsh_found, TRUE AS est_ok
         FROM d a, d b
         WHERE a.doc_id < b.doc_id
           AND len(list_intersect(a.s, b.s))::DOUBLE /
               len(list_distinct(list_concat(a.s, b.s))) >= 0.9
         ORDER BY id_a, id_b""",
    // Self-asserting simhash gate: exact tokenized-doc count companion;
    // signature-consistency and rotation-blocking-agreement booleans
    // pinned TRUE.
    "q_dedup_simhash" ->
      """SELECT count(*) AS n_docs, TRUE AS dist_ok, TRUE AS rotation_agree_ok,
                TRUE AS blocks_agree_ok
         FROM documents
         WHERE len(list_filter(string_split_regex(lower(text), '[^a-z'']+'), t -> t <> '')) > 0""",
    // Self-asserting near-dedup pipeline gate: exact doc / exact-dup-group
    // companions; component-invariant booleans pinned TRUE.
    "q_dedup_pipeline" ->
      """WITH g AS (
           SELECT md5(trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS fp
           FROM documents
           WHERE len(list_filter(string_split_regex(lower(text), '[^a-z'']+'), t -> t <> '')) > 0
           GROUP BY 1 HAVING count(*) >= 2)
         SELECT (SELECT count(*) FROM documents) AS n_docs,
           (SELECT count(*) FROM g) AS n_exact_groups,
           TRUE AS keeper_min_ok, TRUE AS canonical_ok,
           TRUE AS exact_dedup_ok, TRUE AS hi_merge_ok""",
    // Self-asserting trained-IVF gate: the centroid id set is exact (kMeans
    // preserves the deterministic first-k-by-id init ids); argmin-assignment
    // and Lloyd's-monotonicity booleans pinned TRUE.
    "q_similarity_ivf_trained" ->
      """SELECT vec_id AS centroid_id, TRUE AS assign_ok, TRUE AS cost_ok
         FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)
         ORDER BY centroid_id""",
    "q_similarity_sq8" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         b AS (
           SELECT r.pos, min(e.v[r.pos]) AS mn, max(e.v[r.pos]) AS mx
           FROM e, unnest(range(1, len(e.v) + 1)) AS r(pos)
           GROUP BY r.pos),
         q AS (
           SELECT e.vec_id, r.pos,
             CASE WHEN b.mx = b.mn THEN 0
                  ELSE CAST(least(255.0, greatest(0.0,
                    floor((e.v[r.pos] - b.mn) * 255.0 / (b.mx - b.mn)))) AS INT)
             END AS code,
             b.mn, b.mx
           FROM e, unnest(range(1, len(e.v) + 1)) AS r(pos)
           JOIN b ON b.pos = r.pos),
         d AS (
           SELECT vec_id,
             list(mn + (code + 0.5) * (mx - mn) / 255.0 ORDER BY pos) AS deq
           FROM q GROUP BY vec_id),
         dd AS (
           SELECT vec_id, deq, list_inner_product(deq, deq) AS self_dot FROM d),
         p AS (
           SELECT vec_id AS probe_id, v AS pv, list_inner_product(v, v) AS pp
           FROM e WHERE vec_id < 10),
         s AS (
           SELECT p.probe_id, dd.vec_id AS cand_id,
             p.pp - 2.0 * list_inner_product(p.pv, dd.deq) + dd.self_dot AS adist
           FROM dd CROSS JOIN p WHERE dd.vec_id <> p.probe_id),
         top AS (
           SELECT probe_id, cand_id, adist,
             row_number() OVER (PARTITION BY probe_id ORDER BY adist, cand_id) AS rn
           FROM s)
         SELECT probe_id, cand_id, round(adist, 6) AS adist
         FROM top WHERE rn <= 5
         ORDER BY probe_id, cand_id""",

    "q_similarity_pq" ->
      """SELECT vec_id AS probe_id,
           (SELECT count(*) FROM embeddings) AS n_vecs,
           TRUE AS encode_ok, TRUE AS adc_ok, TRUE AS cost_ok
         FROM embeddings WHERE vec_id < 5 ORDER BY probe_id""",
    // Self-asserting IVF+PQ gate: probe ids + corpus count exact; the
    // composition invariants (full-probe ≡ plain PQ, independent distance
    // re-derivation, inverted-list membership) ride as booleans pinned TRUE.
    "q_similarity_ivfpq" ->
      """SELECT vec_id AS probe_id,
           (SELECT count(*) FROM embeddings) AS n_vecs,
           TRUE AS full_eq_ok, TRUE AS pruned_dist_ok, TRUE AS pruned_block_ok
         FROM embeddings WHERE vec_id < 5 ORDER BY probe_id""",
    "q_ngram_jaccard" ->
      """WITH tok AS (
           SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), t -> t <> '') AS ts
           FROM documents),
         sh AS (
           SELECT doc_id,
             CASE WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
                  ELSE list_transform(range(1, len(ts) - 1), i -> array_to_string(ts[i:i+2], ' '))
             END AS s
           FROM tok
           WHERE len(ts) > 0),
         d AS (SELECT doc_id, list_distinct(s) AS s FROM sh)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.s, b.s))::DOUBLE /
                 len(list_distinct(list_concat(a.s, b.s))), 4) AS jac
         FROM d a, d b
         WHERE a.doc_id < b.doc_id
           AND len(list_intersect(a.s, b.s))::DOUBLE /
               len(list_distinct(list_concat(a.s, b.s))) >= 0.8
         ORDER BY id_a, id_b""",
    // direct vector-kernel parity: DuckDB's list kernels sum
    // sequentially over the same float→double-widened values; 4 dp
    // absorbs any last-ulp tree difference (the sqdist elementwise sum
    // is spelled with the same (a-b)² element order as the native).
    "q_vector_ops" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         r AS (SELECT v AS ref FROM e WHERE vec_id = 0)
         SELECT vec_id,
           round(list_inner_product(v, ref), 4) AS dot_ref,
           round(sqrt(list_inner_product(v, v)), 4) AS l2,
           round(list_inner_product(v, ref) /
             (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(ref, ref))), 4)
             AS cos_ref,
           round(list_sum(list_transform(range(1, len(v) + 1),
             i -> (v[i] - ref[i]) * (v[i] - ref[i]))), 4) AS sqdist_ref,
           round(sqrt(list_inner_product(
             list_transform(v, x -> x / sqrt(list_inner_product(v, v))),
             list_transform(v, x -> x / sqrt(list_inner_product(v, v))))), 4)
             AS unit_norm
         FROM e, r WHERE vec_id < 50 ORDER BY vec_id""",

    "q_similarity_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         p AS (SELECT vec_id AS probe_id, emb AS pe FROM e WHERE vec_id < 5),
         scored AS (
           SELECT probe_id, c.vec_id AS cand_id,
             list_inner_product(pe, c.emb) /
               (sqrt(list_inner_product(pe, pe)) * sqrt(list_inner_product(c.emb, c.emb))) AS raw
           FROM p, e c WHERE c.vec_id <> probe_id),
         ranked AS (
           SELECT probe_id, cand_id, raw,
             row_number() OVER (PARTITION BY probe_id ORDER BY raw DESC, cand_id) AS rn
           FROM scored)
         SELECT probe_id, cand_id, round(raw, 4) AS score FROM ranked WHERE rn <= 3
         ORDER BY probe_id, raw DESC, cand_id""",
    "q_embedding_neardup" ->
      s"""WITH e AS (
           SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> x / sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                                CAST(embedding AS DOUBLE[])))) AS ne
           FROM embeddings),
         b AS (${srpTablesSql(4, 4, 64)}),
         cand AS (
           SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
           FROM b a JOIN b c
             ON a.tbl = c.tbl AND a.bucket = c.bucket AND a.vec_id < c.vec_id)
         SELECT id_a, id_b
         FROM cand
         JOIN e ea ON ea.vec_id = id_a
         JOIN e eb ON eb.vec_id = id_b
         WHERE list_inner_product(ea.ne, eb.ne) >= 0.4
         ORDER BY id_a, id_b""",
    // replays BOTH sides of the recall audit: the SRP-blocked top-3 (same
    // seeded planes) and the exact brute-force top-3, then the per-probe
    // hit count — identical tie-breaks (raw DESC, cand_id) on both sides.
    "q_similarity_recall" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         b AS (SELECT vec_id, emb, ${srpBucketSql("emb", 4, 64)} AS bucket FROM e),
         p AS (SELECT vec_id AS probe_id, emb AS pe, bucket FROM b WHERE vec_id < 20),
         ann_scored AS (
           SELECT probe_id, c.vec_id AS cand_id,
             list_inner_product(pe, c.emb) /
               (sqrt(list_inner_product(pe, pe)) * sqrt(list_inner_product(c.emb, c.emb))) AS raw
           FROM p JOIN b c USING (bucket) WHERE c.vec_id <> probe_id),
         ann AS (SELECT probe_id, cand_id FROM (
             SELECT probe_id, cand_id,
               row_number() OVER (PARTITION BY probe_id ORDER BY raw DESC, cand_id) AS rn
             FROM ann_scored) WHERE rn <= 3),
         p2 AS (SELECT vec_id AS probe_id, emb AS pe FROM e WHERE vec_id < 20),
         ex_scored AS (
           SELECT probe_id, c.vec_id AS cand_id,
             list_inner_product(pe, c.emb) /
               (sqrt(list_inner_product(pe, pe)) * sqrt(list_inner_product(c.emb, c.emb))) AS raw
           FROM p2, e c WHERE c.vec_id <> probe_id),
         ex AS (SELECT probe_id, cand_id FROM (
             SELECT probe_id, cand_id,
               row_number() OVER (PARTITION BY probe_id ORDER BY raw DESC, cand_id) AS rn
             FROM ex_scored) WHERE rn <= 3),
         tot AS (SELECT probe_id, count(*) AS n_exact FROM ex GROUP BY probe_id),
         hit AS (SELECT ex.probe_id, count(*) AS n_hit
           FROM ex JOIN ann USING (probe_id, cand_id) GROUP BY ex.probe_id)
         SELECT t.probe_id, t.n_exact, coalesce(h.n_hit, 0) AS n_hit,
           round(coalesce(h.n_hit, 0)::DOUBLE / t.n_exact, 4) AS recall
         FROM tot t LEFT JOIN hit h USING (probe_id)
         ORDER BY t.probe_id""",
    "q_similarity_srp" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         b AS (SELECT vec_id, emb, ${srpBucketSql("emb", 4, 64)} AS bucket FROM e),
         p AS (SELECT vec_id AS probe_id, emb AS pe, bucket FROM b WHERE vec_id < 20),
         scored AS (
           SELECT probe_id, c.vec_id AS cand_id,
             list_inner_product(pe, c.emb) /
               (sqrt(list_inner_product(pe, pe)) * sqrt(list_inner_product(c.emb, c.emb))) AS raw
           FROM p JOIN b c USING (bucket) WHERE c.vec_id <> probe_id),
         ranked AS (
           SELECT probe_id, cand_id, raw,
             row_number() OVER (PARTITION BY probe_id ORDER BY raw DESC, cand_id) AS rn
           FROM scored)
         SELECT probe_id, cand_id, round(raw, 4) AS score FROM ranked WHERE rn <= 3
         ORDER BY probe_id, raw DESC, cand_id""",
    // multi-probe SRP: base bucket + XOR flips of the 2 lowest-|margin|
    // planes (ties by plane index), candidate dedup before scoring.
    "q_similarity_multiprobe" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         b AS (SELECT vec_id, emb, ${srpBucketSql("emb", 4, 64)} AS bucket FROM e),
         p0 AS (SELECT vec_id AS probe_id, emb AS pe, bucket AS b0 FROM b WHERE vec_id < 20),
         m AS (SELECT probe_id, pe, b0, ${srpMarginsSql("pe", 4, 64)} AS mg FROM p0),
         f AS (SELECT probe_id, pe, b0, i FROM (
             SELECT probe_id, pe, b0, CAST(i AS INTEGER) AS i,
               row_number() OVER (PARTITION BY probe_id ORDER BY mg[CAST(i + 1 AS INTEGER)], i) AS rn
             FROM m, unnest(range(0, 4)) AS u(i)) WHERE rn <= 2),
         pb AS (SELECT probe_id, pe, b0 AS bucket FROM m
           UNION ALL
           SELECT probe_id, pe, xor(b0, 1 << i) AS bucket FROM f),
         cand AS (SELECT DISTINCT probe_id, pe, c.vec_id AS cand_id, c.emb AS ce
           FROM pb JOIN b c ON c.bucket = pb.bucket WHERE c.vec_id <> probe_id),
         scored AS (SELECT probe_id, cand_id,
             list_inner_product(pe, ce) /
               (sqrt(list_inner_product(pe, pe)) * sqrt(list_inner_product(ce, ce))) AS raw
           FROM cand),
         ranked AS (SELECT probe_id, cand_id, raw,
             row_number() OVER (PARTITION BY probe_id ORDER BY raw DESC, cand_id) AS rn
           FROM scored)
         SELECT probe_id, cand_id, round(raw, 4) AS score FROM ranked WHERE rn <= 3
         ORDER BY probe_id, raw DESC, cand_id""",
    // cluster-balanced sample: IVF argmin assignment + md5-order top-5
    // per cluster (the q_similarity_ivf and q_sample_perkey patterns).
    "q_cluster_sample" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         cents AS (SELECT vec_id AS centroid_id, emb AS cemb FROM e ORDER BY vec_id LIMIT 8),
         assigned AS (
           SELECT vec_id, centroid_id FROM (
             SELECT v.vec_id, c.centroid_id,
               row_number() OVER (PARTITION BY v.vec_id ORDER BY
                 list_sum(list_transform(range(1, len(v.emb) + 1),
                   i -> (v.emb[i] - c.cemb[i]) * (v.emb[i] - c.cemb[i]))) ASC,
                 c.centroid_id) AS rn
             FROM e v, cents c)
           WHERE rn = 1)
         SELECT vec_id, centroid_id FROM (
           SELECT vec_id, centroid_id,
             row_number() OVER (PARTITION BY centroid_id
               ORDER BY md5(coalesce(CAST(centroid_id AS VARCHAR), chr(0)) || '|' ||
                            coalesce(CAST(vec_id AS VARCHAR), chr(0)))) AS rn
           FROM assigned)
         WHERE rn <= 5
         ORDER BY centroid_id, vec_id""",
    // hard negatives: brute-force top-10 + argmin clusters, keep the 3
    // best candidates whose cluster differs from the probe's.
    "q_hard_negatives" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         cents AS (SELECT vec_id AS centroid_id, emb AS cemb FROM e ORDER BY vec_id LIMIT 8),
         assigned AS (
           SELECT vec_id, centroid_id FROM (
             SELECT v.vec_id, c.centroid_id,
               row_number() OVER (PARTITION BY v.vec_id ORDER BY
                 list_sum(list_transform(range(1, len(v.emb) + 1),
                   i -> (v.emb[i] - c.cemb[i]) * (v.emb[i] - c.cemb[i]))) ASC,
                 c.centroid_id) AS rn
             FROM e v, cents c)
           WHERE rn = 1),
         p AS (SELECT vec_id AS probe_id, emb AS pe FROM e WHERE vec_id < 10),
         scored AS (
           SELECT probe_id, c.vec_id AS cand_id,
             list_inner_product(pe, c.emb) /
               (sqrt(list_inner_product(pe, pe)) * sqrt(list_inner_product(c.emb, c.emb))) AS raw
           FROM p, e c WHERE c.vec_id <> probe_id),
         topk AS (SELECT probe_id, cand_id, raw FROM (
             SELECT probe_id, cand_id, raw,
               row_number() OVER (PARTITION BY probe_id ORDER BY raw DESC, cand_id) AS rn
             FROM scored)
           WHERE rn <= 10),
         negs AS (
           SELECT t.probe_id, t.cand_id, t.raw, ac.centroid_id AS neg_cluster
           FROM topk t
           JOIN assigned ap ON ap.vec_id = t.probe_id
           JOIN assigned ac ON ac.vec_id = t.cand_id
           WHERE ap.centroid_id <> ac.centroid_id),
         ranked AS (
           SELECT probe_id, cand_id, neg_cluster, raw,
             row_number() OVER (PARTITION BY probe_id ORDER BY raw DESC, cand_id) AS rn
           FROM negs)
         SELECT probe_id, cand_id, neg_cluster, round(raw, 4) AS score
         FROM ranked WHERE rn <= 3
         ORDER BY probe_id, raw DESC, cand_id""",
    // resize: out_len = min(budget, payload bytes) with budget = 75·75/64;
    // payload = utf8 bytes of text (octet_length on the encoded blob).
    "q_multimodal_resize" ->
      """SELECT doc_id, 75 AS width, 75 AS height,
           LEAST(87, octet_length(encode(text))) AS out_len
         FROM documents ORDER BY doc_id""",
    // stub-codec features replayed in closed form: h0 = position-weighted
    // byte sum mod M over hex-recovered UTF-8 bytes; feature d =
    // (A^d·h0 + B_d) mod M mod 1000 / 1000. f0/f7 have exactly three
    // decimals, so rounding the double agrees with the engine's
    // round(float→double) chain.
    "q_multimodal_features" ->
      s"""WITH hxt AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
         h AS (SELECT doc_id, ${fakeCodecH0Sql("hx")} AS h0 FROM hxt)
         SELECT doc_id,
           round(${fakeFeatureSql("h0", 1)}, 4) AS f0,
           round(${fakeFeatureSql("h0", 8)}, 4) AS f7
         FROM h ORDER BY doc_id""",
    // frame lengths are pure integer arithmetic on the payload byte
    // count: start = ⌊n·i/3⌋, end = ⌊n·(i+1)/3⌋, len = max(end, start+1)
    // − start; empty payloads emit no frames.
    "q_multimodal_frames" ->
      """WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n
           FROM documents WHERE octet_length(encode(text)) > 0),
         f AS (SELECT doc_id, unnest(range(0, 3)) AS frameIdx, n FROM m)
         SELECT doc_id, frameIdx,
           CAST(GREATEST((n * (frameIdx + 1)) // 3, (n * frameIdx) // 3 + 1)
                - (n * frameIdx) // 3 AS INT) AS frame_len
         FROM f ORDER BY doc_id, frameIdx""",
    // the full pipeline replayed: 64-dim stub features from the 64-char
    // thumbnail (float→double chain), unit-normalized, multi-table SRP
    // blocking with the same seeded planes, dot-product verify — the same
    // blocking-replay contract as q_embedding_neardup.
    "q_multimodal_pipeline" ->
      s"""WITH hxt AS (SELECT doc_id,
             hex(encode(substr(text, 1, 64))) AS hx FROM documents),
         h AS (SELECT doc_id AS vec_id, ${fakeCodecH0Sql("hx")} AS h0 FROM hxt),
         emb AS (SELECT vec_id, ${fakeEmbSql("h0", 64)} AS fe FROM h),
         e AS (SELECT vec_id,
             list_transform(fe, x -> x / sqrt(list_inner_product(fe, fe))) AS ne
           FROM emb),
         b AS (${srpTablesSql(8, 2, 64)}),
         cand AS (
           SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
           FROM b a JOIN b c
             ON a.tbl = c.tbl AND a.bucket = c.bucket AND a.vec_id < c.vec_id)
         SELECT id_a, id_b
         FROM cand
         JOIN e ea ON ea.vec_id = id_a
         JOIN e eb ON eb.vec_id = id_b
         WHERE list_inner_product(ea.ne, eb.ne) >= 0.999
         ORDER BY id_a, id_b""",
    // sqdist replicates Spark's aggregate(zip_with) left fold exactly:
    // per-index squared diff, sequential list_sum (verified bit-exact).
    "q_similarity_ivf" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         cents AS (SELECT vec_id AS centroid_id, emb AS cemb FROM e ORDER BY vec_id LIMIT 8),
         assigned AS (
           SELECT vec_id, emb, centroid_id FROM (
             SELECT v.vec_id, v.emb, c.centroid_id,
               row_number() OVER (PARTITION BY v.vec_id ORDER BY
                 list_sum(list_transform(range(1, len(v.emb) + 1),
                   i -> (v.emb[i] - c.cemb[i]) * (v.emb[i] - c.cemb[i]))) ASC,
                 c.centroid_id) AS rn
             FROM e v, cents c)
           WHERE rn = 1),
         p AS (SELECT vec_id AS probe_id, emb AS pe FROM e WHERE vec_id < 10),
         pc AS (
           SELECT probe_id, pe, centroid_id FROM (
             SELECT p.probe_id, p.pe, c.centroid_id,
               row_number() OVER (PARTITION BY p.probe_id ORDER BY
                 list_sum(list_transform(range(1, len(p.pe) + 1),
                   i -> (p.pe[i] - c.cemb[i]) * (p.pe[i] - c.cemb[i]))) ASC,
                 c.centroid_id) AS rn
             FROM p, cents c)
           WHERE rn <= 2),
         scored AS (
           SELECT pc.probe_id, a.vec_id AS cand_id,
             list_inner_product(pc.pe, a.emb) /
               (sqrt(list_inner_product(pc.pe, pc.pe)) * sqrt(list_inner_product(a.emb, a.emb))) AS raw
           FROM pc JOIN assigned a USING (centroid_id)
           WHERE a.vec_id <> pc.probe_id),
         ranked AS (
           SELECT probe_id, cand_id, raw,
             row_number() OVER (PARTITION BY probe_id ORDER BY raw DESC, cand_id) AS rn
           FROM scored)
         SELECT probe_id, cand_id, round(raw, 4) AS score FROM ranked WHERE rn <= 3
         ORDER BY probe_id, raw DESC, cand_id""",
    "q_text_stats" ->
      """SELECT lang, count(*) AS n,
           SUM(n_chars)::DOUBLE / count(*) AS avg_chars,
           SUM(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)))::DOUBLE
             / count(*) AS avg_tokens
         FROM documents GROUP BY lang ORDER BY lang""",
    "q_lang_id" ->
      s"""WITH tok AS (
            SELECT list_filter(string_split_regex(lower(text), '[^a-z'']+'), t -> t <> '') AS ts
            FROM documents),
          scores AS (
            SELECT
              len(list_filter(ts, t -> list_contains(${inList(markers("de"))}, t))) AS de,
              len(list_filter(ts, t -> list_contains(${inList(markers("en"))}, t))) AS en,
              len(list_filter(ts, t -> list_contains(${inList(markers("es"))}, t))) AS es,
              len(list_filter(ts, t -> list_contains(${inList(markers("fr"))}, t))) AS fr
            FROM tok)
          SELECT detected, count(*) AS n FROM (
            SELECT CASE
              WHEN greatest(de, en, es, fr) = 0 THEN 'und'
              WHEN fr = greatest(de, en, es, fr) THEN 'fr'
              WHEN es = greatest(de, en, es, fr) THEN 'es'
              WHEN en = greatest(de, en, es, fr) THEN 'en'
              ELSE 'de' END AS detected
            FROM scores)
          GROUP BY detected ORDER BY detected""",
    // the SQL-surface query replayed with the same lang-marker scoring
    // and [a-z'] token accounting as q_lang_id/q_token_counts.
    // one pinned TRUE row per REGISTERED native — generated from
    // GraftExtensions.functions itself, so registering a new function
    // without adding its audit leg fails the row-count compare.
    "q_sql_surface_audit" -> {
      val rows = graft.GraftExtensions.functions.map(_._1.funcName).sorted
        .map(n => s"('$n', TRUE)").mkString(", ")
      s"SELECT fn, ok FROM (VALUES $rows) AS t(fn, ok) ORDER BY fn"
    },

    "q_sql_surface" ->
      s"""WITH tok AS (
            SELECT list_filter(string_split_regex(lower(text), '[^a-z'']+'), t -> t <> '') AS ts
            FROM documents),
          scores AS (
            SELECT len(ts) AS ntok,
              len(list_filter(ts, t -> list_contains(${inList(markers("de"))}, t))) AS de,
              len(list_filter(ts, t -> list_contains(${inList(markers("en"))}, t))) AS en,
              len(list_filter(ts, t -> list_contains(${inList(markers("es"))}, t))) AS es,
              len(list_filter(ts, t -> list_contains(${inList(markers("fr"))}, t))) AS fr
            FROM tok),
          det AS (
            SELECT ntok, CASE
              WHEN greatest(de, en, es, fr) = 0 THEN 'und'
              WHEN fr = greatest(de, en, es, fr) THEN 'fr'
              WHEN es = greatest(de, en, es, fr) THEN 'es'
              WHEN en = greatest(de, en, es, fr) THEN 'en'
              ELSE 'de' END AS detected
            FROM scores)
          SELECT detected, count(*) AS n,
            CAST(SUM(ntok) AS BIGINT) AS total_tokens
          FROM det GROUP BY detected ORDER BY detected""",

    "q_dedup_keep_best" ->
      s"""WITH t AS (
           SELECT doc_id, text,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '') AS toks
           FROM documents),
         m AS (
           SELECT doc_id, text, len(toks) AS ntok,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE length(regexp_replace(lower(text), '[^a-z'']', '', 'g'))::DOUBLE / len(toks)
             END AS mwl,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE length(regexp_replace(text, '[^[:punct:]]', '', 'g'))::DOUBLE / length(text)
             END AS pr,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE len(list_filter(toks, x -> list_contains(${inList(TextFunctions.EnglishStopwords)}, x)))::DOUBLE / len(toks)
             END AS sr
           FROM t),
         q AS (
           SELECT doc_id, md5(substr(text, 1, 64)) AS grp,
             ((CASE WHEN ntok >= 5 AND ntok <= 100000 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN mwl >= 2.0 AND mwl <= 12.0 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN pr < 0.2 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN sr > 0.0 THEN 1.0 ELSE 0.0 END)) / 4.0 AS quality
           FROM m),
         ranked AS (
           SELECT doc_id, quality,
             row_number() OVER (PARTITION BY grp ORDER BY quality DESC, doc_id) AS rn
           FROM q)
         SELECT doc_id, quality FROM ranked WHERE rn = 1 ORDER BY doc_id""",
    "q_boilerplate" ->
      """WITH t AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks FROM documents),
         chunked AS (
           SELECT doc_id,
             array_to_string(list_transform(
               range(0, greatest(len(toks) - 1, 0) + 1, 10),
               i -> array_to_string(toks[i + 1 : i + 10], ' ')), chr(10)) AS ctext
           FROM t),
         ls AS (
           SELECT doc_id, unnest(segs) AS seg, unnest(range(1, len(segs) + 1)) AS pos
           FROM (SELECT doc_id, string_split(ctext, chr(10)) AS segs FROM chunked)),
         freq AS (
           SELECT seg FROM ls WHERE length(trim(seg)) > 0
           GROUP BY seg HAVING count(DISTINCT doc_id) >= 2),
         clean AS (
           SELECT doc_id, string_agg(seg, chr(10) ORDER BY pos) AS ct
           FROM ls ANTI JOIN freq USING (seg) GROUP BY doc_id)
         SELECT d.doc_id,
           length(coalesce(ct, '')) AS clean_len,
           md5(coalesce(ct, '')) AS clean_md5
         FROM documents d LEFT JOIN clean ON d.doc_id = clean.doc_id
         ORDER BY d.doc_id""",
    "q_boilerplate_segments" ->
      """WITH t AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks FROM documents),
         chunked AS (
           SELECT doc_id,
             array_to_string(list_transform(
               range(0, greatest(len(toks) - 1, 0) + 1, 10),
               i -> array_to_string(toks[i + 1 : i + 10], ' ')), chr(10)) AS ctext
           FROM t),
         ls AS (
           SELECT doc_id, unnest(string_split(ctext, chr(10))) AS seg
           FROM chunked)
         SELECT seg AS segment, count(DISTINCT doc_id) AS n_docs
         FROM ls WHERE length(trim(seg)) > 0
         GROUP BY seg HAVING count(DISTINCT doc_id) >= 2
         ORDER BY segment""",
    "q_pii_scrub" ->
      """WITH p AS (
           SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                  || '.7 or call +1 555 01'
                  || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS pii
           FROM documents),
         s AS (
           SELECT doc_id, pii,
             regexp_replace(regexp_replace(regexp_replace(pii,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
               '\+?[0-9][0-9()\-\s]{6,}[0-9]', '<PHONE>', 'g') AS sc
           FROM p)
         SELECT doc_id, md5(sc) AS scrubbed_md5,
           length(pii) - length(sc) AS removed_chars
         FROM s ORDER BY doc_id""",
    "q_hash_split" ->
      """WITH b AS (
           SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
               % 10000 AS bucket
           FROM documents)
         SELECT CASE WHEN bucket < 8000 THEN 0
                     WHEN bucket < 9000 THEN 1 ELSE 2 END AS split,
           count(*) AS n_docs, min(doc_id) AS min_id, max(doc_id) AS max_id
         FROM b GROUP BY 1 ORDER BY 1""",
    "q_weighted_sample_perkey" ->
      """WITH kd AS (
           SELECT source, doc_id, n_chars,
             -ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                    AS UBIGINT) + 0.5) / 4503599627370496.0)
               / CAST(n_chars AS DOUBLE) AS wkey
           FROM documents WHERE n_chars > 0),
         r AS (SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source ORDER BY wkey, doc_id) AS rn
           FROM kd)
         SELECT source, doc_id, n_chars FROM r WHERE rn <= 5
         ORDER BY source, doc_id""",

    // the A-Res keys replayed exactly: u from the first 52 md5 bits of
    // the id string, key = -ln(u)/weight, bottom-k by (key, id).
    "q_weighted_sample" ->
      """WITH kd AS (
           SELECT doc_id, n_chars,
             -ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                    AS UBIGINT) + 0.5) / 4503599627370496.0)
               / CAST(n_chars AS DOUBLE) AS wkey
           FROM documents WHERE n_chars > 0),
         pick AS (SELECT doc_id, n_chars FROM kd ORDER BY wkey, doc_id LIMIT 200)
         SELECT doc_id, n_chars FROM pick ORDER BY doc_id""",

    // split assignment replayed end-to-end: fingerprint → cluster rep
    // (min doc id) → md5 bucket → split; leakage-freedom is structural
    // (one split per fp by construction) so the boolean pins TRUE.
    "q_split_leakage_safe" ->
      """WITH g AS (
           SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS fp
           FROM documents),
         rep AS (SELECT fp, min(doc_id) AS rep FROM g GROUP BY fp),
         b AS (SELECT fp,
             CAST(('0x' || substr(md5(CAST(rep AS VARCHAR)), 1, 8)) AS UBIGINT)
               % 10000 AS bucket
           FROM rep),
         s AS (SELECT fp, CASE WHEN bucket < 8000 THEN 0
                               WHEN bucket < 9000 THEN 1 ELSE 2 END AS split
           FROM b)
         SELECT split, count(*) AS n_docs, count(DISTINCT g.fp) AS n_clusters,
           TRUE AS no_leakage
         FROM g JOIN s ON g.fp = s.fp
         GROUP BY split ORDER BY split""",

    "q_contamination_exact" ->
      """WITH probes AS (
           SELECT doc_id AS probe_id, substr(text, 1, 40) AS ptext
           FROM documents WHERE doc_id < 3)
         SELECT probe_id, d.doc_id
         FROM documents d, probes p
         WHERE strpos(d.text, p.ptext) > 0
         ORDER BY probe_id, d.doc_id""",
    "q_contamination_ngram" ->
      """WITH tk AS (
           SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '') AS toks
           FROM documents),
         dg AS (
           SELECT doc_id, unnest(CASE WHEN len(toks) < 5
             THEN [array_to_string(toks, ' ')]
             ELSE list_transform(range(1, len(toks) - 3),
                    i -> array_to_string(toks[i : i + 4], ' ')) END) AS g
           FROM tk),
         pt AS (
           SELECT doc_id AS probe_id,
             list_filter(string_split_regex(lower(substr(text, 1, 120)), '[^a-z'']+'), x -> x <> '') AS toks
           FROM documents WHERE doc_id < 3),
         pg AS (
           SELECT probe_id, unnest(CASE WHEN len(toks) < 5
             THEN [array_to_string(toks, ' ')]
             ELSE list_transform(range(1, len(toks) - 3),
                    i -> array_to_string(toks[i : i + 4], ' ')) END) AS g
           FROM pt)
         SELECT DISTINCT probe_id, doc_id
         FROM dg JOIN pg USING (g)
         ORDER BY probe_id, doc_id""",
    // Positional replay of the decontamination scrub. Gram convention is
    // ngramStrings' (EMPTY below n — no whole-text fallback), unlike the
    // detection query's shingleHashes convention. The stream-safe native
    // implementation must satisfy the IDENTICAL oracle (one contract,
    // two execution strategies).
    "q_decontam_scrub" -> decontamScrubSql,
    "q_decontam_stream" -> decontamScrubSql,
    // exact gram counts per (source, n); sub-n documents contribute
    // nothing — identical to Repetition.distinctNgramRatios.
    "q_distinct_n" -> {
      val per = Seq(1, 2, 3).map { n =>
        s"""SELECT source, CAST($n AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(DISTINCT g) AS BIGINT) AS n_distinct,
           CASE WHEN count(*) > 0 THEN
             round(CAST(count(DISTINCT g) AS DOUBLE)
               / CAST(count(*) AS DOUBLE), 6) END AS distinct_ratio
         FROM (SELECT source,
             unnest(list_transform(range(1, len(toks) - ${n - 2}),
               i -> array_to_string(toks[i : i + ${n - 1}], ' '))) AS g
           FROM (SELECT source,
               list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '') AS toks
             FROM documents)
           WHERE len(toks) >= $n)
         GROUP BY source"""
      }.mkString("\n         UNION ALL\n         ")
      s"""$per
         ORDER BY source, n"""
    },

    // gram identity replayed as md5 of the n-gram STRING (the
    // engine-portable convention) — identical to
    // Contamination.noveltyReport.
    "q_ngram_novelty" ->
      """WITH tk AS (SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '') AS toks
           FROM documents),
         gr AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 3),
                    i -> array_to_string(toks[i : i + 4], ' '))) AS g
           FROM tk WHERE len(toks) >= 5),
         refh AS (SELECT DISTINCT md5(g) AS h FROM gr WHERE doc_id % 2 = 0),
         doch AS (SELECT DISTINCT doc_id, md5(g) AS h FROM gr
           WHERE doc_id % 2 = 1),
         sc AS (SELECT d.doc_id, count(*) AS n_grams,
             SUM(CASE WHEN r.h IS NULL THEN 1 ELSE 0 END) AS n_novel
           FROM doch d LEFT JOIN refh r ON d.h = r.h GROUP BY 1)
         SELECT t.doc_id,
           CAST(COALESCE(n_grams, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(n_novel, 0) AS BIGINT) AS n_novel,
           CASE WHEN n_grams > 0 THEN
             round(CAST(n_novel AS DOUBLE) / CAST(n_grams AS DOUBLE), 6)
           END AS novelty
         FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) t
         LEFT JOIN sc ON t.doc_id = sc.doc_id ORDER BY t.doc_id""",

    // per-word JS terms as one fixed IEEE tree over exact counts,
    // rounded to 9 dp, summed as DECIMAL — identical to
    // Divergence.jsDivergenceMatrix.
    "q_js_divergence" ->
      """WITH tok AS (SELECT source AS s,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '')) AS w
           FROM documents),
         freq AS (SELECT s, w, count(*) AS c FROM tok GROUP BY 1, 2),
         tot AS (SELECT s, CAST(SUM(c) AS BIGINT) AS tot FROM freq GROUP BY 1),
         pairs AS (SELECT a.s AS ga, a.tot AS ta, b.s AS gb, b.tot AS tb
           FROM tot a, tot b WHERE a.s < b.s),
         sides AS (
           SELECT p.ga, p.gb, p.ta, p.tb, f.w, f.c AS ca,
             CAST(0 AS BIGINT) AS cb
           FROM freq f JOIN pairs p ON f.s = p.ga
           UNION ALL
           SELECT p.ga, p.gb, p.ta, p.tb, f.w, CAST(0 AS BIGINT), f.c
           FROM freq f JOIN pairs p ON f.s = p.gb),
         merged AS (SELECT ga, gb, ta, tb, w,
             MAX(ca) AS ca, MAX(cb) AS cb
           FROM sides GROUP BY 1, 2, 3, 4, 5),
         terms AS (SELECT ga, gb,
             CASE WHEN ca > 0 THEN 0.5 * (CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE))
                 * ln(2.0 * (CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE))
                   / ((CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE))
                      + (CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE))))
               ELSE 0.0 END
             + CASE WHEN cb > 0 THEN 0.5 * (CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE))
                 * ln(2.0 * (CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE))
                   / ((CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE))
                      + (CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE))))
               ELSE 0.0 END AS t
           FROM merged)
         SELECT ga AS group_a, gb AS group_b,
           CAST(count(*) AS BIGINT) AS n_words,
           round(CAST(SUM(CAST(round(t, 9) AS DECIMAL(28,12))) AS DOUBLE), 6) AS js
         FROM terms GROUP BY 1, 2 ORDER BY group_a, group_b""",

    // exact integer counts, one IEEE tree per probability — identical
    // to TextRelevance.kneserNeyBigram.
    "q_kneser_ney" ->
      """WITH tok AS (SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '') AS ts
           FROM documents),
         bg AS (SELECT ts[i] AS v, ts[i+1] AS w
           FROM tok, unnest(range(1, len(ts))) AS u(i) WHERE len(ts) >= 2),
         big AS (SELECT v, w, count(*) AS c FROM bg GROUP BY v, w),
         ctx AS (SELECT v, CAST(sum(c) AS BIGINT) AS cv,
             CAST(count(*) AS BIGINT) AS n1fw FROM big GROUP BY v),
         prec AS (SELECT w, CAST(count(*) AS BIGINT) AS n1prec
           FROM big GROUP BY w),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n1all FROM big)
         SELECT big.v, big.w, big.c,
           round(greatest(CAST(c AS DOUBLE) - 0.75, 0.0) / CAST(cv AS DOUBLE)
             + 0.75 * CAST(n1fw AS DOUBLE) / CAST(cv AS DOUBLE)
               * (CAST(n1prec AS DOUBLE) / CAST(n1all AS DOUBLE)), 6) AS p_kn
         FROM big JOIN ctx ON big.v = ctx.v JOIN prec ON big.w = prec.w, tot
         WHERE c >= 5 ORDER BY big.v, big.w""",

    // rounded-then-DECIMAL ln sums (the perplexity device); OLS trees
    // identical to TextRelevance.zipfFit.
    "q_zipf" ->
      """WITH tok AS (SELECT
             unnest(list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '')) AS t
           FROM documents),
         f AS (SELECT t AS w, count(*) AS freq FROM tok GROUP BY 1
           ORDER BY freq DESC, w LIMIT 100),
         r AS (SELECT freq,
             row_number() OVER (ORDER BY freq DESC, w) AS rnk FROM f),
         q0 AS (SELECT round(ln(CAST(rnk AS DOUBLE)), 9) AS xd,
             round(ln(CAST(freq AS DOUBLE)), 9) AS yd FROM r),
         q AS (SELECT CAST(xd AS DECIMAL(28,12)) AS x,
             CAST(yd AS DECIMAL(28,12)) AS y,
             CAST(round(xd * yd, 9) AS DECIMAL(28,12)) AS xy,
             CAST(round(xd * xd, 9) AS DECIMAL(28,12)) AS xx,
             CAST(round(yd * yd, 9) AS DECIMAL(28,12)) AS yy
           FROM q0),
         a AS (SELECT CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(xy) AS DOUBLE) AS sxy, CAST(sum(xx) AS DOUBLE) AS sxx,
             CAST(sum(yy) AS DOUBLE) AS syy
           FROM q),
         d AS (SELECT n_words, CAST(n_words AS DOUBLE) AS nd,
             sx, sy, sxy, sxx, syy,
             CAST(n_words AS DOUBLE) * sxx - sx * sx AS varx,
             CAST(n_words AS DOUBLE) * syy - sy * sy AS vary,
             CAST(n_words AS DOUBLE) * sxy - sx * sy AS cov
           FROM a)
         SELECT n_words,
           CASE WHEN n_words >= 2 AND varx > 0
             THEN round(cov / varx, 6) END AS slope,
           CASE WHEN n_words >= 2 AND varx > 0
             THEN round((sy - (cov / varx) * sx) / nd, 6) END AS intercept,
           CASE WHEN n_words >= 2 AND varx > 0 AND vary > 0
             THEN round(cov * cov / (varx * vary), 6) END AS r2
         FROM d""",

    "q_bigram_ppl" ->
      """WITH ref AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
         tgt AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
         rtok AS (SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '') AS ts
           FROM ref),
         rbg AS (SELECT ts[i] AS v, ts[i+1] AS w
           FROM rtok, unnest(range(1, len(ts))) AS u(i) WHERE len(ts) >= 2),
         big AS (SELECT v, w, count(*) AS cvw FROM rbg GROUP BY v, w),
         ctx AS (SELECT v, sum(cvw) AS cv FROM big GROUP BY v),
         runi AS (SELECT t AS w, count(*) AS cw FROM (
           SELECT unnest(ts) AS t FROM rtok) GROUP BY t),
         totals AS (SELECT CAST(sum(cw) AS BIGINT) AS total,
           count(*) AS vocab FROM runi),
         ttok AS (SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '') AS ts
           FROM tgt),
         tbg AS (SELECT doc_id, ts[i] AS v, ts[i+1] AS w
           FROM ttok, unnest(range(1, len(ts))) AS u(i) WHERE len(ts) >= 2),
         scored AS (
           SELECT doc_id,
             -ln(0.75 * (CASE WHEN big.cvw IS NOT NULL AND ctx.cv IS NOT NULL
                   THEN big.cvw::DOUBLE / ctx.cv ELSE 0.0 END)
               + 0.25 * (coalesce(runi.cw, 0) + 1)::DOUBLE / (total + vocab)) AS nlp
           FROM tbg
           LEFT JOIN big USING (v, w)
           LEFT JOIN ctx USING (v)
           LEFT JOIN runi USING (w), totals),
         perdoc AS (SELECT doc_id,
             CAST(sum(CAST(round(nlp, 9) AS DECIMAL(28,12))) AS DOUBLE)
               / count(*) AS log_ppl
           FROM scored GROUP BY doc_id)
         SELECT t.doc_id, round(p.log_ppl, 4) AS log_ppl
         FROM tgt t LEFT JOIN perdoc p ON t.doc_id = p.doc_id
         ORDER BY t.doc_id""",
    "q_perplexity" ->
      """WITH tok AS (
           SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '')) AS term
           FROM documents),
         tc AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         corpus AS (SELECT term AS t2, sum(tf) AS ctf FROM tc GROUP BY term),
         totals AS (SELECT sum(ctf) AS total, count(*) AS vocab FROM corpus),
         scored AS (
           SELECT doc_id, tf,
             -tf * ln(CAST(ctf + 1 AS DOUBLE) / (total + vocab)) AS nlp
           FROM tc, corpus, totals WHERE tc.term = corpus.t2),
         perdoc AS (
           SELECT doc_id,
             CAST(sum(CAST(round(nlp, 9) AS DECIMAL(28,12))) AS DOUBLE)
               / sum(tf) AS log_ppl
           FROM scored GROUP BY doc_id)
         SELECT d.doc_id, round(p.log_ppl, 4) AS log_ppl
         FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
         ORDER BY d.doc_id""",
    // Postings replay: DuckDB zips parallel unnests positionally, so the
    // (term, 1-based position) pairs come from one zipped unnest; the
    // 80%-of-corpus df cap filters after the per-(term,doc) aggregation,
    // exactly like the Spark join-back (identical IEEE double compare).
    "q_inverted_index" ->
      """WITH tk AS (SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '') AS toks
           FROM documents),
         pos AS (SELECT doc_id, unnest(toks) AS term,
             unnest(range(1, len(toks) + 1)) AS p
           FROM tk WHERE len(toks) > 0),
         post AS (SELECT term, doc_id, count(*) AS tf,
             array_to_string(list_sort(list(p)), ',') AS positions
           FROM pos GROUP BY term, doc_id),
         dfc AS (SELECT term, count(*) AS doc_freq FROM post GROUP BY term),
         n AS (SELECT count(*) AS nd FROM documents)
         SELECT p.term, p.doc_id, d.doc_freq, p.tf, p.positions
         FROM post p JOIN dfc d USING (term), n
         WHERE d.doc_freq <= n.nd * 0.8
         ORDER BY p.term, p.doc_id""",
    // Phrase replay: scan 1-based token positions directly for the
    // consecutive sequence — equivalent to the posting-frame join.
    "q_phrase_search" ->
      """WITH tk AS (SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '') AS toks
           FROM documents),
         st AS (SELECT doc_id,
             list_filter(range(1, len(toks) + 1),
               p -> p + 1 <= len(toks)
                 AND toks[CAST(p AS INT)] = 'value'
                 AND toks[CAST(p AS INT) + 1] = 'table') AS starts
           FROM tk)
         SELECT doc_id, CAST(len(starts) AS BIGINT) AS n_matches,
           starts[1] AS first_pos
         FROM st WHERE len(starts) > 0
         ORDER BY doc_id""",
    "q_tfidf" ->
      """WITH tok AS (
           SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '')) AS term
           FROM documents),
         tc AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         dfq AS (SELECT term AS t2, count(*) AS df FROM tc GROUP BY term),
         n AS (SELECT count(*) AS n_docs FROM documents),
         w AS (
           SELECT doc_id, term, tf,
             round(tf * (ln((n_docs + 1.0) / (df + 1)) + 1.0), 4) AS tfidf
           FROM tc, dfq, n WHERE tc.term = dfq.t2),
         ranked AS (
           SELECT doc_id, term, tf, tfidf,
             row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
           FROM w)
         SELECT doc_id, term, tf, tfidf FROM ranked WHERE rn <= 3
         ORDER BY doc_id, term""",
    "q_hybrid_rrf" ->
      """WITH tok AS (
           SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '')) AS term
           FROM documents),
         tc AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         dfq AS (SELECT term AS t2, count(*) AS df FROM tc GROUP BY term),
         lens AS (
           SELECT doc_id,
             len(list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '')) AS dl
           FROM documents),
         stats AS (
           SELECT (SELECT count(*) FROM documents) AS n_docs,
                  (SELECT avg(dl) FROM lens) AS avgdl),
         scored AS (
           SELECT tc.doc_id,
             ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) AS idf,
             tf * (1.2 + 1.0) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) AS tf_norm
           FROM tc, dfq, lens, stats
           WHERE tc.term = dfq.t2 AND tc.doc_id = lens.doc_id
             AND tc.term IN ('query', 'stream', 'vector')),
         lexs AS (SELECT doc_id,
             round(CAST(sum(CAST(round(idf * tf_norm, 9) AS DECIMAL(28,12)))
               AS DOUBLE), 9) AS s
           FROM scored GROUP BY doc_id),
         lex AS (SELECT doc_id,
             row_number() OVER (ORDER BY s DESC, doc_id) AS lex_rank
           FROM lexs),
         e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         p AS (SELECT v AS pv FROM e WHERE vec_id = 0),
         vecs AS (
           SELECT e.vec_id AS doc_id,
             round(list_inner_product(e.v, p.pv) /
               (sqrt(list_inner_product(e.v, e.v)) *
                sqrt(list_inner_product(p.pv, p.pv))), 9) AS c
           FROM e, p WHERE e.vec_id > 0 AND e.vec_id < 500),
         vec AS (SELECT doc_id,
             row_number() OVER (ORDER BY c DESC, doc_id) AS vec_rank
           FROM vecs),
         u AS (SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id,
             lex.lex_rank, vec.vec_rank
           FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id),
         r AS (SELECT doc_id, lex_rank, vec_rank,
             round(coalesce(1.0 / (60.0 + lex_rank), 0.0) +
                   coalesce(1.0 / (60.0 + vec_rank), 0.0), 6) AS rrf
           FROM u),
         top AS (SELECT * FROM r ORDER BY rrf DESC, doc_id LIMIT 20)
         SELECT doc_id, lex_rank, vec_rank, rrf FROM top ORDER BY doc_id""",

    "q_bm25" ->
      """WITH tok AS (
           SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '')) AS term
           FROM documents),
         tc AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         dfq AS (SELECT term AS t2, count(*) AS df FROM tc GROUP BY term),
         lens AS (
           SELECT doc_id,
             len(list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '')) AS dl
           FROM documents),
         stats AS (
           SELECT (SELECT count(*) FROM documents) AS n_docs,
                  (SELECT avg(dl) FROM lens) AS avgdl),
         scored AS (
           SELECT tc.doc_id,
             ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) AS idf,
             tf * (1.2 + 1.0) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) AS tf_norm
           FROM tc, dfq, lens, stats
           WHERE tc.term = dfq.t2 AND tc.doc_id = lens.doc_id
             AND tc.term IN ('query', 'stream', 'vector'))
         SELECT doc_id,
           round(CAST(sum(CAST(round(idf * tf_norm, 9) AS DECIMAL(28,12)))
             AS DOUBLE), 4) AS score,
           count(*) AS n_matched
         FROM scored GROUP BY doc_id ORDER BY doc_id""",
    // quality/bpe/fp replicated component-by-component. RE2 has no
    // lookarounds, so the BPE-piece split is emulated by inserting spaces at
    // the same boundaries and splitting on whitespace (equivalent piece
    // multiset — verified in TextFunctionsSpec against hand cases).
    "q_quality_scores" ->
      s"""WITH t AS (
           SELECT doc_id, text,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '') AS toks,
             list_filter(
               string_split_regex(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(text, '([a-zA-Z])([0-9])', '\\1 \\2', 'g'),
                     '([0-9])([a-zA-Z])', '\\1 \\2', 'g'),
                   '([^a-zA-Z0-9\\s])', ' \\1', 'g'),
                 '\\s+'),
               x -> x <> '') AS pieces
           FROM documents),
         m AS (
           SELECT doc_id, text, pieces,
             len(toks) AS ntok,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE length(regexp_replace(lower(text), '[^a-z'']', '', 'g'))::DOUBLE / len(toks)
             END AS mwl,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE length(regexp_replace(text, '[^[:punct:]]', '', 'g'))::DOUBLE / length(text)
             END AS pr,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE len(list_filter(toks, x -> list_contains(${inList(TextFunctions.EnglishStopwords)}, x)))::DOUBLE / len(toks)
             END AS sr
           FROM t)
         SELECT doc_id,
           ((CASE WHEN ntok >= 5 AND ntok <= 100000 THEN 1.0 ELSE 0.0 END)
          + (CASE WHEN mwl >= 2.0 AND mwl <= 12.0 THEN 1.0 ELSE 0.0 END)
          + (CASE WHEN pr < 0.2 THEN 1.0 ELSE 0.0 END)
          + (CASE WHEN sr > 0.0 THEN 1.0 ELSE 0.0 END)) / 4.0 AS quality,
           CAST(coalesce(list_sum(list_transform(pieces,
             p -> CAST(ceil(length(p)::DOUBLE / 4.0) AS BIGINT))), 0) AS BIGINT) AS bpe_tokens,
           md5(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))) AS fp
         FROM m ORDER BY doc_id""",
    "q_token_counts" ->
      """WITH tok AS (
           SELECT doc_id, text,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), t -> t <> '') AS lts
           FROM documents)
         SELECT doc_id,
           len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS n_ws_tokens,
           length(text) AS n_chars_actual,
           CASE WHEN len(lts) < 3 THEN 1 ELSE len(lts) - 2 END AS n_shingles
         FROM tok ORDER BY doc_id""",
    "q_repetition_ngrams" ->
      """WITH t AS (
           SELECT doc_id, text,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '') AS toks
           FROM documents),
         g AS (
           SELECT doc_id,
             unnest(CASE WHEN len(toks) >= 2
               THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
               ELSE CAST([] AS VARCHAR[]) END) AS gram
           FROM t),
         pg AS (
           SELECT doc_id, gram, count(*) AS cnt,
             count(*) * length(gram) AS mass
           FROM g GROUP BY doc_id, gram),
         pd AS (
           SELECT doc_id, max(mass) AS top_mass,
             coalesce(sum(mass) FILTER (WHERE cnt > 1), 0) AS dup_mass
           FROM pg GROUP BY doc_id)
         SELECT d.doc_id,
           CASE WHEN length(d.text) > 0
                THEN coalesce(pd.top_mass, 0)::DOUBLE / length(d.text)
                ELSE 0.0 END AS top_ngram_frac,
           CASE WHEN length(d.text) > 0
                THEN coalesce(pd.dup_mass, 0)::DOUBLE / length(d.text)
                ELSE 0.0 END AS dup_ngram_frac
         FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
         ORDER BY d.doc_id""",
    "q_repetition_lines" ->
      """WITH l AS (
           SELECT doc_id,
             unnest([text, substr(text, 1, 50), substr(text, 1, 50)]) AS line
           FROM documents),
         nl AS (SELECT doc_id, line FROM l WHERE length(trim(line)) > 0),
         pl AS (
           SELECT doc_id, line, count(*) AS cnt, length(line) AS len
           FROM nl GROUP BY doc_id, line),
         pd AS (
           SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n,
             CAST(sum(cnt - 1) AS BIGINT) AS dups,
             CAST(sum(cnt * len) AS BIGINT) AS chars,
             CAST(sum((cnt - 1) * len) AS BIGINT) AS dup_chars
           FROM pl GROUP BY doc_id)
         SELECT d.doc_id, coalesce(pd.n, 0) AS n_lines,
           CASE WHEN coalesce(pd.n, 0) > 0
                THEN pd.dups::DOUBLE / pd.n ELSE 0.0 END AS dup_line_frac,
           CASE WHEN coalesce(pd.chars, 0) > 0
                THEN pd.dup_chars::DOUBLE / pd.chars ELSE 0.0 END AS dup_line_char_frac
         FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
         ORDER BY d.doc_id""",
    "q_stratified_sample" ->
      """WITH b AS (
           SELECT doc_id, lang,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
               % 10000 AS bucket
           FROM documents)
         SELECT lang, count(*) AS n_docs, min(doc_id) AS min_id,
           max(doc_id) AS max_id
         FROM b
         WHERE bucket < CASE lang WHEN 'en' THEN 5000
                                  WHEN 'de' THEN 2500
                                  WHEN 'fr' THEN 2500 ELSE 10000 END
         GROUP BY lang ORDER BY lang""",
    "q_quality_bins" ->
      s"""WITH t AS (
           SELECT doc_id, lang, text,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '') AS toks
           FROM documents),
         m AS (
           SELECT doc_id, lang,
             len(toks) AS ntok,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE length(regexp_replace(lower(text), '[^a-z'']', '', 'g'))::DOUBLE / len(toks)
             END AS mwl,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE length(regexp_replace(text, '[^[:punct:]]', '', 'g'))::DOUBLE / length(text)
             END AS pr,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE len(list_filter(toks, x -> list_contains(${inList(TextFunctions.EnglishStopwords)}, x)))::DOUBLE / len(toks)
             END AS sr
           FROM t),
         q AS (
           SELECT doc_id, lang,
             ((CASE WHEN ntok >= 5 AND ntok <= 100000 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN mwl >= 2.0 AND mwl <= 12.0 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN pr < 0.2 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN sr > 0.0 THEN 1.0 ELSE 0.0 END)) / 4.0 AS quality
           FROM m),
         binned AS (
           SELECT lang, quality,
             ntile(4) OVER (PARTITION BY lang ORDER BY quality, doc_id) AS bin
           FROM q)
         SELECT lang, bin, count(*) AS n_docs, min(quality) AS min_q,
           max(quality) AS max_q
         FROM binned GROUP BY lang, bin ORDER BY lang, bin""",
    "q_editdist_neardup" ->
      """WITH p AS (
           SELECT doc_id, substr(text, 1, 48) AS pre,
             length(text) // 64 AS band
           FROM documents)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           levenshtein(a.pre, b.pre) AS dist
         FROM p a JOIN p b ON a.band = b.band AND a.doc_id < b.doc_id
         WHERE levenshtein(a.pre, b.pre) <= 8
         ORDER BY id_a, id_b""",
    "q_chunk_overlap" ->
      """WITH tk AS (
           SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '') AS toks
           FROM documents),
         st AS (
           SELECT doc_id, toks,
             CAST(floor(greatest(len(toks) - 6 + 4 - 1, 0) / 4.0) AS INTEGER) * 4 AS last
           FROM tk WHERE len(toks) > 0),
         ch AS (
           SELECT doc_id, i, (i // 4) AS chunk_idx, toks[i + 1 : i + 6] AS ts
           FROM (SELECT doc_id, toks, last,
                   unnest(range(0, last + 1, 4)) AS i FROM st))
         SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
           CAST(len(ts) AS INTEGER) AS n_chunk_tokens,
           array_to_string(ts, ' ') AS chunk_text
         FROM ch ORDER BY doc_id, chunk_idx""",
    "q_seq_packing" ->
      """WITH t AS (
           SELECT doc_id,
             CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
               AS UBIGINT) % 8 AS BIGINT) AS shard,
             CAST(len(list_filter(string_split_regex(text, '\s+'),
               x -> len(x) > 0)) AS BIGINT) AS tokens
           FROM documents),
         c AS (
           SELECT doc_id, shard, tokens,
             CAST(sum(tokens) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_end
           FROM t WHERE tokens > 0)
         SELECT doc_id, shard, tokens,
           (cum_end - tokens) // 1024 AS start_seq,
           (cum_end - 1) // 1024 AS end_seq,
           (cum_end - tokens) % 1024 AS seq_offset
         FROM c ORDER BY doc_id""",
    "q_mixture_sample" ->
      """WITH c AS (
           SELECT lang, count(*) AS n FROM documents
           WHERE lang IN ('de', 'en', 'es', 'fr', 'zh') GROUP BY lang),
         tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM
           (SELECT count(*) AS n FROM documents)),
         r AS (
           SELECT lang, LEAST(1.0, 0.5 * total * 0.2 / n) AS rate
           FROM c, tot),
         kept AS (
           SELECT d.doc_id, d.lang
           FROM documents d JOIN r USING (lang)
           WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
             AS UBIGINT) / 4294967296.0 < r.rate)
         SELECT lang, count(*) AS n_kept, min(doc_id) AS min_id,
           max(doc_id) AS max_id
         FROM kept GROUP BY lang ORDER BY lang""",
    "q_mixture_tokens" ->
      """WITH w AS (
           SELECT doc_id, lang,
             len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS wt
           FROM documents),
         c AS (
           SELECT lang, CAST(sum(wt) AS BIGINT) AS mass FROM w
           WHERE lang IN ('de', 'en', 'es', 'fr', 'zh') GROUP BY lang),
         tot AS (SELECT CAST(sum(wt) AS BIGINT) AS total FROM w),
         r AS (
           SELECT lang, LEAST(1.0, 0.5 * total * 0.2 / mass) AS rate
           FROM c, tot),
         kept AS (
           SELECT d.doc_id, d.lang, d.wt
           FROM w d JOIN r USING (lang)
           WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
             AS UBIGINT) / 4294967296.0 < r.rate)
         SELECT lang, count(*) AS n_kept, CAST(sum(wt) AS BIGINT) AS kept_tokens,
           min(doc_id) AS min_id, max(doc_id) AS max_id
         FROM kept GROUP BY lang ORDER BY lang""",
    "q_mixture_epochs" ->
      """WITH r AS (
           SELECT doc_id, lang,
             CASE lang WHEN 'de' THEN 2.5 WHEN 'fr' THEN 1.25
                       WHEN 'en' THEN 0.4 ELSE 1.0 END AS rate,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
               AS UBIGINT) / 4294967296.0 AS hf
           FROM documents),
         n AS (
           SELECT doc_id, lang,
             CAST(floor(rate) AS BIGINT)
               + CASE WHEN hf < rate - floor(rate) THEN 1 ELSE 0 END AS n
           FROM r)
         SELECT doc_id, lang, unnest(range(0, n)) AS epoch
         FROM n WHERE n > 0
         ORDER BY doc_id, epoch""",
    "q_vocab_coverage" ->
      """WITH tok AS (
           SELECT unnest(string_split_regex(lower(text), '[^a-z'']+')) AS token
           FROM documents),
         c AS (
           SELECT token, count(*) AS cnt FROM tok
           WHERE token <> '' GROUP BY token),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
         top AS (
           SELECT token, cnt,
             row_number() OVER (ORDER BY cnt DESC, token) AS rank
           FROM c ORDER BY cnt DESC, token LIMIT 100)
         SELECT token, cnt, rank,
           CAST(sum(cnt) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING)
             AS DOUBLE) / CAST(total AS DOUBLE) AS coverage
         FROM top, tot ORDER BY rank""",
    "q_filter_eval" ->
      """WITH d AS (SELECT lang,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '') AS toks
           FROM documents WHERE lang IS NOT NULL),
         s0 AS (SELECT
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             len(list_filter(toks,
               t -> list_contains(['the', 'and', 'of', 'to', 'is', 'that', 'with'], t)))
               * 1.0 / len(toks) AS s
           FROM d WHERE len(toks) > 0),
         b AS (SELECT s, CAST(sum(y) AS BIGINT) AS np,
             CAST(count(*) - sum(y) AS BIGINT) AS nn
           FROM s0 GROUP BY s),
         c AS (SELECT s, np, nn,
             CAST(sum(nn) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_nn,
             CAST(sum(np) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_np
           FROM b),
         t AS (SELECT CAST(sum(np) AS BIGINT) AS p, CAST(sum(nn) AS BIGINT) AS n FROM b),
         a AS (SELECT CAST(sum(np * (2 * (cum_nn - nn) + nn)) AS BIGINT) AS num2 FROM c),
         w2 AS (SELECT s, p - (cum_np - np) AS paa, n - (cum_nn - nn) AS naa
           FROM c, t),
         cut AS (SELECT max(s) AS threshold FROM w2, t WHERE paa >= ceil(0.9 * p))
         SELECT p AS n_pos, n AS n_neg,
           round(num2 * 1.0 / (2.0 * p * n), 4) AS auc,
           round(threshold, 4) AS threshold,
           round(paa * 1.0 / (paa + naa), 4) AS precision,
           round(paa * 1.0 / p, 4) AS recall
         FROM w2, t, a, cut WHERE s = threshold""",

    "q_filter_bias" ->
      """WITH d AS (SELECT lang, source,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '') AS toks
           FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL),
         s0 AS (SELECT source AS g,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             len(list_filter(toks,
               t -> list_contains(['the', 'and', 'of', 'to', 'is', 'that', 'with'], t)))
               * 1.0 / len(toks) AS s
           FROM d WHERE len(toks) > 0),
         b AS (SELECT g, s, CAST(sum(y) AS BIGINT) AS np,
             CAST(count(*) - sum(y) AS BIGINT) AS nn
           FROM s0 GROUP BY g, s),
         c AS (SELECT g, s, np, nn,
             CAST(sum(nn) OVER (PARTITION BY g ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_nn
           FROM b),
         agg AS (SELECT g,
             CAST(sum(np) AS BIGINT) AS n_pos,
             CAST(sum(nn) AS BIGINT) AS n_neg,
             CAST(sum(np * (2 * (cum_nn - nn) + nn)) AS BIGINT) AS num2
           FROM c GROUP BY g)
         SELECT g AS "group", n_pos, n_neg,
           CASE WHEN n_pos > 0 AND n_neg > 0
                THEN round(num2 * 1.0 / (2.0 * n_pos * n_neg), 4) END AS auc
         FROM agg ORDER BY g""",

    "q_calibration" ->
      """WITH d AS (SELECT lang,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '') AS toks
           FROM documents WHERE lang IS NOT NULL),
         s0 AS (SELECT
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             len(list_filter(toks,
               t -> list_contains(['the', 'and', 'of', 'to', 'is', 'that', 'with'], t)))
               * 1.0 / len(toks) AS s
           FROM d WHERE len(toks) > 0),
         binned AS (SELECT least(CAST(floor(s * 10) AS BIGINT), 9) AS bin, y, s FROM s0)
         SELECT bin, count(*) AS n,
           round(sum(y) * 1.0 / count(*), 4) AS frac_pos,
           round(CAST(sum(CAST(round(s, 9) AS DECIMAL(28,12))) AS DOUBLE) / count(*), 4) AS mean_score
         FROM binned GROUP BY bin ORDER BY bin""",

    // Self-asserting classifier gate: per-label doc counts exact (label
    // SQL-replicated); the held-out metric floors ride pinned TRUE.
    "q_quality_classifier" ->
      """WITH t AS (
           SELECT list_filter(string_split_regex(lower(text), '[^a-z'']+'),
             x -> x <> '') AS ts
           FROM documents)
         SELECT CASE WHEN
             len(list_filter(ts, x -> x IN ('join', 'merge', 'hash', 'group'))) >
             len(list_filter(ts, x -> x IN ('scan', 'filter', 'sort', 'order')))
           THEN 'join_heavy' ELSE 'scan_heavy' END AS label,
           count(*) AS n_docs, TRUE AS acc_ok, TRUE AS auc_ok
         FROM t GROUP BY 1 ORDER BY label""",
    // Self-asserting CMS gate: top-50 token counts exact; the sketch
    // inequality booleans ride pinned TRUE.
    "q_cms_counts" ->
      """WITH tok AS (
           SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z'']+'),
             t -> t <> '')) AS token
           FROM documents)
         SELECT token, count(*) AS cnt, TRUE AS lower_ok, TRUE AS bound_ok
         FROM tok GROUP BY token
         ORDER BY cnt DESC, token LIMIT 50""",
    // Native-TypedImperativeAggregate CMS gate: exact top-20 companion;
    // rollup-equality and CMS-bound booleans ride pinned TRUE.
    "q_cms_native" ->
      """WITH tok AS (
           SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z'']+'),
             t -> t <> '')) AS token
           FROM documents)
         SELECT token, count(*) AS cnt,
                TRUE AS merge_ok, TRUE AS lower_ok, TRUE AS bound_ok
         FROM tok GROUP BY token
         ORDER BY cnt DESC, token LIMIT 20""",
    // Self-asserting BPE-encode gate: per-source doc counts exact; the
    // scalar-equality and token-conservation booleans ride pinned TRUE.
    "q_bpe_encode" ->
      """SELECT source, count(*) AS n_docs,
           TRUE AS encode_ok, TRUE AS conservation_ok
         FROM documents GROUP BY source ORDER BY source""",
    // Self-asserting BPE-training gate: merge ranks + corpus companions
    // exact; the trajectory booleans (scalar-replay pair counts and
    // applied counts) ride pinned TRUE.
    "q_bpe_train" ->
      """WITH w AS (
           SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z'']+'),
             t -> t <> '')) AS word
           FROM documents)
         SELECT CAST(range AS BIGINT) AS rank,
           (SELECT count(DISTINCT word) FROM w) AS n_distinct_words,
           (SELECT CAST(sum(len(word)) AS BIGINT) FROM w) AS n_init_symbols,
           TRUE AS count_ok, TRUE AS applied_ok
         FROM range(0, 20) ORDER BY rank""",
    "q_unigram_encode" ->
      """SELECT source, count(*) AS n_docs,
           TRUE AS encode_ok, TRUE AS conservation_ok
         FROM documents GROUP BY source ORDER BY source""",

    "q_unigram_train" ->
      """WITH w AS (
           SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
             SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z'']+'),
               t -> t <> '')) AS word
             FROM documents)
           GROUP BY word)
         SELECT word, freq, CAST(len(word) AS BIGINT) AS word_len,
           TRUE AS recon_ok, TRUE AS opt_vs_greedy_ok,
           TRUE AS opt_vs_chars_ok, TRUE AS score_xpath_ok
         FROM w ORDER BY word""",

    "q_packing_stats" ->
      """WITH t AS (
           SELECT doc_id,
             CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
               AS UBIGINT) % 8 AS BIGINT) AS shard,
             CAST(len(list_filter(string_split_regex(text, '\s+'),
               x -> len(x) > 0)) AS BIGINT) AS tokens
           FROM documents),
         g AS (
           SELECT shard, count(*) AS n_docs,
             CAST(sum(tokens) AS BIGINT) AS n_tokens
           FROM t WHERE tokens > 0 GROUP BY shard)
         SELECT shard, n_docs, n_tokens,
           CAST(ceil(n_tokens / 1024.0) AS BIGINT) AS n_seqs,
           CAST(CAST(ceil(n_tokens / 1024.0) AS BIGINT) * 1024 - n_tokens AS DOUBLE)
             / CAST(CAST(ceil(n_tokens / 1024.0) AS BIGINT) * 1024 AS DOUBLE) AS tail_waste
         FROM g ORDER BY shard""",
    "q_mixture_temperature" ->
      """WITH c AS (
           SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM documents
           GROUP BY lang),
         z AS (SELECT sum(pow(n, 0.5)) AS z, sum(n) AS total FROM c),
         r AS (
           SELECT lang, LEAST(1.0, 0.5 * total * (pow(n, 0.5) / z) / n) AS rate
           FROM c, z),
         kept AS (
           SELECT d.doc_id, d.lang
           FROM documents d JOIN r USING (lang)
           WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
             AS UBIGINT) / 4294967296.0 < r.rate)
         SELECT lang, count(*) AS n_kept, min(doc_id) AS min_id,
           max(doc_id) AS max_id
         FROM kept GROUP BY lang ORDER BY lang""",
    "q_gopher_rules" ->
      s"""WITH t AS (
           SELECT doc_id, text,
             list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) AS ws,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '') AS toks,
             list_filter(string_split(text, chr(10)), l -> trim(l) <> '') AS lines
           FROM documents),
         m AS (
           SELECT doc_id,
             len(ws) AS nw,
             CASE WHEN len(ws) = 0 THEN 0.0
                  ELSE list_sum(list_transform(ws, w -> length(w)))::DOUBLE / len(ws)
             END AS mwl,
             (length(text) - length(replace(text, '#', ''))) +
               (length(text) - length(replace(text, '…', ''))) +
               CAST((length(text) - length(replace(text, '...', ''))) / 3 AS INTEGER) AS sym,
             CASE WHEN len(ws) = 0 THEN 0.0
                  ELSE len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE / len(ws)
             END AS af,
             len(list_intersect(list_distinct(toks), ${inList(TextFunctions.EnglishStopwords)})) AS ds,
             CASE WHEN len(lines) = 0 THEN 0.0
                  ELSE len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]')))::DOUBLE / len(lines)
             END AS bf,
             CASE WHEN len(lines) = 0 THEN 0.0
                  ELSE len(list_filter(lines, l -> regexp_matches(trim(l), '(\\.\\.\\.|…)$$')))::DOUBLE / len(lines)
             END AS ef
           FROM t)
         SELECT doc_id, CAST(nw AS BIGINT) AS n_words,
           nw >= 20 AND nw <= 100000 AS f_words,
           mwl >= 3.0 AND mwl <= 10.0 AS f_word_len,
           CASE WHEN nw = 0 THEN FALSE ELSE sym::DOUBLE / nw <= 0.1 END AS f_symbols,
           af >= 0.8 AS f_alpha,
           ds >= 2 AS f_stopwords,
           bf < 0.9 AND ef < 0.3 AS f_bullets,
           (nw >= 20 AND nw <= 100000) AND (mwl >= 3.0 AND mwl <= 10.0)
             AND (CASE WHEN nw = 0 THEN FALSE ELSE sym::DOUBLE / nw <= 0.1 END)
             AND af >= 0.8 AND ds >= 2 AND (bf < 0.9 AND ef < 0.3) AS keep
         FROM m ORDER BY doc_id""",
    "q_token_budget" ->
      s"""WITH t AS (
           SELECT doc_id, text,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '') AS toks
           FROM documents),
         m AS (
           SELECT doc_id,
             len(toks) AS ntok,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE length(regexp_replace(lower(text), '[^a-z'']', '', 'g'))::DOUBLE / len(toks)
             END AS mwl,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE length(regexp_replace(text, '[^[:punct:]]', '', 'g'))::DOUBLE / length(text)
             END AS pr,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE len(list_filter(toks, x -> list_contains(${inList(TextFunctions.EnglishStopwords)}, x)))::DOUBLE / len(toks)
             END AS sr,
             CAST(len(list_filter(string_split_regex(text, '\\s+'),
               x -> len(x) > 0)) AS BIGINT) AS tokens
           FROM t),
         s AS (
           SELECT doc_id, tokens,
             ((CASE WHEN ntok >= 5 AND ntok <= 100000 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN mwl >= 2.0 AND mwl <= 12.0 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN pr < 0.2 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN sr > 0.0 THEN 1.0 ELSE 0.0 END)) / 4.0 AS score
           FROM m),
         c AS (
           SELECT doc_id, score, tokens,
             CAST(sum(tokens) OVER (ORDER BY score DESC, doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
           FROM s)
         SELECT doc_id, score, tokens, cum_tokens FROM c
         WHERE cum_tokens - tokens < 20000 ORDER BY doc_id""",
    "q_semdedup" ->
      """WITH e AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> x / sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                                CAST(embedding AS DOUBLE[])))) AS ne,
             label
           FROM embeddings),
         cents AS (SELECT vec_id AS centroid_id, emb AS cemb FROM e
           ORDER BY vec_id LIMIT 8),
         assigned AS (
           SELECT vec_id, ne, centroid_id FROM (
             SELECT v.vec_id, v.ne, c.centroid_id,
               row_number() OVER (PARTITION BY v.vec_id ORDER BY
                 list_sum(list_transform(range(1, len(v.emb) + 1),
                   i -> (v.emb[i] - c.cemb[i]) * (v.emb[i] - c.cemb[i]))) ASC,
                 c.centroid_id) AS rn
             FROM e v, cents c)
           WHERE rn = 1),
         ok AS (SELECT centroid_id FROM assigned
           GROUP BY centroid_id HAVING count(*) <= 10000),
         drops AS (
           SELECT DISTINCT b.vec_id
           FROM assigned a JOIN assigned b
             ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
           JOIN ok o ON a.centroid_id = o.centroid_id
           WHERE list_inner_product(a.ne, b.ne) >= 0.4)
         SELECT e.vec_id, e.label FROM e
         LEFT JOIN drops d ON e.vec_id = d.vec_id
         WHERE d.vec_id IS NULL
         ORDER BY e.vec_id""",
    // The MG sketch only PRUNES; emitted counts are an exact recount, so
    // the oracle is the plain frequent-token SQL at the same threshold.
    "q_heavy_hitters" ->
      """WITH t AS (
           SELECT unnest(string_split_regex(lower(text), '[^a-z'']+')) AS token
           FROM documents),
         tt AS (SELECT token FROM t WHERE token <> ''),
         n AS (SELECT count(*) AS total FROM tt)
         SELECT token, count(*) AS n FROM tt, n
         GROUP BY token, total
         HAVING count(*) >= ceil(0.01 * total)
         ORDER BY token""",
    "q_length_trim" ->
      """WITH b AS (
           SELECT quantile_cont(n_chars, 0.05) AS lo,
                  quantile_cont(n_chars, 0.95) AS hi
           FROM documents)
         SELECT doc_id, n_chars FROM documents, b
         WHERE n_chars >= lo AND n_chars <= hi
         ORDER BY doc_id""",
    // Replays both legs with n-gram STRINGS where Spark joins 64-bit
    // shingle hashes — counts agree absent a 64-bit collision (same
    // contract as q_contamination_ngram).
    "q_crosscorpus_dedup" ->
      """WITH refd AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
         newd AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
         refk AS (SELECT DISTINCT
             md5(trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS k
           FROM refd),
         ex AS (SELECT * FROM newd
           WHERE md5(trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')))
             NOT IN (SELECT k FROM refk)),
         ntk AS (SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '') AS toks
           FROM ex),
         nsh AS (SELECT DISTINCT doc_id, g FROM (
           SELECT doc_id, unnest(CASE WHEN len(toks) < 8
             THEN [array_to_string(toks, ' ')]
             ELSE list_transform(range(1, len(toks) - 6),
                    i -> array_to_string(toks[i : i + 7], ' ')) END) AS g
           FROM ntk WHERE len(toks) > 0)),
         rtk AS (SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '') AS toks
           FROM refd),
         rsh0 AS (SELECT DISTINCT doc_id, g FROM (
           SELECT doc_id, unnest(CASE WHEN len(toks) < 8
             THEN [array_to_string(toks, ' ')]
             ELSE list_transform(range(1, len(toks) - 6),
                    i -> array_to_string(toks[i : i + 7], ' ')) END) AS g
           FROM rtk WHERE len(toks) > 0)),
         rdf AS (SELECT g FROM rsh0 GROUP BY g HAVING count(*) <= 1000),
         rsh AS (SELECT s.doc_id, s.g FROM rsh0 s JOIN rdf USING (g)),
         nsz AS (SELECT doc_id, count(*) AS sz FROM nsh GROUP BY doc_id),
         shared AS (SELECT n.doc_id AS nid, r.doc_id AS rid, count(*) AS c
           FROM nsh n JOIN rsh r USING (g) GROUP BY 1, 2),
         drops AS (SELECT DISTINCT s.nid FROM shared s
           JOIN nsz z ON z.doc_id = s.nid
           WHERE s.c >= 0.5 * z.sz)
         SELECT doc_id, n_chars FROM ex
         WHERE doc_id NOT IN (SELECT nid FROM drops)
         ORDER BY doc_id""",
    // FULL oracle for the Bloom-accelerated path: the pre-filter is
    // lossless (no false negatives; false positives fall through to the
    // exact anti-join), so the oracle is the plain fingerprint anti-join.
    "q_bloom_dedup" ->
      """WITH refd AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
         newd AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
         refk AS (SELECT DISTINCT
             md5(trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS k
           FROM refd)
         SELECT doc_id, n_chars FROM newd
         WHERE md5(trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')))
           NOT IN (SELECT k FROM refk)
         ORDER BY doc_id""",
    // FULL oracle through a real compressed codec: PNG is lossless, so
    // the decoded channel means are the pixel function's exact means.
    "q_multimodal_png" ->
      """SELECT doc_id, 16 AS width, 8 AS height,
           CAST(list_sum(list_transform(range(0, 128),
             p -> (doc_id * 31 + p * 7) % 256)) AS DOUBLE) / 128.0 AS mean_r,
           CAST(list_sum(list_transform(range(0, 128),
             p -> (doc_id * 17 + p * 5) % 256)) AS DOUBLE) / 128.0 AS mean_g,
           CAST(list_sum(list_transform(range(0, 128),
             p -> (doc_id * 13 + p * 3) % 256)) AS DOUBLE) / 128.0 AS mean_b
         FROM documents ORDER BY doc_id""",
    "q_multimodal_bmp" ->
      """SELECT doc_id, 12 AS width, 10 AS height,
           CAST(list_sum(list_transform(range(0, 120),
             p -> (doc_id * 31 + p * 7) % 256)) AS DOUBLE) / 120.0 AS mean_r,
           CAST(list_sum(list_transform(range(0, 120),
             p -> (doc_id * 17 + p * 5) % 256)) AS DOUBLE) / 120.0 AS mean_g,
           CAST(list_sum(list_transform(range(0, 120),
             p -> (doc_id * 13 + p * 3) % 256)) AS DOUBLE) / 120.0 AS mean_b
         FROM documents ORDER BY doc_id""",

    // FULL oracle through a real audio codec: PCM 16-bit is lossless,
    // so the decoded per-channel sums are the waveform function's exact
    // integer sums, and RMS is one exact-integer division + sqrt.
    // winnowing: n_tokens exact; the guarantee and density bounds are
    // engine-computed booleans pinned TRUE (xxhash64 shingle values
    // have no DuckDB twin — the accepted self-asserting form).
    "q_winnow_copydetect" ->
      """SELECT doc_id,
           CAST(len(list_filter(string_split_regex(lower(text), '[^a-z'']+'),
             x -> x <> '')) AS BIGINT) AS n_tokens,
           TRUE AS shared_ok, TRUE AS density_hi_ok, TRUE AS density_lo_ok
         FROM documents
         WHERE len(list_filter(string_split_regex(lower(text), '[^a-z'']+'),
           x -> x <> '')) >= 11
         ORDER BY doc_id""",

    // dHash image near-dup: gray grid (⌊(r+g+b)/3⌋ per pixel, 16-pixel
    // floor box means), 16-bit comparison bands, pigeonhole join,
    // bit_count hamming — all in closed-form SQL (PNG is lossless so
    // the engine's decoded pixels ARE the pixel function).
    "q_image_neardup" ->
      s"""WITH $imageDHashCte
         SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
         FROM pairs WHERE hamming <= 10
         ORDER BY id_a, id_b""",
    // image dedup clusters: transitive closure via a RECURSIVE CTE —
    // an independent engine derives the same components the min-label
    // propagation computes; the size histogram must match exactly.
    "q_image_dedup" ->
      s"""WITH RECURSIVE $imageDHashCte,
         nd AS (SELECT id_a, id_b FROM pairs WHERE hamming <= 10),
         e2 AS (SELECT id_a AS a, id_b AS b FROM nd
                UNION ALL SELECT id_b, id_a FROM nd),
         reach(id, lbl) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e2.b, reach.lbl FROM reach JOIN e2 ON e2.a = reach.id),
         comp AS (SELECT id, min(lbl) AS label FROM reach GROUP BY id),
         szs AS (SELECT label, count(*) AS sz FROM comp GROUP BY label)
         SELECT sz, count(*) AS n_components FROM szs
         GROUP BY sz ORDER BY sz""",

    // tone detection: the winning Goertzel bin is ORACLE-EXACT
    // (doc_id picks the synthesized frequency); metadata exact too.
    "q_multimodal_tone" ->
      """SELECT doc_id,
           8000 AS sample_rate,
           CAST(800 + doc_id % 3 * 80 AS BIGINT) AS n_frames,
           CAST(doc_id % 4 AS INTEGER) AS best_idx,
           TRUE AS tone_ok, TRUE AS margin_ok
         FROM documents ORDER BY doc_id""",
    "q_multimodal_wav" ->
      """WITH p AS (SELECT doc_id,
           CAST(600 + doc_id % 5 * 37 AS BIGINT) AS nf FROM documents)
         SELECT doc_id,
           CAST(8000 + doc_id % 3 * 4000 AS INTEGER) AS sample_rate,
           2 AS channels,
           nf AS n_frames,
           CAST(list_sum(list_transform(range(0, nf),
             i -> (doc_id * 31 + i * 7) % 65536 - 32768)) AS BIGINT) AS sum_l,
           CAST(list_sum(list_transform(range(0, nf),
             i -> (doc_id * 31 + 17 + i * 7) % 65536 - 32768)) AS BIGINT) AS sum_r,
           sqrt(CAST(list_sum(list_transform(range(0, nf),
             i -> ((doc_id * 31 + i * 7) % 65536 - 32768)
                * ((doc_id * 31 + i * 7) % 65536 - 32768))) AS DOUBLE) / nf) AS rms_l,
           sqrt(CAST(list_sum(list_transform(range(0, nf),
             i -> ((doc_id * 31 + 17 + i * 7) % 65536 - 32768)
                * ((doc_id * 31 + 17 + i * 7) % 65536 - 32768))) AS DOUBLE) / nf) AS rms_r
         FROM p ORDER BY doc_id""",
    // Self-asserting JPEG gate: exact geometry, decoded-mean-within-
    // tolerance booleans pinned TRUE.
    "q_multimodal_jpeg" ->
      """SELECT doc_id, 16 AS width, 12 AS height,
           TRUE AS r_ok, TRUE AS g_ok, TRUE AS b_ok
         FROM documents ORDER BY doc_id""",
    // Video gate: container metadata replays exactly (frame count and
    // per-frame microseconds are pure functions of doc_id; one row per
    // frame via lateral range), per-frame JPEG means self-assert TRUE.
    "q_multimodal_video" ->
      """WITH p AS (SELECT doc_id, CAST(3 + doc_id % 3 AS INT) AS nf,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 100000 ELSE 40000 END AS INT) AS uspf
           FROM documents)
         SELECT doc_id, CAST(unnest(range(0, nf)) AS INT) AS frame_idx,
           16 AS width, 12 AS height, nf AS n_frames, uspf AS us_per_frame,
           TRUE AS r_ok, TRUE AS g_ok, TRUE AS b_ok
         FROM p ORDER BY doc_id, frame_idx""",
    // FULL oracle through decode → box filter → re-encode → decode:
    // output pixel (ox, oy) = floor mean of the 4×4 source block, all
    // exact integer arithmetic; channel means of the 8×6 result divide
    // exact integer sums once.
    "q_multimodal_resize_real" ->
      """WITH px AS (SELECT doc_id, unnest(range(0, 48)) AS op FROM documents),
         b AS (SELECT doc_id,
           list_sum(list_transform(range(0, 16), k ->
             (doc_id * 31 + (((op // 8) * 4 + k // 4) * 32 + (op % 8) * 4 + k % 4) * 7) % 256)) // 16 AS rv,
           list_sum(list_transform(range(0, 16), k ->
             (doc_id * 17 + (((op // 8) * 4 + k // 4) * 32 + (op % 8) * 4 + k % 4) * 5) % 256)) // 16 AS gv,
           list_sum(list_transform(range(0, 16), k ->
             (doc_id * 13 + (((op // 8) * 4 + k // 4) * 32 + (op % 8) * 4 + k % 4) * 3) % 256)) // 16 AS bv
           FROM px)
         SELECT doc_id, 8 AS width, 6 AS height,
           CAST(SUM(rv) AS DOUBLE) / 48.0 AS mean_r,
           CAST(SUM(gv) AS DOUBLE) / 48.0 AS mean_g,
           CAST(SUM(bv) AS DOUBLE) / 48.0 AS mean_b
         FROM b GROUP BY doc_id ORDER BY doc_id""",
    "q_multimodal_ppm" ->
      """SELECT doc_id, 8 AS width, 6 AS height,
           CAST(list_sum(list_transform(range(0, 48),
             p -> (doc_id * 31 + p * 7) % 256)) AS DOUBLE) / 48.0 AS mean_r,
           CAST(list_sum(list_transform(range(0, 48),
             p -> (doc_id * 17 + p * 5) % 256)) AS DOUBLE) / 48.0 AS mean_g,
           CAST(list_sum(list_transform(range(0, 48),
             p -> (doc_id * 13 + p * 3) % 256)) AS DOUBLE) / 48.0 AS mean_b
         FROM documents ORDER BY doc_id""",
    "q_crossdoc_dup" ->
      """WITH tk AS (
           SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '') AS toks
           FROM documents),
         sh AS (SELECT DISTINCT doc_id, g FROM (
           SELECT doc_id, unnest(CASE WHEN len(toks) < 8
             THEN [array_to_string(toks, ' ')]
             ELSE list_transform(range(1, len(toks) - 6),
                    i -> array_to_string(toks[i : i + 7], ' ')) END) AS g
           FROM tk)),
         df AS (SELECT g, count(*) AS d FROM sh GROUP BY g),
         per AS (
           SELECT s.doc_id, count(*) AS n,
             SUM(CASE WHEN f.d >= 2 THEN 1 ELSE 0 END) AS shared
           FROM sh s JOIN df f USING (g) GROUP BY s.doc_id)
         SELECT d.doc_id,
           CAST(coalesce(p.n, 0) AS BIGINT) AS n_shingles,
           CASE WHEN coalesce(p.n, 0) > 0
                THEN p.shared::DOUBLE / p.n::DOUBLE ELSE 0.0 END AS dup_shingle_frac
         FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
         ORDER BY d.doc_id""",
    // Full replay of the ExactSubstr apply step: 5-gram occurrences,
    // duplicate = same gram text elsewhere in the corpus, canonical =
    // first (doc_id, pos), removal by covered token positions, text
    // rebuilt from kept tokens. Gram identity is the STRING here vs md5
    // in Spark — identical unless the 128-bit hash collides.
    "q_span_dedup" ->
      """WITH tk AS (
           SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '') AS toks
           FROM documents),
         occ AS (
           SELECT doc_id, i - 1 AS pos, array_to_string(toks[i : i + 4], ' ') AS g
           FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 3)) AS i
                 FROM tk WHERE len(toks) >= 5)),
         marked AS (
           SELECT doc_id, pos,
             count(*) OVER (PARTITION BY g) AS cnt,
             row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
           FROM occ),
         dup AS (SELECT doc_id, pos FROM marked WHERE cnt >= 2 AND rn > 1),
         tok AS (
           SELECT doc_id, unnest(toks) AS t, unnest(range(0, len(toks))) AS i
           FROM tk),
         removedpos AS (
           SELECT DISTINCT t.doc_id, t.i
           FROM tok t JOIN dup d
             ON t.doc_id = d.doc_id AND t.i >= d.pos AND t.i < d.pos + 5),
         kept AS (
           SELECT t.doc_id, t.i, t.t
           FROM tok t LEFT JOIN removedpos r
             ON t.doc_id = r.doc_id AND t.i = r.i
           WHERE r.i IS NULL),
         agg AS (
           SELECT doc_id, count(*) AS n_kept,
             string_agg(t, ' ' ORDER BY i) AS dedup_text
           FROM kept GROUP BY doc_id)
         SELECT k.doc_id,
           CAST(len(k.toks) AS BIGINT) AS n_tokens,
           CAST(len(k.toks) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
           coalesce(a.dedup_text, '') AS dedup_text
         FROM tk k LEFT JOIN agg a USING (doc_id)
         ORDER BY k.doc_id""",
    // Exact replay of both epochs' salted-hash deal + in-shard order.
    "q_epoch_shuffle" ->
      """WITH e0 AS (SELECT doc_id,
           CAST(CAST(('0x' || substr(md5('0|' || CAST(doc_id AS VARCHAR)), 1, 8))
             AS UBIGINT) % 8 AS INTEGER) AS shard_e0,
           md5('0|' || CAST(doc_id AS VARCHAR)) AS h0
         FROM documents),
         r0 AS (SELECT doc_id, shard_e0,
           row_number() OVER (PARTITION BY shard_e0 ORDER BY h0, doc_id) AS pos_e0
         FROM e0),
         e1 AS (SELECT doc_id,
           CAST(CAST(('0x' || substr(md5('1|' || CAST(doc_id AS VARCHAR)), 1, 8))
             AS UBIGINT) % 8 AS INTEGER) AS shard_e1,
           md5('1|' || CAST(doc_id AS VARCHAR)) AS h1
         FROM documents),
         r1 AS (SELECT doc_id, shard_e1,
           row_number() OVER (PARTITION BY shard_e1 ORDER BY h1, doc_id) AS pos_e1
         FROM e1)
         SELECT doc_id, shard_e0, pos_e0, shard_e1, pos_e1
         FROM r0 JOIN r1 USING (doc_id) ORDER BY doc_id""",
    "q_shard_assign" ->
      """WITH w AS (SELECT doc_id,
           len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS weight
         FROM documents),
         r AS (SELECT doc_id, weight,
           row_number() OVER (ORDER BY weight DESC, doc_id) AS rank FROM w),
         s AS (SELECT doc_id, weight,
           CASE WHEN CAST(floor((rank - 1) / 8.0) AS BIGINT) % 2 = 0
                THEN (rank - 1) % 8
                ELSE 7 - ((rank - 1) % 8) END AS shard
         FROM r)
         SELECT CAST(shard AS INTEGER) AS shard, count(*) AS n_docs,
           CAST(SUM(weight) AS BIGINT) AS total_weight
         FROM s GROUP BY 1 ORDER BY 1""",
    "q_pipeline_e2e" ->
      s"""WITH t AS (
           SELECT doc_id, text,
             list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) AS ws,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '') AS toks,
             list_filter(string_split(text, chr(10)), l -> trim(l) <> '') AS lines
           FROM documents),
         m AS (
           SELECT doc_id,
             len(ws) AS nw,
             CASE WHEN len(ws) = 0 THEN 0.0
                  ELSE list_sum(list_transform(ws, w -> length(w)))::DOUBLE / len(ws)
             END AS mwl,
             (length(text) - length(replace(text, '#', ''))) +
               (length(text) - length(replace(text, '…', ''))) +
               CAST((length(text) - length(replace(text, '...', ''))) / 3 AS INTEGER) AS sym,
             CASE WHEN len(ws) = 0 THEN 0.0
                  ELSE len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE / len(ws)
             END AS af,
             len(list_intersect(list_distinct(toks), ${inList(TextFunctions.EnglishStopwords)})) AS ds,
             CASE WHEN len(lines) = 0 THEN 0.0
                  ELSE len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]')))::DOUBLE / len(lines)
             END AS bf,
             CASE WHEN len(lines) = 0 THEN 0.0
                  ELSE len(list_filter(lines, l -> regexp_matches(trim(l), '(\\.\\.\\.|…)$$')))::DOUBLE / len(lines)
             END AS ef
           FROM t),
         g AS (
           SELECT doc_id FROM m
           WHERE (nw >= 20 AND nw <= 100000) AND (mwl >= 3.0 AND mwl <= 10.0)
             AND (CASE WHEN nw = 0 THEN FALSE ELSE sym::DOUBLE / nw <= 0.1 END)
             AND af >= 0.8 AND ds >= 2 AND (bf < 0.9 AND ef < 0.3)),
         kept AS (SELECT d.* FROM documents d JOIN g USING (doc_id)),
         dd AS (SELECT min(doc_id) AS doc_id FROM kept
                GROUP BY md5(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')))),
         dkept AS (SELECT k.* FROM kept k JOIN dd USING (doc_id)),
         b AS (SELECT quantile_cont(n_chars, 0.05) AS lo,
                      quantile_cont(n_chars, 0.95) AS hi FROM dkept),
         fin AS (SELECT dkept.* FROM dkept, b
                 WHERE n_chars >= lo AND n_chars <= hi)
         SELECT source, count(*) AS n_docs,
           CAST(SUM(len(list_filter(string_split_regex(text, '\\s+'),
             x -> len(x) > 0))) AS BIGINT) AS total_tokens,
           min(doc_id) AS min_id, max(doc_id) AS max_id
         FROM fin GROUP BY source ORDER BY source""",
    // the funnel labels from the SAME stage CTEs as q_pipeline_e2e:
    // first-drop-stage per doc, counted per source.
    "q_curation_funnel" ->
      s"""WITH t AS (
           SELECT doc_id, text,
             list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) AS ws,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '') AS toks,
             list_filter(string_split(text, chr(10)), l -> trim(l) <> '') AS lines
           FROM documents),
         m AS (
           SELECT doc_id,
             len(ws) AS nw,
             CASE WHEN len(ws) = 0 THEN 0.0
                  ELSE list_sum(list_transform(ws, w -> length(w)))::DOUBLE / len(ws)
             END AS mwl,
             (length(text) - length(replace(text, '#', ''))) +
               (length(text) - length(replace(text, '…', ''))) +
               CAST((length(text) - length(replace(text, '...', ''))) / 3 AS INTEGER) AS sym,
             CASE WHEN len(ws) = 0 THEN 0.0
                  ELSE len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE / len(ws)
             END AS af,
             len(list_intersect(list_distinct(toks), ${inList(TextFunctions.EnglishStopwords)})) AS ds,
             CASE WHEN len(lines) = 0 THEN 0.0
                  ELSE len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]')))::DOUBLE / len(lines)
             END AS bf,
             CASE WHEN len(lines) = 0 THEN 0.0
                  ELSE len(list_filter(lines, l -> regexp_matches(trim(l), '(\\.\\.\\.|…)$$')))::DOUBLE / len(lines)
             END AS ef
           FROM t),
         g AS (
           SELECT doc_id FROM m
           WHERE (nw >= 20 AND nw <= 100000) AND (mwl >= 3.0 AND mwl <= 10.0)
             AND (CASE WHEN nw = 0 THEN FALSE ELSE sym::DOUBLE / nw <= 0.1 END)
             AND af >= 0.8 AND ds >= 2 AND (bf < 0.9 AND ef < 0.3)),
         kept AS (SELECT d.* FROM documents d JOIN g USING (doc_id)),
         dd AS (SELECT min(doc_id) AS doc_id FROM kept
                GROUP BY md5(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')))),
         dkept AS (SELECT k.* FROM kept k JOIN dd USING (doc_id)),
         b AS (SELECT quantile_cont(n_chars, 0.05) AS lo,
                      quantile_cont(n_chars, 0.95) AS hi FROM dkept),
         lab AS (
           SELECT d.source,
             CASE WHEN d.doc_id NOT IN (SELECT doc_id FROM g) THEN 'gopher'
                  WHEN d.doc_id NOT IN (SELECT doc_id FROM dd) THEN 'dedup'
                  WHEN d.n_chars < (SELECT lo FROM b)
                    OR d.n_chars > (SELECT hi FROM b) THEN 'trim'
                  ELSE 'kept' END AS stage
           FROM documents d)
         SELECT source, stage, count(*) AS n
         FROM lab GROUP BY source, stage ORDER BY source, stage""",
    "q_contamination_full" ->
      """WITH p AS (
           SELECT doc_id AS probe_id, substr(text, 1, 40) AS ptext
           FROM documents WHERE doc_id < 2
           UNION ALL
           SELECT doc_id AS probe_id, substr(text, 1, 200) AS ptext
           FROM documents WHERE doc_id = 2),
         pt AS (SELECT probe_id, ptext,
             list_filter(string_split_regex(lower(ptext), '[^a-z'']+'), x -> x <> '') AS toks
           FROM p),
         shortp AS (SELECT probe_id, ptext FROM pt
           WHERE len(toks) < 13 AND len(toks) > 0),
         longp AS (SELECT probe_id, toks FROM pt WHERE len(toks) >= 13),
         ex AS (SELECT s.probe_id, d.doc_id
           FROM documents d, shortp s WHERE instr(d.text, s.ptext) > 0),
         pg AS (SELECT probe_id, unnest(CASE WHEN len(toks) < 13
             THEN [array_to_string(toks, ' ')]
             ELSE list_transform(range(1, len(toks) - 11),
                    i -> array_to_string(toks[i : i + 12], ' ')) END) AS g
           FROM longp),
         dtok AS (SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '') AS toks
           FROM documents),
         dg AS (SELECT doc_id, unnest(CASE WHEN len(toks) < 13
             THEN [array_to_string(toks, ' ')]
             ELSE list_transform(range(1, len(toks) - 11),
                    i -> array_to_string(toks[i : i + 12], ' ')) END) AS g
           FROM dtok),
         gm AS (SELECT DISTINCT pg.probe_id, dg.doc_id FROM dg JOIN pg USING (g))
         SELECT DISTINCT probe_id, doc_id
         FROM (SELECT * FROM ex UNION ALL SELECT * FROM gm)
         ORDER BY probe_id, doc_id""",
    "q_truncate_tokens" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS ws
           FROM documents)
         SELECT doc_id,
           CASE WHEN len(ws) <= 64 THEN array_to_string(ws, ' ')
                ELSE array_to_string(
                  list_concat(ws[1:48], ws[len(ws)-15:len(ws)]), ' ')
           END AS text_trunc,
           CAST(least(len(ws), 64) AS BIGINT) AS n_tokens
         FROM t ORDER BY doc_id""",
    "q_corpus_report" ->
      s"""WITH t AS (
           SELECT source, text,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '') AS toks,
             len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)) AS tok
           FROM documents),
         m AS (
           SELECT source, tok,
             len(toks) AS ntok,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE length(regexp_replace(lower(text), '[^a-z'']', '', 'g'))::DOUBLE / len(toks)
             END AS mwl,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE length(regexp_replace(text, '[^[:punct:]]', '', 'g'))::DOUBLE / length(text)
             END AS pr,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE len(list_filter(toks, x -> list_contains(${inList(TextFunctions.EnglishStopwords)}, x)))::DOUBLE / len(toks)
             END AS sr,
             md5(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))) AS fp
           FROM t),
         q AS (
           SELECT source, tok, fp,
             ((CASE WHEN ntok >= 5 AND ntok <= 100000 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN mwl >= 2.0 AND mwl <= 12.0 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN pr < 0.2 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN sr > 0.0 THEN 1.0 ELSE 0.0 END)) / 4.0 AS quality
           FROM m)
         SELECT source, count(*) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS total_tokens,
           CAST(SUM(CAST(quality AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_quality,
           count(*) - count(DISTINCT fp) AS n_dup_docs
         FROM q GROUP BY source ORDER BY source""",
  )
}
