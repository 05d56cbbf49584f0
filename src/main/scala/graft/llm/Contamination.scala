package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Benchmark-contamination detection: which corpus documents overlap an
  * evaluation set — the check every serious pretraining pipeline runs
  * before training (GPT-3 appendix C popularized the n-gram form;
  * exact-substring is the strict variant). The probe side (the eval set)
  * is small by construction, so both paths broadcast it and scan the
  * corpus once — no shuffle of corpus text.
  */
object Contamination {

  // persisted-frame registry (same hygiene contract as Dedup/Similarity):
  // scrubOverlaps reads its tokenized-docs frame twice
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

  /** Exact-substring overlap: (probe_id, doc_id) for every document whose
    * text contains the probe verbatim. Broadcast nested-loop by design —
    * |probes| is eval-set-sized; the corpus is scanned once and `instr`
    * stays inside codegen. */
  def exactOverlap(docs: DataFrame, idCol: String, textCol: String,
                   probes: DataFrame, probeIdCol: String,
                   probeTextCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(textCol).as("__t"))
      .crossJoin(broadcast(probes.select(col(probeIdCol).as("probe_id"),
        col(probeTextCol).as("__p"))))
      .filter(instr(col("__t"), col("__p")) > 0)
      .select(col("probe_id"), col("doc_id"))

  /** N-gram overlap (the GPT-3-style check, default n=13): (probe_id,
    * doc_id) for documents sharing at least one n-token shingle with a
    * probe. Shingles are 64-bit rolling hashes (graft.functions
    * .ShingleExprs — single pass, codegen), so the join carries longs, not
    * n-gram text; a pair is a false positive only on a 64-bit collision.
    *
    * Completeness caveat: a probe SHORTER than n tokens emits only its
    * full-run hash ([[TextFunctions.shingleHashes]] convention), which can
    * match a document's hash only when the document is itself shorter than
    * n with the identical token run — a long document CONTAINING the short
    * probe verbatim is NOT matched by this leg. Use [[overlapComplete]]
    * when eval items vary in length; it routes sub-n probes through the
    * exact-substring scan. */
  def ngramOverlap(docs: DataFrame, idCol: String, textCol: String,
                   probes: DataFrame, probeIdCol: String,
                   probeTextCol: String, n: Int = 13): DataFrame = {
    val d = docs.select(col(idCol).as("doc_id"),
      explode(TextFunctions.shingleHashes(col(textCol), n)).as("__h"))
    val p = probes.select(col(probeIdCol).as("probe_id"),
      explode(TextFunctions.shingleHashes(col(probeTextCol), n)).as("__h"))
    d.join(broadcast(p), Seq("__h"))
      .select(col("probe_id"), col("doc_id"))
      .dropDuplicates("probe_id", "doc_id")
  }

  /** Length-complete contamination check: probes with ≥ n tokens go
    * through the [[ngramOverlap]] hash join; probes under n tokens (which
    * that leg cannot match against longer documents — see its caveat) go
    * through the [[exactOverlap]] broadcast substring scan; zero-token
    * probes match nothing. Both legs broadcast the (eval-set-sized) probe
    * side and scan the corpus once each.
    *
    * Matching-semantics asymmetry (deliberate, mirrored by the oracle):
    * the n-gram leg compares LOWERCASED TOKEN runs (case- and
    * whitespace-insensitive), while the exact leg is a RAW substring
    * `instr` (case- and whitespace-sensitive) — a sub-n probe differing
    * from a document only by case is missed where an equivalent ≥ n-token
    * probe would hit. Raw matching is kept on the exact leg because short
    * probes (code snippets, IDs, names) are precisely where case carries
    * signal; normalize probe text upstream for case-insensitive
    * short-probe matching. */
  def overlapComplete(docs: DataFrame, idCol: String, textCol: String,
                      probes: DataFrame, probeIdCol: String,
                      probeTextCol: String, n: Int = 13): DataFrame = {
    val nTok = size(TextFunctions.tokens(col(probeTextCol)))
    val longP = probes.filter(nTok >= n)
    val shortP = probes.filter(nTok < n && nTok > 0)
    ngramOverlap(docs, idCol, textCol, longP, probeIdCol, probeTextCol, n)
      .unionByName(
        exactOverlap(docs, idCol, textCol, shortP, probeIdCol, probeTextCol))
      .dropDuplicates("probe_id", "doc_id")
  }

  /** Per-probe contamination summary: how many documents each probe hit,
    * via [[ngramOverlap]]. */
  def contaminationReport(docs: DataFrame, idCol: String, textCol: String,
                          probes: DataFrame, probeIdCol: String,
                          probeTextCol: String, n: Int = 13): DataFrame =
    ngramOverlap(docs, idCol, textCol, probes, probeIdCol, probeTextCol, n)
      .groupBy(col("probe_id"))
      .agg(count(lit(1)).as("n_contaminated_docs"))

  /** Per-document n-gram NOVELTY against a reference corpus: the
    * fraction of a document's DISTINCT n-grams absent from the
    * reference — the "how much new text does this shard actually add"
    * acquisition signal (the inverse of contamination: high overlap =
    * low value, high novelty = worth ingesting), a standard
    * data-valuation heuristic for pretraining corpus growth.
    *
    * Identity is md5 of the lowercased-token n-gram (engine-portable,
    * and the join shuffles 16-byte hashes, never gram TEXT — the
    * scrubOverlaps scale rule). Documents shorter than n tokens follow
    * the ngramStrings convention (EMPTY gram array below n — no
    * whole-text fallback), so they report n_grams = 0 with NULL
    * novelty, as do NULL/empty docs; sub-n reference docs contribute
    * nothing to the reference gram set.
    *
    * Scale posture: both gram streams reduce to per-side DISTINCT
    * hashes before the ONE hash join; per-doc aggregation is
    * map-combinable. Reference grams are NOT assumed broadcastable
    * (unlike eval probes) — this is a corpus-vs-corpus join on hash
    * identity.
    *
    * @return (doc_id, n_grams, n_novel, novelty 6 dp) — one row per
    *         scored document */
  def noveltyReport(docs: DataFrame, idCol: String, textCol: String,
                    ref: DataFrame, refTextCol: String,
                    n: Int = 5): DataFrame = {
    import graft.functions.ShingleExprs
    val refHashes = ref
      .select(explode(ShingleExprs.ngramStrings(
        coalesce(col(refTextCol), lit("")), n)).as("__g"))
      .select(md5(col("__g").cast("binary")).as("__h")).distinct()
      .withColumn("__seen", lit(true))
    val docHashes = docs
      .select(col(idCol).as("doc_id"),
        explode(ShingleExprs.ngramStrings(
          coalesce(col(textCol), lit("")), n)).as("__g"))
      .select(col("doc_id"), md5(col("__g").cast("binary")).as("__h"))
      .distinct()
    val scored = docHashes.join(refHashes, Seq("__h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__seen").isNull, 1L).otherwise(0L)).as("n_novel"))
    docs.select(col(idCol).as("doc_id")).distinct()
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        round(when(col("n_grams") > 0,
          col("n_novel").cast("double") / col("n_grams").cast("double")), 6)
          .as("novelty"))
  }

  /** Decontamination APPLY step: scrub every n-token span of a document
    * that matches any probe n-gram — the span-surgical alternative to
    * dropping whole contaminated documents (the GPT-3 appendix-C family
    * removes contaminated WINDOWS, preserving the rest of the document;
    * whole-doc dropping over-deletes at corpus scale). Every matching
    * occurrence is removed — there is no canonical keeper here, unlike
    * [[graft.llm.Dedup.removeDuplicateSpans]]: eval text must not survive
    * anywhere in the training corpus. Overlapping matched spans union
    * their removed token ranges. Same caveat as [[ngramOverlap]]: probes
    * shorter than n tokens contribute no grams and scrub nothing — route
    * them through [[exactOverlap]] + a whole-doc policy upstream.
    *
    * Output: (id, n_tokens BIGINT, n_removed BIGINT, scrubbed_text) —
    * text rebuilt from kept tokens, tokenizer-normalized. NULL text stays
    * NULL. Matching is by lowercased-token n-gram, md5 identity.
    *
    * Scale: probe grams are eval-set-sized → deduplicated and BROADCAST;
    * the corpus grams stream through one hash semi-join (no corpus
    * shuffle), then duplicate starts aggregate per doc (ids + ints) and
    * join back to the documents by id. Corpus text rides only the final
    * id-equi-join; per-row rebuild is O(tokens × matched starts). */
  def scrubOverlaps(docs: DataFrame, idCol: String, textCol: String,
                    probes: DataFrame, probeIdCol: String,
                    probeTextCol: String, n: Int = 13): DataFrame = {
    require(n >= 2, s"scrub gram size must be >= 2, got $n")
    import graft.functions.ShingleExprs
    val probeGrams = probes.select(
        explode(ShingleExprs.ngramStrings(col(probeTextCol), n)).as("__g"))
      .select(md5(col("__g").cast("binary")).as("__h"))
      .distinct()
    val toks = track(docs.select(col(idCol).as("__id"),
      col(textCol).isNull.as("__textnull"),
      coalesce(TextFunctions.tokens(col(textCol)),
        array().cast("array<string>")).as("__toks"),
      ShingleExprs.ngramStrings(coalesce(col(textCol), lit("")), n)
        .as("__grams")))
    val hitStarts = toks
      .select(col("__id"), posexplode(col("__grams")).as(Seq("__pos", "__g")))
      .select(col("__id"), col("__pos"),
        md5(col("__g").cast("binary")).as("__h"))
      .join(broadcast(probeGrams), Seq("__h"), "left_semi")
      .groupBy(col("__id"))
      .agg(sort_array(collect_list(col("__pos"))).as("__starts"))
    toks.join(hitStarts, Seq("__id"), "left")
      .withColumn("__starts", coalesce(col("__starts"),
        array().cast("array<int>")))
      .withColumn("__kept", filter(
        transform(col("__toks"), (t, i) => struct(t.as("t"), i.as("i"))),
        s => !exists(col("__starts"),
          p => s.getField("i") >= p && s.getField("i") < p + lit(n))))
      .select(col("__id").as(idCol),
        when(col("__textnull"), lit(null).cast("long"))
          .otherwise(size(col("__toks")).cast("long")).as("n_tokens"),
        when(col("__textnull"), lit(null).cast("long"))
          .otherwise((size(col("__toks")) - size(col("__kept"))).cast("long"))
          .as("n_removed"),
        when(col("__textnull"), lit(null).cast("string"))
          .otherwise(concat_ws(" ",
            transform(col("__kept"), s => s.getField("t")))).as("scrubbed_text"))
  }

  /** Stream-safe form of [[scrubOverlaps]]: the probe-gram hash set is
    * COLLECTED to the driver (bounded — View-side-input contract, eval
    * sets are small by construction) and the scrub evaluates as ONE
    * native projection (graft.functions.ShingleExprs.ScrubSpansExpr) —
    * no shuffle, no state store, so the identical call curates an
    * unbounded stream in append mode (batch ≡ relational-form ≡ stream
    * proven in ContaminationSpec/StreamingSpec; the batch leg is
    * oracle-checked as q_decontam_stream against the SAME SQL as
    * q_decontam_scrub). Gram membership is xxhash64 here vs md5 in the
    * relational form — results diverge only on a 64-bit collision.
    * Same sub-n-probe caveat as [[ngramOverlap]]. */
  def scrubOverlapsStreaming(docs: DataFrame, idCol: String, textCol: String,
                             probes: DataFrame, probeTextCol: String,
                             n: Int = 13,
                             maxProbeGrams: Int = 1000000): DataFrame = {
    require(n >= 2, s"scrub gram size must be >= 2, got $n")
    import graft.functions.ShingleExprs
    // xxhash64(gram string) — the documented parity contract of
    // ShingleHash/ScrubSpansExpr's internal hash
    val hashes = probes
      .select(explode(ShingleExprs.ngramStrings(col(probeTextCol), n)).as("__g"))
      .select(xxhash64(col("__g")).as("__h")).distinct()
      .take(maxProbeGrams + 1).map(_.getLong(0))
    require(hashes.length <= maxProbeGrams,
      s"probe gram set exceeds maxProbeGrams=$maxProbeGrams — this scrub " +
        "ships the set with the plan; use the relational scrubOverlaps " +
        "for reference-corpus-sized probe sides")
    // struct lands in its own projection, fields extracted one level up
    // (the GopherFlags pattern): one native eval per row, not one per field
    docs.select(col(idCol),
        ShingleExprs.scrubSpans(col(textCol), n, hashes).as("__s"))
      .select(col(idCol),
        col("__s.n_tokens").cast("long").as("n_tokens"),
        col("__s.n_removed").cast("long").as("n_removed"),
        col("__s.scrubbed_text").as("scrubbed_text"))
  }
}
