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
}
