package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Jensen-Shannon divergence between per-group token distributions —
  * the symmetric, bounded (≤ ln 2) companion to the PSI drift monitor
  * (q_psi_drift): "how far apart do two corpus slices read", the
  * standard corpus-drift / source-similarity diagnostic when mixing
  * pretraining sources.
  *
  *   JS(P,Q) = ½·KL(P‖M) + ½·KL(Q‖M),  M = (P+Q)/2
  *           = Σ_w [½·p·ln(2p/(p+q)) + ½·q·ln(2q/(p+q))]
  *
  * with p, q the word relative frequencies (zero-frequency terms
  * vanish — JS needs no smoothing, unlike KL). Determinism: each
  * per-word term is one fixed IEEE tree over exact integer counts,
  * rounded to 9 dp and summed as DECIMAL (the perplexity device) — the
  * pair score is partial-aggregation-order-free and oracle-replayable.
  *
  * Scale posture: ONE tokenize + count pass builds the (group, word)
  * frequency table; the pair expansion joins each frequency row to the
  * (tiny, broadcast) group-pair list — rows ∝ Σ_pairs vocab, never a
  * corpus self-join; the reduction is a map-combinable hash agg.
  */
object Divergence {

  /** Pairwise JS divergence matrix over the groups of `groupCol`.
    * @return (group_a, group_b, n_words, js) for every unordered pair
    *         (group_a < group_b lexicographically), js 6 dp */
  def jsDivergenceMatrix(df: DataFrame, groupCol: Column,
                         textCol: Column): DataFrame = {
    val freq = df.select(groupCol.cast("string").as("__s"),
        explode(TextFunctions.tokens(textCol)).as("__w"))
      .groupBy(col("__s"), col("__w")).agg(count(lit(1)).as("__c"))
    val tot = freq.groupBy(col("__s")).agg(sum(col("__c")).as("__tot"))
    val pairs = broadcast(tot.select(col("__s").as("group_a"),
        col("__tot").as("__ta"))
      .crossJoin(tot.select(col("__s").as("group_b"), col("__tot").as("__tb")))
      .filter(col("group_a") < col("group_b")))
    // each side's vocabulary lands on every pair it belongs to; the
    // union merges per (pair, word) into (ca, cb) with absent = 0
    val left = freq.join(pairs, col("__s") === col("group_a"))
      .select(col("group_a"), col("group_b"), col("__ta"), col("__tb"),
        col("__w"), col("__c").as("__ca"), lit(0L).as("__cb"))
    val right = freq.join(pairs, col("__s") === col("group_b"))
      .select(col("group_a"), col("group_b"), col("__ta"), col("__tb"),
        col("__w"), lit(0L).as("__ca"), col("__c").as("__cb"))
    val merged = left.unionByName(right)
      .groupBy(col("group_a"), col("group_b"), col("__ta"), col("__tb"),
        col("__w"))
      .agg(max(col("__ca")).as("__ca"), max(col("__cb")).as("__cb"))
    val p = col("__ca").cast("double") / col("__ta").cast("double")
    val q = col("__cb").cast("double") / col("__tb").cast("double")
    val term =
      when(col("__ca") > 0,
        lit(0.5d) * p * log(lit(2.0d) * p / (p + q))).otherwise(lit(0.0d)) +
      when(col("__cb") > 0,
        lit(0.5d) * q * log(lit(2.0d) * q / (p + q))).otherwise(lit(0.0d))
    merged
      .groupBy(col("group_a"), col("group_b"))
      .agg(count(lit(1)).as("n_words"),
        sum(round(term, 9).cast("decimal(28,12)")).cast("double").as("__js"))
      .select(col("group_a"), col("group_b"), col("n_words"),
        round(col("__js"), 6).as("js"))
  }
}
