package graft.llm

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Distributed byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016,
  * arXiv:1508.07909 — the algorithm behind GPT-2/SentencePiece-BPE vocabs),
  * re-expressed relationally.
  *
  * The published algorithm iterates: count adjacent symbol pairs across the
  * corpus, merge the most frequent pair everywhere, repeat. The classic
  * scale observation (also Sennrich's) is that training state lives on the
  * DISTINCT-WORD table, not the corpus: a 100 TB corpus has a vocabulary of
  * maybe 10⁶ distinct words, so the corpus is scanned exactly once (one
  * shuffle to build `(word, freq)`) and every iteration after that works on
  * a vocabulary-sized frame — pair counting is freq-weighted.
  *
  * Per iteration, relationally:
  *  - pair counts: `transform(sequence(...))` explodes each word's adjacent
  *    symbol pairs (positional count — "aaa" contributes (a,a) twice, as in
  *    the reference implementation's `get_stats`), one freq-weighted
  *    hash-agg shuffle of vocabulary size;
  *  - argmax: 1-row collect with a total deterministic tie-break
  *    (count desc, then pair lexicographic) so training is reproducible;
  *  - merge application: a greedy left-to-right non-overlapping fold over
  *    each word's symbols as an `aggregate` HOF (codegen'd, no UDF) —
  *    "aaa" + merge (a,a) → ["aa","a"], matching the scalar reference;
  *  - `localCheckpoint` per iteration keeps the plan flat across N merges
  *    (same pattern as Dedup.connectedComponents).
  *
  * [[replay]] is the independent scalar re-implementation used by the
  * correctness gate: given the learned merge sequence it re-derives every
  * per-rank positional pair count and applied-merge count with plain Scala
  * loops, which q_bpe_train compares freq-weighted against the relational
  * trainer's recorded trajectory.
  */
object Bpe {

  /** One learned merge: `rank`-th most frequent pair at its step.
    * `pairCount` is the positional (overlap-counting) frequency that won
    * the argmax; `applied` is the number of non-overlapping merge sites
    * actually rewritten (freq-weighted), ≤ pairCount. */
  final case class BpeMerge(rank: Int, left: String, right: String,
                            pairCount: Long, applied: Long)

  /** Corpus → freq-weighted distinct-word table. The single corpus-sized
    * shuffle of the whole training procedure. */
  def wordFreqs(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(TextFunctions.tokens(text)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).cast("long").as("freq"))

  /** Split a word into single-character symbols. */
  private def charSyms(word: Column): Column =
    transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1)))

  /** Freq-weighted positional adjacent-pair counts over the current state. */
  private def pairCounts(state: DataFrame): DataFrame =
    state.filter(size(col("syms")) > 1)
      .select(col("freq"),
        explode(transform(sequence(lit(0), size(col("syms")) - 2), i =>
          struct(element_at(col("syms"), i + 1).as("l"),
            element_at(col("syms"), i + 2).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("cnt"))

  /** Greedy left-to-right non-overlapping single-merge rewrite as a fold:
    * the accumulator carries (rewritten-prefix, previous-position-consumed)
    * so "aaa" under (a,a) becomes ["aa","a"], never ["aa","aa"].
    *
    * The input is LET-BOUND through a single-element `aggregate` whose
    * zero is `syms`: the rewrite body references the bound lambda
    * variable (a leaf) instead of duplicating the input expression ~8×
    * per level, which is what keeps [[applyMerges]]' chained tree LINEAR
    * in the merge count. Without the binding, 20 chained rewrites build
    * an ~8^20-node Catalyst tree — observed as a 156 MiB task binary and
    * a 12-minute sf0.01 query before this fix (projection barriers don't
    * help: CollapseProject folds them straight back). */
  def mergeOnce(syms: Column, l: String, r: String): Column =
    aggregate(array(lit(0)), syms, (bound, _) => mergeOnceBound(bound, l, r))

  private def mergeOnceBound(syms: Column, l: String, r: String): Column = {
    val n = size(syms)
    val zero = struct(array().cast("array<string>").as("o"), lit(false).as("k"))
    aggregate(
      sequence(lit(0), n - 1),
      zero,
      (acc, i) => {
        val cur = element_at(syms, i + 1)
        val nxt = element_at(syms, i + 2) // null past the end
        val hit = !acc.getField("k") && i < n - 1 &&
          cur === lit(l) && nxt === lit(r)
        struct(
          when(acc.getField("k"), acc.getField("o"))
            .when(hit, concat(acc.getField("o"), array(lit(l + r))))
            .otherwise(concat(acc.getField("o"), array(cur))).as("o"),
          hit.as("k"))
      },
      acc => acc.getField("o"))
  }

  /** Apply an already-learned merge list in rank order (the BPE encode
    * path for new text, and the trainer's own state transition). Tree
    * size is linear in the merge count thanks to [[mergeOnce]]'s
    * let-binding, so a full vocab's merge list chains safely inline. */
  def applyMerges(syms: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(syms) { case (s, (l, r)) => mergeOnce(s, l, r) }

  /** Encode the distinct-word table with a learned merge list — THE
    * corpus-scale encode shape: the chained merge rewrites run once per
    * DISTINCT word (vocabulary-sized work), and the corpus gets its BPE
    * tokens by joining exploded tokens back to this table (one shuffle,
    * or a broadcast when the vocab fits). Returns (word, freq, syms). */
  def encodeWords(words: DataFrame, merges: Seq[(String, String)]): DataFrame =
    words.select(col("word"), col("freq").cast("long").as("freq"),
      applyMerges(charSyms(col("word")), merges).as("syms"))

  /** Learn `numMerges` merges from a `(word, freq)` table. Deterministic:
    * ties break on (left, right) lexicographic. Stops early if no pair
    * remains.
    *
    * One aggregation job + one vocabulary-sized checkpoint per iteration:
    * a single `min_by`/`sum` pass returns both the winning pair (min of
    * (-cnt, l, r) ≡ count-desc-then-lex) and the total pair mass Σcnt.
    * Since Σcnt(t) = Σ freq·(len−1) = S(t) − F (S = freq-weighted symbol
    * mass, F = Σ freq, constant), each merge's applied count falls out of
    * successive totals — applied(t) = S(t) − S(t+1), every application
    * replacing exactly two symbols with one — with no separate counting
    * job. The scalar replay in q_bpe_train re-derives every applied count
    * independently, so the identity is oracle-checked, not assumed. */
  def train(words: DataFrame, numMerges: Int,
            localThreshold: Int = 65536): Seq[BpeMerge] = {
    val merges = ArrayBuffer.empty[BpeMerge]
    var state = words
      .select(col("word"), col("freq").cast("long").as("freq"),
        charSyms(col("word")).as("syms"))
      .localCheckpoint(true)

    // Adaptive small-state cutover (the broadcast-threshold pattern):
    // the training state is the distinct-word table; below the
    // threshold the 2·numMerges distributed jobs are pure scheduler
    // overhead, so collect the (already materialized) state once and
    // run the scalar trainer — merge-for-merge identical to the
    // relational loop by BpeSpec's classic + randomized fixtures. The
    // count reads checkpoint blocks, not the upstream plan.
    if (state.count() <= localThreshold) {
      val local = state.select(col("word"), col("freq"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      state.unpersist()
      return scalarTrain(local, numMerges)
    }

    /** (best pair with its count, S(t)): one job. */
    def bestAndMass(): (Option[(String, String, Long)], Long) = {
      val row = pairCounts(state).agg(
        min_by(struct(col("cnt"), col("l"), col("r")),
          struct((col("cnt") * -1).as("nc"), col("l"), col("r"))).as("best"),
        sum(col("cnt")).as("sumcnt"))
        .collect()(0)
      val f = fTotal
      if (row.isNullAt(0)) (None, f)
      else {
        val b = row.getStruct(0)
        (Some((b.getString(1), b.getString(2), b.getLong(0))),
          row.getLong(1) + f)
      }
    }
    lazy val fTotal: Long =
      state.agg(sum(col("freq"))).collect()(0).getLong(0)

    var t = 0
    var exhausted = false
    var pending: Option[(Int, String, String, Long, Long)] = None // + S(t)
    while (t < numMerges && !exhausted) {
      val (best, massNow) = bestAndMass()
      pending.foreach { case (pt, pl, pr, pcnt, massBefore) =>
        merges += BpeMerge(pt, pl, pr, pcnt, massBefore - massNow)
      }
      pending = None
      best match {
        case None => exhausted = true
        case Some((l, r, cnt)) =>
          val old = state
          state = old
            .select(col("word"), col("freq"),
              mergeOnce(col("syms"), l, r).as("syms"))
            .localCheckpoint(true)
          old.unpersist()
          pending = Some((t, l, r, cnt, massNow))
          t += 1
      }
    }
    pending.foreach { case (pt, pl, pr, pcnt, massBefore) =>
      val sFinal = state
        .agg(sum(col("freq") * size(col("syms")).cast("long")))
        .collect()(0).getLong(0)
      merges += BpeMerge(pt, pl, pr, pcnt, massBefore - sFinal)
    }
    state.unpersist()
    merges.toSeq
  }

  // ------------------------------------------------------- scalar reference

  /** Scalar greedy single-merge: returns (rewritten, positionalCount,
    * appliedCount) for ONE word occurrence. */
  def scalarMergeOnce(syms: List[String], l: String, r: String)
      : (List[String], Long, Long) = {
    var pos = 0L
    var i = 0
    while (i < syms.length - 1) {
      if (syms(i) == l && syms(i + 1) == r) pos += 1
      i += 1
    }
    val out = ArrayBuffer.empty[String]
    var applied = 0L
    i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out += l + r; applied += 1; i += 2
      } else { out += syms(i); i += 1 }
    }
    (out.toList, pos, applied)
  }

  /** Independent trajectory replay for one word: for each rank, the
    * positional pair count BEFORE that merge and the applied count, both
    * unweighted (the caller weights by freq). Plain Scala loops — shares
    * no code with the relational trainer. */
  def replay(word: String, merges: Seq[(String, String)]): Seq[(Int, Long, Long)] = {
    var syms = word.map(_.toString).toList
    merges.zipWithIndex.map { case ((l, r), rank) =>
      val (next, pos, applied) = scalarMergeOnce(syms, l, r)
      syms = next
      (rank, pos, applied)
    }
  }

  /** Scalar full trainer for spec-sized fixtures: the direct transcription
    * of Sennrich's reference loop, used to pin the relational trainer's
    * entire output (pairs, counts, tie-breaks) on small inputs. */
  def scalarTrain(words: Seq[(String, Long)], numMerges: Int): Seq[BpeMerge] = {
    var state = words.map { case (w, f) => (w.map(_.toString).toList, f) }
    val merges = ArrayBuffer.empty[BpeMerge]
    var t = 0
    var done = false
    while (t < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (syms, f) =>
        syms.zip(syms.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), cnt) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        var applied = 0L
        state = state.map { case (syms, f) =>
          val (next, _, app) = scalarMergeOnce(syms, l, r)
          applied += app * f
          (next, f)
        }
        merges += BpeMerge(t, l, r, cnt, applied)
        t += 1
      }
    }
    merges.toSeq
  }
}
