package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.UnigramViterbi

/** Distributed unigram-LM tokenizer training (Kudo 2018, "Subword
  * Regularization", arXiv:1804.10959 — the SentencePiece unigram model),
  * as deterministic hard-EM (Viterbi E-step), re-expressed relationally.
  *
  * The BPE scale observation (see [[Bpe]]) holds verbatim: training
  * state lives on the DISTINCT-WORD table, never the corpus. The corpus
  * is scanned exactly once (one shuffle → `(word, freq)`); every EM
  * round after that is one vocabulary-sized aggregation:
  *
  *  - seed: freq-weighted counts of ALL substrings up to `maxPieceLen`
  *    (one explode + hash-agg over the word table), pruned to the
  *    `maxSeed` most frequent (count desc, piece asc — total order) plus
  *    every single character (the coverage guarantee);
  *  - E-step: the current piece table (bounded, ≤ maxSeed rows) is
  *    collected and shipped inside the native [[UnigramViterbi]]
  *    expression — each word's max-likelihood segmentation is one
  *    O(len·maxPieceLen) DP, embarrassingly parallel over words;
  *  - M-step: explode the segmentations, freq-weighted count per piece
  *    (one vocabulary-sized shuffle), +1-smoothed re-estimate
  *    logp = ln(cnt+1) − ln(total+|V|) — smoothing keeps never-chosen
  *    single chars finite so coverage survives pruning;
  *  - prune: keep the `vocabSize` highest-count pieces (count desc,
  *    piece asc), single chars always retained on top.
  *
  * Every step is exact integer counting plus a deterministic double
  * formula, so the trained vocabulary is reproducible bit-for-bit;
  * [[scalarTrain]] is the independent plain-Scala reference the spec
  * pins the relational path against, and the registered query's gate
  * asserts per-word invariants (reconstruction, Viterbi dominance over
  * greedy/char segmentations, cross-path score agreement) engine-side.
  *
  * At 100 TB: |distinct words| ~10⁶-10⁷ and |V| ~10⁴-10⁵ — the word
  * table partitions across the cluster, the piece table broadcasts via
  * the expression capture (a few MB), and each round is one shuffle of
  * piece counts. Nothing driver-side ever exceeds maxSeed rows. */
object Unigram {

  /** One vocabulary piece: exact freq-weighted count from the last
    * E-step (seed: substring count) and its smoothed log-probability. */
  final case class Piece(piece: String, cnt: Long, logp: Double)

  /** Smoothed log-prob table from exact counts: ln(c+1) − ln(N+|V|). */
  private def withLogp(counts: Seq[(String, Long)]): Seq[Piece] = {
    val total = counts.map(_._2).sum
    val denom = math.log((total + counts.size).toDouble)
    counts.map { case (p, c) => Piece(p, c, math.log((c + 1).toDouble) - denom) }
  }

  /** Deterministic prune: top `vocabSize` by (cnt desc, piece asc),
    * then union all single-char pieces (coverage), re-smoothed. */
  private def prune(counts: Seq[(String, Long)], vocabSize: Int): Seq[Piece] = {
    val ordered = counts.sortBy { case (p, c) => (-c, p) }
    val kept = ordered.take(vocabSize)
    val keptSet = kept.map(_._1).toSet
    val chars = ordered.filter { case (p, _) => p.length == 1 && !keptSet.contains(p) }
    withLogp((kept ++ chars).sortBy(_._1))
  }

  /** Freq-weighted counts of every substring of length ≤ maxPieceLen —
    * the relational seed. One explode over the word table, one hash-agg
    * shuffle of substring-universe size (bounded by Σ len·maxPieceLen
    * over DISTINCT words, not the corpus). */
  def substringCounts(words: DataFrame, maxPieceLen: Int): DataFrame =
    words
      .select(col("freq"), explode(flatten(
        transform(sequence(lit(1), length(col("word"))), i =>
          transform(sequence(i, least(length(col("word")),
            i + lit(maxPieceLen - 1))), j =>
            col("word").substr(i, j - i + 1))))).as("piece"))
      .groupBy(col("piece"))
      .agg(sum(col("freq")).as("cnt"))

  /** Train on a `(word, freq)` table (see [[Bpe.wordFreqs]]). Returns
    * the final vocabulary, piece-sorted. */
  def train(words: DataFrame, vocabSize: Int, rounds: Int = 3,
            maxPieceLen: Int = 6, maxSeed: Int = 2000,
            localThreshold: Int = 65536): Seq[Piece] = {
    require(vocabSize >= 1 && rounds >= 0 && maxPieceLen >= 1)
    require(maxSeed >= vocabSize, "maxSeed must be >= vocabSize")
    // the word table is read by the seed, the char-universe scan, and
    // every EM round — cut the upstream (usually corpus-sized) plan off
    // once, the Bpe.train state pattern
    val wordsCk = words.localCheckpoint(true)
    // adaptive small-state cutover, as in Bpe.train: below the
    // threshold every EM job is scheduler overhead — collect the
    // materialized word table and run the scalar loop, which
    // UnigramSpec pins piece-for-piece against the relational path
    if (wordsCk.count() <= localThreshold) {
      val local = wordsCk.select(col("word"), col("freq").cast("long"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      wordsCk.unpersist()
      return scalarTrain(local, vocabSize, rounds, maxPieceLen, maxSeed)
    }
    val seedCounts = substringCounts(wordsCk, maxPieceLen)
      .orderBy(desc("cnt"), col("piece"))
      .limit(maxSeed)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // seed cut can drop rare single chars — coverage re-union needs the
    // full char universe, not the pruned one
    val allChars = substringCounts(wordsCk, 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val seedSet = seedCounts.map(_._1).toSet
    var vocab = withLogp((seedCounts ++ allChars.filterNot(c => seedSet.contains(c._1)))
      .sortBy(_._1))
    var round = 0
    while (round < rounds) {
      val logp = vocab.map(p => p.piece -> p.logp).toMap
      val counts = wordsCk
        .select(col("freq"),
          explode(UnigramViterbi(col("word"), logp, maxPieceLen,
            heuristics = false).getField("seg"))
            .as("piece"))
        .groupBy(col("piece"))
        .agg(sum(col("freq")).as("cnt"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val countMap = counts.toMap
      // chars stay at observed count (0 if never chosen); smoothing keeps
      // them finite, pruning keeps them present
      val withChars = counts ++ allChars.collect {
        case (c, _) if !countMap.contains(c) => (c, 0L)
      }
      vocab = prune(withChars, vocabSize)
      round += 1
    }
    vocab
  }

  /** Final-vocab segmentation of a word column: struct(seg, vscore,
    * gscore, cscore) — see [[UnigramViterbi]]. */
  def segment(word: Column, vocab: Seq[Piece], maxPieceLen: Int = 6): Column =
    UnigramViterbi(word, vocab.map(p => p.piece -> p.logp).toMap, maxPieceLen,
      heuristics = true)

  // ---- independent scalar reference (the spec's ground truth) ----

  /** Plain-Scala Viterbi with the identical tie rule (longer last piece
    * wins exact score ties). */
  def scalarViterbi(word: String, logp: Map[String, Double],
                    maxPieceLen: Int): (List[String], Double) = {
    val L = word.length
    if (L == 0) return (Nil, 0.0)
    val best = Array.fill(L + 1)(Double.NegativeInfinity)
    val back = new Array[Int](L + 1)
    best(0) = 0.0
    for (i <- 1 to L; len <- 1 to math.min(maxPieceLen, i)) {
      val j = i - len
      if (best(j) != Double.NegativeInfinity) {
        logp.get(word.substring(j, i)).foreach { p =>
          val cand = best(j) + p
          if (cand >= best(i)) { best(i) = cand; back(i) = j }
        }
      }
    }
    if (best(L) == Double.NegativeInfinity)
      return (word.map(_.toString).toList, UnigramViterbi.Unsegmentable)
    var pos = L
    var seg = List.empty[String]
    while (pos > 0) { seg = word.substring(back(pos), pos) :: seg; pos = back(pos) }
    (seg, best(L))
  }

  /** The whole training loop with plain maps and loops — byte-for-byte
    * the same seed/E/M/prune rules as [[train]]. */
  def scalarTrain(words: Seq[(String, Long)], vocabSize: Int, rounds: Int = 3,
                  maxPieceLen: Int = 6, maxSeed: Int = 2000): Seq[Piece] = {
    val sub = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, f) =>
      for (i <- 0 until w.length; j <- (i + 1) to math.min(w.length, i + maxPieceLen))
        sub.updateWith(w.substring(i, j))(o => Some(o.getOrElse(0L) + f))
    }
    val seedCounts = sub.toSeq.sortBy { case (p, c) => (-c, p) }.take(maxSeed)
    val allChars = sub.toSeq.filter(_._1.length == 1)
    val seedSet = seedCounts.map(_._1).toSet
    var vocab = withLogp((seedCounts ++ allChars.filterNot(c => seedSet.contains(c._1)))
      .sortBy(_._1))
    for (_ <- 0 until rounds) {
      val logp = vocab.map(p => p.piece -> p.logp).toMap
      val counts = scala.collection.mutable.Map.empty[String, Long]
      words.foreach { case (w, f) =>
        scalarViterbi(w, logp, maxPieceLen)._1.foreach(p =>
          counts.updateWith(p)(o => Some(o.getOrElse(0L) + f)))
      }
      val withChars = counts.toSeq ++ allChars.collect {
        case (c, _) if !counts.contains(c) => (c, 0L)
      }
      vocab = prune(withChars, vocabSize)
    }
    vocab
  }
}
