package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Combine

/** Sequence packing for pretraining: lay documents end-to-end and chunk the
  * token stream into fixed-length training sequences (the "concat then
  * chunk" packing GPT-style pipelines use — no padding, documents straddle
  * sequence boundaries). The reference SDK has no such operator
  * (SURVEY.md §2.6 covers only scalar functions); this is part of the
  * mandated LLM-pipeline family (SURVEY.md §2.9).
  *
  * Scale posture: packing needs a total order inside each pack unit, which
  * on a cluster must NOT mean a global sort. Documents are first assigned
  * to `shards` deterministic hash shards (portable md5 bucket of the id —
  * reproducible across engines and under repartitioning), and the token
  * stream is laid out per shard: one shuffle, `shards`-way parallel window,
  * no global ordering anywhere. At 100 TB, `shards` is sized so one
  * shard's (id, token_count) pairs fit a task (the window carries two longs
  * per doc, not the text). Sequence ids are therefore (shard, seq) pairs —
  * exactly how distributed packing shards a corpus in practice.
  */
object Packing {

  /** Per-document placement in the packed token stream of its shard:
    *
    *  - `shard`: deterministic hash shard (md5 bucket of `idCol`);
    *  - `tokens`: whitespace token count ([[TextFunctions.tokenCount]]);
    *  - `start_seq` / `end_seq`: first / last sequence (length `seqLen`
    *    tokens, numbered per shard from 0) this document occupies;
    *  - `seq_offset`: token offset of the document's first token inside
    *    `start_seq`.
    *
    * Docs are laid out in ascending-id order within a shard; zero-token
    * docs are dropped (they occupy no stream position). All arithmetic is
    * exact integer math — bit-identical across engines by construction.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    seqLen: Int, shards: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    require(shards > 0, "shards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(
        col(idCol),
        Combine.hashBucket(col(idCol), shards).as("shard"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("tokens"))
      .filter(col("tokens") > 0)
      .withColumn("cum_end", sum(col("tokens")).over(w))
      .select(
        col(idCol), col("shard"), col("tokens"),
        floor((col("cum_end") - col("tokens")) / seqLen).as("start_seq"),
        floor((col("cum_end") - 1) / seqLen).as("end_seq"),
        pmod(col("cum_end") - col("tokens"), lit(seqLen.toLong)).as("seq_offset"))
  }

  /** Shard-level packing summary: sequence count and tail waste — the
    * fraction of the last (partial) sequence left unfilled, the quantity a
    * packing strategy is judged on. `n_seqs` counts full-or-partial
    * sequences (ceil of stream length / seqLen). */
  def packingStats(packed: DataFrame, seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    packed.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("n_tokens"))
      .withColumn("n_seqs", ceil(col("n_tokens") / lit(seqLen.toDouble)).cast("long"))
      .withColumn("tail_waste",
        (col("n_seqs") * seqLen - col("n_tokens")).cast("double") /
          (col("n_seqs") * seqLen).cast("double"))
  }

  /** Size-balanced shard assignment: rank documents by descending weight
    * (ties by ascending id) and deal them serpentine across `shards`
    * (pass 0 left-to-right, pass 1 right-to-left, …) — the deterministic
    * longest-processing-time heuristic that keeps per-shard totals within
    * one max-document of each other, where plain hashing leaves the
    * heavy-tailed document-length distribution unbalanced.
    *
    * The global rank is [[Combine.prefixSum]] of 1s — a range-partitioned
    * distributed rank, never a single-partition window — and the dealing
    * arithmetic is exact integer math, so the assignment is a pure
    * function of (weight, id) and replayable in SQL. Output: (id, weight,
    * rank, shard). */
  def assignShardsBySize(df: DataFrame, idCol: String,
                         weight: Column, shards: Int): DataFrame = {
    require(shards > 0, "shards must be positive")
    val ranked = Combine.prefixRank(
      df.select(col(idCol), weight.cast("long").as("weight")),
      Seq(col("weight").desc, col(idCol).asc), "rank")
    val r0 = (col("rank") - 1).cast("long")
    // integer div (exact over the full long range) — see ntilePerKey
    val pass = expr(s"(rank - 1) div ${shards}L")
    val pos = pmod(r0, lit(shards.toLong))
    val shard = when(pmod(pass, lit(2L)) === 0, pos)
      .otherwise(lit(shards.toLong - 1) - pos)
    ranked.select(col(idCol), col("weight"), col("rank").cast("long").as("rank"),
      shard.cast("int").as("shard"))
  }

  /** Deterministic per-epoch shuffle WITHOUT a global sort — the step
    * that feeds a trainer decorrelated epochs over an immutable corpus.
    * Each epoch `seed` re-deals every row to a shard (md5 hash bucket of
    * "seed|id" — [[Combine.hashBucket]]'s portable arithmetic) and orders
    * rows within the shard by the same salted hash: one hash-partitioned
    * shuffle + shard-local sorts, never a corpus-wide range exchange.
    * Different seeds give independent hashes, so consecutive epochs
    * decorrelate (PackingSpec measures the rank correlation ≈ 0). The
    * assignment is a pure function of (seed, id): reproducible on any
    * engine, resumable mid-epoch, and SQL-replayable for the oracle.
    * Output: (id, shard, pos) — pos is the 1-based read order inside the
    * shard. */
  def epochShuffleAssign(df: DataFrame, idCol: String, seed: Long,
                         shards: Int): DataFrame = {
    require(shards > 0, "shards must be positive")
    val salted = md5(concat(lit(s"$seed|"), col(idCol).cast("string"))
      .cast("binary"))
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.select(col(idCol),
        Combine.hashBucket(concat(lit(s"$seed|"), col(idCol).cast("string")),
          shards).cast("int").as("shard"),
        salted.as("__h"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /** OVERLAPPING token chunking — the retrieval-indexing sibling of
    * [[packSequences]]: each document is cut into windows of `chunkSize`
    * tokens starting every `stride` tokens (stride < chunkSize ⇒
    * consecutive chunks overlap by chunkSize − stride tokens — the
    * standard RAG/embedding-index layout, also the long-document
    * training layout when context windows overlap). Chunk starts are
    * 0, stride, 2·stride, … while start < n_tokens, with one final
    * possibly-short chunk; a document shorter than `chunkSize` yields
    * exactly one chunk; an empty or null document yields none. A start
    * is emitted only if it covers at least one NEW token (start = 0 or
    * start + chunkSize − stride < n_tokens … equivalently the last
    * start is the smallest multiple of stride with start + chunkSize ≥
    * n_tokens), so no fully-redundant tail chunks are produced.
    *
    * Output: (id, chunk_idx INT, n_chunk_tokens INT, chunk_text) —
    * chunk_idx is 0-based in document order; chunk text is rebuilt from
    * the tokenizer's tokens (whitespace/case-normalized, like every
    * text-surgery operator here).
    *
    * Scale: tokenize + window slicing are per-row HOFs inside one
    * projection and the explode is the output itself — no shuffle, no
    * join, no state; stream-safe in append mode by construction. */
  def chunkWithOverlap(df: DataFrame, idCol: String, textCol: String,
                       chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(stride > 0 && stride <= chunkSize,
      s"stride must be in [1, chunkSize], got $stride")
    // tokenize ONCE into an attribute: the token array is referenced by
    // every per-chunk slice lambda, and a raw tokens(textCol) expression
    // there would re-tokenize the document once per chunk (custom
    // expressions are not collapse-cheap, but lambdas re-evaluate their
    // captured non-attribute expressions per element)
    val tokenized = df.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("__toks"))
    val toks = col("__toks")
    // last start: smallest multiple of stride covering the doc's tail;
    // floor((max(n - chunkSize + stride - 1, 0)) / stride) * stride
    val n = size(toks)
    val lastStart = floor(
      greatest(n - lit(chunkSize) + lit(stride) - 1, lit(0))
        .cast("double") / stride).cast("int") * stride
    val chunks = when(n > 0,
      transform(sequence(lit(0), lastStart, lit(stride)),
        start => struct(
          slice(toks, start + 1, lit(chunkSize)).as("ts"),
          start.as("s"))))
      .otherwise(array().cast(
        "array<struct<ts:array<string>,s:int>>"))
    tokenized.select(col(idCol), posexplode(chunks).as(Seq("chunk_idx", "__c")))
      .select(col(idCol), col("chunk_idx").cast("int").as("chunk_idx"),
        size(col("__c.ts")).as("n_chunk_tokens"),
        concat_ws(" ", col("__c.ts")).as("chunk_text"))
  }
}
