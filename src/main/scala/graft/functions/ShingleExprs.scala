package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the text-dedup hot path (SURVEY.md §2
  * custom-operator preference (b): a native Expression where built-in
  * operators genuinely can't express the computation efficiently).
  *
  * The Column-combinator forms (tokens → sequence → transform → xxhash64
  * per position) are semantically right but execute as *interpreted*
  * higher-order functions — nothing eliminates the duplicated inner
  * traversals, and every shingle allocates. Tokenizing, shingling, and
  * min-hashing one document is a tight single-pass loop; these expressions
  * run exactly that loop per row. Hash parity: the values equal the
  * Column forms' (same XXH64 chain, seed 42), so swapping implementations
  * changes no query output.
  *
  * CodegenFallback is deliberate: the per-row work is one opaque loop —
  * codegen could only inline the call, not improve the loop, so the
  * fallback costs one virtual call per row.
  */
object ShingleExprs {

  private val NonToken = Pattern.compile("[^a-z']+")
  private val Seed = 42L

  /** Input validation shared by the string-input expressions: without it,
    * SQL-registered use (GraftExtensions) would pass analysis and fail at
    * runtime with a cast error. */
  private def requireType(e: Expression, ok: DataType => Boolean,
                          expected: String): TypeCheckResult =
    if (ok(e.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected $expected, got ${e.dataType.catalogString}")

  private def isStringType(dt: DataType): Boolean = dt.isInstanceOf[StringType]

  private def isDoubleArray(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** WordCount-style tokens of the lowercased text (parity with
    * TextFunctions.tokens: split on runs of non-[a-z'], drop empties). */
  private[functions] def tokenize(text: UTF8String): Array[String] =
    NonToken.split(text.toLowerCase.toString, -1).filter(_.nonEmpty)

  /** xxhash64 of a shingle string's UTF-8 bytes, seed 42 — identical to
    * functions.xxhash64(concat_ws(" ", tokens...)). */
  private def hashShingle(s: String): Long = {
    val b = UTF8String.fromString(s).getBytes
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, Seed)
  }

  private[functions] def shingleHashArray(text: UTF8String, k: Int): Array[Long] = {
    val toks = tokenize(text)
    if (toks.length < k) Array(hashShingle(toks.mkString(" ")))
    else {
      val out = new Array[Long](toks.length - k + 1)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < out.length) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = hashShingle(sb.toString)
        i += 1
      }
      out
    }
  }

  /** Rolling k-token shingle hashes: array<long>, one per window (single
    * element — the whole text — when fewer than k tokens). */
  final case class ShingleHash(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    require(k > 0, "shingle size must be positive")
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, isStringType, "string")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      new GenericArrayData(shingleHashArray(input.asInstanceOf[UTF8String], k))
    override def prettyName: String = "shingle_hash"
    override protected def withNewChildInternal(newChild: Expression): ShingleHash =
      copy(child = newChild)
  }

  /** Winnowing fingerprints in ONE pass (Schleimer et al. 2003): the
    * min shingle hash of every w-window, value-deduplicated in window
    * order — exactly `array_distinct(transform(sequence(...), i =>
    * array_min(slice(sh, i, w))))` over [[shingleHashArray]], but via a
    * monotonic deque: O(n) instead of the combinator form's
    * interpreted O(n·w) slices (which measured ~10× slower on the
    * copy-detection query). n ≤ w degenerates to the single global
    * min, matching the Column reference's `when` branch. */
  final case class WinnowFingerprints(child: Expression, k: Int, w: Int)
      extends UnaryExpression with CodegenFallback {
    require(k > 0 && w > 0, "k and w must be positive")
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, isStringType, "string")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val hs = shingleHashArray(input.asInstanceOf[UTF8String], k)
      val n = hs.length
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      if (n <= w) {
        var m = Long.MaxValue
        var i = 0
        while (i < n) { if (hs(i) < m) m = hs(i); i += 1 }
        seen.add(m)
      } else {
        // monotonic deque of indices; ties keep the EARLIER index so the
        // emitted value sequence equals per-window array_min
        val dq = new Array[Int](n)
        var head = 0; var tail = 0 // [head, tail)
        var i = 0
        while (i < n) {
          while (tail > head && hs(dq(tail - 1)) > hs(i)) tail -= 1
          dq(tail) = i; tail += 1
          if (dq(head) <= i - w) head += 1
          if (i >= w - 1) seen.add(hs(dq(head)))
          i += 1
        }
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
      new GenericArrayData(out)
    }
    override def prettyName: String = "winnow_fingerprints"
    override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
      copy(child = newChild)
  }

  /** MinHash signature in one pass: position j = min over shingles of the
    * j-salted hash (salt chain parity with xxhash64(j, shingleHash)). */
  final case class MinHashSig(child: Expression, k: Int, numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    require(k > 0 && numHashes > 0, "k and numHashes must be positive")
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, isStringType, "string")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    // xxhash64(j, h) evaluates as: seed 42 → fold int j → fold long h;
    // the per-position int-fold is input-independent, so precompute it
    @transient private lazy val salts: Array[Long] =
      Array.tabulate(numHashes)(j => XXH64.hashInt(j, Seed))

    override def nullSafeEval(input: Any): Any = {
      val hs = shingleHashArray(input.asInstanceOf[UTF8String], k)
      val sig = Array.fill(numHashes)(Long.MaxValue)
      var i = 0
      while (i < hs.length) {
        val h = hs(i)
        var j = 0
        while (j < numHashes) {
          val v = XXH64.hashLong(h, salts(j))
          if (v < sig(j)) sig(j) = v
          j += 1
        }
        i += 1
      }
      new GenericArrayData(sig)
    }
    override def prettyName: String = "minhash_sig"
    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
  }

  /** 64-bit SimHash in one pass: per-bit vote over the document's
    * k-shingle xxhash64 hashes ([[shingleHashArray]] — seed-42 parity
    * with the whole shingle family), sign → bit.
    *
    * Two measured design decisions, both from the sf10 scale rung
    * (500k docs):
    *
    * 64 bits, not 32 (Manku, Jain & Sarma, "Detecting Near-Duplicates
    * for Web Crawling", WWW'07 §3): the pigeonhole blocking in
    * Dedup.simHashPairs buckets on fingerprint chunks of
    * width/(maxDist+1) bits, so uniform-signature candidate volume is
    * ~n²/2^chunkWidth — 8-bit chunks measured ENOSPC (>74 GB of
    * shuffle); 16-bit chunks carry the same corpus trivially. 32 bits
    * also emit birthday-collision false distance-0 pairs at ~n²/2³³.
    *
    * SHINGLE features, not unigram tokens: a unigram per-bit vote is
    * the sign of the corpus-wide token distribution as sampled by the
    * document, so same-distribution documents get CORRELATED bits —
    * measured 15% of the 500k-doc corpus sharing one 16-bit chunk
    * value (11.8e9 candidate pairs — quadratic no matter the chunk
    * width). Shingles are near-unique per document, votes decorrelate:
    * the same probe measured max bucket 100 (= the true near-dup
    * family size) and 21e6 candidates, a 560× reduction. Shingles are
    * also what Manku fingerprints, and they see token ORDER.
    *
    * Sub-k documents use shingleHashArray's whole-text fallback (ONE
    * feature = xxhash64 of the joined tokens), so the single-feature
    * law pinned in the q_sql_surface audit — simhash64 of a document
    * below k tokens IS xxhash64 of its joined tokens — gives SQL an
    * exact cross-derivation: simhash64('graft') = xxhash64('graft'). */
  final case class SimHash64(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    require(k > 0, "k must be positive")
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, isStringType, "string")
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val hs = shingleHashArray(input.asInstanceOf[UTF8String], k)
      val votes = new Array[Int](64)
      var t = 0
      while (t < hs.length) {
        val h = hs(t)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
        t += 1
      }
      var out = 0L
      var i = 0
      while (i < 64) {
        if (votes(i) > 0) out |= (1L << i)
        i += 1
      }
      out
    }
    override def prettyName: String = "simhash64"
    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  /** Rolling n-token gram STRINGS — the string-valued sibling of
    * [[ShingleHash]] for stats that need the gram text itself (length,
    * oracle-replayable identity). Value parity with the Column form
    * `transform(sequence(1, size(toks)-n+1), i => array_join(slice(toks,
    * i, n), " "))` guarded by `size(toks) >= n` (EMPTY array below n —
    * unlike shingleHashArray's whole-text fallback), asserted in
    * ShingleExprsSpec. One tokenize + tight loop instead of interpreted
    * higher-order functions (sequence/transform/slice/array_join run as
    * per-element closures, never codegen). */
  final case class NgramStrings(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    require(n > 0, "n-gram size must be positive")
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, isStringType, "string")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val toks = tokenize(input.asInstanceOf[UTF8String])
      if (toks.length < n) new GenericArrayData(Array.empty[Any])
      else {
        val out = new Array[Any](toks.length - n + 1)
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i < out.length) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          out(i) = UTF8String.fromString(sb.toString)
          i += 1
        }
        new GenericArrayData(out)
      }
    }
    override def prettyName: String = "ngram_strings"
    override protected def withNewChildInternal(newChild: Expression): NgramStrings =
      copy(child = newChild)
  }

  /** Span scrub in one pass — the projection form of decontamination
    * (graft.llm.Contamination.scrubOverlaps): tokenize, hash each n-gram
    * (same xxhash64-of-gram-string convention as [[ShingleHash]], but with
    * [[NgramStrings]]' EMPTY-below-n convention — no whole-text fallback),
    * mark positions [i, i+n) for every gram whose hash is in the probe
    * set, rebuild the kept tokens. Because the probe set rides the
    * serialized expression (eval-set-sized by the caller's contract),
    * the whole scrub is a stateless per-row map: stream-safe in append
    * mode, no shuffle, no state store.
    *
    * Returns struct(n_tokens INT, n_removed INT, scrubbed_text STRING);
    * null text propagates to a null struct (UnaryExpression contract). */
  final case class ScrubSpansExpr(child: Expression, n: Int,
                                  probeHashes: Array[Long])
      extends UnaryExpression with CodegenFallback {
    require(n >= 2, "scrub gram size must be >= 2")
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, isStringType, "string")
    override def dataType: DataType = StructType(Seq(
      StructField("n_tokens", IntegerType, nullable = false),
      StructField("n_removed", IntegerType, nullable = false),
      StructField("scrubbed_text", StringType, nullable = false)))
    // sorted copy for binary-search membership; built once per task
    @transient private lazy val sorted: Array[Long] = {
      val a = probeHashes.clone(); java.util.Arrays.sort(a); a
    }
    override def nullSafeEval(input: Any): Any = {
      val toks = tokenize(input.asInstanceOf[UTF8String])
      val L = toks.length
      val removed = new Array[Boolean](L)
      if (L >= n && sorted.length > 0) {
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i <= L - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          val b = UTF8String.fromString(sb.toString).getBytes
          val h = XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET,
            b.length, Seed)
          if (java.util.Arrays.binarySearch(sorted, h) >= 0) {
            var k = i
            while (k < i + n) { removed(k) = true; k += 1 }
          }
          i += 1
        }
      }
      var nRemoved = 0
      val out = new java.lang.StringBuilder
      var i = 0
      while (i < L) {
        if (removed(i)) nRemoved += 1
        else {
          if (out.length > 0) out.append(' ')
          out.append(toks(i))
        }
        i += 1
      }
      org.apache.spark.sql.catalyst.InternalRow(
        L, nRemoved, UTF8String.fromString(out.toString))
    }
    override def prettyName: String = "scrub_spans"
    override protected def withNewChildInternal(newChild: Expression): ScrubSpansExpr =
      copy(child = newChild)
  }

  /** Consecutive (v, w) pairs of a string array — the native form of
    * `transform(sequence(1, size(t)-1), i => struct(element_at(t, i),
    * element_at(t, i+1)))` (interpreted per element), for bigram streams
    * built from an ALREADY-tokenized column (the tokenize-once persist
    * contract in TextRelevance). Empty below 2 elements. */
  final case class ConsecutivePairs(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, {
        case ArrayType(_: StringType, _) => true
        case _ => false
      }, "array<string>")
    // v/w nullable: the registered SQL form accepts any array<string>,
    // including one with null elements (token arrays never carry them,
    // but the schema must not promise what the input can break)
    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("v", StringType, nullable = true),
        StructField("w", StringType, nullable = true))),
      containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = arr.numElements()
      if (n < 2) new GenericArrayData(Array.empty[Any])
      else {
        val out = new Array[Any](n - 1)
        var i = 0
        while (i < n - 1) {
          out(i) = org.apache.spark.sql.catalyst.InternalRow(
            arr.getUTF8String(i), arr.getUTF8String(i + 1))
          i += 1
        }
        new GenericArrayData(out)
      }
    }
    override def prettyName: String = "consecutive_pairs"
    override protected def withNewChildInternal(newChild: Expression): ConsecutivePairs =
      copy(child = newChild)
  }

  /** Whitespace token count in one byte scan — ≡ `size(filter(split(
    * text, "\\s+"), len > 0))` (maximal runs of non-`\s` bytes; Java
    * regex `\s` = the six ASCII whitespace chars). */
  final case class WsTokenCount(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, isStringType, "string")
    override def dataType: DataType = org.apache.spark.sql.types.IntegerType
    override def nullSafeEval(input: Any): Any = {
      val rb = input.asInstanceOf[UTF8String].getBytes
      var n = 0
      var inWord = false
      var i = 0
      while (i < rb.length) {
        val b = rb(i)
        val ws = b == ' ' || b == '\t' || b == '\n' || b == 0x0b ||
          b == '\f' || b == '\r'
        if (!ws && !inWord) { n += 1; inWord = true }
        else if (ws) inWord = false
        i += 1
      }
      n
    }
    override def prettyName: String = "ws_token_count"
    override protected def withNewChildInternal(newChild: Expression): WsTokenCount =
      copy(child = newChild)
  }

  /** BPE-proxy subword count in one char scan — the native form of the
    * split-on-boundaries + ceil(len/4) fold. Piece boundaries replicate
    * the regex `(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])|\s+|
    * (?=[^a-zA-Z0-9\s])` exactly: ASCII letter↔digit transitions and
    * every non-alphanumeric non-whitespace char (unicode included — the
    * char classes are ASCII-only, so `ü` is a boundary-BEFORE char that
    * then glues to the following run, e.g. "don't" → "don","'t" and
    * "a!?b" → "a","!","?b"). Piece length counts CHARS (non-continuation
    * bytes); scanning is per UTF-8 char start. */
  final case class BpeProxyCount(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, isStringType, "string")
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val rb = input.asInstanceOf[UTF8String].getBytes
      var total = 0L
      var pieceLen = 0
      var prevClass = 0 // 0 none, 1 letter, 2 digit, 3 other
      def endPiece(): Unit = {
        if (pieceLen > 0) total += (pieceLen + 3) / 4
        pieceLen = 0; prevClass = 0
      }
      var i = 0
      while (i < rb.length) {
        val b = rb(i)
        if ((b & 0xc0) != 0x80) { // char start
          val ws = b == ' ' || b == '\t' || b == '\n' || b == 0x0b ||
            b == '\f' || b == '\r'
          if (ws) endPiece()
          else {
            val cls =
              if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')) 1
              else if (b >= '0' && b <= '9') 2
              else 3
            val boundary = pieceLen > 0 && (cls == 3 ||
              (prevClass == 1 && cls == 2) || (prevClass == 2 && cls == 1))
            if (boundary) endPiece()
            pieceLen += 1
            prevClass = cls
          }
        }
        i += 1
      }
      endPiece()
      total
    }
    override def prettyName: String = "bpe_proxy_count"
    override protected def withNewChildInternal(newChild: Expression): BpeProxyCount =
      copy(child = newChild)
  }

  /** Heuristic language ID in one byte scan — the native form of
    * TextFunctions.langId's Column rules (per-language marker-token hit
    * counts, argmax, "und" when nothing matches). Tie-break parity with
    * `array_max(array(struct(hits, lang)...))`: struct ordering compares
    * hits first, then the lang string — so equal hit counts resolve to
    * the LEXICOGRAPHICALLY LARGEST language code. Asserted against the
    * Column reference in the property fuzz. */
  final case class LangIdExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, isStringType, "string")
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any = {
      val lb = input.asInstanceOf[UTF8String].toLowerCase.getBytes
      val counts = new Array[Int](LangCodes.length)
      var runStart = -1
      var i = 0
      while (i <= lb.length) {
        val isTok = i < lb.length && {
          val b = lb(i)
          (b >= 'a' && b <= 'z') || b == '\''
        }
        if (isTok) { if (runStart < 0) runStart = i }
        else if (runStart >= 0) {
          val len = i - runStart
          if (len <= MaxMarkerLen) {
            val langs = MarkerLangs.get(
              new String(lb, runStart, len, java.nio.charset.StandardCharsets.US_ASCII))
            if (langs != null) {
              var j = 0
              while (j < langs.length) { counts(langs(j)) += 1; j += 1 }
            }
          }
          runStart = -1
        }
        i += 1
      }
      // argmax, ties to the LAST (lexicographically largest) code
      var best = 0
      var j = 1
      while (j < counts.length) {
        if (counts(j) >= counts(best)) best = j
        j += 1
      }
      if (counts(best) > 0) UTF8String.fromString(LangCodes(best))
      else UTF8String.fromString("und")
    }
    override def prettyName: String = "lang_id"
    override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
      copy(child = newChild)
  }

  /** language codes in ascending order — ties resolve to the larger code,
    * matching array_max's struct comparison in the Column form */
  private val LangCodes: Array[String] =
    TextFunctions.LanguageMarkers.keys.toArray.sorted
  private val MarkerLangs: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    LangCodes.zipWithIndex.foreach { case (lang, idx) =>
      TextFunctions.LanguageMarkers(lang).foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) Array(idx) else prev :+ idx)
      }
    }
    m
  }
  private val MaxMarkerLen: Int =
    TextFunctions.LanguageMarkers.values.flatten.map(_.length).max

  /** C4-style composite quality score in ONE byte scan — the native form
    * of TextFunctions.qualityScore's documented semantics. Parity
    * contract (asserted against the Column reference form in
    * TextFunctionsSpec):
    *   - tokens/letters count maximal `[a-z']` runs of `lower(text)` —
    *     lowercasing uses the same UTF8String.toLowerCase as Spark's
    *     `lower`, and `[a-z']` chars are single UTF-8 bytes, so the byte
    *     scan counts exactly what the regex forms count;
    *   - punctuation is Java regex `\p{Punct}` = the 32 ASCII POSIX
    *     punctuation chars, counted over the RAW text's bytes (non-ASCII
    *     never matches, and ASCII bytes in UTF-8 are unambiguous);
    *   - stopword hit = some maximal run is a member of
    *     TextFunctions.EnglishStopwords (all ≤ 4 chars — longer runs
    *     skip the lookup);
    *   - score arithmetic replays the Column form's IEEE ops: each
    *     sub-check contributes 1.0/0.0, mean word length and punct ratio
    *     are int-cast-double divisions. */
  final case class QualityScoreExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, isStringType, "string")
    override def dataType: DataType = DoubleType
    override def nullSafeEval(input: Any): Any = {
      val raw = input.asInstanceOf[UTF8String]
      val lb = raw.toLowerCase.getBytes
      var nTok = 0; var letters = 0; var stopHit = false
      var runStart = -1
      var i = 0
      while (i <= lb.length) {
        val isTok = i < lb.length && {
          val b = lb(i)
          (b >= 'a' && b <= 'z') || b == '\''
        }
        if (isTok) {
          if (runStart < 0) runStart = i
          letters += 1
        } else if (runStart >= 0) {
          nTok += 1
          val len = i - runStart
          if (!stopHit && len <= 4)
            stopHit = Stopwords.contains(
              new String(lb, runStart, len, java.nio.charset.StandardCharsets.US_ASCII))
          runStart = -1
        }
        i += 1
      }
      val rb = raw.getBytes
      var punct = 0
      i = 0
      while (i < rb.length) {
        val b = rb(i)
        if ((b >= 0x21 && b <= 0x2f) || (b >= 0x3a && b <= 0x40) ||
            (b >= 0x5b && b <= 0x60) || (b >= 0x7b && b <= 0x7e)) punct += 1
        i += 1
      }
      val chars = raw.numChars()
      val meanWordLen = if (nTok == 0) 0.0 else letters.toDouble / nTok
      val lenOk = if (nTok >= 5 && nTok <= 100000) 1.0 else 0.0
      val wordLenOk = if (meanWordLen >= 2.0 && meanWordLen <= 12.0) 1.0 else 0.0
      val punctOk =
        if (chars == 0 || punct.toDouble / chars.toDouble < 0.2) 1.0 else 0.0
      val stopOk = if (stopHit) 1.0 else 0.0
      (lenOk + wordLenOk + punctOk + stopOk) / 4.0
    }
    override def prettyName: String = "quality_score"
    override protected def withNewChildInternal(newChild: Expression): QualityScoreExpr =
      copy(child = newChild)
  }

  private val Stopwords: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    TextFunctions.EnglishStopwords.foreach(s.add)
    s
  }

  private val StopIndex: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    TextFunctions.EnglishStopwords.zipWithIndex.foreach { case (w, i) =>
      m.put(w, i)
    }
    m
  }

  /** All six Gopher quality rules + word count in THREE byte scans (raw
    * words/symbols/lines, lowered stopword runs) — the native form of
    * Curation.gopherQualityFlags' Column rules, which evaluate the
    * whitespace-words array ~4× and each flag twice (own column + keep).
    * Byte-level parity contract with the replaced combinators (asserted
    * against the fully-inlined Column reference in CurationSpec):
    *   - words: maximal runs of non-`\s` (Java regex `\s` = the six
    *     ASCII whitespace chars); word length in CHARS (count non-
    *     continuation bytes); alpha hit = any ASCII letter byte;
    *   - symbols: '#' chars + '…' (U+2026) chars + NON-OVERLAPPING
    *     left-to-right "..." triples (regexp_replace semantics);
    *   - lines: split on '\n'; blank = only 0x20 spaces (Spark `trim`
    *     trims exactly the space char); bullet = first post-trim char ∈
    *     {-, *, •}; ellipsis = trimmed line ends with "..." or "…";
    *   - stopword distinctness via an 18-bit membership mask over the
    *     lowered `[a-z']` runs (array_intersect ∘ array_distinct ≡
    *     distinct-member count);
    *   - flag arithmetic replays the Column form's IEEE double
    *     divisions and comparisons. */
  final case class GopherFlags(child: Expression, minWords: Int, maxWords: Int)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, isStringType, "string")
    override def dataType: DataType = StructType(Seq(
      StructField("n_words", LongType, nullable = false),
      StructField("f_words", org.apache.spark.sql.types.BooleanType, nullable = false),
      StructField("f_word_len", org.apache.spark.sql.types.BooleanType, nullable = false),
      StructField("f_symbols", org.apache.spark.sql.types.BooleanType, nullable = false),
      StructField("f_alpha", org.apache.spark.sql.types.BooleanType, nullable = false),
      StructField("f_stopwords", org.apache.spark.sql.types.BooleanType, nullable = false),
      StructField("f_bullets", org.apache.spark.sql.types.BooleanType, nullable = false),
      StructField("keep", org.apache.spark.sql.types.BooleanType, nullable = false)))
    override def nullSafeEval(input: Any): Any = {
      val raw = input.asInstanceOf[UTF8String]
      val rb = raw.getBytes
      // words: runs of non-\s bytes; char lengths; per-word alpha hit
      var nWords = 0L; var sumLen = 0L; var alphaWords = 0L
      var inWord = false; var wordHasAlpha = false; var wordChars = 0
      def isWs(b: Byte): Boolean =
        b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'
      var i = 0
      while (i <= rb.length) {
        val ws = i == rb.length || isWs(rb(i))
        if (!ws) {
          val b = rb(i)
          if (!inWord) { inWord = true; wordHasAlpha = false; wordChars = 0 }
          if ((b & 0xc0) != 0x80) wordChars += 1
          if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) wordHasAlpha = true
        } else if (inWord) {
          nWords += 1; sumLen += wordChars
          if (wordHasAlpha) alphaWords += 1
          inWord = false
        }
        i += 1
      }
      // symbols: '#', '…' (E2 80 A6), non-overlapping "..."
      var symbols = 0L
      i = 0
      while (i < rb.length) {
        if (rb(i) == '#') symbols += 1
        else if (rb(i) == 0xe2.toByte && i + 2 < rb.length &&
          rb(i + 1) == 0x80.toByte && rb(i + 2) == 0xa6.toByte) symbols += 1
        i += 1
      }
      i = 0
      while (i + 2 < rb.length) {
        if (rb(i) == '.' && rb(i + 1) == '.' && rb(i + 2) == '.') {
          symbols += 1; i += 3
        } else i += 1
      }
      // lines: '\n'-split, space-trim, bullet prefix / ellipsis suffix
      var nLines = 0L; var bullets = 0L; var ellipsisEnd = 0L
      var lineStart = 0
      i = 0
      while (i <= rb.length) {
        if (i == rb.length || rb(i) == '\n') {
          var s = lineStart; var e = i - 1
          while (s <= e && rb(s) == ' ') s += 1
          while (e >= s && rb(e) == ' ') e -= 1
          if (s <= e) {
            nLines += 1
            val b0 = rb(s)
            if (b0 == '-' || b0 == '*' ||
              (b0 == 0xe2.toByte && s + 2 <= e &&
                rb(s + 1) == 0x80.toByte && rb(s + 2) == 0xa2.toByte)) bullets += 1
            // Java regex `$` (non-MULTILINE) also matches BEFORE one
            // final line terminator — here \r, NEL (C2 85) or LS/PS
            // (E2 80 A8/A9); \n cannot survive the split — so the
            // reference rlike counts a line ending "…\r". Strip at most
            // one such terminator before the suffix test.
            var e2 = e
            if (rb(e2) == '\r') e2 -= 1
            else if (e2 - s >= 1 && rb(e2 - 1) == 0xc2.toByte &&
              rb(e2) == 0x85.toByte) e2 -= 2
            else if (e2 - s >= 2 && rb(e2 - 2) == 0xe2.toByte &&
              rb(e2 - 1) == 0x80.toByte &&
              (rb(e2) == 0xa8.toByte || rb(e2) == 0xa9.toByte)) e2 -= 3
            if (e2 - s + 1 >= 3 &&
              ((rb(e2) == '.' && rb(e2 - 1) == '.' && rb(e2 - 2) == '.') ||
                (rb(e2) == 0xa6.toByte && rb(e2 - 1) == 0x80.toByte &&
                  rb(e2 - 2) == 0xe2.toByte))) ellipsisEnd += 1
          }
          lineStart = i + 1
        }
        i += 1
      }
      // distinct stopwords among lowered [a-z'] runs (18-bit mask)
      val lb = raw.toLowerCase.getBytes
      var mask = 0
      var runStart = -1
      i = 0
      while (i <= lb.length) {
        val isTok = i < lb.length && {
          val b = lb(i)
          (b >= 'a' && b <= 'z') || b == '\''
        }
        if (isTok) { if (runStart < 0) runStart = i }
        else if (runStart >= 0) {
          val len = i - runStart
          if (len <= 4) {
            val idx = StopIndex.get(
              new String(lb, runStart, len, java.nio.charset.StandardCharsets.US_ASCII))
            if (idx != null) mask |= 1 << idx.intValue()
          }
          runStart = -1
        }
        i += 1
      }
      val distinctStops = Integer.bitCount(mask)
      // flags (same IEEE ops as the Column form)
      val meanLen = if (nWords == 0L) 0.0 else sumLen.toDouble / nWords
      val fWords = nWords >= minWords && nWords <= maxWords
      val fWordLen = meanLen >= 3.0 && meanLen <= 10.0
      val fSymbols = nWords != 0L && symbols.toDouble / nWords <= 0.1
      val alphaFrac = if (nWords == 0L) 0.0 else alphaWords.toDouble / nWords
      val fAlpha = alphaFrac >= 0.8
      val fStop = distinctStops >= 2
      val bulletFrac = if (nLines == 0L) 0.0 else bullets.toDouble / nLines
      val ellFrac = if (nLines == 0L) 0.0 else ellipsisEnd.toDouble / nLines
      val fBullets = bulletFrac < 0.9 && ellFrac < 0.3
      val keep = fWords && fWordLen && fSymbols && fAlpha && fStop && fBullets
      org.apache.spark.sql.catalyst.InternalRow(
        nWords, fWords, fWordLen, fSymbols, fAlpha, fStop, fBullets, keep)
    }
    override def prettyName: String = "gopher_flags"
    override protected def withNewChildInternal(newChild: Expression): GopherFlags =
      copy(child = newChild)
  }

  /** Count of positions where two long arrays hold EQUAL values — the
    * MinHash signature-agreement kernel, run once per LSH candidate pair
    * (corpus-proportional at scale). Value parity with the HOF form
    * `size(array_compact(zip_with(a, b, (x, y) => when(x === y, 1))))`:
    * zip_with pads the shorter array with null, null-safe equality then
    * yields null (dropped by array_compact), so positions beyond the
    * shorter length and null elements count 0 — replicated here by
    * iterating to min(len) and skipping nulls. */
  final case class SigAgreement(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    private def isLongArray(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    override def checkInputDataTypes(): TypeCheckResult = {
      val l = requireType(left, isLongArray, "array<bigint>")
      if (l.isFailure) l else requireType(right, isLongArray, "array<bigint>")
    }
    override def dataType: DataType = org.apache.spark.sql.types.IntegerType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var agree = 0
      var i = 0
      while (i < n) {
        if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i))
          agree += 1
        i += 1
      }
      agree
    }
    override def prettyName: String = "sig_agreement"
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SigAgreement =
      copy(left = newLeft, right = newRight)
  }

  /** Σ aᵢ·bᵢ over two double arrays, sequential left-to-right accumulation
    * — bit-parity with aggregate(zip_with(a, b, _*_), 0.0, _+_) and with
    * DuckDB's list_inner_product, which both oracle paths rely on.
    * Null semantics match the replaced form: mismatched lengths or a null
    * element yield NULL (zip_with pads/propagates null → null sum), never
    * a plausible partial sum. */
  final case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult = {
      val l = requireType(left, isDoubleArray, "array<double>")
      if (l.isFailure) l else requireType(right, isDoubleArray, "array<double>")
    }
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n != b.numElements()) return null
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc += a.getDouble(i) * b.getDouble(i)
        i += 1
      }
      acc
    }
    override def prettyName: String = "dot_product"
    override protected def withNewChildrenInternal(newLeft: Expression,
                                                   newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  /** Σ (aᵢ−bᵢ)² over two double arrays, sequential left-to-right
    * accumulation — bit-parity with
    * aggregate(zip_with(a, b, (x,y) => (x−y)*(x−y)), 0.0, _+_), the form
    * it replaces (same IEEE op order, so centroid assignments are
    * unchanged). Null semantics match [[DotProduct]]: length mismatch or
    * null element → NULL. Hot path: nearest-centroid assignment scores
    * |corpus|·k pairs (IVF, k-means, SemDeDup); the interpreted HOF form
    * allocates a difference array per pair. */
  final case class SqDistance(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult = {
      val l = requireType(left, isDoubleArray, "array<double>")
      if (l.isFailure) l else requireType(right, isDoubleArray, "array<double>")
    }
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n != b.numElements()) return null
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val d = a.getDouble(i) - b.getDouble(i)
        acc += d * d
        i += 1
      }
      acc
    }
    override def prettyName: String = "sq_distance"
    override protected def withNewChildrenInternal(newLeft: Expression,
                                                   newRight: Expression): SqDistance =
      copy(left = newLeft, right = newRight)
  }

  /** Unit-normalize a double array in ONE pass (norm computed once, then
    * one divide per element) — the Column form re-evaluates the full
    * norm subtree inside the transform lambda per element (O(d²) per
    * row). IEEE semantics for the zero vector (elements become NaN/Inf —
    * same as the divide in the Column form); null element → null output
    * array element positions are not representable, so a null element
    * yields a NULL result. */
  final case class L2Normalize(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, isDoubleArray, "array<double>")
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[ArrayData]
      val n = a.numElements()
      var sumSq = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i)) return null
        val x = a.getDouble(i)
        sumSq += x * x
        i += 1
      }
      val norm = math.sqrt(sumSq)
      val out = new Array[Double](n)
      i = 0
      while (i < n) {
        out(i) = a.getDouble(i) / norm
        i += 1
      }
      new GenericArrayData(out)
    }
    override def prettyName: String = "l2_normalize"
    override protected def withNewChildInternal(newChild: Expression): L2Normalize =
      copy(child = newChild)
  }

  /** Column wrappers. */
  def shingleHashes(text: Column, k: Int): Column =
    GraftSqlBridge.column(ShingleHash(GraftSqlBridge.expression(text), k))

  def ngramStrings(text: Column, n: Int): Column =
    GraftSqlBridge.column(NgramStrings(GraftSqlBridge.expression(text), n))

  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    GraftSqlBridge.column(WinnowFingerprints(GraftSqlBridge.expression(text), k, w))

  def qualityScore(text: Column): Column =
    GraftSqlBridge.column(QualityScoreExpr(GraftSqlBridge.expression(text)))

  def scrubSpans(text: Column, n: Int, probeHashes: Array[Long]): Column =
    GraftSqlBridge.column(ScrubSpansExpr(GraftSqlBridge.expression(text), n, probeHashes))

  def consecutivePairs(tokens: Column): Column =
    GraftSqlBridge.column(ConsecutivePairs(GraftSqlBridge.expression(tokens)))

  def gopherFlags(text: Column, minWords: Int, maxWords: Int): Column =
    GraftSqlBridge.column(GopherFlags(GraftSqlBridge.expression(text), minWords, maxWords))

  def langId(text: Column): Column =
    GraftSqlBridge.column(LangIdExpr(GraftSqlBridge.expression(text)))

  def wsTokenCount(text: Column): Column =
    GraftSqlBridge.column(WsTokenCount(GraftSqlBridge.expression(text)))

  def bpeProxyCount(text: Column): Column =
    GraftSqlBridge.column(BpeProxyCount(GraftSqlBridge.expression(text)))

  def sigAgreement(a: Column, b: Column): Column =
    GraftSqlBridge.column(SigAgreement(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def minHashSignature(text: Column, k: Int, numHashes: Int): Column =
    GraftSqlBridge.column(MinHashSig(GraftSqlBridge.expression(text), k, numHashes))

  def simHash(text: Column, k: Int = 3): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(text), k))

  /** Callers must pre-cast both sides to array<double>. */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Callers must pre-cast both sides to array<double>. */
  def sqDistance(a: Column, b: Column): Column =
    GraftSqlBridge.column(SqDistance(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Caller must pre-cast to array<double>. */
  def l2Normalize(v: Column): Column =
    GraftSqlBridge.column(L2Normalize(GraftSqlBridge.expression(v)))
}
