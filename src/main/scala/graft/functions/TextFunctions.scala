package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale document pipelines.
  *
  * The reference SDK has no expression language at all — element-level text
  * logic lives in user Java inside DoFns (e.g. the canonical WordCount's
  * ExtractWordsFn splits on "[^a-zA-Z']+"; SURVEY.md section 2.6). Here every
  * function is a pure Column expression built from Spark built-ins, so it
  * stays inside whole-stage codegen and never forces a deserialization to JVM
  * objects — the property that matters at 100 TB.
  */
object TextFunctions {

  /** Lower-cased word tokens, WordCount-style: split on non-letters,
    * drop empties. Runs as the n=1 case of the native
    * [[ShingleExprs.NgramStrings]] expression — value-identical to
    * `filter(split(lower(text), "[^a-z']+"), t => length(t) > 0)`
    * (asserted in TextFunctionsSpec/ShingleExprsSpec) but one tokenize
    * pass instead of an interpreted regex-split + filter closure. */
  def tokens(text: Column): Column =
    ShingleExprs.ngramStrings(text, 1)

  /** Whitespace token count (cheap "how many words" metric). Native
    * one-scan form of `size(filter(split(text, "\\s+"), len > 0))` —
    * parity asserted in the property fuzz. */
  def tokenCount(text: Column): Column =
    ShingleExprs.wsTokenCount(text)

  /** BPE-ish subword count: words are split further on letter/digit
    * boundaries and long words counted as ceil(len/4) pieces, a standard
    * cheap proxy for tokenizer cost when the real BPE table is external.
    * Native one-scan form (see [[ShingleExprs.BpeProxyCount]]) of the
    * split-regex + aggregate fold — parity asserted in the property
    * fuzz. */
  def approxBpeTokenCount(text: Column): Column =
    ShingleExprs.bpeProxyCount(text)

  /** Ratio of punctuation characters to total characters (0 when empty). */
  def punctRatio(text: Column): Column = {
    val punct = length(regexp_replace(text, "[^\\p{Punct}]", ""))
    when(length(text) === 0, 0.0)
      .otherwise(punct.cast("double") / length(text).cast("double"))
  }

  /** Fraction of tokens that are members of `stopwords`. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val ts = tokens(text)
    val hits = size(filter(ts, t => t.isin(stopwords.map(lit): _*)))
    when(size(ts) === 0, 0.0)
      .otherwise(hits.cast("double") / size(ts).cast("double"))
  }

  /** English-ish stopwords used by quality scoring / language id. */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
        "that", "for", "on", "with", "as", "at", "by", "from")

  /** Small per-language marker sets for the n-gram/stopword language-ID
    * heuristic. Deliberately tiny: language ID at pipeline scale is a
    * first-pass filter, not a classifier. */
  val LanguageMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "pour"),
    "es" -> Seq("el", "la", "los", "y", "es", "que", "por"))

  /** Heuristic language ID: argmax over per-language marker-token hit
    * counts; "und" (undetermined) when nothing matches. Runs as a
    * single-pass native Expression (see [[ShingleExprs.LangIdExpr]]) —
    * the Column form re-tokenized the text once per language for the
    * per-marker isin scans; values identical incl. the
    * largest-code-wins tie-break (asserted in the property fuzz). */
  def langId(text: Column): Column =
    ShingleExprs.langId(text)

  /** Composite quality score in [0,1]: mean-word-length sanity, low
    * punctuation noise, presence of stopwords. Mirrors the shape of
    * published pretraining-data quality filters (C4-style heuristics).
    *
    * Runs as a single-pass native Expression (see
    * [[ShingleExprs.QualityScoreExpr]]): the equivalent Column form
    * (array tokens + isin + two regexp_replace passes) re-tokenizes the
    * text for every reference because higher-order functions are
    * excluded from codegen subexpression elimination — measured ~5×
    * slower; values are bit-identical (asserted in TextFunctionsSpec). */
  def qualityScore(text: Column): Column =
    ShingleExprs.qualityScore(text)

  /** The normative dedup whitespace class, spelled OUT rather than as
    * `\s`: Java-regex `\s` is `[ \t\n\x0B\f\r]` but RE2 (DuckDB, Go —
    * the engines that recompute these keys) excludes `\x0B` from `\s`,
    * so a document containing a vertical tab would fingerprint
    * differently across engines. Pinning the explicit class keeps the
    * normalization engine-portable by construction (Spark behavior is
    * unchanged — the class IS Java's `\s`). */
  private val WsClass = "[ \\t\\n\\x0B\\f\\r]+"

  /** 64-bit document fingerprint of the normalized text (case-folded,
    * whitespace-collapsed) — the exact-dedup key. */
  def fingerprint(text: Column): Column =
    xxhash64(trim(regexp_replace(lower(text), WsClass, " ")))

  /** Engine-portable fingerprint: md5 hex of the same normalization.
    * Slower than [[fingerprint]] but reproducible outside Spark (xxhash64's
    * seed/variant is engine-specific) — use when downstream systems must
    * recompute the key. Oracle twin: `md5(trim(regexp_replace(lower(text),
    * '[ \t\n\x0B\f\r]+', ' ', 'g')))`. */
  def fingerprintPortable(text: Column): Column =
    md5(trim(regexp_replace(lower(text), WsClass, " ")).cast("binary"))

  /** Scrub common PII shapes to typed placeholder tokens — emails, IPv4
    * addresses, phone-like digit runs — the redaction pass a pretraining
    * pipeline runs before publication. Order matters: emails first (their
    * local parts contain digits), then IPs (dots protect them from the
    * phone pattern, whose class has none), then phones. Patterns are
    * RE2-compatible (no lookaround/backrefs), so external engines can
    * replicate the transform byte-for-byte. */
  def scrubPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>")
    regexp_replace(ip, "\\+?[0-9][0-9()\\-\\s]{6,}[0-9]", "<PHONE>")
  }

  /** Rolling-hash shingle fingerprints: hash of every k-token window.
    * Array column; input to MinHash. Runs as a single-pass native
    * Expression (see [[ShingleExprs]]) — the equivalent Column-combinator
    * form (sequence → transform → xxhash64(concat_ws(slice))) is
    * interpreted per window and measured ~10× slower; hash values are
    * identical. */
  def shingleHashes(text: Column, k: Int): Column =
    ShingleExprs.shingleHashes(text, k)

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, MOSS): the min
    * shingle hash from every window of `w` consecutive shingles,
    * deduplicated — a compact sketch with the guarantee that any shared
    * run of w+k-1 tokens between two documents yields at least one shared
    * fingerprint. The standard copy-detection sketch: ~|shingles|/w values
    * per doc instead of all of them. */
  def winnowingFingerprints(text: Column, k: Int, w: Int): Column = {
    require(w > 0, "window size must be positive")
    // native one-pass monotonic-deque form; value-identical to the
    // Column reference below (asserted in the property fuzz)
    ShingleExprs.winnowFingerprints(text, k, w)
  }

  /** The Column-combinator reference [[winnowingFingerprints]] replaced
    * (O(n·w) interpreted slices): kept as the fuzz target that pins the
    * native's values. */
  private[graft] def winnowingFingerprintsReference(text: Column, k: Int, w: Int): Column = {
    val sh = shingleHashes(text, k)
    val n = size(sh)
    array_distinct(
      when(n <= w, array(array_min(sh)))
        .otherwise(transform(sequence(lit(1), n - lit(w - 1)),
          i => array_min(slice(sh, i, lit(w))))))
  }
}
