package graft.functions

import java.text.Normalizer
import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftglue.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-CURATION front of a training
  * pipeline: the normalize → clean → extract stages that run BEFORE any
  * dedup/quality operator, over every byte of a 100 TB crawl. Like
  * [[ShingleExprs]] these are single-pass per-row loops (SURVEY.md §2
  * custom-operator tier (b)); CodegenFallback for the same reason argued
  * there (the work is one opaque loop; codegen could only inline the
  * call).
  *
  * Upstream framing: the reference's model runs these as user DoFns over
  * strings ([U] sdk/.../transforms/ParDo.java); here each stage is an
  * expression so it fuses into whole-stage scans around it, never
  * materializing intermediate corpora.
  *
  * Oracle strategy (BASELINE.md hash-parity rules): NFC and the cleanup
  * chain are replayable in DuckDB (`nfc_normalize`, regexp chains), so
  * their queries get full oracles; NFKC has no DuckDB twin, so its gate
  * entries use the self-asserting boolean form. Every expression is ALSO
  * fuzz-pinned to an independent JVM reference in CurationExprsSpec.
  */
object CurationExprs {

  private def requireString(e: Expression): TypeCheckResult =
    if (e.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected string, got ${e.dataType.catalogString}")

  // ---------------------------------------------------------------------
  // Unicode normalization
  // ---------------------------------------------------------------------

  /** Unicode-normalize text to the given form (NFC/NFD/NFKC/NFKD) via
    * `java.text.Normalizer`. Crawled text arrives with mixed composed/
    * decomposed accents and compatibility glyphs (ligatures, fullwidth
    * forms); hashing-based dedup is wrong unless every document is
    * normalized to ONE form first — byte-different, render-identical
    * strings must collide.
    */
  final case class NormalizeText(child: Expression, form: Normalizer.Form)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult = requireString(child)
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      // Fast path: Normalizer.isNormalized is a scan without allocation —
      // on the (typical) mostly-ASCII corpus the copy is skipped entirely.
      if (Normalizer.isNormalized(s, form)) input
      else UTF8String.fromString(Normalizer.normalize(s, form))
    }
    override def prettyName: String = s"normalize_${form.name.toLowerCase}"
    override protected def withNewChildInternal(newChild: Expression): NormalizeText =
      copy(child = newChild)
  }

  // ---------------------------------------------------------------------
  // Whitespace / control-character cleanup
  // ---------------------------------------------------------------------

  /** Canonical whitespace cleanup, exactly this chain (each step is
    * replayable in DuckDB, so the query gets a full oracle):
    *
    *   1. CRLF → LF
    *   2. drop control chars [\x00-\x08\x0B-\x1F\x7F] (keeps \t, \n;
    *      lone \r dies here)
    *   3. collapse runs of [ \t] to one space
    *   4. drop spaces immediately before a newline
    *   5. trim leading/trailing spaces and newlines
    *
    * Implemented as ONE forward pass (the chain semantics, not the chain
    * cost); CurationExprsSpec fuzz-pins the pass against the literal
    * 5-step regex reference.
    */
  final case class CleanTextExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult = requireString(child)
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val out = cleanText(s)
      if (out == s) input else UTF8String.fromString(out)
    }
    override def prettyName: String = "clean_text"
    override protected def withNewChildInternal(newChild: Expression): CleanTextExpr =
      copy(child = newChild)
  }

  private[functions] def cleanText(s: String): String = {
    val n = s.length
    val b = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false // an open [ \t]+ run, not yet emitted
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\r') {
        // CRLF collapses to LF (handled when the LF arrives); lone CR is
        // a control char and dies.
        ()
      } else if (c == ' ' || c == '\t') {
        pendingSpace = true
      } else if (c == '\n') {
        // step 4: spaces before a newline never materialize
        pendingSpace = false
        b.append('\n')
      } else if (c < 0x20 || c == 0x7f) {
        // step 2: other controls vanish; they do NOT break a space run
        // (matching the regex chain, which deletes them before collapsing)
        ()
      } else {
        if (pendingSpace) {
          // step 5 (leading): a space run at the very start, or right
          // after a newline, was "before" visible text — the regex chain
          // keeps interior single spaces only. Leading-of-line spaces DO
          // survive the chain (only trailing-before-\n are dropped), so
          // emit unless at buffer start (global leading trim).
          if (b.length > 0) b.append(' ')
          pendingSpace = false
        }
        b.append(c)
      }
      i += 1
    }
    // step 5: trailing spaces are pending (unemitted) but trailing
    // newlines were emitted; leading newlines (and a space emitted right
    // after them) survive the emit loop — strip both chars from both ends.
    var end = b.length
    while (end > 0 && { val c = b.charAt(end - 1); c == '\n' || c == ' ' }) end -= 1
    var start = 0
    while (start < end && { val c = b.charAt(start); c == '\n' || c == ' ' }) start += 1
    b.substring(start, end)
  }

  /** The literal 5-step reference chain (spec + oracle parity target). */
  private[functions] def cleanTextReference(s: String): String = {
    val step1 = s.replace("\r\n", "\n")
    val step2 = step1.replaceAll("[\\x00-\\x08\\x0B-\\x1F\\x7F]", "")
    val step3 = step2.replaceAll("[ \\t]+", " ")
    val step4 = step3.replaceAll(" +\\n", "\n")
    // trim ' ' and '\n' from both ends (DuckDB: trim(x, ' ' || chr(10)))
    var start = 0
    var end = step4.length
    while (start < end && (step4.charAt(start) == ' ' || step4.charAt(start) == '\n')) start += 1
    while (end > start && (step4.charAt(end - 1) == ' ' || step4.charAt(end - 1) == '\n')) end -= 1
    step4.substring(start, end)
  }

  // ---------------------------------------------------------------------
  // HTML → text extraction
  // ---------------------------------------------------------------------

  /** Strip markup and decode entities — the crawl-to-text step that
    * precedes every other curation stage. One forward pass:
    *
    *   - `<...>` spans (tag contents up to the next `>`) are replaced by
    *     one space (tags are word boundaries: `a<br>b` must not fuse);
    *     an unterminated `<` swallows the rest of the input.
    *   - entities decode: the XML five (&amp; &lt; &gt; &quot; &apos;)
    *     + &nbsp; (→ space) + numeric &#NNN; / &#xHH;. Unknown or
    *     malformed entities pass through verbatim. Double-escaped text
    *     (&amp;lt;) decodes ONE level, as a browser renders it.
    *
    * No whitespace collapsing here — compose with [[CleanTextExpr]];
    * stages stay orthogonal and each keeps an exact oracle.
    */
  final case class StripHtmlExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult = requireString(child)
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val out = stripHtml(s)
      if (out == s) input else UTF8String.fromString(out)
    }
    override def prettyName: String = "strip_html"
    override protected def withNewChildInternal(newChild: Expression): StripHtmlExpr =
      copy(child = newChild)
  }

  private[functions] def stripHtml(s: String): String = {
    val n = s.length
    val b = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        val close = s.indexOf('>', i + 1)
        if (close < 0) { i = n } // unterminated tag swallows the tail
        else { b.append(' '); i = close + 1 }
      } else if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        // entity names are short; a ';' further than 10 chars away means
        // this '&' is plain text
        if (semi < 0 || semi - i > 10) { b.append('&'); i += 1 }
        else {
          val name = s.substring(i + 1, semi)
          val decoded: Int = name match {
            case "amp"  => '&'
            case "lt"   => '<'
            case "gt"   => '>'
            case "quot" => '"'
            case "apos" => '\''
            case "nbsp" => ' '
            case _ =>
              if (name.length > 1 && name.charAt(0) == '#') {
                val num = name.substring(1)
                try {
                  val cp =
                    if (num.length > 1 && (num.charAt(0) == 'x' || num.charAt(0) == 'X'))
                      Integer.parseInt(num.substring(1), 16)
                    else Integer.parseInt(num)
                  // surrogate code points are not scalar values — a lone
                  // surrogate can't round-trip UTF-8, so treat as malformed
                  if (Character.isValidCodePoint(cp) && cp > 0 &&
                      !(cp >= 0xD800 && cp <= 0xDFFF)) cp
                  else -1
                } catch { case _: NumberFormatException => -1 }
              } else -1
          }
          if (decoded >= 0) { b.appendCodePoint(decoded); i = semi + 1 }
          else { b.append('&'); i += 1 } // malformed: '&' is literal
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  // ---------------------------------------------------------------------
  // Compression-ratio quality signal
  // ---------------------------------------------------------------------

  /** DEFLATE-compressed size of the UTF-8 bytes (level 6, raw/nowrap —
    * no zlib header so tiny inputs aren't dominated by framing). The
    * compressed/raw ratio is a standard one-number quality signal for
    * crawled text (near-0 = degenerate repetition, near-1 = high-entropy
    * noise; prose sits in between) — cheap enough to run on every
    * document because the deflater never leaves the row's partition.
    *
    * Engine-specific by construction (DuckDB has no deflate), so gate
    * entries use the self-asserting form; the spec pins an
    * Inflater round-trip (decompress(compress(x)) == x) and the
    * repetition-monotonicity property.
    */
  final case class DeflateSizeExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult = requireString(child)
    override def dataType: DataType = IntegerType
    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[UTF8String].getBytes
      CurationExprs.deflateSize(bytes)
    }
    override def prettyName: String = "deflate_size"
    override protected def withNewChildInternal(newChild: Expression): DeflateSizeExpr =
      copy(child = newChild)
  }

  /** Per-thread deflater, reset per call — Deflater allocates native
    * zlib state; one per row would thrash JNI. */
  private val localDeflater = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater(6, true)
  }

  private[functions] def deflateSize(bytes: Array[Byte]): Int = {
    val d = localDeflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  // ---------------------------------------------------------------------
  // Column API
  // ---------------------------------------------------------------------

  def nfc(text: Column): Column =
    GraftSqlBridge.column(NormalizeText(GraftSqlBridge.expression(text), Normalizer.Form.NFC))

  def nfkc(text: Column): Column =
    GraftSqlBridge.column(NormalizeText(GraftSqlBridge.expression(text), Normalizer.Form.NFKC))

  def cleanText(text: Column): Column =
    GraftSqlBridge.column(CleanTextExpr(GraftSqlBridge.expression(text)))

  def stripHtml(text: Column): Column =
    GraftSqlBridge.column(StripHtmlExpr(GraftSqlBridge.expression(text)))

  def deflateSize(text: Column): Column =
    GraftSqlBridge.column(DeflateSizeExpr(GraftSqlBridge.expression(text)))

  /** compressed-bytes / raw-utf8-bytes as double (raw length from
    * octet_length, codegen'd); degenerate empty input → ratio 0. */
  def compressionRatio(text: Column): Column = {
    import org.apache.spark.sql.functions._
    when(octet_length(text) === 0, lit(0.0))
      .otherwise(deflateSize(text).cast("double") / octet_length(text).cast("double"))
  }
}
