package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftglue.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** String-metric and web-provenance natives: Jaro–Winkler similarity
  * (entity resolution / fuzzy record linkage), URL canonicalization and
  * registrable-domain extraction (the Common Crawl-style web-curation
  * front door: the same page arrives under dozens of byte-different URLs
  * — tracking params, fragments, casing, default ports, www prefixes —
  * and URL-keyed dedup only works after they collapse to one key).
  *
  * All three are single-pass per-row loops over the string — the
  * ShingleExprs custom-operator rationale applies verbatim (SURVEY.md §2
  * preference (b)); CodegenFallback for the same reason documented there.
  *
  * Jaro–Winkler parity: the match-window/transposition/prefix-boost
  * algorithm below was pinned bit-exact against DuckDB's
  * `jaro_winkler_similarity` over 20k random pairs (worst abs diff 0.0),
  * including its conventions: empty-vs-anything (and empty-vs-empty)
  * scores 0.0, transpositions are halved with integer division, the 0.1
  * prefix boost applies only when jaro > 0.7, prefix capped at 4. The
  * comparison unit is the UTF-16 code unit, which equals DuckDB's byte
  * unit on ASCII input — non-ASCII parity is NOT guaranteed (DuckDB
  * compares UTF-8 bytes) and oracle fixtures stay ASCII.
  */
object StringMetricExprs {

  private def requireString(e: Expression): TypeCheckResult =
    if (e.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected string, got ${e.dataType.catalogString}")

  /** Jaro similarity, textbook greedy matching inside the standard
    * window max(|a|,|b|)/2 - 1 (floor, min 0). Shared by [[JaroWinkler]]
    * and the spec's independent reference check. */
  private[functions] def jaroSim(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val mw = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - mw)
      val hi = math.min(l2 - 1, i + mw)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    // exact grouping order matters for bit-parity with the oracle engine
    (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
  }

  private[functions] def jaroWinklerSim(s1: String, s2: String): Double = {
    val j = jaroSim(s1, s2)
    if (j > 0.7) {
      val maxL = math.min(4, math.min(s1.length, s2.length))
      var l = 0
      while (l < maxL && s1.charAt(l) == s2.charAt(l)) l += 1
      j + 0.1 * l * (1.0 - j)
    } else j
  }

  /** jaro_winkler(left, right) → double in [0, 1]. */
  final case class JaroWinkler(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult = {
      val l = requireString(left)
      if (l.isFailure) l else requireString(right)
    }
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      jaroWinklerSim(a.asInstanceOf[UTF8String].toString,
        b.asInstanceOf[UTF8String].toString)
    override def prettyName: String = "jaro_winkler"
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): JaroWinkler =
      copy(left = newLeft, right = newRight)
  }

  /** Tracking params dropped by [[CanonicalizeUrl]]: the industry-common
    * click/campaign identifiers that never change page content. */
  private def isTrackingParam(p: String): Boolean = {
    val eq = p.indexOf('=')
    val key = if (eq >= 0) p.substring(0, eq) else p
    key.startsWith("utm_") || key == "gclid" || key == "fbclid" || key == "ref"
  }

  /** Canonical URL form for dedup keying. Rules (each removes a
    * source of byte-difference that cannot change the fetched content):
    *   1. scheme and host lowercased
    *   2. leading "www." stripped from the host
    *   3. default port stripped (":80" for http, ":443" for https);
    *      non-default ports kept
    *   4. path: runs of '/' collapse to one; a single trailing '/'
    *      stripped (the root path "/" survives)
    *   5. query: tracking params dropped (utm_*, gclid, fbclid, ref),
    *      the rest sorted lexicographically; '?' omitted if none remain
    *   6. fragment dropped
    * Strings without "://" are returned unchanged (not a URL — the
    * caller's filter concern, not a silent null). Scheme/host case is
    * per RFC 3986 §6.2.2.1; trailing-slash and www folding are the
    * crawl-dedup convention rather than RFC equivalence, which is the
    * right trade for dedup keys (false merges are ~impossible for real
    * sites serving both forms identically).
    */
  private[functions] def canonicalize(url: String): String = {
    val schemeEnd = url.indexOf("://")
    if (schemeEnd < 0) return url
    val scheme = url.substring(0, schemeEnd).toLowerCase(java.util.Locale.ROOT)
    val rest = url.substring(schemeEnd + 3)
    var authEnd = rest.length
    var i = 0
    while (i < rest.length && authEnd == rest.length) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?' || c == '#') authEnd = i
      i += 1
    }
    var host = rest.substring(0, authEnd).toLowerCase(java.util.Locale.ROOT)
    if (host.startsWith("www.")) host = host.substring(4)
    if ((scheme == "http" && host.endsWith(":80")) ||
        (scheme == "https" && host.endsWith(":443")))
      host = host.substring(0, host.lastIndexOf(':'))
    val afterAuth = rest.substring(authEnd)
    val fragStart = afterAuth.indexOf('#')
    val noFrag = if (fragStart >= 0) afterAuth.substring(0, fragStart) else afterAuth
    val qStart = noFrag.indexOf('?')
    val rawPath = if (qStart >= 0) noFrag.substring(0, qStart) else noFrag
    val rawQuery = if (qStart >= 0) noFrag.substring(qStart + 1) else ""
    // collapse '/' runs, strip one trailing slash (keep a lone "/")
    val sb = new java.lang.StringBuilder(rawPath.length)
    i = 0
    while (i < rawPath.length) {
      val c = rawPath.charAt(i)
      if (c != '/' || sb.length == 0 || sb.charAt(sb.length - 1) != '/')
        sb.append(c)
      i += 1
    }
    if (sb.length > 1 && sb.charAt(sb.length - 1) == '/')
      sb.setLength(sb.length - 1)
    val path = sb.toString
    val params =
      rawQuery.split("&", -1).filter(p => p.nonEmpty && !isTrackingParam(p)).sorted
    val query = if (params.isEmpty) "" else "?" + params.mkString("&")
    scheme + "://" + host + path + query
  }

  /** canonicalize_url(url) → string. */
  final case class CanonicalizeUrl(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult = requireString(child)
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any =
      UTF8String.fromString(canonicalize(input.asInstanceOf[UTF8String].toString))
    override def prettyName: String = "canonicalize_url"
    override protected def withNewChildInternal(newChild: Expression): CanonicalizeUrl =
      copy(child = newChild)
  }

  /** Two-level public suffixes recognized by [[RegistrableDomain]] — a
    * deliberate HEURISTIC subset of the Mozilla Public Suffix List
    * covering the common ccTLD second-level registries. The real PSL is
    * a ~10k-row data file that changes monthly; at production scale the
    * right design is a broadcast join against a PSL snapshot table, not
    * a bigger hardcoded set — this expression is the zero-dependency
    * fast path for the dominant gTLD/ccTLD cases. */
  private val TwoLevelSuffixes = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "com.au",
    "net.au", "com.br", "co.in", "co.nz", "com.mx", "co.za", "com.cn",
    "com.tw", "co.kr", "com.sg", "com.ar")

  private[functions] def registrableDomain(hostRaw: String): String = {
    var host = hostRaw.toLowerCase(java.util.Locale.ROOT)
    val colon = host.indexOf(':')
    if (colon >= 0) host = host.substring(0, colon)
    val labels = host.split('.')
    if (labels.length <= 2) return host
    val lastTwo = labels(labels.length - 2) + "." + labels(labels.length - 1)
    val n = if (TwoLevelSuffixes.contains(lastTwo)) 3 else 2
    if (labels.length <= n) host
    else labels.takeRight(n).mkString(".")
  }

  /** registrable_domain(host) → string: the eTLD+1 a crawl-policy or
    * blocklist decision applies to ("img.cdn.example.co.uk" →
    * "example.co.uk"). Accepts a bare host or host:port. */
  final case class RegistrableDomain(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult = requireString(child)
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any =
      UTF8String.fromString(registrableDomain(input.asInstanceOf[UTF8String].toString))
    override def prettyName: String = "registrable_domain"
    override protected def withNewChildInternal(newChild: Expression): RegistrableDomain =
      copy(child = newChild)
  }

  // ---- Column API ----

  def jaroWinkler(a: Column, b: Column): Column =
    GraftSqlBridge.column(JaroWinkler(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def canonicalizeUrl(url: Column): Column =
    GraftSqlBridge.column(CanonicalizeUrl(GraftSqlBridge.expression(url)))

  def registrableDomainOf(host: Column): Column =
    GraftSqlBridge.column(RegistrableDomain(GraftSqlBridge.expression(host)))
}
