package graft.functions

import java.text.Normalizer
import java.util.zip.Inflater

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Curation-front expressions: each native single-pass loop is pinned to
  * an independent JVM reference (java.text.Normalizer; the literal
  * 5-step regex chain; a regex+map entity decoder; Inflater round-trip),
  * on directed cases AND seeded random text. Non-ASCII is spelled in
  * \u escapes so source encoding can never silently change the cases.
  */
class CurationExprsSpec extends SparkSpec {
  import spark.implicits._

  // generator rich in the characters the expressions treat specially
  private val curationChar = Gen.frequency(
    (8, Gen.alphaLowerChar), (2, Gen.alphaUpperChar), (1, Gen.numChar),
    (2, Gen.oneOf(' ', '\t', '\n', '\r')),
    (1, Gen.oneOf('\u0000', '\u0001', '\u0007', '\u000B', '\u007F')),
    (1, Gen.oneOf('<', '>', '&', ';', '#', '"', '\'')),
    (1, Gen.oneOf('é' /* e-acute */ , 'e', '́' /* combining acute */ ,
      'ﬁ' /* fi ligature */ , 'Ａ' /* fullwidth A */ ,
      '\u00A0' /* NBSP */ , '漢' /* CJK */ )))
  private val textGen: Gen[String] =
    Gen.chooseNum(0, 150).flatMap(n => Gen.stringOfN(n, curationChar))

  private def randomTexts(n: Int): Seq[String] =
    (0 until n).flatMap(i => textGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("normalize_text equals java.text.Normalizer on NFC/NFKC (directed + random)") {
    val directed = Seq(
      "", "plain ascii",
      "éclair",          // decomposed e-acute
      "éclair",           // composed e-acute
      "ﬁle",              // fi ligature (NFKC folds to "fi")
      "ＡＢＣ",    // fullwidth ABC (NFKC folds to ASCII)
      "a\u00A0b",          // NBSP (NFKC folds to space)
      "ę́")         // stacked combining marks (ogonek + acute)
    val texts = directed ++ randomTexts(150)
    val rows = texts.toDF("t").select(
      col("t"),
      CurationExprs.nfc(col("t")).as("nfc"),
      CurationExprs.nfkc(col("t")).as("nfkc")).collect()
    rows.foreach { r =>
      val t = r.getString(0)
      if (r.getString(1) != Normalizer.normalize(t, Normalizer.Form.NFC))
        fail(s"NFC diverged on codes ${t.take(40).map(_.toInt).mkString(",")}")
      if (r.getString(2) != Normalizer.normalize(t, Normalizer.Form.NFKC))
        fail(s"NFKC diverged on codes ${t.take(40).map(_.toInt).mkString(",")}")
    }
  }

  test("clean_text single pass equals the literal 5-step regex chain") {
    val directed = Seq(
      "", "a b", "a  b", "a\t\tb", "a \t b",
      "a\r\nb", "a\rb", "\r\n", "a \r\nb",
      "a\u0001b", "a\t\u0007 b",
      " a", "a ", "\n a", "a \n", "\na\n", "\n\n a \n\n",
      "line one   \nline two", "  \t ", "\n\n\n",
      "a\n b", "a\n\nb", "tab\tend\t", "\u007F", "x\u0000y")
    val texts = directed ++ randomTexts(200)
    texts.foreach { t =>
      if (CurationExprs.cleanText(t) != CurationExprs.cleanTextReference(t))
        fail(s"clean_text diverged on codes ${t.map(_.toInt).mkString(",")}")
    }
    // and through the expression path
    val rows = texts.toDF("t")
      .select(col("t"), CurationExprs.cleanText(col("t")).as("c")).collect()
    rows.foreach { r =>
      if (r.getString(1) != CurationExprs.cleanTextReference(r.getString(0)))
        fail(s"expression path diverged on codes ${r.getString(0).map(_.toInt).mkString(",")}")
    }
  }

  /** Independent reference for strip_html: same tag walk, but a
    * DIFFERENT (regex-located, map-driven) entity decoder. */
  private def stripHtmlReference(s: String): String = {
    val noTags = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
        val close = s.indexOf('>', i + 1)
        if (close < 0) i = s.length else { noTags.append(' '); i = close + 1 }
      } else { noTags.append(c); i += 1 }
    }
    val entity = java.util.regex.Pattern.compile("&(#[xX]?[0-9a-fA-F]+|[a-zA-Z]+);")
    val named = Map("amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
      "apos" -> "'", "nbsp" -> " ")
    val m = entity.matcher(noTags.toString)
    val out = new StringBuffer
    while (m.find()) {
      val name = m.group(1)
      val repl: Option[String] =
        if (name.startsWith("#")) {
          val num = name.substring(1)
          try {
            val cp = if (num.toLowerCase.startsWith("x")) Integer.parseInt(num.substring(1), 16)
                     else Integer.parseInt(num)
            if (Character.isValidCodePoint(cp) && cp > 0 && !(cp >= 0xD800 && cp <= 0xDFFF))
              Some(new String(Character.toChars(cp)))
            else None
          } catch { case _: NumberFormatException => None }
        } else named.get(name)
      // names longer than 9 chars, unknown names, bad numerics: verbatim
      val valid = repl.isDefined && name.length <= 9
      m.appendReplacement(out,
        java.util.regex.Matcher.quoteReplacement(if (valid) repl.get else m.group(0)))
    }
    m.appendTail(out)
    out.toString
  }

  test("strip_html equals independent tag/entity reference (directed + random)") {
    val directed = Seq(
      "", "no markup here",
      "<p>hello</p>", "a<br>b", "a<br/>b",
      "<a href=\"x\">link</a>",
      "unterminated <tag swallows tail",
      "&amp; &lt; &gt; &quot; &apos; &nbsp;",
      "&amp;lt; stays one level",             // double-escape: one decode
      "&#233;tude &#x41; &#xe9;",             // numeric decimal + hex
      "&bogus; &toolongentityname; &#; &#x; &#zz; & alone; x&y",
      "&#55296; &#0; &#1114112;",             // surrogate, zero, out of range
      "<<>> <> <a<b>c>",
      "tag <b>bold</b> and &amp; entity")
    val texts = directed ++ randomTexts(200)
    texts.foreach { t =>
      if (CurationExprs.stripHtml(t) != stripHtmlReference(t))
        fail(s"strip_html diverged on codes ${t.take(60).map(_.toInt).mkString(",")}")
    }
    val rows = texts.toDF("t")
      .select(col("t"), CurationExprs.stripHtml(col("t")).as("c")).collect()
    rows.foreach { r =>
      if (r.getString(1) != stripHtmlReference(r.getString(0)))
        fail(s"expression path diverged on codes ${r.getString(0).take(60).map(_.toInt).mkString(",")}")
    }
  }

  test("deflate_size: inflates back to the input; doubling back-references") {
    val texts = Seq("", "a", "abab" * 200, "the quick brown fox") ++ randomTexts(80)
    texts.foreach { t =>
      val bytes = t.getBytes("UTF-8")
      val n = CurationExprs.deflateSize(bytes)
      if (bytes.isEmpty) assert(n >= 0)
      else {
        // re-deflate with identical settings, then inflate: lossless
        val d = new java.util.zip.Deflater(6, true)
        d.setInput(bytes); d.finish()
        val comp = new Array[Byte](bytes.length * 2 + 64)
        val m = d.deflate(comp)
        d.end()
        assert(m == n, s"deflate size unstable on ${t.take(40)}")
        val inf = new Inflater(true)
        inf.setInput(comp, 0, m)
        val back = new Array[Byte](bytes.length + 16)
        val k = inf.inflate(back)
        inf.end()
        assert(k == bytes.length && back.take(k).sameElements(bytes),
          s"round-trip failed on ${t.take(40)}")
      }
    }
    // monotonicity: text||text must compress to < 2x text + slack (the
    // second copy is one back-reference; inputs sit inside the 32 KB
    // deflate window)
    texts.filter(_.length > 20).foreach { t =>
      val one = CurationExprs.deflateSize(t.getBytes("UTF-8"))
      val two = CurationExprs.deflateSize((t + t).getBytes("UTF-8"))
      assert(two < 2 * one + 64, s"doubling did not back-reference: $one -> $two")
    }
  }

  test("SQL registry exposes the curation functions") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT normalize_text('é', 'NFC') AS n, " +
        "clean_text('  a\tb  ') AS c, " +
        "strip_html('<p>x &amp; y</p>') AS h, " +
        "deflate_size('aaaaaaaaaa') AS d").head()
    assert(r.getString(0) == "é")
    assert(r.getString(1) == "a b")
    assert(r.getString(2) == " x & y ")
    assert(r.getInt(3) > 0)
  }

  test("null propagates; non-string input is rejected") {
    val rows = Seq(Some("x"), None).toDF("t")
      .select(CurationExprs.nfc(col("t")), CurationExprs.cleanText(col("t")),
        CurationExprs.stripHtml(col("t")), CurationExprs.deflateSize(col("t")))
      .collect()
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1) && rows(1).isNullAt(2) && rows(1).isNullAt(3))
    intercept[Exception] {
      Seq(1).toDF("n").select(CurationExprs.nfc(col("n"))).collect()
    }
  }
}
