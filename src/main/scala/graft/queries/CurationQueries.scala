package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.CurationExprs

/** Text-curation FRONT of the pipeline (normalize → clean → extract →
  * quality-signal) — the stages that run before any dedup/quality
  * operator at 100 TB, each as a native single-pass expression
  * ([[CurationExprs]]) fused into the document scan.
  *
  * Oracle strategy: the synthetic corpus is pure ASCII, so each query
  * first MANGLES the text deterministically (doc_id-keyed unicode/
  * control/markup injections, the same construction spelled in both
  * engines) and then un-does it with the operator under test — DuckDB
  * replays NFC via `nfc_normalize`, the cleanup chain via regexp, and
  * entity/tag extraction via replace chains, giving full value oracles.
  * NFKC and DEFLATE have no DuckDB twin: NFKC's expected output is
  * constructible exactly for the injected compatibility chars, and the
  * deflate query pins engine-computed invariant booleans TRUE
  * (the q_approx_sketches self-asserting form).
  */
object CurationQueries {

  type Q = (SparkSession, String) => DataFrame

  /** doc_id-keyed unicode mangle shared by the two normalize queries:
    * decomposed e+acute (%3), fi-ligature (%4), NBSP pair (%5). */
  private def unicodeMangle(withNbsp: Boolean): org.apache.spark.sql.Column = {
    val nbsp = if (withNbsp)
      when(pmod(col("doc_id"), lit(5)) === 0, lit("a\u00A0b ")).otherwise(lit(""))
    else lit("")
    concat(
      when(pmod(col("doc_id"), lit(3)) === 0, lit("éclair ")).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(4)) === 0, lit("\uFB01le ")).otherwise(lit("")),
      nbsp,
      col("text"))
  }

  val defs: Map[String, Q] = Map(

    // Canonical composition: byte-different, render-identical strings
    // must collide before any hash-keyed dedup. Full DuckDB oracle
    // (nfc_normalize).
    "q_normalize_nfc" -> { (s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"), unicodeMangle(withNbsp = false).as("raw"))
        .select(col("doc_id"), CurationExprs.nfc(col("raw")).as("nfc_text"), col("raw"))
        .select(col("doc_id"), col("nfc_text"),
          (col("nfc_text") =!= col("raw")).as("changed"))
        .orderBy(col("doc_id"))
    },

    // Compatibility folding: ligatures/fullwidth/NBSP fold to ASCII so
    // tokenizers see one surface form. DuckDB has no NFKC — the oracle
    // CONSTRUCTS the expected folded text exactly (the injected chars
    // have known folds; the ASCII body is NFKC-invariant) and pins the
    // idempotence/NFC-stability booleans TRUE.
    "q_normalize_nfkc" -> { (s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"), unicodeMangle(withNbsp = true).as("raw"))
        .select(col("doc_id"), CurationExprs.nfkc(col("raw")).as("nfkc_text"))
        .select(col("doc_id"), col("nfkc_text"),
          (CurationExprs.nfkc(col("nfkc_text")) === col("nfkc_text")).as("idempotent_ok"),
          (CurationExprs.nfc(col("nfkc_text")) === col("nfkc_text")).as("nfc_stable_ok"))
        .orderBy(col("doc_id"))
    },

    // Whitespace/control cleanup ahead of tokenization — CRLF, doubled
    // spaces, stray controls, trailing runs. Full DuckDB oracle (the
    // literal 5-step regexp chain the native pass is fuzz-pinned to).
    "q_clean_text" -> { (s, dir) =>
      val crlf = regexp_replace(col("text"), lit(" the "), lit(" the\r\n"))
      val raw = concat(
        when(pmod(col("doc_id"), lit(5)) === 0, lit("\u000B\r\n")).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(2)) === 0, regexp_replace(crlf, lit(" "), lit("  ")))
          .otherwise(crlf),
        when(pmod(col("doc_id"), lit(3)) === 0, lit(" \t\n")).otherwise(lit("")))
      Tables(s, dir).documents
        .select(col("doc_id"), raw.as("raw"))
        .select(col("doc_id"), CurationExprs.cleanText(col("raw")).as("cleaned"))
        .orderBy(col("doc_id"))
    },

    // Crawl-to-text: markup wraps every word, attributes carry ids,
    // entities (named + numeric, one per-row computed) pepper the
    // footer. Full DuckDB oracle (tag regexp + entity replace chain,
    // &amp; decoded last so double-escapes decode one level).
    "q_html_extract" -> { (s, dir) =>
      val entNum = (lit(65) + pmod(col("doc_id"), lit(26))).cast("int")
      val html = concat(
        lit("<!doctype html><html><body data-id=\""), col("doc_id"),
        lit("\"><h1>Doc &#"), entNum, lit(";</h1><p>"),
        regexp_replace(col("text"), lit(" "), lit("</p> <p>")),
        lit("</p><footer>&amp; &nbsp;fin&#233;</footer></body></html>"))
      Tables(s, dir).documents
        .select(col("doc_id"), html.as("html"))
        .select(col("doc_id"), CurationExprs.stripHtml(col("html")).as("body"))
        .orderBy(col("doc_id"))
    },

    // The curation FRONT composed end-to-end: crawl-shaped HTML →
    // strip_html → clean_text → NFKC fold → tokenize → prefix-keyed
    // exact dedup → per-source report. Every stage is one of the native
    // single-pass expressions above, fused into ONE scan projection
    // before the dedup shuffle; the oracle replays the whole chain
    // (tag/entity regexps, the cleanup chain, the ligature's known NFKC
    // fold, md5-prefix keepers) in DuckDB. The numeric-entity ligature
    // (&#64257; = ﬁ) exercises the fold for real: strip decodes it,
    // NFKC folds it to "fi".
    "q_curation_front" -> { (s, dir) =>
      val html = concat(
        lit("<!doctype html><html><body data-id=\""), col("doc_id"),
        lit("\"><h1>&#64257;le sample</h1><p>"),
        regexp_replace(col("text"), lit(" "), lit("</p> <p>")),
        lit("</p><footer>&amp; fin&#233;</footer></body></html>"))
      val folded = CurationExprs.nfkc(
        CurationExprs.cleanText(CurationExprs.stripHtml(html)))
      // keeper via a k-partitioned window, NOT a groupBy+self-join: the
      // join shape would execute the fold chain twice (docs appears on
      // both sides); this is ONE scan projection + ONE shuffle on k
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("k"))
      Tables(s, dir).documents
        .select(col("doc_id"), col("source"), folded.as("folded"))
        .withColumn("k", md5(substring(col("folded"), 1, 64).cast("binary")))
        .withColumn("keeper", min(col("doc_id")).over(w))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("doc_id") === col("keeper"), 1).otherwise(0)).as("n_keepers"),
          sum(size(graft.functions.TextFunctions.tokens(col("folded"))).cast("long"))
            .as("total_tokens"))
        .orderBy(col("source"))
    },

    // DSIR data selection (Xie et al. 2023): raw docs scored by hashed
    // unigram+bigram log importance weight toward a target domain
    // (here: the doc_id%5==0 slice as the "target", everything else as
    // the raw pool), top-50 selected. Full DuckDB oracle — the md5
    // bucket, the Laplace-smoothed bucket frequencies, and the exact
    // DECIMAL weight sum all replay in SQL.
    "q_dsir_select" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val target = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      val raw = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      graft.llm.Curation.dsirLogWeights(raw, target, "doc_id", "text", buckets = 1024)
        .orderBy(desc("logw"), col("doc_id"))
        .limit(50)
        .select(col("doc_id"), col("n_feats"), round(col("logw"), 4).as("logw"))
        .orderBy(col("doc_id"))
    },

    // The frozen-table DSIR scorer under its own gate: the ratio table
    // collects driver-side (bounded by buckets) and every raw doc is
    // scored by the ZERO-SHUFFLE per-row path — a different execution
    // route than q_dsir_select's aggregate, which the oracle replays via
    // the aggregate SQL, so the two paths' documented bit-equality is
    // DuckDB-checked, not just spec-checked. Docs whose text yields no
    // features score 0 (no evidence), mirrored by the oracle's coalesce.
    "q_dsir_score" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val target = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      val raw = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      val table = graft.llm.Curation.dsirRatioTable(raw, target, "text", buckets = 1024)
      raw.filter(col("text").isNotNull)
        .select(col("doc_id"),
          round(graft.llm.Curation.dsirScore(col("text"), table, 1024), 4).as("logw"))
        .orderBy(col("doc_id"))
    },

    // DSIR composed with the token-budget selector — the production
    // "take the most target-like documents until the budget is spent"
    // shape: DSIR log-weights order the raw pool, prefixSum's
    // range-partitioned cumulative sum (never a single-partition window)
    // cuts it at the budget. n_feats (unigrams+bigrams) is the budget
    // unit, so the whole composition stays inside the one oracle.
    "q_dsir_budget" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val target = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      val raw = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      val weighted = graft.llm.Curation.dsirLogWeights(
        raw, target, "doc_id", "text", buckets = 1024)
      graft.llm.Curation.selectByTokenBudget(weighted, "doc_id",
          col("logw"), col("n_feats"), budget = 20000L)
        .select(col("doc_id"), round(col("score"), 4).as("logw"),
          col("tokens").as("n_feats"), col("cum_tokens").as("cum_feats"))
        .orderBy(col("doc_id"))
    },

    // Compression-ratio quality signal (deflate level 6, raw stream):
    // degenerate repetition compresses far below prose; high-entropy
    // noise doesn't compress. No DuckDB deflate — self-asserting form:
    //   pos_ok      compressed size is positive
    //   bounded_ok  deflate never expands past raw + 64 (stored-block cap)
    //   backref_ok  text||text < 2×text + slack (the second copy is one
    //               back-reference; docs sit inside the 32 KB window)
    //   entropy_ok  single-char run of the same length compresses harder
    //               than the document's prose
    "q_compress_ratio" -> { (s, dir) =>
      val sz = CurationExprs.deflateSize(col("text"))
      val szDouble = CurationExprs.deflateSize(concat(col("text"), col("text")))
      val szDegenerate =
        CurationExprs.deflateSize(expr("repeat('a', CAST(n_chars AS INT))"))
      Tables(s, dir).documents
        .select(col("doc_id"), col("n_chars"),
          (sz > 0).as("pos_ok"),
          (sz <= octet_length(col("text")) + 64).as("bounded_ok"),
          (szDouble < sz * 2 + 64).as("backref_ok"),
          (szDegenerate < sz).as("entropy_ok"))
        .orderBy(col("doc_id"))
    },
  )

  /** Shared DSIR weighting CTE chain (through `w`: doc_id, logw,
    * n_feats) — ONE definition for both DSIR oracles so the SQL cannot
    * drift from itself; it must mirror `Curation.dsirLogWeights`
    * clause-for-clause (tokenizer regex, md5 bucket, Laplace smoothing,
    * 9-dp quantized DECIMAL sum). Parity note: round(·, 9) of an
    * ln-based double sits in the same accepted quantization-parity
    * class as the perplexity oracles (a value within 1 ulp of a 0.5e-9
    * boundary could round differently across engines — never observed
    * on the fixtures, including the 10× stress corpus). */
  private val dsirWeightsCte: String =
    """tgt AS (SELECT text FROM documents
             WHERE doc_id % 5 = 0 AND text IS NOT NULL),
         raw AS (SELECT doc_id, text FROM documents
             WHERE doc_id % 5 <> 0 AND text IS NOT NULL),
         rt AS (SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '') AS ts
           FROM raw),
         rf AS (SELECT doc_id, f FROM (
             SELECT doc_id, unnest(ts) AS f FROM rt
             UNION ALL
             SELECT doc_id, ts[i] || ' ' || ts[i+1] AS f
             FROM rt, unnest(range(1, len(ts))) AS u(i) WHERE len(ts) >= 2)),
         rb AS (SELECT doc_id,
             CAST(('0x' || substr(md5(f), 1, 8)) AS UBIGINT) % 1024 AS b,
             count(*) AS c
           FROM rf GROUP BY 1, 2),
         rtot AS (SELECT b, CAST(sum(c) AS BIGINT) AS cr FROM rb GROUP BY b),
         rn AS (SELECT CAST(coalesce(sum(cr), 0) AS BIGINT) AS tr FROM rtot),
         tt AS (SELECT
             list_filter(string_split_regex(lower(text), '[^a-z'']+'), x -> x <> '') AS ts
           FROM tgt),
         tf AS (SELECT f FROM (
             SELECT unnest(ts) AS f FROM tt
             UNION ALL
             SELECT ts[i] || ' ' || ts[i+1] AS f
             FROM tt, unnest(range(1, len(ts))) AS u(i) WHERE len(ts) >= 2)),
         tb AS (SELECT
             CAST(('0x' || substr(md5(f), 1, 8)) AS UBIGINT) % 1024 AS b,
             count(*) AS ct
           FROM tf GROUP BY 1),
         tn AS (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) AS ttot FROM tb),
         lr AS (SELECT rtot.b,
             CAST(round(
               ln((coalesce(tb.ct, 0) + 1.0) / (tn.ttot + 1024.0)) -
               ln((rtot.cr + 1.0) / (rn.tr + 1024.0)), 9) AS DECIMAL(19,12)) AS lr
           FROM rtot LEFT JOIN tb USING (b), rn, tn),
         w AS (SELECT doc_id,
             CAST(sum(CAST(c AS DECIMAL(18,0)) * lr) AS DOUBLE) AS logw,
             CAST(sum(c) AS BIGINT) AS n_feats
           FROM rb JOIN lr USING (b) GROUP BY doc_id)"""

  val oracles: Map[String, String] = Map(

    "q_normalize_nfc" ->
      """WITH raw AS (
           SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'e' || chr(769) || 'clair ' ELSE '' END ||
             CASE WHEN doc_id % 4 = 0 THEN chr(64257) || 'le ' ELSE '' END || text AS raw
           FROM documents)
         SELECT doc_id, nfc_normalize(raw) AS nfc_text,
                nfc_normalize(raw) <> raw AS changed
         FROM raw ORDER BY doc_id""",

    "q_normalize_nfkc" ->
      """SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN chr(233) || 'clair ' ELSE '' END ||
           CASE WHEN doc_id % 4 = 0 THEN 'file ' ELSE '' END ||
           CASE WHEN doc_id % 5 = 0 THEN 'a b ' ELSE '' END || text AS nfkc_text,
           TRUE AS idempotent_ok, TRUE AS nfc_stable_ok
         FROM documents ORDER BY doc_id""",

    "q_clean_text" ->
      """WITH raw AS (
           SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN chr(11) || chr(13) || chr(10) ELSE '' END ||
             CASE WHEN doc_id % 2 = 0
                  THEN replace(replace(text, ' the ', ' the' || chr(13) || chr(10)), ' ', '  ')
                  ELSE replace(text, ' the ', ' the' || chr(13) || chr(10)) END ||
             CASE WHEN doc_id % 3 = 0 THEN ' ' || chr(9) || chr(10) ELSE '' END AS raw
           FROM documents)
         SELECT doc_id,
           trim(regexp_replace(regexp_replace(regexp_replace(
             replace(raw, chr(13) || chr(10), chr(10)),
             '[\x00-\x08\x0B-\x1F\x7F]', '', 'g'),
             '[ \t]+', ' ', 'g'),
             ' +\n', chr(10), 'g'), ' ' || chr(10)) AS cleaned
         FROM raw ORDER BY doc_id""",

    "q_html_extract" ->
      """WITH h AS (
           SELECT doc_id, '<!doctype html><html><body data-id="' || doc_id || '"><h1>Doc &#'
             || (65 + doc_id % 26) || ';</h1><p>' || replace(text, ' ', '</p> <p>')
             || '</p><footer>&amp; &nbsp;fin&#233;</footer></body></html>' AS html
           FROM documents)
         SELECT doc_id,
           replace(replace(replace(replace(
             regexp_replace(html, '<[^>]*>', ' ', 'g'),
             '&#' || (65 + doc_id % 26) || ';', chr(CAST(65 + doc_id % 26 AS INTEGER))),
             '&#233;', chr(233)), '&nbsp;', ' '), '&amp;', '&') AS body
         FROM h ORDER BY doc_id""",

    "q_dsir_select" ->
      s"""WITH $dsirWeightsCte,
         pick AS (SELECT doc_id, n_feats, logw FROM w
           ORDER BY logw DESC, doc_id LIMIT 50)
         SELECT doc_id, n_feats, round(logw, 4) AS logw
         FROM pick ORDER BY doc_id""",

    "q_dsir_score" ->
      s"""WITH $dsirWeightsCte
         SELECT r.doc_id, round(coalesce(w.logw, 0.0), 4) AS logw
         FROM raw r LEFT JOIN w ON w.doc_id = r.doc_id
         ORDER BY r.doc_id""",

    "q_dsir_budget" ->
      s"""WITH $dsirWeightsCte,
         sel AS (SELECT doc_id, logw, n_feats,
             CAST(sum(n_feats) OVER (ORDER BY logw DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
           FROM w)
         SELECT doc_id, round(logw, 4) AS logw, n_feats, cum AS cum_feats
         FROM sel WHERE cum - n_feats < 20000 ORDER BY doc_id""",

    "q_compress_ratio" ->
      """SELECT doc_id, n_chars,
           TRUE AS pos_ok, TRUE AS bounded_ok, TRUE AS backref_ok, TRUE AS entropy_ok
         FROM documents ORDER BY doc_id""",

    "q_curation_front" ->
      """WITH h AS (
           SELECT doc_id, source,
             '<!doctype html><html><body data-id="' || doc_id || '"><h1>&#64257;le sample</h1><p>'
             || replace(text, ' ', '</p> <p>') || '</p><footer>&amp; fin&#233;</footer></body></html>' AS html
           FROM documents),
         body AS (
           SELECT doc_id, source,
             replace(replace(replace(
               regexp_replace(html, '<[^>]*>', ' ', 'g'),
               '&#64257;', chr(64257)), '&#233;', chr(233)), '&amp;', '&') AS body
           FROM h),
         cleaned AS (
           SELECT doc_id, source,
             trim(regexp_replace(regexp_replace(regexp_replace(
               replace(body, chr(13) || chr(10), chr(10)),
               '[\x00-\x08\x0B-\x1F\x7F]', '', 'g'),
               '[ \t]+', ' ', 'g'),
               ' +\n', chr(10), 'g'), ' ' || chr(10)) AS cleaned
           FROM body),
         folded AS (
           SELECT doc_id, source, replace(cleaned, chr(64257), 'fi') AS folded
           FROM cleaned),
         keepers AS (
           SELECT md5(substring(folded, 1, 64)) AS k, MIN(doc_id) AS keeper
           FROM folded GROUP BY 1),
         toks AS (
           SELECT doc_id,
             len(list_filter(string_split_regex(lower(folded), '[^a-z'']+'),
               t -> t <> '')) AS n_toks
           FROM folded)
         SELECT f.source,
                COUNT(*) AS n_docs,
                CAST(SUM(CASE WHEN f.doc_id = kp.keeper THEN 1 ELSE 0 END) AS BIGINT) AS n_keepers,
                CAST(SUM(t.n_toks) AS BIGINT) AS total_tokens
         FROM folded f
         JOIN keepers kp ON md5(substring(f.folded, 1, 64)) = kp.k
         JOIN toks t ON t.doc_id = f.doc_id
         GROUP BY f.source ORDER BY f.source""",
  )
}
