package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.StringMetricExprs

/** Web-provenance curation + fuzzy record linkage — the stages that sit
  * BEFORE text curation in a crawl pipeline: the same page arrives under
  * dozens of byte-different URLs, crawl policy applies per registrable
  * domain, and entity/record linkage needs a string metric stronger than
  * equality. All string surgery is native single-pass expressions
  * ([[StringMetricExprs]]).
  *
  * Oracle strategy: the corpus has no URL column, so each query first
  * SYNTHESIZES a deterministic messy URL per document (doc_id-keyed
  * casing/tracking/fragment/port noise over a gid-keyed canonical
  * identity — the multimodal-query construction pattern) and the oracle
  * CONSTRUCTS the expected canonical form directly from doc_id arithmetic
  * — an independent derivation, not a replay of the parser. Jaro–Winkler
  * has a DuckDB twin (`jaro_winkler_similarity`, pinned bit-exact — see
  * StringMetricExprs scaladoc), giving the linkage query a full oracle.
  */
object WebQueries {

  type Q = (SparkSession, String) => DataFrame

  /** gid: the page identity — everything canonical-VISIBLE derives from
    * it, so the ~100 distinct gids are the true URL universe. */
  private def gid: Column = pmod(col("doc_id"), lit(100))

  /** Canonical-identity pieces reused by [[messyUrl]]; the port rule is
    * inline there (its messy form interleaves with the default-port
    * noise) and in [[canonSql]] — the oracle-side single definition. */
  private def schemeOf(g: Column): Column =
    when(pmod(g, lit(2)) === 0, lit("https")).otherwise(lit("http"))
  private def hostOf(g: Column): Column = concat(
    when(pmod(g, lit(3)) === 0, lit("img.")).otherwise(lit("")),
    lit("example"), pmod(g, lit(7)),
    when(pmod(g, lit(5)) === 0, lit(".co.uk")).otherwise(lit(".com")))

  /** Messy URL: canonical identity from gid, byte-noise from doc_id —
    * uppercased scheme/host, WWW. prefix, explicit default port,
    * duplicate + trailing slashes, tracking params in shifting order,
    * and a fragment. Canonicalization must erase exactly the noise. */
  private def messyUrl: Column = {
    val g = gid
    val scheme = schemeOf(g)
    val schemeM = when(pmod(col("doc_id"), lit(3)) === 0, upper(scheme)).otherwise(scheme)
    val host0 = concat(
      when(pmod(col("doc_id"), lit(4)) === 0, lit("WWW.")).otherwise(lit("")),
      hostOf(g))
    val hostM = when(pmod(col("doc_id"), lit(2)) === 1, upper(host0)).otherwise(host0)
    val portM = when(pmod(g, lit(11)) === 0, lit(":8080"))
      .otherwise(when(pmod(col("doc_id"), lit(5)) === 0,
        when(pmod(g, lit(2)) === 0, lit(":443")).otherwise(lit(":80")))
        .otherwise(lit("")))
    val pathM = concat(
      lit("/docs/"), pmod(g, lit(50)),
      when(pmod(col("doc_id"), lit(7)) === 0, lit("//x")).otherwise(lit("/x")),
      when(pmod(col("doc_id"), lit(6)) === 0, lit("/")).otherwise(lit("")))
    val id = concat(lit("id="), pmod(g, lit(100)))
    val queryM = when(pmod(col("doc_id"), lit(2)) === 0,
      concat(lit("utm_source=feed&"), id, lit("&gclid=g"), col("doc_id")))
      .otherwise(concat(id, lit("&utm_source=feed")))
    concat(schemeM, lit("://"), hostM, portM, pathM,
      lit("?"), queryM, lit("#s"), pmod(col("doc_id"), lit(3)))
  }

  /** SQL twin of the EXPECTED canonical URL, built from doc_id arithmetic
    * alone — shared by the three URL oracles. */
  private val canonSql: String =
    """(CASE WHEN (doc_id % 100) % 2 = 0 THEN 'https' ELSE 'http' END || '://' ||
        CASE WHEN (doc_id % 100) % 3 = 0 THEN 'img.' ELSE '' END ||
        'example' || ((doc_id % 100) % 7) ||
        CASE WHEN (doc_id % 100) % 5 = 0 THEN '.co.uk' ELSE '.com' END ||
        CASE WHEN (doc_id % 100) % 11 = 0 THEN ':8080' ELSE '' END ||
        '/docs/' || ((doc_id % 100) % 50) || '/x' ||
        '?id=' || (doc_id % 100))"""

  private def nameList(xs: Seq[String]): Column = array(xs.map(lit): _*)

  private val FirstNames = Seq(
    "Alan", "Beth", "Carl", "Dana", "Emma", "Fred", "Gina", "Hugo",
    "Iris", "Jack", "Kara", "Liam", "Mona", "Nina", "Omar", "Pete",
    "Quin", "Rosa", "Sam", "Tara", "Uma", "Vera", "Walt", "Xena",
    "Yuri", "Zane", "Cora", "Dale", "Erin", "Gwen", "Hans", "Ivan")
  private val LastNames = Seq(
    "Adams", "Baker", "Cohen", "Diaz", "Evans", "Fisher", "Garcia", "Hayes",
    "Irwin", "Jones", "Keller", "Lopez", "Meyer", "Nolan", "Ortiz", "Perez",
    "Quincy", "Reed", "Reid", "Stone", "Turner", "Usher", "Vance", "Walker",
    "Young", "Zhang", "Brooks", "Carter", "Dunn", "Ellis", "Floyd", "Grant")

  /** Clean + typo'd person records from the customer table: name =
    * FN[key%32] ' ' LN[(key/32)%32]; every 4th key also emits a dirty
    * copy (id = -key-1) with one adjacent transposition at 1-based
    * position 3 + key%3 — first two chars and length survive, so the
    * (prefix-2, length) blocking key is typo-stable by construction. */
  private def personRecords(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables(s, dir).customer
      .select(col("c_custkey").cast("long").as("key"))
      .withColumn("name", concat(
        element_at(nameList(FirstNames), (pmod(col("key"), lit(32)) + 1).cast("int")),
        lit(" "),
        element_at(nameList(LastNames),
          (pmod(expr("key div 32"), lit(32)) + 1).cast("int"))))
    val clean = cust.select(col("key").as("id"), col("name"))
    val dirty = cust.filter(pmod(col("key"), lit(4)) === 0)
      .withColumn("p", (lit(3) + pmod(col("key"), lit(3))).cast("int"))
      .select((-col("key") - 1).as("id"),
        expr("concat(substring(name, 1, p - 1), substring(name, p + 1, 1)," +
          " substring(name, p, 1), substring(name, p + 2))").as("name"))
    clean.unionByName(dirty)
  }

  val defs: Map[String, Q] = Map(

    // URL canonicalization: the native parser-normalizer vs an
    // INDEPENDENT construction of the expected canonical form. The
    // idempotence boolean pins canon(canon(u)) == canon(u) engine-side.
    "q_url_canon" -> { (s, dir) =>
      val canon = StringMetricExprs.canonicalizeUrl(messyUrl)
      Tables(s, dir).documents
        .select(col("doc_id"), canon.as("canon_url"))
        .select(col("doc_id"), col("canon_url"),
          (StringMetricExprs.canonicalizeUrl(col("canon_url")) === col("canon_url"))
            .as("idempotent_ok"))
        .orderBy(col("doc_id"))
    },

    // URL-keyed crawl dedup: byte-different recrawls collapse onto one
    // canonical key; per key the keeper is the earliest doc. One
    // hash-shuffle on the canonical key — the 100 TB ingest shape.
    "q_url_dedup" -> { (s, dir) =>
      val canon = StringMetricExprs.canonicalizeUrl(messyUrl)
      Tables(s, dir).documents
        .select(col("doc_id"), col("source"), canon.as("url"))
        .groupBy(col("url"))
        .agg(count(lit(1)).as("n_copies"),
          min(col("doc_id")).as("keeper_doc_id"),
          min_by(col("source"), col("doc_id")).as("keeper_source"))
        .orderBy(col("url"))
    },

    // Registrable-domain policy view: eTLD+1 extraction off the
    // canonical host (subdomain + port stripped), per-domain volume, and
    // a broadcast blocklist join — the per-domain crawl-policy audit.
    "q_domain_stats" -> { (s, dir) =>
      val blocklist = s.createDataFrame(
        java.util.Arrays.asList(
          org.apache.spark.sql.Row("example3.com"),
          org.apache.spark.sql.Row("example5.co.uk")),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("domain",
            org.apache.spark.sql.types.StringType))))
        .withColumn("blocked", lit(true))
      val canon = StringMetricExprs.canonicalizeUrl(messyUrl)
      val host = regexp_extract(canon, "^[a-z]+://([^/]+)", 1)
      Tables(s, dir).documents
        .select(col("doc_id"),
          StringMetricExprs.registrableDomainOf(host).as("domain"), canon.as("url"))
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_docs"), countDistinct(col("url")).as("n_pages"))
        .join(broadcast(blocklist), Seq("domain"), "left")
        .select(col("domain"), col("n_docs"), col("n_pages"),
          coalesce(col("blocked"), lit(false)).as("is_blocked"))
        .orderBy(col("domain"))
    },

    // Fuzzy record linkage: block on (2-char prefix, length) — an
    // equi-join, never a cartesian — then Jaro–Winkler ≥ 0.94 inside
    // blocks. is_true_match exposes linkage precision: TRUE rows are a
    // dirty copy meeting its own source record; FALSE rows are distinct
    // entities the metric (correctly) flags as confusable.
    "q_entity_resolution" -> { (s, dir) =>
      val recs = personRecords(s, dir)
        .withColumn("blk_p", substring(col("name"), 1, 2))
        .withColumn("blk_l", length(col("name")))
      val clean = recs.filter(col("id") >= 0)
        .select(col("id").as("clean_id"), col("name").as("clean_name"),
          col("blk_p"), col("blk_l"))
      val dirty = recs.filter(col("id") < 0)
        .select(col("id").as("dirty_id"), col("name").as("dirty_name"),
          col("blk_p"), col("blk_l"))
      clean.join(dirty, Seq("blk_p", "blk_l"))
        .withColumn("jw",
          StringMetricExprs.jaroWinkler(col("clean_name"), col("dirty_name")))
        .filter(col("jw") >= 0.94)
        .select(col("clean_id"), col("dirty_id"), round(col("jw"), 4).as("jw"),
          // an INT label, deliberately not boolean: FALSE rows are
          // correct behavior (confusable distinct entities), so this
          // must not look like a self-assert bound to the stress
          // harness's all-booleans-TRUE check
          (col("clean_id") === -col("dirty_id") - 1).cast("int").as("is_true_match"))
        .orderBy(col("clean_id"), col("dirty_id"))
    },

    // Crawl-policy filter with robots.txt longest-prefix-match
    // semantics: per domain a rule set of (path-prefix, allow/deny),
    // the LONGEST matching prefix decides (the robots.txt tie rule;
    // '/docs/2' re-allows inside a '/docs/' deny — raw string-prefix
    // matching, including '/docs/2' covering '/docs/20-29/...', exactly
    // as robots does). Rules are tiny → broadcast; the corpus never
    // shuffles: one broadcast join + one per-doc argmax.
    "q_robots_policy" -> { (s, dir) =>
      val rules = s.createDataFrame(policyRules).toDF("domain", "prefix", "allow")
      val g = gid
      val docs = Tables(s, dir).documents.select(col("doc_id"),
        concat(lit("example"), pmod(g, lit(7)),
          when(pmod(g, lit(5)) === 0, lit(".co.uk")).otherwise(lit(".com")))
          .as("domain"),
        concat(lit("/docs/"), pmod(g, lit(50)), lit("/x")).as("path"))
      docs.join(broadcast(rules), Seq("domain"))
        .filter(col("path").startsWith(col("prefix")))
        .groupBy(col("doc_id"), col("domain"), col("path"))
        .agg(max_by(struct(col("prefix"), col("allow")), length(col("prefix")))
          .as("m"))
        .select(col("doc_id"), col("domain"), col("path"),
          col("m.prefix").as("rule_prefix"), col("m.allow").as("allowed"))
        .orderBy(col("doc_id"))
    },

    // The crawl-ingest front composed end-to-end: messy URLs →
    // canonicalize → URL-keyed dedup (first crawl wins) → registrable-
    // domain extraction → robots longest-prefix policy → token-count
    // gate → per-domain report. Each stage is individually oracled
    // above; this proves the composition stays bit-reproducible (the
    // q_pipeline_e2e contract for the web front). The policy verdict is
    // computed on an ids-only frame and joined back by doc_id, so the
    // text column never rides through the rules join or the argmax.
    "q_web_pipeline" -> { (s, dir) =>
      val rules = s.createDataFrame(policyRules).toDF("domain", "prefix", "allow")
      val docs = Tables(s, dir).documents
        .select(col("doc_id"), col("text"),
          StringMetricExprs.canonicalizeUrl(messyUrl).as("url"))
      val keeper = docs.groupBy(col("url")).agg(min(col("doc_id")).as("doc_id"))
      val canon = docs.join(keeper, Seq("url", "doc_id"))
        .withColumn("host", regexp_extract(col("url"), "^[a-z]+://([^/]+)", 1))
        .withColumn("domain", StringMetricExprs.registrableDomainOf(col("host")))
        .withColumn("path", regexp_extract(col("url"), "^[a-z]+://[^/]+(/[^?#]*)", 1))
      val verdicts = canon.select(col("doc_id"), col("domain"), col("path"))
        .join(broadcast(rules), Seq("domain"))
        .filter(col("path").startsWith(col("prefix")))
        .groupBy(col("doc_id"))
        .agg(max_by(col("allow"), length(col("prefix"))).as("allowed"))
      canon.join(verdicts, Seq("doc_id"))
        .withColumn("n_toks",
          size(graft.functions.TextFunctions.tokens(col("text"))))
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_pages"),
          sum(when(col("allowed"), 1).otherwise(0)).cast("long").as("n_allowed"),
          sum(when(col("allowed") && col("n_toks") >= 20, 1).otherwise(0))
            .cast("long").as("n_final"),
          sum(when(col("allowed") && col("n_toks") >= 20, col("n_toks"))
            .otherwise(0)).cast("long").as("total_tokens"))
        .orderBy(col("domain"))
    },

    // Entity CLUSTERS: the linkage pairs (all record pairs this time,
    // clean-clean exact-name duplicates included) feed min-label
    // connected components; the entity-size histogram is checked
    // against a DuckDB RECURSIVE-CTE transitive closure — the image-
    // dedup gate pattern applied to the record-linkage family, so the
    // CC operator is cross-engine-verified on a second edge topology
    // (near-clique name groups + typo spurs).
    "q_entity_clusters" -> { (s, dir) =>
      val recs = personRecords(s, dir)
        .withColumn("blk_p", substring(col("name"), 1, 2))
        .withColumn("blk_l", length(col("name")))
      val a = recs.select(col("id").as("id_a"), col("name").as("name_a"),
        col("blk_p"), col("blk_l"))
      val b = recs.select(col("id").as("id_b"), col("name").as("name_b"),
        col("blk_p"), col("blk_l"))
      val pairs = a.join(b, Seq("blk_p", "blk_l"))
        .filter(col("id_a") < col("id_b"))
        .filter(StringMetricExprs.jaroWinkler(col("name_a"), col("name_b")) >= 0.94)
        .select(col("id_a"), col("id_b"))
      graft.llm.Dedup.connectedComponents(recs.select(col("id")), pairs)
        .groupBy(col("label")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz")).agg(count(lit(1)).as("n_entities"))
        .orderBy(col("sz"))
    },

    // k-anonymity suppression: quasi-identifier groups smaller than k=8
    // are dropped entirely; surviving groups report size and sensitive-
    // attribute diversity (l-diversity on the market segment).
    "q_k_anonymity" -> { (s, dir) =>
      val cust = Tables(s, dir).customer
        .withColumn("bal_bucket", floor(col("c_acctbal") / 2000).cast("long"))
      graft.llm.Curation.kAnonymize(cust, Seq("c_nationkey", "bal_bucket"), k = 8)
        .groupBy(col("c_nationkey"), col("bal_bucket"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("c_mktsegment")).as("l_div"))
        .select(col("c_nationkey"), col("bal_bucket"), col("n"), col("l_div"),
          (col("l_div") >= 2).as("l_ok"))
        .orderBy(col("c_nationkey"), col("bal_bucket"))
    },
  )

  /** Crawl-policy rule set, ONE definition feeding both engines (the
    * Spark DataFrame and the oracle's VALUES literal): every domain
    * allows at root; domains 1 and 4 deny under /docs/ but re-allow the
    * /docs/2 prefix; domain 3 bans the single page prefix /docs/13.
    * Prefix lengths are distinct per domain, so longest-match is a
    * total rule. */
  private val policyRules: Seq[(String, String, Boolean)] =
    for {
      tld <- Seq(".com", ".co.uk")
      i <- 0 to 6
      d = s"example$i$tld"
      rule <- Seq((d, "/", true)) ++
        (if (i == 1 || i == 4) Seq((d, "/docs/", false), (d, "/docs/2", true))
         else Nil) ++
        (if (i == 3) Seq((d, "/docs/13", false)) else Nil)
    } yield rule

  private def policyRulesSql: String =
    policyRules.map { case (d, p, a) => s"('$d', '$p', $a)" }.mkString(",\n           ")

  /** DuckDB list-literal twins of the two name arrays. */
  private def sqlList(xs: Seq[String]): String =
    xs.map(n => s"'$n'").mkString("[", ", ", "]")

  private val personCte: String =
    s"""recs AS (
         SELECT c_custkey AS key,
           ${sqlList(FirstNames)}[(c_custkey % 32) + 1] || ' ' ||
           ${sqlList(LastNames)}[((c_custkey // 32) % 32) + 1] AS name
         FROM customer),
       clean AS (SELECT key AS id, name FROM recs),
       dirty AS (
         SELECT -key - 1 AS id,
           substr(name, 1, p - 1) || substr(name, p + 1, 1) ||
           substr(name, p, 1) || substr(name, p + 2) AS name
         FROM (SELECT key, name, CAST(3 + key % 3 AS INT) AS p
               FROM recs WHERE key % 4 = 0))"""

  val oracles: Map[String, String] = Map(

    "q_url_canon" ->
      s"""SELECT doc_id, $canonSql AS canon_url, TRUE AS idempotent_ok
         FROM documents ORDER BY doc_id""",

    "q_url_dedup" ->
      s"""SELECT $canonSql AS url,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS keeper_doc_id,
           arg_min(source, doc_id) AS keeper_source
         FROM documents GROUP BY 1 ORDER BY url""",

    "q_domain_stats" ->
      s"""WITH d AS (
           SELECT doc_id,
             'example' || ((doc_id % 100) % 7) ||
               CASE WHEN (doc_id % 100) % 5 = 0 THEN '.co.uk' ELSE '.com' END AS domain,
             $canonSql AS url
           FROM documents)
         SELECT domain, COUNT(*) AS n_docs, COUNT(DISTINCT url) AS n_pages,
           domain IN ('example3.com', 'example5.co.uk') AS is_blocked
         FROM d GROUP BY domain ORDER BY domain""",

    "q_entity_resolution" ->
      s"""WITH $personCte
         SELECT c.id AS clean_id, d.id AS dirty_id,
           round(jaro_winkler_similarity(c.name, d.name), 4) AS jw,
           CAST(c.id = -d.id - 1 AS INT) AS is_true_match
         FROM clean c JOIN dirty d
           ON substr(c.name, 1, 2) = substr(d.name, 1, 2)
          AND length(c.name) = length(d.name)
         WHERE jaro_winkler_similarity(c.name, d.name) >= 0.94
         ORDER BY clean_id, dirty_id""",

    "q_robots_policy" ->
      s"""WITH d AS (
           SELECT doc_id,
             'example' || ((doc_id % 100) % 7) ||
               CASE WHEN (doc_id % 100) % 5 = 0 THEN '.co.uk' ELSE '.com' END AS domain,
             '/docs/' || ((doc_id % 100) % 50) || '/x' AS path
           FROM documents),
         rules(domain, prefix, allow) AS (VALUES
           $policyRulesSql)
         SELECT doc_id, domain, path,
           arg_max(prefix, length(prefix)) AS rule_prefix,
           arg_max(allow, length(prefix)) AS allowed
         FROM d JOIN rules USING (domain)
         WHERE starts_with(path, prefix)
         GROUP BY doc_id, domain, path
         ORDER BY doc_id""",

    "q_web_pipeline" ->
      s"""WITH d AS (
           SELECT doc_id, text, $canonSql AS url FROM documents),
         k AS (SELECT url, min(doc_id) AS doc_id FROM d GROUP BY url),
         c AS (
           SELECT d.doc_id, d.text, d.url,
             'example' || ((d.doc_id % 100) % 7) ||
               CASE WHEN (d.doc_id % 100) % 5 = 0 THEN '.co.uk' ELSE '.com' END AS domain,
             '/docs/' || ((d.doc_id % 100) % 50) || '/x' AS path
           FROM d JOIN k ON d.url = k.url AND d.doc_id = k.doc_id),
         rules(domain, prefix, allow) AS (VALUES
           $policyRulesSql),
         v AS (
           SELECT c.doc_id, arg_max(r.allow, length(r.prefix)) AS allowed
           FROM c JOIN rules r USING (domain)
           WHERE starts_with(c.path, r.prefix)
           GROUP BY c.doc_id),
         st AS (
           SELECT c.domain, v.allowed,
             len(list_filter(string_split_regex(lower(c.text), '[^a-z'']+'),
               t -> t <> '')) AS n_toks
           FROM c JOIN v USING (doc_id))
         SELECT domain, count(*) AS n_pages,
           CAST(sum(CASE WHEN allowed THEN 1 ELSE 0 END) AS BIGINT) AS n_allowed,
           CAST(sum(CASE WHEN allowed AND n_toks >= 20 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_final,
           CAST(sum(CASE WHEN allowed AND n_toks >= 20 THEN n_toks ELSE 0 END)
             AS BIGINT) AS total_tokens
         FROM st GROUP BY domain ORDER BY domain""",

    "q_entity_clusters" ->
      s"""WITH RECURSIVE $personCte,
         recs2 AS (SELECT id, name FROM clean UNION ALL SELECT id, name FROM dirty),
         prs AS (
           SELECT a.id AS id_a, b.id AS id_b
           FROM recs2 a JOIN recs2 b
             ON substr(a.name, 1, 2) = substr(b.name, 1, 2)
            AND length(a.name) = length(b.name)
            AND a.id < b.id
           WHERE jaro_winkler_similarity(a.name, b.name) >= 0.94),
         e2 AS (SELECT id_a AS a, id_b AS b FROM prs
                UNION ALL SELECT id_b, id_a FROM prs),
         reach(id, lbl) AS (
           SELECT id, id FROM recs2
           UNION
           SELECT e2.b, reach.lbl FROM reach JOIN e2 ON e2.a = reach.id),
         comp AS (SELECT id, min(lbl) AS label FROM reach GROUP BY id),
         szs AS (SELECT label, count(*) AS sz FROM comp GROUP BY label)
         SELECT sz, count(*) AS n_entities FROM szs GROUP BY sz ORDER BY sz""",

    "q_k_anonymity" ->
      """WITH g AS (
           SELECT c_nationkey, CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_bucket,
             COUNT(*) AS n, COUNT(DISTINCT c_mktsegment) AS l_div
           FROM customer GROUP BY 1, 2)
         SELECT c_nationkey, bal_bucket, n, l_div, l_div >= 2 AS l_ok
         FROM g WHERE n >= 8
         ORDER BY c_nationkey, bal_bucket""",
  )
}
