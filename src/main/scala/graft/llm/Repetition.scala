package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-document repetition filters in the style of Gopher's rule set
  * (Rae et al. 2021, appendix A1.1): documents dominated by a repeated
  * word n-gram or by duplicated lines are low-quality (templated spam,
  * keyword stuffing, scraper loops) and get filtered before pretraining.
  * The reference SDK has no text operators (SURVEY.md §2.6); this extends
  * the mandated LLM text-cleaning family alongside [[Boilerplate]]
  * (which removes segments recurring ACROSS documents — these stats are
  * WITHIN-document).
  *
  * Scale posture: one tokenize+explode pass, one (doc, gram) aggregation
  * with map-side partials, one per-doc re-aggregation, one broadcast-free
  * left join back to the id spine to restore gram-less docs. Nothing is
  * O(doc_len²) per document and no driver collect — the shape survives
  * docs of any length and corpora of any row count.
  */
object Repetition {

  /** Word n-gram repetition stats per document:
    *
    *  - `top_ngram_frac`: characters covered by the heaviest n-gram
    *    (occurrences × gram length, spaces included) / document chars.
    *    Deliberate deviation from Gopher's "most frequent n-gram": we rank
    *    by total character mass, which is deterministic under count ties
    *    and is the quantity the filter actually thresholds.
    *  - `dup_ngram_frac`: characters covered by ALL n-grams occurring more
    *    than once (every occurrence counted) / document chars.
    *
    * Both are 0.0 for docs with fewer than n tokens. Fractions can exceed
    * 1.0 because overlapping n-gram occurrences each count their full
    * length (same as Gopher's published definition for n≥2 duplicates).
    *
    * Tokens are lower-cased words (TextFunctions.tokens); grams join with
    * a single space; char base is the raw text length, so the stat is
    * independent of tokenization whitespace. Integer÷integer double
    * division keeps the result bit-identical across engines.
    */
  def ngramRepetitionStats(df: DataFrame, idCol: String, textCol: String,
                           n: Int): DataFrame = {
    require(n >= 1, "n-gram size must be >= 1")
    val spine = df.select(col(idCol).as("__id"),
      length(col(textCol)).as("__chars"))
    // native gram builder: one tokenize + tight loop per row; the HOF
    // form (sequence → transform → slice → array_join) runs interpreted
    // per element and measured ~4× slower (empty array below n tokens →
    // explode drops the doc; the left join below restores it as 0.0)
    val grams = df.select(
        col(idCol).as("__id"),
        explode(graft.functions.ShingleExprs.ngramStrings(col(textCol), n))
          .as("__gram"))
    val perGram = grams
      .groupBy(col("__id"), col("__gram"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__mass", col("__cnt") * length(col("__gram")))
    val perDoc = perGram.groupBy(col("__id")).agg(
      max(col("__mass")).as("__top_mass"),
      coalesce(sum(when(col("__cnt") > 1, col("__mass"))), lit(0L))
        .as("__dup_mass"))
    spine.join(perDoc, Seq("__id"), "left")
      .select(
        col("__id").as(idCol),
        when(col("__chars") > 0,
          coalesce(col("__top_mass"), lit(0L)).cast("double") /
            col("__chars").cast("double")).otherwise(0.0)
          .as("top_ngram_frac"),
        when(col("__chars") > 0,
          coalesce(col("__dup_mass"), lit(0L)).cast("double") /
            col("__chars").cast("double")).otherwise(0.0)
          .as("dup_ngram_frac"))
  }

  /** Duplicate-line stats per document (Gopher's duplicate-line-fraction
    * family):
    *
    *  - `n_lines`: non-empty lines (whitespace-only lines ignored,
    *    matching [[Boilerplate]]'s segment rules);
    *  - `dup_line_frac`: fraction of lines that are repeats of an earlier
    *    identical line (occurrences beyond the first / total lines);
    *  - `dup_line_char_frac`: same, weighted by line length.
    *
    * Lines are exact-match after nothing but the split — callers wanting
    * normalization pass a pre-normalized column. Corpora without newline
    * structure first re-segment with [[Boilerplate.chunkTokens]].
    */
  /** Distinct-n diversity ratios per corpus slice (Li et al. 2016's
    * distinct-1/2/3, the standard text-diversity metric next to the
    * per-document repetition stats above): for each n in `ns`,
    * distinct n-grams / total n-grams over ALL text in the group —
    * low ratios flag templated/looping corpora at the slice level the
    * way ngramRepetitionStats flags single documents.
    *
    * Exact integer counts; each ratio is one double division. One
    * grouped count per n over the gram stream (map-side partials);
    * gram identity never leaves the aggregation.
    *
    * @return one row per (group, n): n_grams, n_distinct, distinct_ratio
    *         (6 dp, NULL when the slice has no n-grams) */
  def distinctNgramRatios(df: DataFrame, groupCol: Column, textCol: Column,
                          ns: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), "ns must be positive")
    import graft.functions.ShingleExprs
    val perN = ns.map { n =>
      // ngramStrings' sub-n whole-text convention would count a short
      // document as one gram; diversity wants true n-grams only, so
      // sub-n docs contribute nothing (size filter before explode)
      val toks = graft.functions.TextFunctions.tokens(textCol)
      df.filter(size(toks) >= n)
        .select(groupCol.cast("string").as("group"),
          explode(ShingleExprs.ngramStrings(textCol, n)).as("__g"))
        .groupBy(col("group"))
        .agg(count(lit(1)).as("n_grams"),
          countDistinct(col("__g")).as("n_distinct"))
        .select(col("group"), lit(n.toLong).as("n"), col("n_grams"),
          col("n_distinct"),
          round(when(col("n_grams") > 0, col("n_distinct").cast("double") /
            col("n_grams").cast("double")), 6).as("distinct_ratio"))
    }
    perN.reduceLeft(_ unionByName _)
  }

  def duplicateLineStats(df: DataFrame, idCol: String, textCol: String,
                         delimiter: String = "\n"): DataFrame = {
    val spine = df.select(col(idCol).as("__id"))
    val lines = df.select(
        col(idCol).as("__id"),
        explode(split(col(textCol),
          java.util.regex.Pattern.quote(delimiter))).as("__line"))
      .filter(length(trim(col("__line"))) > 0)
    val perLine = lines
      .groupBy(col("__id"), col("__line"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__len", length(col("__line")))
    val perDoc = perLine.groupBy(col("__id")).agg(
      sum(col("__cnt")).as("__n"),
      sum(col("__cnt") - 1).as("__dups"),
      sum(col("__cnt") * col("__len")).as("__chars"),
      sum((col("__cnt") - 1) * col("__len")).as("__dup_chars"))
    spine.join(perDoc, Seq("__id"), "left")
      .select(
        col("__id").as(idCol),
        coalesce(col("__n"), lit(0L)).as("n_lines"),
        when(coalesce(col("__n"), lit(0L)) > 0,
          col("__dups").cast("double") / col("__n").cast("double"))
          .otherwise(0.0).as("dup_line_frac"),
        when(coalesce(col("__chars"), lit(0L)) > 0,
          col("__dup_chars").cast("double") / col("__chars").cast("double"))
          .otherwise(0.0).as("dup_line_char_frac"))
  }

  /** Blocked edit-distance near-dup pairs: candidate pairs share a
    * document-length band (`bandWidth` chars wide) and match when the
    * Levenshtein distance between their `prefixLen`-char prefixes is at
    * most `maxDist`. The band join is an equi-join (scale-safe: no cross
    * product; band population bounds the per-key fan-out), and the
    * distance only ever sees fixed-length prefixes, so per-pair cost is
    * O(prefixLen²) regardless of document size — the standard cheap
    * fuzzy-dedup pass between exact-hash dedup and MinHash. Length
    * banding is a blocking heuristic: near-dups straddling a band
    * boundary are missed (callers needing full recall also probe the
    * adjacent band).
    */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
                        prefixLen: Int, maxDist: Int,
                        bandWidth: Int, numSalts: Int = 4): DataFrame = {
    require(prefixLen > 0 && maxDist >= 0 && bandWidth > 0 && numSalts > 0)
    val pre = df.select(
      col(idCol).as("id"),
      substring(col(textCol), 1, prefixLen).as("pre"),
      (length(col(textCol)) / bandWidth).cast("long").as("band"))
    // Candidate generation splits by band: documents long enough that
    // their prefix is exactly prefixLen chars (band ≥ fullBand, the
    // common case) go through PassJoin segment blocking — subquadratic,
    // an equi-join on short exact substrings. Shorter documents (bands
    // below fullBand, whose prefixes vary in length) keep the salted
    // within-band pair join; their strings and population are small by
    // construction. Both branches feed the same bounded-levenshtein
    // verify, so the union equals the plain within-band all-pairs
    // definition — the DuckDB oracle replays that quadratic form.
    val fullBand = (prefixLen + bandWidth - 1) / bandWidth // min band with len ≥ prefixLen
    val full = pre.filter(col("band") >= fullBand)
    val short = pre.filter(col("band") < fullBand)

    // --- PassJoin (Li, Deng, Feng: "PASS-JOIN", VLDB'11) on the
    // fixed-length prefixes: partition each prefix into maxDist+1 segments
    // (pigeonhole: edit distance ≤ maxDist ⇒ some segment of A occurs
    // EXACTLY in B, at a position shifted by at most maxDist — the errors
    // preceding an error-free segment each shift it by ≤ 1). The index
    // side emits its maxDist+1 segments; the probe side emits every
    // substring with a segment's length within ±maxDist of that segment's
    // position; candidates are an equi-join on (band, segment#, value).
    // Complete by construction, and frequent n-grams only collide when
    // they sit at compatible positions in the same length band.
    val k = maxDist + 1
    val base = prefixLen / k
    val rem = prefixLen % k
    // 1-indexed (start, len) per segment: first `rem` segments are one
    // char longer, matching the canonical even partition.
    val segs: Seq[(Int, Int)] = {
      val b = Seq.newBuilder[(Int, Int)]
      var s = 1
      (0 until k).foreach { i =>
        val l = base + (if (i < rem) 1 else 0)
        b += ((s, l))
        s += l
      }
      b.result()
    }
    val segCols = segs.zipWithIndex.map { case ((s, l), i) =>
      struct(lit(i).as("i"), substring(col("pre"), s, l).as("v"))
    }
    // segment VALUES join as xxhash64 longs, not strings: the candidate
    // shuffle carries 8 bytes instead of a segment substring per row, and
    // a hash collision can only ADD a candidate, which the levenshtein
    // verify below rejects — output identical, shuffle narrower.
    val idxSide = full.select(col("id").as("id_a"), col("band"),
      explode(array(segCols: _*)).as("sg"))
      .select(col("id_a"), col("band"), col("sg.i").as("i"),
        xxhash64(col("sg.v")).as("v"))
    val probeCols = segs.zipWithIndex.map { case ((s, l), i) =>
      val lo = math.max(1, s - maxDist)
      val hi = math.min(prefixLen - l + 1, s + maxDist)
      transform(sequence(lit(lo), lit(hi)),
        p => struct(lit(i).as("i"), col("pre").substr(p, lit(l)).as("v")))
    }
    val probeSide = full.select(col("id").as("id_b"), col("band"),
      explode(flatten(array(probeCols: _*))).as("sg"))
      .select(col("id_b"), col("band"), col("sg.i").as("i"),
        xxhash64(col("sg.v")).as("v"))
    // each unordered pair is probed from both directions; normalize + distinct
    val passCands = idxSide.join(probeSide, Seq("band", "i", "v"))
      .filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .dropDuplicates("id_a", "id_b")

    // --- short-doc bands: salted within-band pair join (band cardinality
    // ≈ prefixLen/bandWidth here, so the salt spreads the skew; see git
    // history for the measured salt sweep).
    val l = short.select(col("id").as("id_a"), col("band"),
      pmod(xxhash64(col("id")), lit(numSalts)).cast("int").as("salt"))
    val r = short.select(col("id").as("id_b"), col("band"),
      explode(sequence(lit(0), lit(numSalts - 1))).as("salt"))
    val shortCands = l.join(r, Seq("band", "salt"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))

    // --- verify: join prefixes back, threshold-bounded levenshtein
    // (Spark 3.5+: banded DP, early exit, -1 past the bound —
    // O(prefixLen·maxDist) per pair, identical distances for survivors).
    passCands.unionByName(shortCands)
      .join(pre.select(col("id").as("id_a"), col("pre").as("pre_a")), Seq("id_a"))
      .join(pre.select(col("id").as("id_b"), col("pre").as("pre_b")), Seq("id_b"))
      .withColumn("dist", levenshtein(col("pre_a"), col("pre_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
