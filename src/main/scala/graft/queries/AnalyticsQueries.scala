package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.Selection
import graft.operators.{Graph, TimeSeries}
import graft.queries.QueryUtil._

/** Round-8 analytics additions: time-series gap-fill, exact-arithmetic
  * experiment analysis, triangle counting, and the diversity-selection
  * pair (MMR re-rank, k-center coreset).
  *
  * Oracle posture: ALL five queries are full-value DuckDB oracles — the
  * greedy selection queries get theirs by unrolling the k selection
  * stages into k relational stages on BOTH engines (the same
  * `WITH s1 … sk` text the Spark loop mirrors join-for-join), with every
  * double routed through the proven bit-reproducible devices
  * (list_inner_product cosine, list_sum/list_transform sqdist, DECIMAL
  * sums, fixed IEEE expression trees, HUGEINT/DECIMAL(38) integer
  * cross-multiplication).
  */
object AnalyticsQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Dense-grid resampling of an irregular hourly series: a 1-in-13
    // event sample leaves real gaps in the per-type hourly means; the
    // gap-fill emits LOCF and linear interpolation side by side. The
    // grid is generated per key from its own span (sequence + explode,
    // no driver materialization); both fill windows are key-partitioned.
    // Hash parity: observed means via exact DECIMAL avg; the
    // interpolation is a fixed IEEE tree over those exact inputs,
    // spelled identically in the oracle.
    "q_gapfill" -> { (s, dir) =>
      val obs = Tables(s, dir).events
        .filter(pmod(col("event_id"), lit(13)) === 0)
        .groupBy(col("event_type"),
          expr("unix_timestamp(ts) DIV 3600").as("slot"))
        .agg(davg(col("value")).as("v"))
      TimeSeries.gapFillLinear(obs, Seq("event_type"), "slot", "v")
        .select(col("event_type"), col("slot"),
          to_timestamp(col("slot") * 3600).as("slot_ts"),
          col("v"), col("ffill"), col("interp"))
        .orderBy(col("event_type"), col("slot"))
    },

    // Two-proportion z-test per segment (the A/B readout): arms split by
    // deterministic user-id arithmetic, conversion = any purchase event.
    // The α=0.05 verdict is decided ENTIRELY in integer arithmetic —
    // z² ≥ 1.96² cross-multiplied to
    //   10000·D²·N ≥ 38416·n_a·n_b·C·(N−C),  D = c_a·n_b − c_b·n_a,
    // exact in DECIMAL(38,0) here and HUGEINT in the oracle, so the
    // boolean is reproducible bit-for-bit (a float z-score could flip
    // on the boundary). Rates are one double division each.
    "q_ab_test" -> { (s, dir) =>
      val users = Tables(s, dir).events
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
        .select(pmod(col("user_id"), lit(4)).as("seg"),
          pmod(expr("user_id DIV 4"), lit(2)).as("arm"), col("conv"))
      val g = users.groupBy(col("seg"))
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("conv_a"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
          sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("conv_b"))
      val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val bigD = d38(col("conv_a") * col("n_b") - col("conv_b") * col("n_a"))
      val n = col("n_a") + col("n_b")
      val c = col("conv_a") + col("conv_b")
      g.select(col("seg"), col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
          round(col("conv_a").cast("double") / col("n_a"), 6).as("rate_a"),
          round(col("conv_b").cast("double") / col("n_b"), 6).as("rate_b"),
          (lit(10000) * bigD * bigD * d38(n) >=
            lit(38416) * d38(col("n_a")) * d38(col("n_b")) * d38(c) * d38(n - c))
            .as("significant_05"))
        .orderBy(col("seg"))
    },

    // Per-node triangle counts over the item co-engagement graph (items
    // touched by the same user on the same day). Degree-ordered edge
    // orientation bounds the wedge fan-out at hubs — the (degree, id)
    // struct comparison IS the total order, so no global-rank window
    // exists anywhere in the plan.
    "q_triangles" -> { (s, dir) =>
      val ui = Tables(s, dir).events
        .select(col("user_id"), to_date(col("ts")).as("day"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").cast("long").as("item"))
        .distinct()
      val edges = ui.as("x")
        .join(ui.as("y"),
          col("x.user_id") === col("y.user_id") &&
            col("x.day") === col("y.day") && col("x.item") < col("y.item"))
        .select(col("x.item").as("a"), col("y.item").as("b"))
        .distinct()
      Graph.triangleCount(edges).orderBy(col("node"))
    },

    // MMR re-rank: relevance vs redundancy over the brute-force top-20,
    // k=5, λ=0.75 (complement 0.25 is IEEE-exact — the greedy compare
    // replays bit-for-bit). Unrolled greedy: SQL stages s1..s5 mirror
    // the Spark loop exactly.
    "q_mmr_rerank" -> { (s, dir) =>
      val emb = Tables(s, dir).embeddings
      Selection.mmrRerank(emb, emb.filter(col("vec_id") < 8),
          topN = 20, k = 5, lambda = 0.75)
        .select(col("probe_id"), col("rank").as("sel_rank"), col("cand_id"),
          round(col("rel"), 4).as("rel"), round(col("mmr"), 4).as("mmr"))
        .orderBy(col("probe_id"), col("sel_rank"))
    },

    // k-center greedy coreset (k=6 from the lowest vec_id): the
    // farthest-point gain sequence plus the final covering radius, all
    // squared-L2 through the bit-reproducible sqdist device.
    "q_kcenter_coreset" -> { (s, dir) =>
      Selection.kCenterGreedy(Tables(s, dir).embeddings, k = 6)
        .select(col("rank").as("sel_rank"), col("vec_id"),
          round(col("gain"), 6).as("gain"), round(col("radius"), 6).as("radius"))
        .orderBy(col("sel_rank"))
    },

    // EWMA smoothing over the same sampled hourly series as q_gapfill
    // (observed points, irregular slots): the sequential recurrence
    // y₁=x₁, yₜ=α·xₜ+(1−α)·yₜ₋₁ as one typed per-key scan; α=0.25 so
    // both coefficients are IEEE-exact and the whole trajectory
    // hash-matches the oracle's recursive-CTE replay step for step.
    "q_ewma" -> { (s, dir) =>
      val obs = Tables(s, dir).events
        .filter(pmod(col("event_id"), lit(13)) === 0)
        .groupBy(col("event_type"),
          expr("unix_timestamp(ts) DIV 3600").as("slot"))
        .agg(davg(col("value")).as("v"))
      TimeSeries.ewma(obs, "event_type", "slot", "v", alpha = 0.25)
        .orderBy(col("event_type"), col("slot"))
    },

    // ε = ln 2 differentially-private per-(source,lang) counts: the
    // geometric mechanism with EXACT integer noise (trailing-zero-bit
    // geometric draws from the portable md5 device — no float logs), so
    // the oracle replays every noised count bit-for-bit. True counts
    // stay in the output for the audit/oracle; a real release drops
    // them and re-seeds (Curation.dpNoisedCounts scaladoc).
    "q_dp_counts" -> { (s, dir) =>
      graft.llm.Curation.dpNoisedCounts(
          Tables(s, dir).documents, Seq("source", "lang"))
        .orderBy(col("source"), col("lang"))
    },

    // Rank-biased overlap between two part rankings per brand
    // (cheapest-first vs smallest-first), depth 10, p = 9/10 — the
    // top-weighted ranking-agreement score, exact via per-depth power
    // LITERALS and 12-dp integer-quantized terms (no pow() anywhere).
    "q_rbo" -> { (s, dir) =>
      import graft.operators.RankCompare
      RankCompare.rbo(Tables(s, dir).part, Seq("p_brand"),
          id = col("p_partkey"), scoreA = col("p_retailprice"),
          scoreB = col("p_size"), depth = 10)
        .orderBy(col("p_brand"))
    },
  )

  // ---- oracle SQL ---------------------------------------------------

  private def cosSql(a: String, b: String): String =
    s"list_inner_product($a, $b) / (sqrt(list_inner_product($a, $a)) * sqrt(list_inner_product($b, $b)))"

  private def sqSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))"

  /** Unrolled-greedy MMR oracle — stage CTEs s1..sK, λ and 1−λ inlined. */
  private def mmrSql(nProbes: Int, topN: Int, k: Int): String = {
    val parts = scala.collection.mutable.Buffer(
      "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)",
      s"p AS (SELECT vec_id AS probe_id, emb AS pe FROM e WHERE vec_id < $nProbes)",
      s"scored AS (SELECT probe_id, c.vec_id AS cand_id, ${cosSql("pe", "c.emb")} AS rel FROM p, e c WHERE c.vec_id <> probe_id)",
      s"cands AS (SELECT probe_id, cand_id, rel FROM (SELECT probe_id, cand_id, rel, row_number() OVER (PARTITION BY probe_id ORDER BY rel DESC, cand_id) AS rn FROM scored) WHERE rn <= $topN)",
      "ce AS (SELECT c.probe_id, c.cand_id, c.rel, e.emb FROM cands c JOIN e ON e.vec_id = c.cand_id)",
      s"ps AS (SELECT a.probe_id, a.cand_id, b.cand_id AS other_id, ${cosSql("a.emb", "b.emb")} AS sim FROM ce a JOIN ce b ON a.probe_id = b.probe_id AND a.cand_id <> b.cand_id)",
      "s1 AS (SELECT probe_id, CAST(1 AS BIGINT) AS sel_rank, cand_id, rel, 0.75 * rel AS mmr FROM (SELECT probe_id, cand_id, rel, row_number() OVER (PARTITION BY probe_id ORDER BY rel DESC, cand_id) AS rn FROM cands) WHERE rn = 1)",
      "sel1 AS (SELECT probe_id, cand_id FROM s1)")
    for (i <- 2 to k) {
      val j = i - 1
      parts += (s"s$i AS (SELECT probe_id, CAST($i AS BIGINT) AS sel_rank, cand_id, rel, mmr FROM (" +
        "SELECT probe_id, cand_id, rel, mmr, row_number() OVER (PARTITION BY probe_id ORDER BY mmr DESC, cand_id) AS rn FROM (" +
        "SELECT m.probe_id, m.cand_id, r.rel, 0.75 * r.rel - 0.25 * m.maxsim AS mmr " +
        s"FROM (SELECT ps.probe_id, ps.cand_id, max(ps.sim) AS maxsim FROM ps JOIN sel$j s ON ps.probe_id = s.probe_id AND ps.other_id = s.cand_id GROUP BY ps.probe_id, ps.cand_id) m " +
        "JOIN cands r ON r.probe_id = m.probe_id AND r.cand_id = m.cand_id " +
        s"LEFT JOIN sel$j x ON x.probe_id = m.probe_id AND x.cand_id = m.cand_id WHERE x.cand_id IS NULL)) WHERE rn = 1)")
      parts += s"sel$i AS (SELECT probe_id, cand_id FROM sel$j UNION ALL SELECT probe_id, cand_id FROM s$i)"
    }
    val allSel = (1 to k).map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")
    "WITH " + parts.mkString(",\n") +
      s"\nSELECT probe_id, sel_rank, cand_id, round(rel, 4) AS rel, round(mmr, 4) AS mmr FROM ($allSel) ORDER BY probe_id, sel_rank"
  }

  /** Unrolled k-center oracle — alternating argmax (cᵢ) / incremental
    * min-distance (dᵢ) CTEs. */
  private def kCenterSql(k: Int): String = {
    val parts = scala.collection.mutable.Buffer(
      "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)",
      "c1 AS (SELECT vec_id, emb FROM e ORDER BY vec_id LIMIT 1)",
      s"d1 AS (SELECT v.vec_id, v.emb, ${sqSql("v.emb", "c.emb")} AS mind FROM e v, c1 c)")
    for (i <- 2 to k) {
      parts += s"c$i AS (SELECT vec_id, emb, mind FROM d${i - 1} ORDER BY mind DESC, vec_id LIMIT 1)"
      parts += s"d$i AS (SELECT v.vec_id, v.emb, least(v.mind, ${sqSql("v.emb", "c.emb")}) AS mind FROM d${i - 1} v, c$i c)"
    }
    val sel = ("SELECT CAST(1 AS BIGINT) AS sel_rank, vec_id, CAST(NULL AS DOUBLE) AS gain FROM c1" +:
      (2 to k).map(i => s"SELECT CAST($i AS BIGINT), vec_id, mind FROM c$i")).mkString(" UNION ALL ")
    "WITH " + parts.mkString(",\n") + s",\nsel AS ($sel)" +
      s"\nSELECT sel_rank, vec_id, round(gain, 6) AS gain, round((SELECT max(mind) FROM d$k), 6) AS radius FROM sel ORDER BY sel_rank"
  }

  val oracles: Map[String, String] = Map(
    "q_gapfill" ->
      """WITH obs AS (
           SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS slot,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS v
           FROM events WHERE event_id % 13 = 0 GROUP BY 1, 2),
         spans AS (SELECT event_type, min(slot) AS lo, max(slot) AS hi FROM obs GROUP BY 1),
         grid AS (SELECT event_type, unnest(generate_series(lo, hi, 1)) AS slot FROM spans),
         j AS (SELECT g.event_type, g.slot, o.v FROM grid g
               LEFT JOIN obs o ON o.event_type = g.event_type AND o.slot = g.slot),
         f AS (SELECT event_type, slot, v,
             last_value(v IGNORE NULLS) OVER wb AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN slot END IGNORE NULLS) OVER wb AS pt,
             first_value(v IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN slot END IGNORE NULLS) OVER wf AS nt
           FROM j
           WINDOW wb AS (PARTITION BY event_type ORDER BY slot ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                  wf AS (PARTITION BY event_type ORDER BY slot ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         SELECT event_type, slot, make_timestamp(slot * 3600 * 1000000) AS slot_ts, v,
           pv AS ffill,
           CASE WHEN pv IS NULL OR nv IS NULL THEN NULL
                WHEN pt = nt THEN pv
                ELSE pv + (nv - pv) * (CAST(slot - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE)) END AS interp
         FROM f ORDER BY event_type, slot""",
    "q_ab_test" ->
      """WITH u AS (
           SELECT user_id, max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
           FROM events GROUP BY user_id),
         a AS (SELECT user_id % 4 AS seg, (user_id // 4) % 2 AS arm, conv FROM u),
         g AS (SELECT seg,
             CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
           FROM a GROUP BY seg)
         SELECT seg, n_a, conv_a, n_b, conv_b,
           round(CAST(conv_a AS DOUBLE) / n_a, 6) AS rate_a,
           round(CAST(conv_b AS DOUBLE) / n_b, 6) AS rate_b,
           (10000 * CAST(conv_a * n_b - conv_b * n_a AS HUGEINT)
                  * CAST(conv_a * n_b - conv_b * n_a AS HUGEINT) * (n_a + n_b))
             >= (38416 * CAST(n_a AS HUGEINT) * n_b * (conv_a + conv_b)
                       * (n_a + n_b - conv_a - conv_b)) AS significant_05
         FROM g ORDER BY seg""",
    "q_triangles" ->
      """WITH ui AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
             CAST(json_extract(props, '$.k') AS BIGINT) AS item
           FROM events),
         ed AS (SELECT DISTINCT x.item AS a, y.item AS b
                FROM ui x JOIN ui y
                  ON x.user_id = y.user_id AND x.day = y.day AND x.item < y.item),
         deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM
                   (SELECT a AS node FROM ed UNION ALL SELECT b FROM ed)
                 GROUP BY node),
         o AS (SELECT
             CASE WHEN (da.degree, e.a) < (db.degree, e.b) THEN e.a ELSE e.b END AS src,
             CASE WHEN (da.degree, e.a) < (db.degree, e.b) THEN e.b ELSE e.a END AS dst,
             CASE WHEN (da.degree, e.a) < (db.degree, e.b) THEN db.degree ELSE da.degree END AS dd
           FROM ed e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b),
         w AS (SELECT e1.src AS v1, e1.dst AS v2, e2.dst AS v3
               FROM o e1 JOIN o e2
                 ON e1.src = e2.src AND (e1.dd, e1.dst) < (e2.dd, e2.dst)),
         t AS (SELECT v1, v2, v3 FROM w JOIN o ON o.src = w.v2 AND o.dst = w.v3),
         pn AS (SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM
                  (SELECT v1 AS node FROM t UNION ALL SELECT v2 FROM t
                   UNION ALL SELECT v3 FROM t)
                GROUP BY node)
         SELECT d.node, d.degree, COALESCE(pn.n_tri, 0) AS n_tri
         FROM deg d LEFT JOIN pn ON pn.node = d.node ORDER BY d.node""",
    "q_ewma" ->
      """WITH RECURSIVE obs AS (
           SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS slot,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS v
           FROM events WHERE event_id % 13 = 0 GROUP BY 1, 2),
         o2 AS (SELECT event_type, slot, v,
             row_number() OVER (PARTITION BY event_type ORDER BY slot) AS rn
           FROM obs),
         r AS (
           SELECT event_type, slot, v, v AS ewma, rn FROM o2 WHERE rn = 1
           UNION ALL
           SELECT o.event_type, o.slot, o.v, 0.25 * o.v + 0.75 * r.ewma, o.rn
           FROM o2 o JOIN r ON o.event_type = r.event_type AND o.rn = r.rn + 1)
         SELECT event_type, slot, v, ewma FROM r ORDER BY event_type, slot""",
    "q_mmr_rerank" -> mmrSql(nProbes = 8, topN = 20, k = 5),
    "q_kcenter_coreset" -> kCenterSql(k = 6),
    "q_dp_counts" -> {
      def w(tag: String) =
        s"(CAST(('0x' || substr(md5(concat_ws('|', 'graft-dp-$tag', source, lang)), 1, 13)) AS BIGINT) | 4503599627370496) AS w$tag"
      s"""WITH g AS (
           SELECT source, lang, CAST(count(*) AS BIGINT) AS n
           FROM documents GROUP BY source, lang),
         h AS (SELECT source, lang, n, ${w("a")}, ${w("b")} FROM g),
         d AS (SELECT source, lang, n,
             CAST(bit_count((wa & (-wa)) - 1) AS BIGINT)
               - CAST(bit_count((wb & (-wb)) - 1) AS BIGINT) AS noise
           FROM h)
         SELECT source, lang, n, noise, n + noise AS n_noised
         FROM d ORDER BY source, lang"""
    },
    // per-depth power literals generated once (BigInt, identical values
    // in both engines); 12-dp integer-quantized terms; see RankCompare.
    "q_rbo" -> {
      val depth = 10; val pNum = 9; val pDen = 10
      val rows = (1 to depth).map { d =>
        val num = BigInt(pNum).pow(d - 1) * BigInt(10).pow(12)
        val den = BigInt(pDen).pow(d - 1) * d
        s"($d, CAST($num AS HUGEINT), CAST($den AS HUGEINT))"
      }.mkString(", ")
      s"""WITH ranked AS (SELECT p_brand,
             row_number() OVER (PARTITION BY p_brand
               ORDER BY p_retailprice, p_partkey) AS ra,
             row_number() OVER (PARTITION BY p_brand
               ORDER BY p_size, p_partkey) AS rb
           FROM part),
         mm AS (SELECT p_brand, greatest(ra, rb) AS m FROM ranked
           WHERE greatest(ra, rb) <= $depth),
         counts AS (SELECT p_brand, m, COUNT(*) AS c FROM mm GROUP BY 1, 2),
         scaffold AS (SELECT * FROM (VALUES $rows) AS t(d, num, den)),
         grid AS (SELECT b.p_brand, s.d, s.num, s.den
           FROM (SELECT DISTINCT p_brand FROM ranked) b CROSS JOIN scaffold s),
         xd AS (SELECT g.p_brand, g.d, g.num, g.den,
             COALESCE(SUM(CASE WHEN counts.m <= g.d THEN c END), 0) AS x
           FROM grid g LEFT JOIN counts ON g.p_brand = counts.p_brand
           GROUP BY 1, 2, 3, 4),
         terms AS (SELECT p_brand, d, x,
             (CAST(x AS HUGEINT) * num) // den AS t12 FROM xd),
         agg AS (SELECT p_brand, SUM(t12) AS t12s,
             MAX(CASE WHEN d = $depth THEN x END) AS x_final
           FROM terms GROUP BY 1)
         SELECT p_brand,
           round(CAST(t12s AS DOUBLE)
             * (CAST(1.0 AS DOUBLE) - CAST(${pNum.toDouble / pDen} AS DOUBLE))
             / CAST(1000000000000.0 AS DOUBLE), 6) AS rbo,
           CAST(COALESCE(x_final, 0) AS BIGINT) AS x_final,
           CAST($depth AS BIGINT) AS depth
         FROM agg ORDER BY p_brand"""
    },
  )
}
