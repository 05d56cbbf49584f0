package graft

/** Physical-plan audit (the 100 TB posture, checked mechanically):
  * pushdown reaches the parquet scan, dimensions broadcast, top-k plans as
  * a bounded heap, and NO registered query degenerates to an all-pairs
  * join. These are the properties the bench numbers depend on — asserting
  * them here means a regression fails loudly instead of showing up as a
  * silent slowdown at scale. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("filters push into the parquet scan and columns are pruned") {
    val p = plan("q_map_filter")
    assert(p.contains("PushedFilters: ["), "no pushed filters in scan")
    assert(p.contains("l_quantity"), "quantity predicate missing from scan")
    // projection pruning: untouched wide columns never reach the reader
    assert(!p.contains("l_comment"), "unused column read from parquet")
  }

  test("dimension joins broadcast; no shuffle of the big side for dims") {
    assert(plan("q_join_q3").contains("BroadcastHashJoin"))
    assert(plan("q_join_multiway").contains("BroadcastHashJoin"))
  }

  test("global top-k plans as TakeOrderedAndProject (bounded distributed heap)") {
    assert(plan("q_top_global").contains("TakeOrderedAndProject"))
  }

  test("no registered query plans an unpartitioned (single-partition) Window") {
    // A WindowExec with an empty partition spec moves the ENTIRE input to
    // one partition — fine only for frames that are bounded-small by
    // construction, and those carry an explicit constant partition key
    // (see Combine.prefixSum) precisely so this audit stays clean.
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val exec = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan
      val root = exec match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val bad = root.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
      assert(bad.isEmpty,
        s"$name plans an unpartitioned Window:\n${bad.headOption.getOrElse("")}")
    }
  }

  test("LSH bucket caps plan as grouped counts, never per-bucket windows") {
    // The maxBucket / maxDf / maxCluster caps exist to defuse skew; a
    // Window.partitionBy(bucket) count would itself materialize the hottest
    // bucket in one task. These plans must carry NO WindowExec at all —
    // their caps are groupBy + semi-join-back.
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    Seq("q_dedup_minhash", "q_dedup_simhash", "q_crosscorpus_dedup",
        "q_crossdoc_dup", "q_semdedup").foreach { name =>
      val exec = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan
      val root = exec match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val wins = root.collect { case w: WindowExec => w }
      assert(wins.isEmpty,
        s"$name plans a WindowExec (skew-unsafe bucket cap):\n${wins.headOption.getOrElse("")}")
    }
  }

  test("partitioned layout: the fact scan prunes partitions dynamically (DPP)") {
    // q_partitioned_prune joins a hive-partitioned fact on its partition
    // column against a dim filtered on an aggregate (not statically
    // inferable) — only dynamic partition pruning can skip directories.
    // The scan must carry a dynamicpruning PartitionFilter reusing the
    // join's broadcast.
    val p = plan("q_partitioned_prune").toLowerCase
    assert(p.contains("dynamicpruning"),
      s"no dynamic partition pruning in the fact scan:\n$p")
  }

  test("no registered query plans a CartesianProduct") {
    // BroadcastNestedLoopJoin is legitimate ONLY where the design is an
    // intentional broadcast of a tiny side against a non-equi condition:
    // the exact ANN baseline (probes), IVF centroid assignment, and the
    // 1-row corpus-statistics frames (N, avgdl) under TF-IDF/BM25 — the
    // same plan Catalyst gives a scalar subquery.
    // q_contamination_exact broadcasts the eval-set probes against a
    // substring predicate — the designed corpus-scan-once plan.
    // q_semdedup assigns to broadcast centroids the same way the IVF
    // queries do; q_vocab_coverage crossJoins a broadcast 1-row total —
    // both are the intended bounded fan-out, not a degenerate join.
    // q_heavy_hitters / q_length_trim attach a broadcast 1-row frame
    // (token total; quantile bounds) — same scalar-subquery-shaped plan.
    val bnljAllowed = Set("q_similarity_topk", "q_similarity_ivf",
      "q_similarity_ivf_trained", "q_tfidf", "q_bm25", "q_perplexity",
      "q_contamination_exact", "q_contamination_full", "q_semdedup",
      "q_vocab_coverage", "q_heavy_hitters", "q_length_trim",
      "q_pipeline_e2e")
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a CartesianProduct")
      if (!bnljAllowed(name))
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin")
    }
  }
}
