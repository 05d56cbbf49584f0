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

  test("sketch probes and vocab join-backs broadcast their small sides") {
    // q_bpe_encode: corpus tokens join the vocabulary-sized encode table —
    // the vocab side must broadcast (the corpus side never shuffles for it)
    assert(plan("q_bpe_encode").contains("BroadcastHashJoin"))
    // q_cms_counts: the 1-row sketch summary rides a broadcast
    assert(plan("q_cms_counts").contains("BroadcastNestedLoopJoin"))
  }

  test("global top-k plans as TakeOrderedAndProject (bounded distributed heap)") {
    assert(plan("q_top_global").contains("TakeOrderedAndProject"))
    // the TPC-H top-N queries must use the heap too, never a global sort
    assert(plan("q_join_q10").contains("TakeOrderedAndProject"))
    assert(plan("q_join_q18").contains("TakeOrderedAndProject"))
  }

  test("the TPC-H dim joins broadcast (Q8 two nation roles, Q14 part, Q17 brand+avg)") {
    Seq("q_join_q8", "q_join_q14", "q_join_q17").foreach { name =>
      assert(plan(name).contains("BroadcastHashJoin"), s"$name has no broadcast join")
    }
  }

  test("the TPC-H tail: dims broadcast; Q6's predicates all reach the scan") {
    Seq("q_join_q2", "q_join_q9", "q_join_q16", "q_join_q19", "q_join_q20")
      .foreach { name =>
        assert(plan(name).contains("BroadcastHashJoin"), s"$name has no broadcast join")
      }
    // Q6 IS the pushdown query: shipdate range, discount band, quantity
    // cap must all appear as pushed scan filters, and unused wide
    // columns must be pruned from the read
    val q6 = plan("q_join_q6")
    assert(q6.contains("PushedFilters: ["), "Q6 has no pushed filters")
    assert(q6.contains("l_shipdate"), "Q6 shipdate predicate missing from scan")
    assert(q6.contains("l_quantity"), "Q6 quantity predicate missing from scan")
    assert(!q6.contains("l_returnflag"), "Q6 reads an unused column")
  }

  test("AQE skew-split stays enabled (the dynamic-work-rebalancing answer)") {
    // SURVEY §2.8 maps BoundedSource.splitAtFraction (Dataflow's liquid
    // sharding) to AQE runtime re-planning: skewed shuffle partitions
    // split, small ones coalesce. That mapping is only honest while the
    // feature is ON — pin it so a future config edit can't silently
    // remove the straggler story.
    assert(spark.conf.get("spark.sql.adaptive.enabled").toBoolean)
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled").toBoolean)
    assert(spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled").toBoolean)
  }

  test("no registered query plans an unpartitioned (single-partition) Window") {
    // A WindowExec with an empty partition spec moves the ENTIRE input to
    // one partition — fine only for frames that are bounded-small by
    // construction, and those carry an explicit constant partition key
    // (see Combine.prefixSum) precisely so this audit stays clean.
    //
    // BLIND-SPOT CLOSURE (VERDICT r13 task 5): inspecting only the
    // RETURNED DataFrame's plan misses side-effect writes executed
    // INSIDE a query closure (gate feeds, layout writes, merges). A
    // QueryExecutionListener captures every execution the sweep
    // triggers, and the same assertions — plus the no-CartesianProduct
    // rule — run over those executed plans too.
    //
    // No exemptions: the one historical exemption (q_zorder_prune's
    // ntile(16) global-sort layout writes) was replaced in r15 by
    // value-prefix buckets — every closure-executed plan must now be
    // free of unpartitioned windows too.
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.util.QueryExecutionListener
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[(String, QueryExecution)]()
    @volatile var current = "<setup>"
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        captured.add((current, qe))
      // failed executions never ran to completion, so they are not a
      // shipped-plan hazard — and several gates PROBE with reads that
      // fail by design (q_wallclock_panes polls its output dir before
      // the first commit), whose qe cannot even re-analyze
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    // executedPlan is memoized for completed executions; the Try guards
    // any exotic capture whose lazy plan re-analysis throws
    def unwrap(qe: QueryExecution) = scala.util.Try(qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    })
    spark.listenerManager.register(listener)
    try {
      SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
        current = name
        val exec = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan
        val root = exec match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        val bad = root.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
        assert(bad.isEmpty,
          s"$name plans an unpartitioned Window:\n${bad.headOption.getOrElse("")}")
      }
      current = "<drained>"
      // the listener bus is asynchronous — poll until the capture count
      // has been stable for ~2 s before asserting over it
      var last = -1L; var stable = 0
      while (stable < 10) {
        val n = captured.size.toLong
        if (n == last) stable += 1 else { stable = 0; last = n }
        Thread.sleep(200)
      }
    } finally spark.listenerManager.unregister(listener)
    assert(!captured.isEmpty, "listener captured no executions — closure " +
      "writes exist in the registry, so the capture hook is broken")
    captured.forEach { case (name, qe) =>
      unwrap(qe).foreach { root =>
        val wins = root.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
        assert(wins.isEmpty,
          s"closure write inside $name executes an unpartitioned Window " +
            s"(name attribution is best-effort — the bus is async):\n" +
            s"${wins.headOption.getOrElse("")}")
        val carts = root.collect {
          case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
        }
        assert(carts.isEmpty,
          s"closure write inside $name executes a CartesianProduct:\n" +
            s"${carts.headOption.getOrElse("")}")
      }
    }
  }

  test("LSH bucket caps plan as grouped counts, never per-bucket windows") {
    // The maxBucket / maxDf / maxCluster caps exist to defuse skew; a
    // Window.partitionBy(bucket) count would itself materialize the hottest
    // bucket in one task. These plans must carry NO WindowExec at all —
    // their caps are groupBy + semi-join-back.
    // (q_semdedup is audited by the BNLJ size rule instead: its plan
    // legitimately contains a per-vec_id row_number window from the
    // nearest-centroid top-1, partitioned by the non-skewed vector id.)
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    Seq("q_dedup_minhash", "q_dedup_simhash", "q_crosscorpus_dedup",
        "q_crossdoc_dup").foreach { name =>
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

  test("span-surgery queries never shuffle gram text; probe sets broadcast") {
    // removeDuplicateSpans / scrubOverlaps promise gram TEXT stays out of
    // every exchange (identity rides as md5 + int positions). At 100 TB
    // the n-gram explosion is ~n× the corpus text; shuffling it would
    // dwarf the query. Mechanically: no ShuffleExchange output may carry
    // the gram column (__g) or a token-array column (__toks/__grams) —
    // only ids, positions, hashes, and the final per-doc rebuild columns.
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.SparkPlan
    def shuffles(p: SparkPlan): Seq[ShuffleExchangeExec] =
      p.collect {
        case q: QueryStageExec => shuffles(q.plan)
        case r: ReusedExchangeExec => shuffles(r.child)
        case e: ShuffleExchangeExec => Seq(e) ++ shuffles(e.child)
      }.flatten
    Seq("q_span_dedup", "q_decontam_scrub").foreach { name =>
      val exec = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan
      val root = exec match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val offending = shuffles(root).filter(_.output.exists(a =>
        a.name == "__g" || a.name == "__toks" || a.name == "__grams"))
      assert(offending.isEmpty,
        s"$name shuffles gram/token text:\n${offending.headOption.getOrElse("")}")
    }
    // and the decontamination probe filter must be a broadcast semi-join —
    // the corpus side reaches the probe check without any exchange
    assert(plan("q_decontam_scrub").contains("BroadcastHashJoin"),
      "probe-gram semi-join does not broadcast")
    // the stream-safe scrub is a pure projection: its ONLY exchange is
    // the presentation ORDER BY (range partitioning of the output rows)
    locally {
      import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
      val exec = SparkEntry.queries("q_decontam_stream")(spark, dir)
        .queryExecution.executedPlan
      val root = exec match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val nonSort = shuffles(root).filterNot(
        _.outputPartitioning.isInstanceOf[RangePartitioning])
      assert(nonSort.isEmpty,
        s"q_decontam_stream shuffles beyond the output sort:\n${nonSort.headOption.getOrElse("")}")
    }
  }

  test("prefix-rank/sum queries shuffle the data ONCE; offsets reuse that exchange") {
    // prefixRank/prefixSum range-partition the data, then read the same
    // frame again for the per-partition offsets. The second read MUST
    // come back as a ReusedExchange of the first range shuffle — a plan
    // that re-executes the range exchange (sampling pass included) doubles
    // the dominant scan at 100 TB. Allowed range exchanges: the prefix
    // shuffle itself plus the final presentation ORDER BY (which sorts the
    // few aggregated output rows, not the corpus).
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
    def collectDeep[A](p: SparkPlan)(f: PartialFunction[SparkPlan, A]): Seq[A] =
      p.collect {
        case q: QueryStageExec => collectDeep(q.plan)(f)
        case r: ReusedExchangeExec => collectDeep(r.child)(f)
        case n if f.isDefinedAt(n) => Seq(f(n))
      }.flatten
    Seq("q_quality_bins", "q_token_budget").foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect()
      val root = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // distinct-by-identity range exchanges actually planned
      val ranges = new java.util.IdentityHashMap[ShuffleExchangeExec, Unit]
      collectDeep(root) {
        case e: ShuffleExchangeExec if e.outputPartitioning.isInstanceOf[RangePartitioning] => e
      }.foreach(e => ranges.put(e, ()))
      assert(ranges.size <= 2,
        s"$name plans ${ranges.size} distinct range exchanges (expected: data + output sort)")
      // and at least one reuse of a range exchange must be present
      def reusedRanges(p: SparkPlan): Int =
        p.collect {
          case q: QueryStageExec => reusedRanges(q.plan)
          case r: ReusedExchangeExec
            if r.child.outputPartitioning.isInstanceOf[RangePartitioning] => 1
        }.sum
      assert(reusedRanges(root) >= 1,
        s"$name: offsets read does not reuse the data range exchange")
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

  test("no CartesianProduct; every BroadcastNestedLoopJoin broadcasts < 1000 rows") {
    // A BroadcastNestedLoopJoin is legitimate ONLY as an intentional
    // broadcast of a tiny side against a non-equi condition — ANN probe
    // frames, centroid tables, 1-row corpus-statistics frames (the same
    // plan Catalyst gives a scalar subquery). Rather than allowlisting
    // query names (which new queries could silently ride), execute each
    // BNLJ's build side and assert it is genuinely sub-1000-row: a
    // degenerate all-pairs join cannot pass, whatever its query is named.
    import org.apache.spark.sql.catalyst.plans.physical.IdentityBroadcastMode
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec}
    // BNLJ build sides broadcast with IdentityBroadcastMode (hash joins
    // use HashedRelationBroadcastMode), so identity-mode exchanges in the
    // executed plan are exactly the frames a BNLJ replicated. AQE query
    // stages are leaf nodes — recurse into them explicitly.
    def identityExchanges(p: SparkPlan): Seq[BroadcastExchangeExec] =
      p.collect {
        case e: BroadcastExchangeExec if e.mode == IdentityBroadcastMode => Seq(e)
        case q: QueryStageExec => identityExchanges(q.plan)
        case r: ReusedExchangeExec => identityExchanges(r.child)
      }.flatten
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val initial = df.queryExecution.executedPlan.toString
      assert(!initial.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
      if (initial.contains("BroadcastNestedLoopJoin")) {
        df.collect() // run so the exchange's numOutputRows metric populates
        val root = df.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        identityExchanges(root).foreach { e =>
          val n = e.metrics("numOutputRows").value
          assert(n < 1000,
            s"$name broadcasts $n rows through a BroadcastNestedLoopJoin " +
              "(bound: 1000) — this degenerates to all-pairs at scale")
        }
      }
    }
  }
}
