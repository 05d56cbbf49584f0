package graft.operators

import scala.reflect.ClassTag

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The Combine family (SURVEY.md §2.3).
  *
  * Beam's CombineFn[I,Acc,Out] maps field-for-field onto Spark's
  * Aggregator[IN,BUF,OUT] (createAccumulator/addInput/mergeAccumulators/
  * extractOutput ≡ zero/reduce/merge/finish). Combiner lifting — the
  * partial-then-final split the Dataflow service performs (*FlumeJava* §4)
  * — is Catalyst's partial/final HashAggregate, automatic for every
  * aggregate below. Prefer the Column-based built-ins (sum/min/max/avg/
  * count) over custom CombineFns: they stay in whole-stage codegen.
  */
object Combine {

  /** Dataflow-style CombineFn contract ([U] T/Combine.java CombineFn). */
  trait CombineFn[I, A, O] extends Serializable {
    def createAccumulator(): A
    def addInput(acc: A, input: I): A
    def mergeAccumulators(a: A, b: A): A
    def extractOutput(acc: A): O
  }

  /** Bridge: CombineFn → Spark typed Aggregator. Spark runs this with
    * map-side partial aggregation, i.e. combiner lifting for free. */
  def toAggregator[I, A, O](fn: CombineFn[I, A, O])(
      implicit ea: Encoder[A], eo: Encoder[O]): Aggregator[I, A, O] =
    new Aggregator[I, A, O] {
      override def zero: A = fn.createAccumulator()
      override def reduce(acc: A, in: I): A = fn.addInput(acc, in)
      override def merge(a: A, b: A): A = fn.mergeAccumulators(a, b)
      override def finish(acc: A): O = fn.extractOutput(acc)
      override def bufferEncoder: Encoder[A] = ea
      override def outputEncoder: Encoder[O] = eo
    }

  /** Combine.globally ([U] T/Combine.java): whole-dataset fold to one value. */
  def globally[I, A, O](ds: Dataset[I], fn: CombineFn[I, A, O])(
      implicit ea: Encoder[A], eo: Encoder[O]): O =
    ds.select(toAggregator(fn).toColumn).head()

  /** Combine.perKey: per-key fold of a KV dataset via the typed path. */
  def perKey[K, V, A, O](ds: Dataset[(K, V)], fn: CombineFn[V, A, O])(
      implicit ek: Encoder[K], ea: Encoder[A], eo: Encoder[O],
      eko: Encoder[(K, O)]): Dataset[(K, O)] = {
    val agg: TypedColumn[(K, V), O] =
      toAggregator[(K, V), A, O](new CombineFn[(K, V), A, O] {
        def createAccumulator(): A = fn.createAccumulator()
        def addInput(acc: A, in: (K, V)): A = fn.addInput(acc, in._2)
        def mergeAccumulators(a: A, b: A): A = fn.mergeAccumulators(a, b)
        def extractOutput(acc: A): O = fn.extractOutput(acc)
      }).toColumn
    ds.groupByKey(_._1).agg(agg)
  }

  /** Count.globally/perKey/perElement ([U] T/Count.java) — Column forms. */
  def countGlobally(df: DataFrame): DataFrame = df.agg(count(lit(1)).as("n"))
  def countPerKey(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
  def countPerElement(df: DataFrame): DataFrame =
    df.groupBy(df.columns.toIndexedSeq.map(col): _*).agg(count(lit(1)).as("n"))

  /** Top.of/largest/perKey ([U] T/Top.java).
    *
    * Global top-k: orderBy+limit plans as TakeOrderedAndProject — a
    * distributed bounded heap, no full sort. Per-key top-k: window
    * row_number with a rank filter; AQE handles key skew. */
  def topGlobal(df: DataFrame, k: Int, ordering: Column*): DataFrame =
    df.orderBy(ordering: _*).limit(k)

  def topPerKey(df: DataFrame, keys: Seq[String], k: Int, ordering: Column*): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }

  /** Sample.any(n) ([U] T/Sample.java): any n elements — limit. */
  def sampleAny[T](ds: Dataset[T], n: Int): Dataset[T] = ds.limit(n)

  /** Sample.fixedSizeGlobally(n): exact-size uniform reservoir, done the
    * scalable way: assign a seeded per-row random and take the n smallest
    * (TakeOrderedAndProject — no single-node reservoir bottleneck). */
  def sampleFixedSize(df: DataFrame, n: Int, seed: Long = 42L): DataFrame =
    df.withColumn("__r", rand(seed)).orderBy(col("__r")).limit(n).drop("__r")

  /** Sample.fixedSizePerKey(n): same trick per key. */
  def sampleFixedSizePerKey(df: DataFrame, keys: Seq[String], n: Int,
                            seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__r"))
    df.withColumn("__r", rand(seed))
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= n)
      .drop("__r", "__rank")
  }

  /** Deterministic fixed-size per-key "sample": top-n per key ordered by
    * md5 of the row identity. Unlike rand(seed) — whose stream is engine-
    * and partitioning-specific — this is reproducible across engines and
    * stable under repartitioning, which is what an auditable pipeline
    * sample needs at scale. */
  def samplePerKeyByHash(df: DataFrame, keys: Seq[String], n: Int,
                         idCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // coalesce each part: concat_ws silently DROPS nulls, which would
    // collide identities like (a,NULL,b)/(a,b) and diverge from engines
    // where || propagates NULL
    val h = md5(concat_ws("|",
      idCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__h"))
    df.withColumn("__h", h)
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= n)
      .drop("__h", "__rank")
  }

  /** Deterministic, engine-portable bucket in [0, buckets): md5 of the
    * id's decimal string, first 8 hex digits as an integer, mod buckets.
    * Stable under repartitioning and across engines — the property a
    * reproducible train/val/test assignment needs (rand(seed) is neither). */
  def hashBucket(id: Column, buckets: Int): Column = {
    require(buckets > 0, "buckets must be positive")
    // total over null ids: a null would otherwise propagate through the
    // hash and silently drop the row from every split/sample predicate
    // (oracle twin for non-null ids: md5(CAST(id AS VARCHAR)))
    val idStr = coalesce(id.cast("string"), lit("__graft_null__"))
    pmod(conv(substring(md5(idStr.cast("binary")), 1, 8), 16, 10)
      .cast("long"), lit(buckets.toLong))
  }

  /** Deterministic dataset split (train/val/test …): weights normalize to
    * bucket ranges over 10,000 hash buckets; every row lands in exactly
    * one split, membership is a pure function of the id. Returns one
    * DataFrame per weight, all filters over the same input (no shuffle —
    * the split predicate rides into the scan). */
  def hashSplit(df: DataFrame, idCol: String, weights: Seq[Double]): Seq[DataFrame] = {
    require(weights.nonEmpty && weights.forall(_ > 0), "weights must be positive")
    val buckets = 10000
    val total = weights.sum
    val bounds = weights.scanLeft(0.0)(_ + _)
      .map(w => math.round(w / total * buckets).toInt)
    val b = hashBucket(col(idCol), buckets)
    bounds.sliding(2).toSeq.map { case Seq(lo, hi) =>
      df.filter(b >= lo && b < hi)
    }
  }

  /** Deterministic weighted sampling WITHOUT replacement: k rows with
    * inclusion probability ∝ `weight` (Efraimidis–Spirakis A-Res, the
    * mergeable one-pass weighted reservoir), derandomized the way
    * [[hashBucket]] derandomizes Bernoulli draws — the uniform draw is
    * an md5-derived fraction of the id, so the sample is a pure
    * replayable function of the data: same rows on any engine, any
    * partitioning, any day. Each row gets an exponential key
    * −ln(u)/w (u from the first 52 md5 bits); the k SMALLEST keys are
    * the sample, which Spark plans as TakeOrderedAndProject — a
    * bounded per-partition heap + merge, never a global sort. Rows
    * with non-positive weight are excluded (they have no valid
    * exponential). The pretraining-mixture use: "sample 100k documents
    * ∝ quality·tokens" with an audit trail anyone can recompute. */
  def weightedSampleByHash(df: DataFrame, idCol: String, weight: Column,
                           k: Int): DataFrame = {
    require(k > 0, "sample size must be positive")
    val u = (conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 13),
      16, 10).cast("double") + 0.5) / 4503599627370496.0 // 2^52
    val key = -log(u) / weight.cast("double")
    // null ids have no hash identity (their key would sort NULLS FIRST
    // and hijack the sample) — excluded like non-positive weights
    df.filter(weight.cast("double") > 0.0 && col(idCol).isNotNull)
      .withColumn("__wkey", key)
      .orderBy(col("__wkey"), col(idCol))
      .limit(k)
      .drop("__wkey")
  }

  /** Per-key variant of [[weightedSampleByHash]]: k rows per key with
    * inclusion ∝ `weight` inside each key — "10 exemplar docs per
    * source, length-weighted". Same derandomized A-Res keys; selection
    * is a rank over a window PARTITIONED by the keys (each key's rank
    * runs in its own partition — never a global window). */
  def weightedSamplePerKeyByHash(df: DataFrame, keyCols: Seq[String],
                                 idCol: String, weight: Column,
                                 k: Int): DataFrame = {
    require(k > 0, "sample size must be positive")
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val u = (conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 13),
      16, 10).cast("double") + 0.5) / 4503599627370496.0
    val wkey = -log(u) / weight.cast("double")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__wkey"), col(idCol))
    df.filter(weight.cast("double") > 0.0 && col(idCol).isNotNull)
      .withColumn("__wkey", wkey)
      .withColumn("__rn", row_number().over(win))
      .filter(col("__rn") <= k)
      .drop("__wkey", "__rn")
  }

  /** Leakage-safe split: assign every member of a GROUP (near-dup
    * cluster, source domain, conversation thread …) to the same split,
    * by hashing the group's canonical representative (min id) through
    * the same 10,000-bucket machinery as [[hashSplit]]. Splitting
    * per-document leaks near-duplicates across train/test — the eval
    * set then contains soft copies of training documents and measured
    * loss is contaminated; splitting per-group is the fix, and keeping
    * the representative-hash scheme makes membership a pure replayable
    * function of the data. Returns `df` plus a `split` int column.
    *
    * Scale shape: one ids-only partial aggregation for representatives,
    * then one equi-join back on the group key (AQE skew-splittable —
    * a window over the group key would concentrate each mega-cluster
    * in one task with no skew remedy). */
  def splitByGroup(df: DataFrame, idCol: String, groupCol: String,
                   weights: Seq[Double]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_ > 0), "weights must be positive")
    val buckets = 10000
    val total = weights.sum
    val bounds = weights.scanLeft(0.0)(_ + _)
      .map(w => math.round(w / total * buckets).toInt)
    val reps = df.groupBy(col(groupCol)).agg(min(col(idCol)).as("__rep"))
    val b = hashBucket(col("__rep"), buckets)
    val splitCol = bounds.sliding(2).zipWithIndex
      .foldLeft(lit(-1): Column) { case (acc, (Seq(lo, hi), i)) =>
        when(b >= lo && b < hi, lit(i)).otherwise(acc)
      }
    // null-SAFE join: groupBy keeps a null group (its min id is a valid
    // representative), but a plain equi-join would drop those rows from
    // every split — every row must land in exactly one split, nulls too
    val assigned = reps.withColumn("split", splitCol).drop("__rep")
      .withColumnRenamed(groupCol, "__grp")
    df.join(assigned, col(groupCol) <=> col("__grp")).drop("__grp")
  }

  /** Deterministic stratified sample: per-stratum keep fraction,
    * membership a pure function of the id (the same 10,000-bucket md5
    * machinery as [[hashSplit]]). Unlike `DataFrame.stat.sampleBy` —
    * whose Bernoulli draw depends on partitioning and engine RNG — this
    * is reproducible across engines and stable under repartitioning,
    * which an auditable curation pipeline needs (e.g. "downsample web
    * crawl to 30%, keep all books"). Strata absent from `fractions` keep
    * `defaultFraction`; the filter is a pure predicate, so it rides into
    * the scan with no shuffle. */
  def stratifiedSampleByHash(df: DataFrame, strataCol: String, id: Column,
                             fractions: Map[String, Double],
                             defaultFraction: Double = 0.0): DataFrame = {
    require((fractions.values.toSeq :+ defaultFraction)
      .forall(f => f >= 0.0 && f <= 1.0), "fractions must be in [0,1]")
    val thr = fractions.toSeq.sortBy(_._1)
      .foldRight(lit(math.round(defaultFraction * 10000).toInt): Column) {
        case ((k, f), acc) =>
          when(col(strataCol) === k, math.round(f * 10000).toInt).otherwise(acc)
      }
    df.filter(hashBucket(id, 10000) < thr)
  }

  /** ApproximateUnique ([U] T/ApproximateUnique.java) → HLL++. */
  def approximateUnique(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)

  /** ApproximateQuantiles ([U] T/ApproximateQuantiles.java) → Greenwald-
    * Khanna QuantileSummaries built-in. */
  def approximateQuantiles(c: Column, quantiles: Seq[Double],
                           accuracy: Int = 10000): Column =
    percentile_approx(c, array(quantiles.map(lit): _*), lit(accuracy))

  /** Single-quantile scalar form of [[approximateQuantiles]]. */
  def approximateQuantile(c: Column, quantile: Double,
                          accuracy: Int = 10000): Column =
    percentile_approx(c, lit(quantile), lit(accuracy))

  /** EXACT weighted median per key — the smallest value v whose
    * cumulative weight reaches half the key's total (the lower
    * weighted median; unlike [[approximateQuantile]] this is exact and
    * weight-aware, the "median price weighted by units sold" form).
    *
    * Scale posture: first collapse to one row per (key, value) — the
    * hash aggregation does the heavy lifting, and the per-key window
    * that follows only sees DISTINCT values of that key (bounded by
    * value cardinality, not row count). The half-total test is exact:
    * weights accumulate as DECIMAL(18,4) sums and the comparison is
    * 2·cum ≥ total in decimal — no float boundary to flip.
    *
    * @return (keys…, median, total_w) — total_w as double (one cast
    *         from the exact decimal total)
    */
  def weightedMedianPerKey(df: DataFrame, keys: Seq[String],
                           value: Column, weight: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keys.nonEmpty, "weightedMedianPerKey needs grouping keys " +
      "(wrap a constant key for a global median)")
    val kc = keys.map(col)
    val perV = df.groupBy(kc :+ value.as("__v"): _*)
      .agg(sum(weight.cast("decimal(18,4)")).as("__w"))
    val wRun = Window.partitionBy(kc: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(kc: _*)
    perV
      .withColumn("__cum", sum(col("__w")).over(wRun))
      .withColumn("__tot", sum(col("__w")).over(wAll))
      .filter(col("__cum") * 2 >= col("__tot"))
      .groupBy(kc: _*)
      .agg(min(col("__v")).as("median"),
        min(col("__tot")).cast("double").as("total_w"))
  }

  /** MERGEABLE distinct-count sketch (SURVEY §4 optional row: sketch
    * columns): build per-group HLL sketches as binary columns, union them
    * across groups later — the pre-aggregate-once, re-aggregate-anywhere
    * pattern sketch warehouses rely on at scale. Spark 4 built-ins
    * (Datasketches-compatible HllSketch under the hood). */
  def hllSketch(c: Column, lgConfigK: Int = 12): Column =
    hll_sketch_agg(c, lit(lgConfigK))

  /** Union previously built sketches; estimate with [[hllEstimate]]. */
  def hllUnion(sketch: Column): Column = hll_union_agg(sketch)

  /** Cardinality estimate of a sketch column. */
  def hllEstimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** Combine.perKey(...).withHotKeyFanout ([U] T/Combine.java): two-stage
    * salted aggregation for skewed keys. Stage 1 aggregates (key, salt)
    * partials across `fanout` buckets; stage 2 merges per key. Use when one
    * key dominates and even map-side partials overwhelm a single reducer.
    * The salt must vary PER ROW — a per-partition salt collapses to what
    * map-side partials already give, and a row-CONTENT hash collapses when
    * the hot key's rows are identical (the common skew case). A
    * monotonically increasing row id round-robins every physical row
    * across the fanout regardless of content. */
  def sumWithHotKeyFanout(df: DataFrame, keys: Seq[String], value: Column,
                          fanout: Int): DataFrame = {
    val salted = df.withColumn(
      "__salt", pmod(monotonically_increasing_id(), lit(fanout)))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(value).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("sum"))
  }

  /** CombineWithContext ([U] T/CombineWithContext.java): a CombineFn whose
    * logic reads a side input. Spark-native rendering: the context value is
    * broadcast once and the returned CombineFn closes over the broadcast
    * handle, so every executor reads it locally — no per-row shipping, no
    * driver round-trips. */
  def withContext[I, A, O, C](spark: org.apache.spark.sql.SparkSession, context: C)(
      mk: org.apache.spark.broadcast.Broadcast[C] => CombineFn[I, A, O])(
      implicit ct: ClassTag[C]): CombineFn[I, A, O] =
    mk(spark.sparkContext.broadcast(context))

  /** Distributed global prefix sum: appends `cumCol` = inclusive running
    * total of `value` in `orderCols` order. The naive rendering — a window
    * over an unpartitioned `Window.orderBy` — moves the ENTIRE dataset to
    * one task; this is the scale-correct shape instead:
    *
    *  1. range-repartition on the order (Spark's distributed-sort
    *     machinery: sampled boundaries, equal keys co-located);
    *  2. per-range-partition running sum (window inside each partition —
    *     no cross-partition data motion);
    *  3. per-partition totals → exclusive offsets (a window over
    *     ≤ `spark.sql.shuffle.partitions` rows — trivially small) joined
    *     back via broadcast.
    *
    * The two reads of the ranged frame are identical subtrees of one
    * query, so Spark's exchange reuse executes the range shuffle once.
    * Exact for integral values; for floating-point the addition grouping
    * follows the sampled range boundaries (sum is order-sensitive in the
    * last ulp). */
  def prefixSum(df: DataFrame, orderCols: Seq[Column], value: Column,
                cumCol: String = "cum", numPartitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // When `value` is already a bare column of df, do NOT alias a second
    // copy: `Project[..., tokens, tokens AS __v]` blocks CollapseProject
    // (inlining would duplicate the expensive upstream expression), the
    // two exchange branches then collapse DIFFERENTLY, stop canonicalizing
    // equal, and exchange reuse fails — re-executing the whole scan +
    // scoring + range-sampling pipeline for the offsets read. Reusing the
    // existing attribute keeps both branches byte-identical below the
    // exchange. The fast path requires the expression to RESOLVE to a
    // bare attribute (not merely have a toString matching a column name:
    // lit(1) next to a column named "1" must not silently substitute the
    // column), and the temp-column path picks a name that cannot clobber
    // an input column literally named "__v".
    val bareName =
      org.apache.spark.sql.graftglue.GraftSqlBridge.bareAttributeName(value)
    val (ranged0, vcol, vName, tempCol) = bareName.filter(df.columns.contains) match {
      case Some(n) => (df, col(n), n, false)
      case None =>
        val fresh = Iterator.from(0).map(i => if (i == 0) "__v" else s"__v$i")
          .find(n => !df.columns.contains(n)).get
        (df.withColumn(fresh, value), col(fresh), fresh, true)
    }
    // numPartitions = 0: planner default (AQE may coalesce small inputs);
    // explicit value pins the fan-out (AQE honors user-specified counts)
    val ranged = (if (numPartitions > 0)
      ranged0.repartitionByRange(numPartitions, orderCols: _*)
    else ranged0.repartitionByRange(orderCols: _*))
      .withColumn("__pid", spark_partition_id())
    // the first(...) aggregates exist ONLY to reference every remaining
    // column: without them the optimizer prunes this branch's columns
    // below the range exchange, the two exchange subplans stop
    // canonicalizing equal, reuse fails, and the WHOLE upstream pipeline
    // executes twice — the exact 2x corpus scan PlanSpec's reuse rule now
    // forbids. Cost: k discarded values per partition.
    val keepAll = ranged.columns.filterNot(c => c == "__pid" || c == vName)
      .map(c => first(col(c)).as(s"__keep_$c"))
    val offsets = ranged.groupBy(col("__pid"))
      .agg(sum(vcol).as("__ps"), keepAll.toIndexedSeq: _*)
      .withColumn("__off", coalesce(
        // constant partition key: this frame is one row PER PARTITION
        // (≤ shuffle-partition count), so the single-partition window is
        // bounded by construction. pmod(pid, 1) ≡ 0 but is column-derived,
        // so EliminateWindowPartitions can't fold it back into the
        // unpartitioned form that WindowExec (and our plan audit) flags.
        sum(col("__ps")).over(
          Window.partitionBy(pmod(col("__pid"), lit(1))).orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
      .select(col("__pid"), col("__off"))
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = ranged.join(broadcast(offsets), Seq("__pid"))
      .withColumn(cumCol, sum(vcol).over(w) + col("__off"))
      .drop("__pid", "__off")
    if (tempCol) joined.drop(vName) else joined
  }

  /** Global 1-based rank in `orderCols` order — the value-agnostic fast
    * path of [[prefixSum]] (cum of 1 per row). Where prefixSum must run a
    * per-partition running-sum WINDOW (which forces a second full-data
    * exchange to hash-distribute on the partition id), a pure rank falls
    * out of physical row position: range-partition, sort WITHIN
    * partitions (no shuffle), and read the local row number off
    * `monotonically_increasing_id` (its scaladoc guarantees consecutive
    * ids within a partition). Global rank = broadcast per-partition
    * offsets + local index. ONE exchange of the data total, no wide
    * window, no per-partition sort beyond what the rank semantics demand.
    */
  def prefixRank(df: DataFrame, orderCols: Seq[Column],
                 rankCol: String = "rank"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranged = df.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", spark_partition_id())
    // per-partition (count, first-id): ≤ shuffle-partition-count rows.
    // min(__mid) anchors the local index without assuming mid's bit
    // layout; the exclusive running count is the same bounded
    // constant-partition-key window device as prefixSum's offsets.
    val offsets = ranged.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__pn"), min(col("__mid")).as("__mmin"))
      .withColumn("__off", coalesce(
        sum(col("__pn")).over(
          Window.partitionBy(pmod(col("__pid"), lit(1))).orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__mmin"), col("__off"))
    ranged.join(broadcast(offsets), Seq("__pid"))
      .withColumn(rankCol, col("__off") + (col("__mid") - col("__mmin")) + 1)
      .drop("__mid", "__pid", "__pn", "__mmin", "__off")
  }

  /** Scale-safe per-key ntile: equal-count bins per key WITHOUT a per-key
    * window sort. `Window.partitionBy(key)` ntile moves each key's entire
    * population into one task — for low-cardinality keys (languages,
    * sources, tiers: the curriculum-binning case) that is one task per
    * 1/k-th of the corpus. This rides [[prefixRank]]'s physical device —
    * ONE range exchange of the data, local sorts, local row position off
    * `monotonically_increasing_id` — and applies ntile's bin arithmetic
    * (first n mod k bins one larger) — identical output to the window
    * form, asserted in CombineSpec.
    *
    * Everything else derives from ONE aggregation over the (reused)
    * exchange output: a per-(partition, key) "slice" row carrying its
    * count and first local id. Global row order equals (__pid, keys…)
    * slice order, so the exclusive running count over slices is each
    * slice's global start, its per-key minimum is the key's start, and
    * the per-key sum is the key's population — per-partition offsets AND
    * per-key stats from the same pass, where separate branches would
    * each rescan the corpus. The slices frame is ≤ partitions ×
    * keys-per-partition rows — broadcast sized, small by the same
    * contract as [[Mixture]]'s domains. High-cardinality keys don't need
    * this: their per-key windows are small, use ntile directly. */
  def ntilePerKey(df: DataFrame, keys: Seq[String], order: Seq[Column],
                  k: Int, binCol: String = "bin"): DataFrame = {
    require(k > 0, "ntile bucket count must be positive")
    import org.apache.spark.sql.expressions.Window
    val kc = keys.map(col)
    val ranged = df.repartitionByRange(kc ++ order: _*)
      .sortWithinPartitions(kc ++ order: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", spark_partition_id())
    // windows on the tiny slices frame only: the running sum rides the
    // constant-partition-key device (same as prefixSum's offsets), the
    // per-key aggregates partition by the keys
    val slices = ranged.groupBy((col("__pid") +: kc): _*)
      .agg(count(lit(1)).as("__sn"), min(col("__mid")).as("__smin"))
      .withColumn("__soff", coalesce(
        sum(col("__sn")).over(
          Window.partitionBy(pmod(col("__pid"), lit(1)))
            .orderBy(col("__pid") +: kc: _*)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__kn", sum(col("__sn")).over(Window.partitionBy(kc: _*)))
      .withColumn("__koff",
        min(col("__soff")).over(Window.partitionBy(kc: _*)))
    // null-safe key join back: a plain equi-join would DROP null-key
    // rows, where the window form bins the null key as its own partition
    val renamed = keys.foldLeft(slices) { (d, kname) =>
      d.withColumnRenamed(kname, s"__k_$kname")
    }.withColumnRenamed("__pid", "__spid")
    val cond = (col("__pid") === col("__spid")) &&
      keys.map(kname => col(kname) <=> col(s"__k_$kname")).reduce(_ && _)
    // per-key 1-based rank = slice's global start − key's start + local
    // row index. Integer division throughout (SQL `div`, not `/`):
    // Spark's `/` on longs routes through doubles, exact only below 2^53
    // — fine in practice but wrong in principle for a function advertised
    // as scale-safe. `div` is exact over the full long range; it is only
    // reachable via expr(), hence the named temp columns.
    // lazy branches: when n < k, q = 0 and every row satisfies the first
    // branch (r ≤ rem), so the q-division in the otherwise never runs
    ranged.join(broadcast(renamed), cond)
      .withColumn("__r",
        col("__soff") - col("__koff") + (col("__mid") - col("__smin")) + 1)
      .withColumn("__q", expr(s"__kn div ${k}L"))
      .withColumn("__rem", col("__kn") % k)
      .withColumn(binCol, when(col("__r") <= col("__rem") * (col("__q") + 1),
          expr("(__r - 1) div (__q + 1)") + 1)
        .otherwise(col("__rem") + expr("(__r - 1 - __rem * (__q + 1)) div __q") + 1))
      .drop(keys.map(kname => s"__k_$kname"): _*)
      .drop("__mid", "__pid", "__spid", "__sn", "__smin", "__soff",
        "__kn", "__koff", "__r", "__q", "__rem")
  }

  /** Top-k CombineFn (bounded min-heap) for the typed path — the direct
    * analogue of Top.TopCombineFn's bounded heap. */
  final class TopKFn[T: Ordering: ClassTag](k: Int) extends CombineFn[T, Seq[T], Seq[T]] {
    // Beam's Top validates count too; without this, k = 0 would make
    // addInput call acc.head on an empty accumulator
    require(k > 0, s"TopKFn: k must be positive (got $k)")
    private val ord = implicitly[Ordering[T]]
    // accumulator invariant: sorted ASCENDING, size ≤ k, head = current min
    def createAccumulator(): Seq[T] = Vector.empty
    def addInput(acc: Seq[T], in: T): Seq[T] =
      if (acc.length < k) insert(acc, in)
      else if (ord.lteq(in, acc.head)) acc // below the bar: O(1) reject
      else insert(acc.tail, in)
    def mergeAccumulators(a: Seq[T], b: Seq[T]): Seq[T] =
      (a ++ b).sorted(ord).takeRight(k)
    def extractOutput(acc: Seq[T]): Seq[T] = acc.reverse
    private def insert(xs: Seq[T], in: T): Seq[T] = {
      // binary-search insertion keeps addInput O(log k + k) copy instead
      // of the former full O(k log k) re-sort per element
      var lo = 0; var hi = xs.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ord.lt(xs(mid), in)) lo = mid + 1 else hi = mid
      }
      (xs.take(lo) :+ in) ++ xs.drop(lo)
    }
  }
}

