package graft.operators

import graft.SparkSpec
import graft.operators.Combine._
import org.apache.spark.sql.functions.{col, countDistinct, first, min, when}

class CombineSpec extends SparkSpec {
  import spark.implicits._

  /** Beam's canonical Mean CombineFn shape: accumulator = (sum, count). */
  object MeanFn extends CombineFn[Double, (Double, Long), Double] {
    def createAccumulator(): (Double, Long) = (0.0, 0L)
    def addInput(acc: (Double, Long), in: Double): (Double, Long) = (acc._1 + in, acc._2 + 1)
    def mergeAccumulators(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    def extractOutput(acc: (Double, Long)): Double =
      if (acc._2 == 0) 0.0 else acc._1 / acc._2
  }

  test("Combine.globally folds to one value") {
    assert(Combine.globally(Seq(1.0, 2.0, 3.0, 4.0).toDS(), MeanFn) == 2.5)
  }

  test("Combine.perKey folds per key with partial aggregation") {
    val out = Combine.perKey(Seq(("a", 1.0), ("a", 3.0), ("b", 10.0)).toDS(), MeanFn)
    assertInAnyOrder(out.collect().toSeq, Seq(("a", 2.0), ("b", 10.0)))
  }

  test("TopKFn keeps a bounded heap and merges correctly") {
    val fn = new TopKFn[Int](3)
    val acc = Seq(5, 1, 9, 3).foldLeft(fn.createAccumulator())(fn.addInput)
    val acc2 = Seq(7, 2).foldLeft(fn.createAccumulator())(fn.addInput)
    assert(fn.extractOutput(fn.mergeAccumulators(acc, acc2)) == Seq(9, 7, 5))
  }

  test("topGlobal / topPerKey") {
    val df = Seq(("a", 3), ("a", 1), ("a", 7), ("b", 5), ("b", 2)).toDF("k", "v")
    assertInAnyOrder(
      Combine.topGlobal(df, 2, org.apache.spark.sql.functions.col("v").desc)
        .as[(String, Int)].collect().toSeq,
      Seq(("a", 7), ("b", 5)))
    assertInAnyOrder(
      Combine.topPerKey(df, Seq("k"), 2, org.apache.spark.sql.functions.col("v").desc)
        .as[(String, Int)].collect().toSeq,
      Seq(("a", 7), ("a", 3), ("b", 5), ("b", 2)))
  }

  test("counts: globally, perKey, perElement") {
    val df = Seq("x", "y", "x", "x").toDF("v")
    assert(Combine.countGlobally(df).as[Long].head() == 4L)
    assertInAnyOrder(Combine.countPerKey(df, Seq("v")).as[(String, Long)].collect().toSeq,
      Seq(("x", 3L), ("y", 1L)))
    assertInAnyOrder(Combine.countPerElement(df).as[(String, Long)].collect().toSeq,
      Seq(("x", 3L), ("y", 1L)))
  }

  test("sampleAny / sampleFixedSize / sampleFixedSizePerKey sizes") {
    val df = spark.range(100).toDF("v")
    assert(Combine.sampleAny(df, 7).count() == 7)
    assert(Combine.sampleFixedSize(df, 10).count() == 10)
    // deterministic under a fixed seed
    assert(Combine.sampleFixedSize(df, 10, seed = 1).as[Long].collect().toSeq ==
           Combine.sampleFixedSize(df, 10, seed = 1).as[Long].collect().toSeq)
    val keyed = spark.range(100).selectExpr("id % 4 as k", "id as v")
    val per = Combine.sampleFixedSizePerKey(keyed, Seq("k"), 5)
    assert(per.count() == 20)
    assert(per.groupBy("k").count().select("count").as[Long].collect().forall(_ == 5L))
  }

  test("hot-key fanout sum equals plain sum") {
    val df = spark.range(1000).selectExpr("id % 3 as k", "cast(id as double) as v")
    val fanned = Combine.sumWithHotKeyFanout(df, Seq("k"), $"v", fanout = 8)
      .as[(Long, Double)].collect().toMap
    val plain = df.groupBy("k").sum("v").as[(Long, Double)].collect().toMap
    assert(fanned == plain)
  }

  test("CombineWithContext: combine logic reads a broadcast side input") {
    val scaled = Combine.withContext(spark, 10.0) { bc =>
      new CombineFn[Double, Double, Double] {
        def createAccumulator(): Double = 0.0
        def addInput(acc: Double, in: Double): Double = acc + in
        def mergeAccumulators(a: Double, b: Double): Double = a + b
        def extractOutput(acc: Double): Double = acc * bc.value
      }
    }
    assert(Combine.globally(Seq(1.0, 2.0, 3.0).toDS(), scaled) == 60.0)
    val perKey = Combine.perKey(Seq(("a", 1.0), ("b", 2.0)).toDS(), scaled)
    assertInAnyOrder(perKey.collect().toSeq, Seq(("a", 10.0), ("b", 20.0)))
  }

  test("samplePerKeyByHash: size-exact, deterministic, engine-portable order") {
    val keyed = spark.range(100).selectExpr("id % 4 as k", "id as v")
    val s1 = Combine.samplePerKeyByHash(keyed, Seq("k"), 5, Seq("k", "v"))
    assert(s1.count() == 20)
    val s2 = Combine.samplePerKeyByHash(keyed, Seq("k"), 5, Seq("k", "v"))
    assert(s1.as[(Long, Long)].collect().sorted.toSeq ==
           s2.as[(Long, Long)].collect().sorted.toSeq)
  }

  test("hashSplit: disjoint, covering, deterministic, ~weight-proportional") {
    val df = spark.range(10000).toDF("id")
    val parts = Combine.hashSplit(df, "id", Seq(0.8, 0.1, 0.1))
    val sets = parts.map(_.select("id").as[Long].collect().toSet)
    assert(sets.map(_.size).sum == 10000)                 // covering
    assert(sets.combinations(2).forall { case Seq(a, b) => (a & b).isEmpty })
    assert(math.abs(sets(0).size - 8000) < 300)           // ~80%
    assert(math.abs(sets(1).size - 1000) < 150)
    // re-running produces the identical assignment (pure fn of id)
    val again = Combine.hashSplit(df, "id", Seq(0.8, 0.1, 0.1))
      .map(_.select("id").as[Long].collect().toSet)
    assert(again == sets)
  }

  test("weightedSampleByHash: ≡ scalar A-Res reference; partition-invariant; ∝ weight") {
    val df = spark.range(2000).toDF("id")
      .withColumn("w", when(col("id") % 10 === 0, 20.0).otherwise(1.0))
    val out = Combine.weightedSampleByHash(df, "id", col("w"), 300)
      .select("id").as[Long].collect().toSet
    assert(out.size == 300)
    // scalar reference: identical md5-fraction keys, bottom-k
    def key(id: Long, w: Double): Double = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md5.map("%02x".format(_)).mkString.take(13)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4503599627370496.0
      -math.log(u) / w
    }
    val ref = (0L until 2000L)
      .map(i => (i, key(i, if (i % 10 == 0) 20.0 else 1.0)))
      .sortBy { case (i, k) => (k, i) }.take(300).map(_._1).toSet
    assert(out == ref)
    // repartitioning cannot change a pure function of the data
    val again = Combine.weightedSampleByHash(df.repartition(13), "id", col("w"), 300)
      .select("id").as[Long].collect().toSet
    assert(again == out)
    // weight-20 items are 10% of rows; ∝-weight sampling must pull them
    // far above 10% of the sample (exact value fixed by the hash)
    val heavy = out.count(_ % 10 == 0)
    assert(heavy > 75, s"heavy stratum underrepresented: $heavy/300")
  }

  test("weightedSampleByHash excludes non-positive weights") {
    val df = spark.range(100).toDF("id")
      .withColumn("w", when(col("id") < 50, -1.0).otherwise(2.0))
    val out = Combine.weightedSampleByHash(df, "id", col("w"), 100)
      .select("id").as[Long].collect()
    assert(out.length == 50 && out.forall(_ >= 50))
  }

  test("splitByGroup: whole groups move together; singleton groups ≡ hashSplit") {
    // ids 0..9999 in groups of 4 (group = id/4): all 4 members must share
    // a split, and the split must be the one the group's min id hashes to
    val df = spark.range(10000).toDF("id")
      .withColumn("grp", (col("id") / 4).cast("long"))
    val assigned = Combine.splitByGroup(df, "id", "grp", Seq(0.8, 0.1, 0.1))
    val perGroup = assigned.groupBy("grp")
      .agg(countDistinct(col("split")).as("ns"), min(col("id")).as("rep"),
        first(col("split")).as("split"))
      .collect()
    assert(perGroup.forall(_.getLong(1) == 1L), "a group straddles splits")
    // representative-hash agreement with hashSplit on the reps alone
    val repSplit = perGroup.map(r => r.getLong(2) -> r.getInt(3)).toMap
    val repsDf = spark.createDataset(repSplit.keySet.toSeq).toDF("id")
    val expected = Combine.hashSplit(repsDf, "id", Seq(0.8, 0.1, 0.1))
      .zipWithIndex.flatMap { case (p, i) =>
        p.as[Long].collect().map(_ -> i)
      }.toMap
    assert(repSplit == expected)
    // proportions hold at the group level
    val bySplit = assigned.groupBy("split").count().as[(Int, Long)].collect().toMap
    assert(math.abs(bySplit(0) - 8000) < 1200)
  }

  test("hashSplit and samplers are total over null ids (no silent row loss)") {
    val df = Seq[(Option[Long], Double)]((Some(1L), 2.0), (None, 3.0), (Some(2L), 4.0))
      .toDF("id", "w")
    val parts = Combine.hashSplit(df, "id", Seq(0.5, 0.5))
    assert(parts.map(_.count()).sum == 3L, "a null id fell out of every split")
    // weighted samplers EXCLUDE null ids (documented: no hash identity) —
    // but deterministically, not via a null-key sort accident
    val s = Combine.weightedSampleByHash(df, "id", col("w"), 3)
      .select("id").as[Option[Long]].collect()
    assert(s.length == 2 && s.forall(_.isDefined))
  }

  test("splitByGroup keeps null-group rows (null-safe join), all in one split") {
    val df = Seq[(Long, Option[String])](
      (1L, Some("g1")), (2L, None), (3L, None), (4L, Some("g2")))
      .toDF("id", "grp")
    val out = Combine.splitByGroup(df, "id", "grp", Seq(0.5, 0.5))
      .select("id", "split").as[(Long, Int)].collect().toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L), "rows were dropped")
    // the null group is ONE group: both its members share a split
    assert(out(2L) == out(3L))
  }

  test("stratifiedSampleByHash: per-stratum rates, deterministic, scan-side filter") {
    val df = spark.range(12000)
      .selectExpr("id", "CASE id % 3 WHEN 0 THEN 'a' WHEN 1 THEN 'b' ELSE 'c' END AS s")
    val sampled = Combine.stratifiedSampleByHash(df, "s", $"id",
      Map("a" -> 0.5, "b" -> 0.1), defaultFraction = 1.0)
    val counts = sampled.groupBy("s").count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(counts("a") - 2000) < 200)   // 50% of 4000
    assert(math.abs(counts("b") - 400) < 100)    // 10% of 4000
    assert(counts("c") == 4000)                  // default keeps all
    // pure function of id: identical assignment on re-run
    val again = Combine.stratifiedSampleByHash(df, "s", $"id",
      Map("a" -> 0.5, "b" -> 0.1), defaultFraction = 1.0)
    assert(again.select("id").as[Long].collect().sorted.toSeq ==
           sampled.select("id").as[Long].collect().sorted.toSeq)
    // a pure predicate: no shuffle (Exchange) in the plan
    val plan = sampled.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sample should not shuffle:\n$plan")
  }

  test("mergeable HLL sketches: union of partial sketches ≈ global distinct") {
    val df = spark.range(20000).selectExpr("id % 7 as seg", "id % 9999 as v")
    val partial = df.groupBy("seg").agg(Combine.hllSketch($"v").as("sk"))
    val merged = partial.agg(
      Combine.hllEstimate(Combine.hllUnion($"sk"))).as[Long].head()
    assert(math.abs(merged - 9999) < 500, s"estimate $merged too far from 9999")
  }

  test("approximate aggregates are within tolerance") {
    val df = spark.range(10000).toDF("v")
    val approx = df.select(Combine.approximateUnique($"v", 0.02)).as[Long].head()
    assert(math.abs(approx - 10000) < 600)
    val qs = df.select(Combine.approximateQuantiles($"v", Seq(0.5)))
      .as[Seq[Long]].head()
    assert(math.abs(qs.head - 5000) < 200)
  }

  test("ntilePerKey ≡ window ntile, including n < k, uneven and NULL keys") {
    import org.apache.spark.sql.expressions.Window
    val rng = new scala.util.Random(7)
    // uneven key sizes incl. one key smaller than k and a NULL key group
    // (window ntile bins the null partition like any other — the
    // null-safe join must not drop it)
    val rows = (Seq.fill(103)("a") ++ Seq.fill(41)("b") ++ Seq.fill(2)("c") ++
        Seq.fill(9)(null: String))
      .zipWithIndex.map { case (k, i) => (k, i.toLong, rng.nextInt(10)) }
    val df = rows.toDF("key", "id", "v")
    for (k <- Seq(1, 3, 4, 7)) {
      val got = Combine.ntilePerKey(df, Seq("key"), Seq($"v", $"id"), k)
        .select($"key", $"id", $"bin").as[(String, Long, Long)]
        .collect().toSet
      val w = Window.partitionBy($"key").orderBy($"v", $"id")
      val want = df.withColumn("bin",
        org.apache.spark.sql.functions.ntile(k).over(w).cast("long"))
        .select($"key", $"id", $"bin").as[(String, Long, Long)]
        .collect().toSet
      assert(got == want, s"k=$k")
    }
  }

  test("weightedMedianPerKey: exact half-total boundary picks the lower median") {
    val df = Seq(
      // key a: weights 1,1 over values 10,20 -> cum(10)=1, 2*1 >= 2 exactly,
      // so the LOWER median 10 wins (the boundary case a float sum could flip)
      ("a", 10.0, 1.0), ("a", 20.0, 1.0),
      // key b: duplicate values collapse; median where cum crosses half
      ("b", 1.0, 1.0), ("b", 1.0, 1.0), ("b", 5.0, 1.0), ("b", 9.0, 0.5),
      // key c: one dominant weight owns the median outright
      ("c", 3.0, 10.0), ("c", 100.0, 1.0))
      .toDF("k", "v", "w")
    val out = weightedMedianPerKey(df, Seq("k"), col("v"), col("w"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out == Map(
      "a" -> (10.0, 2.0), "b" -> (1.0, 3.5), "c" -> (3.0, 11.0)))
  }

  test("weightedMedianPerKey matches a scalar reference on seeded data") {
    val rnd = new scala.util.Random(31)
    val rows = (0 until 500).map { i =>
      (s"k${i % 5}", rnd.nextInt(50).toDouble, (rnd.nextInt(40) + 1) / 4.0)
    }
    val got = weightedMedianPerKey(rows.toDF("k", "v", "w"), Seq("k"),
        col("v"), col("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for ((k, g) <- rows.groupBy(_._1)) {
      // scalar lower weighted median over exact 0.25-granular weights
      val byV = g.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
      val tot = byV.map(_._2).sum
      var cum = 0.0
      val want = byV.find { case (_, w) => cum += w; 2 * cum >= tot }.get._1
      assert(got(k) == want, k)
    }
  }
}
