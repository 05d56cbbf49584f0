package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    // 800 docs in domain a, 150 in b, 50 in c
    val rows = (1L to 1000L).map { i =>
      val d = if (i <= 800) "a" else if (i <= 950) "b" else "c"
      (i, d)
    }
    rows.toDF("doc_id", "domain")
  }

  test("sampleByRates: deterministic, rate-respecting, subset-stable") {
    val once = Mixture.sampleByRates(corpus, "doc_id", "domain",
      Map("a" -> 0.25, "b" -> 1.0), defaultRate = 0.0)
    val ids = once.select("doc_id").as[Long].collect().toSet
    val again = Mixture.sampleByRates(corpus, "doc_id", "domain",
      Map("a" -> 0.25, "b" -> 1.0), defaultRate = 0.0)
      .select("doc_id").as[Long].collect().toSet
    assert(ids === again, "membership must be a pure function of the id")
    // full-rate domain kept whole, zero-rate domain dropped
    assert(ids.count(i => i > 800 && i <= 950) === 150)
    assert(!ids.exists(_ > 950))
    // hash sampling at 25%: expect ~200 of 800, generous tolerance
    val na = ids.count(_ <= 800)
    assert(na > 120 && na < 280, s"rate 0.25 of 800 kept $na")
    // a higher rate keeps a superset (threshold sampling is nested)
    val more = Mixture.sampleByRates(corpus, "doc_id", "domain",
      Map("a" -> 0.5, "b" -> 1.0), defaultRate = 0.0)
      .select("doc_id").as[Long].collect().toSet
    assert(ids.subsetOf(more), "raising a rate must only add rows")
  }

  test("rebalanceRates: targets shares, caps small domains at 1.0") {
    val rates = Mixture.rebalanceRates(corpus, "domain",
      Map("a" -> 0.4, "b" -> 0.3, "c" -> 0.3), outFraction = 0.5)
    // a: 0.5*1000*0.4/800 = 0.25; b: 0.5*1000*0.3/150 = 1.0; c: capped
    assert(rates("a") === 0.25)
    assert(rates("b") === 1.0)
    assert(rates("c") === 1.0, "undersized domain is kept whole, not upsampled")
    // unknown domain → rate 0
    val r2 = Mixture.rebalanceRates(corpus, "domain",
      Map("zz" -> 1.0), outFraction = 0.5)
    assert(r2("zz") === 0.0)
  }

  test("temperatureRates: alpha=1 is natural, alpha=0 is uniform, caps at 1") {
    // alpha=1 → share_d = n_d/N → rate = outFraction everywhere
    val r1 = Mixture.temperatureRates(corpus, "domain", alpha = 1.0, outFraction = 0.5)
    assert(r1.values.forall(r => math.abs(r - 0.5) < 1e-12))
    // alpha=0 → uniform shares → small domains up-weighted, capped at 1
    val r0 = Mixture.temperatureRates(corpus, "domain", alpha = 0.0, outFraction = 0.5)
    // share = 1/3 each; a: 0.5*1000/3/800 = 0.2083…; c: 0.5*1000/3/50 > 1 → cap
    assert(math.abs(r0("a") - 500.0 / 3.0 / 800.0) < 1e-12)
    assert(r0("c") === 1.0)
    // monotone: smaller alpha gives small domains a higher rate
    val rHalf = Mixture.temperatureRates(corpus, "domain", alpha = 0.5, outFraction = 0.5)
    assert(rHalf("c") >= r1("c") && rHalf("a") <= 1.0)
  }

  test("uncapped temperature rates compose with the epoch upsampler") {
    // alpha=0, uniform shares: domain c (50 of 1000 rows) gets rate
    // 0.5·1000/3/50 = 10/3 > 1 — reachable only with capAtOne = false
    val rates = Mixture.temperatureRates(corpus, "domain", alpha = 0.0,
      outFraction = 0.5, capAtOne = false)
    assert(math.abs(rates("c") - 10.0 / 3.0) < 1e-12)
    val out = Mixture.sampleByRatesWithRepeats(corpus, "doc_id", "domain",
        rates, defaultRate = 0.0)
      .filter($"domain" === "c")
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    // every c row repeats 3 or 4 times (⌊10/3⌋ = 3 + fractional extra)
    assert(out.size === 50)
    assert(out.values.forall(n => n == 3L || n == 4L))
    assert(out.values.exists(_ == 4L), "fractional epochs must fire for some rows")
  }

  test("sampleByRatesWithRepeats: integer rates repeat exactly, fractions are deterministic") {
    // rate 3.0: every domain-b row appears exactly 3 times, epochs 0,1,2
    val out = Mixture.sampleByRatesWithRepeats(corpus, "doc_id", "domain",
      Map("a" -> 0.25, "b" -> 3.0), defaultRate = 0.0)
    val rows = out.select("doc_id", "epoch").as[(Long, Long)].collect()
    val byId = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val bIds = byId.keySet.filter(i => i > 800 && i <= 950)
    assert(bIds.size === 150)
    assert(bIds.forall(i => byId(i) == Seq(0L, 1L, 2L)))
    assert(!byId.keySet.exists(_ > 950)) // defaultRate 0 drops domain c
    // fractional part ≤ 1 degrades to sampleByRates membership + epoch 0
    val plain = Mixture.sampleByRates(corpus, "doc_id", "domain",
      Map("a" -> 0.25), defaultRate = 0.0)
      .select("doc_id").as[Long].collect().toSet
    val aIds = byId.keySet.filter(_ <= 800)
    assert(aIds === plain)
    assert(aIds.forall(i => byId(i) == Seq(0L)))
    // expected-copies arithmetic: rate 2.5 of domain b gives every row 2
    // copies plus a deterministic ~half an extra one
    val up = Mixture.sampleByRatesWithRepeats(corpus, "doc_id", "domain",
      Map("b" -> 2.5), defaultRate = 0.0)
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(up.values.forall(n => n == 2L || n == 3L))
    val extras = up.values.count(_ == 3L)
    assert(extras > 40 && extras < 110, s"~75 of 150 expected an extra copy, got $extras")
  }

  test("sampleByRatesWithRepeats rejects inputs that already carry its output columns") {
    Seq("epoch", "__n").foreach { c =>
      val clash = corpus.withColumn(c, lit(99L))
      val e = intercept[IllegalArgumentException] {
        Mixture.sampleByRatesWithRepeats(clash, "doc_id", "domain", Map("a" -> 2.0))
      }
      assert(e.getMessage.contains(c), s"guard for $c")
    }
  }

  test("sampleByRates plan: scan-side predicate, no shuffle or join") {
    val sampled = Mixture.sampleByRates(corpus, "doc_id", "domain",
      Map("a" -> 0.5), defaultRate = 0.1)
    assertNoCartesian(sampled)
    val plan = sampled.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"mixture filter must not shuffle:\n$plan")
  }

  // weighted corpus: same doc counts, but domain a's docs carry weight 1
  // and domain c's carry weight 100 — token-mass order inverts doc-count
  // order between them (a: 800 mass, b: 150·10=1500, c: 50·100=5000)
  private def weighted = {
    val rows = (1L to 1000L).map { i =>
      val (d, w) = if (i <= 800) ("a", 1L) else if (i <= 950) ("b", 10L) else ("c", 100L)
      (i, d, w)
    }
    rows.toDF("doc_id", "domain", "wt")
  }

  test("rebalanceRatesByWeight solves on mass, not doc counts") {
    val rates = Mixture.rebalanceRatesByWeight(weighted, "domain", col("wt"),
      Map("a" -> 0.4, "b" -> 0.3, "c" -> 0.3), outFraction = 0.5)
    // total mass 7300; a: 0.5*7300*0.4/800 = 1.825 → cap 1.0
    // b: 0.5*7300*0.3/1500 = 0.73; c: 0.5*7300*0.3/5000 = 0.219
    assert(rates("a") === 1.0)
    assert(math.abs(rates("b") - 0.5 * 7300 * 0.3 / 1500) < 1e-12)
    assert(math.abs(rates("c") - 0.5 * 7300 * 0.3 / 5000) < 1e-12)
    // doc-count solving would have given c the HIGHEST rate (smallest
    // domain); mass solving gives it the lowest — the inversion that
    // motivates the variant
    val byDocs = Mixture.rebalanceRates(weighted, "domain",
      Map("a" -> 0.4, "b" -> 0.3, "c" -> 0.3), outFraction = 0.5,
      capAtOne = false)
    assert(byDocs("c") > byDocs("b") && rates("c") < rates("b"))
  }

  test("temperatureRatesByWeight: alpha=1 natural in mass, alpha=0 uniform") {
    val r1 = Mixture.temperatureRatesByWeight(weighted, "domain", col("wt"),
      alpha = 1.0, outFraction = 0.5)
    assert(r1.values.forall(r => math.abs(r - 0.5) < 1e-12),
      "alpha=1 must keep the natural mass mixture")
    val r0 = Mixture.temperatureRatesByWeight(weighted, "domain", col("wt"),
      alpha = 0.0, outFraction = 0.5, capAtOne = false)
    // uniform target mass 7300/3 per domain; a needs upsampling (>1)
    assert(r0("a") > 1.0 && r0("c") < 1.0)
    assert(math.abs(r0("c") - 0.5 * 7300.0 / 3.0 / 5000.0) < 1e-12)
  }
}
