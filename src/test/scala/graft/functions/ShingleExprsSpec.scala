package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Parity proof: the native ShingleExprs produce bit-identical hashes to
  * the Column-combinator reference forms they replace (same XXH64 chain,
  * seed 42) — so the 10× speedup changes no query output. */
class ShingleExprsSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "short",
    "",
    "  leading  spaces and   runs\t\tof whitespace ",
    "punctuation!!! and... d1g1ts 42 mixed-in, apostrophe's kept",
    "Ünïcode çharacters straße ÉCOLE"
  ).toDF("text")

  /** The original Column-combinator shingle form (kept here as the
    * reference model). */
  private def shinglesReference(text: org.apache.spark.sql.Column, k: Int) = {
    val ts = filter(split(lower(text), "[^a-z']+"), t => length(t) > 0)
    val n = size(ts)
    when(n < k, array(xxhash64(concat_ws(" ", ts))))
      .otherwise(transform(sequence(lit(1), n - lit(k - 1)),
        i => xxhash64(concat_ws(" ", slice(ts, i, lit(k))))))
  }

  /** The original per-position minhash form. */
  private def minhashReference(text: org.apache.spark.sql.Column, k: Int, nh: Int) =
    aggregate(
      shinglesReference(text, k),
      array_repeat(lit(Long.MaxValue), nh),
      (acc, h) => zip_with(acc,
        transform(sequence(lit(0), lit(nh - 1)), j => xxhash64(j, h)),
        (x, y) => least(x, y)))

  test("ShingleHash ≡ Column-combinator shingle hashes") {
    for (k <- Seq(1, 3, 5)) {
      val rows = texts.select(
        ShingleExprs.shingleHashes(col("text"), k).as("fast"),
        shinglesReference(col("text"), k).as("ref"))
        .as[(Seq[Long], Seq[Long])].collect()
      rows.foreach { case (fast, ref) => assert(fast == ref, s"k=$k") }
    }
  }

  test("MinHashSig ≡ Column-combinator minhash signature") {
    val rows = texts.select(
      ShingleExprs.minHashSignature(col("text"), 3, 16).as("fast"),
      minhashReference(col("text"), 3, 16).as("ref"))
      .as[(Seq[Long], Seq[Long])].collect()
    rows.foreach { case (fast, ref) => assert(fast == ref) }
  }

  /** Column-combinator simhash form: per-bit vote over xxhash64 token
    * hashes. Bit positions are Scala-side (shiftrightunsigned takes a
    * literal shift), so this is 64 interpreted aggregates — reference
    * semantics, not a usable implementation. */
  private def simhashReference(text: org.apache.spark.sql.Column) = {
    // per-bit vote over the 3-shingle hash array (ShingleHash is itself
    // reference-checked above, so this cross-checks the vote fold)
    val hs = ShingleExprs.shingleHashes(text, 3)
    (0 until 64).map { i =>
      val vote = aggregate(hs, lit(0), (acc, h) =>
        acc + when(shiftrightunsigned(h, i).bitwiseAND(lit(1L)) === 1L, 1)
          .otherwise(-1))
      when(vote > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  test("SimHash64 ≡ Column-combinator simhash") {
    val rows = texts.select(
      ShingleExprs.simHash(col("text")).as("fast"),
      simhashReference(col("text")).as("ref"))
      .as[(Long, Long)].collect()
    rows.foreach { case (fast, ref) => assert(fast == ref) }
  }

  test("SimHash64 single-token law: simhash64(token) = xxhash64(token)") {
    val rows = Seq("graft", "spark", "dedup").toDF("t")
      .select(ShingleExprs.simHash(col("t")).as("sh"), xxhash64(col("t")).as("xh"))
      .as[(Long, Long)].collect()
    rows.foreach { case (sh, xh) => assert(sh == xh) }
  }

  test("NgramStrings ≡ HOF transform/slice/array_join form") {
    Seq(1, 2, 3, 5).foreach { n =>
      // HOF reference inlined (TextFunctions.tokens is itself native now)
      val ts = filter(split(lower(col("text")), "[^a-z']+"), t => length(t) > 0)
      val ref = when(size(ts) >= n,
        transform(sequence(lit(1), size(ts) - lit(n - 1)),
          i => array_join(slice(ts, i, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
      val rows = texts
        .select(ShingleExprs.ngramStrings(col("text"), n).as("fast"), ref.as("slow"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n diverges: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
      }
    }
  }

  test("ConsecutivePairs ≡ HOF transform/element_at struct form") {
    val ts = filter(split(lower(col("text")), "[^a-z']+"), t => length(t) > 0)
    val ref = when(size(ts) >= 2,
      transform(sequence(lit(1), size(ts) - 1), i =>
        struct(element_at(ts, i).as("v"), element_at(ts, i + 1).as("w"))))
      .otherwise(array().cast("array<struct<v:string,w:string>>"))
    val rows = texts
      .select(ShingleExprs.consecutivePairs(ts).as("fast"), ref.as("slow"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[org.apache.spark.sql.Row](0) == r.getSeq[org.apache.spark.sql.Row](1),
        s"diverges: ${r.getSeq[Any](0)} vs ${r.getSeq[Any](1)}")
    }
  }

  test("SigAgreement ≡ zip_with/array_compact form, incl. length mismatch and nulls") {
    val cases = Seq(
      (Seq(1L, 2L, 3L), Seq(1L, 9L, 3L)),
      (Seq(1L, 2L), Seq(1L, 2L, 3L)),          // shorter left: padded nulls count 0
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 2L)),      // shorter right
      (Seq.empty[Long], Seq(1L)),
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq(7L, 7L, 7L), Seq(7L, 7L, 7L)))
    cases.foreach { case (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val ref = size(array_compact(zip_with(col("a"), col("b"),
        (x, y) => when(x === y, 1))))
      val row = df.select(
        ShingleExprs.sigAgreement(col("a"), col("b")).as("fast"), ref.as("slow"))
        .head()
      assert(row.getInt(0) == row.getInt(1), s"diverged on a=$a b=$b")
    }
    // null elements inside the arrays count 0 on either side
    val withNulls = spark.sql(
      """SELECT CAST(array(1, NULL, 3) AS ARRAY<BIGINT>) AS a,
               CAST(array(1, NULL, 4) AS ARRAY<BIGINT>) AS b""")
    val row = withNulls.select(
      ShingleExprs.sigAgreement(col("a"), col("b")).as("fast"),
      size(array_compact(zip_with(col("a"), col("b"),
        (x, y) => when(x === y, 1)))).as("slow")).head()
    assert(row.getInt(0) == row.getInt(1) && row.getInt(0) == 1)
  }

  test("DotProduct ≡ aggregate(zip_with) fold, floats and doubles") {
    val df = Seq(
      (Seq(1.5f, -2.25f, 3.0f), Seq(0.5, 4.0, -1.125)),
      (Seq(0.1f, 0.2f, 0.3f), Seq(0.7, 0.8, 0.9))
    ).toDF("a", "b")
    val ad = col("a").cast("array<double>")
    val bd = col("b").cast("array<double>")
    val rows = df.select(
      ShingleExprs.dot(ad, bd).as("fast"),
      aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (acc, v) => acc + v).as("ref"))
      .as[(Double, Double)].collect()
    rows.foreach { case (fast, ref) => assert(fast == ref) } // bit-exact
  }

  test("SqDistance ≡ aggregate(zip_with) fold; null on length mismatch") {
    val df = Seq(
      (Seq(1.5f, -2.25f, 3.0f), Seq(0.5, 4.0, -1.125)),
      (Seq(0.1f, 0.2f, 0.3f), Seq(0.7, 0.8, 0.9))
    ).toDF("a", "b")
    val ad = col("a").cast("array<double>")
    val bd = col("b").cast("array<double>")
    val rows = df.select(
      ShingleExprs.sqDistance(ad, bd).as("fast"),
      aggregate(zip_with(ad, bd, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v).as("ref"))
      .as[(Double, Double)].collect()
    rows.foreach { case (fast, ref) => assert(fast == ref) } // bit-exact
    val mismatch = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
      .select(ShingleExprs.sqDistance(col("a"), col("b")).as("d"))
      .collect()
    assert(mismatch.head.isNullAt(0))
  }
}
