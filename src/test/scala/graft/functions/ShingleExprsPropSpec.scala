package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property fuzz: the native expressions must equal the Column-combinator
  * reference forms on ARBITRARY strings — whitespace runs, unicode,
  * apostrophes, digit/letter boundaries, empty input — not just the
  * curated sample list in ShingleExprsSpec. (Seeded Gen sampling; the
  * scalatest-scalacheck bridge isn't on the classpath.) */
class ShingleExprsPropSpec extends SparkSpec {
  import spark.implicits._

  private val wordChar = Gen.frequency(
    (8, Gen.alphaLowerChar), (2, Gen.alphaUpperChar), (1, Gen.numChar),
    (1, Gen.oneOf('\'', '!', '.', ',', '-', '_')),
    (1, Gen.oneOf('ü', 'ß', 'é', '漢', 'א')),
    (3, Gen.oneOf(' ', '\t', '\n')))
  private val textGen: Gen[String] =
    Gen.chooseNum(0, 120).flatMap(n => Gen.stringOfN(n, wordChar))

  private def shinglesReference(text: org.apache.spark.sql.Column, k: Int) = {
    val ts = filter(split(lower(text), "[^a-z']+"), t => length(t) > 0)
    val n = size(ts)
    when(n < k, array(xxhash64(concat_ws(" ", ts))))
      .otherwise(transform(sequence(lit(1), n - lit(k - 1)),
        i => xxhash64(concat_ws(" ", slice(ts, i, lit(k))))))
  }

  private def simhashReference(text: org.apache.spark.sql.Column) = {
    val ts = filter(split(lower(text), "[^a-z']+"), t => length(t) > 0)
    val hs = transform(ts, t => hash(t).cast("long").bitwiseAND(lit(0xFFFFFFFFL)))
    val bitsOf = (h: org.apache.spark.sql.Column) =>
      transform(sequence(lit(0), lit(31)), i =>
        when(pmod(floor(h / pow(lit(2.0), i)).cast("long"), lit(2L)) === 1L, 1).otherwise(-1))
    val votes = aggregate(hs, array_repeat(lit(0), 32),
      (acc, h) => zip_with(acc, bitsOf(h), (a, v) => a + v))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(31)),
        (v, i) => when(v > 0, pow(lit(2.0), i).cast("long")).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  test("native shingle/minhash/simhash ≡ reference forms on random text") {
    val texts = (0 until 200).flatMap { i =>
      textGen.apply(Gen.Parameters.default, Seed(i.toLong))
    }
    assert(texts.length >= 150, "generator drought")
    val df = texts.toDF("text")
    val rows = df.select(
      col("text"),
      ShingleExprs.shingleHashes(col("text"), 3).as("f_sh"),
      shinglesReference(col("text"), 3).as("r_sh"),
      ShingleExprs.minHashSignature(col("text"), 3, 8).as("f_mh"),
      ShingleExprs.simHash(col("text")).as("f_si"),
      simhashReference(col("text")).as("r_si"))
      .collect()
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"shingles diverged on: ${t.take(60)}")
      assert(r.getLong(4) == r.getLong(5), s"simhash diverged on: ${t.take(60)}")
      // minhash: every position = min over shingles of the salted hash
      val sh = r.getSeq[Long](1)
      val expected = (0 until 8).map { j =>
        val salt = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(j, 42L)
        sh.map(h => org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(h, salt)).min
      }
      assert(r.getSeq[Long](3) == expected, s"minhash diverged on: ${t.take(60)}")
    }
  }
}
