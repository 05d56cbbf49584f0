package graft

import org.apache.spark.sql.functions.col

import graft.functions.ShingleExprs

/** The SQL surface of the native expressions: registered functions must
  * resolve from spark.sql(...) and agree with the Column API. */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  test("shingle_hash / minhash_sig / simhash64 resolve in SQL with equal results") {
    Seq("the quick brown fox jumps over the lazy dog").toDF("text")
      .createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT shingle_hash(text, 3) AS sh, minhash_sig(text, 3, 8) AS mh,
               simhash64(text) AS si
         FROM ext_docs""").as[(Seq[Long], Seq[Long], Long)].head()
    val viaCol = spark.table("ext_docs").select(
      ShingleExprs.shingleHashes(col("text"), 3),
      ShingleExprs.minHashSignature(col("text"), 3, 8),
      ShingleExprs.simHash(col("text"))).as[(Seq[Long], Seq[Long], Long)].head()
    assert(viaSql == viaCol)
  }

  test("dot_product resolves in SQL") {
    val d = spark.sql(
      "SELECT dot_product(CAST(array(1.0, 2.0) AS ARRAY<DOUBLE>), CAST(array(3.0, 4.0) AS ARRAY<DOUBLE>))")
      .as[Double].head()
    assert(d == 11.0)
  }

  test("ngram_strings / consecutive_pairs / quality_score / gopher_flags resolve in SQL") {
    // "the" and "of": two distinct stopwords, so gopher keep holds
    Seq("the quick brown fox jumps over the back of the lazy dog").toDF("text")
      .createOrReplaceTempView("ext_docs2")
    val viaSql = spark.sql(
      """SELECT ngram_strings(text, 2) AS ng,
               consecutive_pairs(ngram_strings(text, 1)) AS cp,
               quality_score(text) AS q,
               gopher_flags(text, 5, 100).keep AS keep
         FROM ext_docs2""")
      .as[(Seq[String], Seq[(String, String)], Double, Boolean)].head()
    val viaCol = spark.table("ext_docs2").select(
      ShingleExprs.ngramStrings(col("text"), 2),
      ShingleExprs.consecutivePairs(ShingleExprs.ngramStrings(col("text"), 1)),
      ShingleExprs.qualityScore(col("text")),
      ShingleExprs.gopherFlags(col("text"), 5, 100).getField("keep"))
      .as[(Seq[String], Seq[(String, String)], Double, Boolean)].head()
    assert(viaSql == viaCol)
    assert(viaSql._1.head == "the quick" && viaSql._3 == 1.0 && viaSql._4)
  }

  test("non-literal size argument is rejected clearly") {
    Seq(("x", 3)).toDF("text", "k").createOrReplaceTempView("ext_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_hash(text, k) FROM ext_bad").collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      Option(e.getCause).exists(_.getMessage.contains("integer literal")))
  }
}
