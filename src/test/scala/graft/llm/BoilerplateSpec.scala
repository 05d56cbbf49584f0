package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "COPYRIGHT NOTICE\nreal content one\nfooter text"),
    (2L, "COPYRIGHT NOTICE\nother real content\nfooter text"),
    (3L, "COPYRIGHT NOTICE\nunique third body"),
    (4L, "nothing shared here at all")
  ).toDF("doc_id", "text")

  test("segments recurring in >= minRepeats docs are removed, order kept") {
    val out = Boilerplate.removeFrequentSegments(docs, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "real content one")
    assert(out(2L) == "other real content")
    assert(out(3L) == "unique third body")
    assert(out(4L) == "nothing shared here at all")
  }

  test("a doc whose every segment is boilerplate survives with empty text") {
    val all = docs.union(Seq((5L, "COPYRIGHT NOTICE\nfooter text")).toDF("doc_id", "text"))
    val out = Boilerplate.removeFrequentSegments(all, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out(5L) == "")
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("frequentSegments reports the flagged segments with doc counts") {
    val flagged = Boilerplate.frequentSegments(docs, "doc_id", "text")
      .as[(String, Long)].collect().toMap
    assert(flagged == Map("COPYRIGHT NOTICE" -> 3L, "footer text" -> 2L))
  }

  test("repeats WITHIN one doc do not make a segment boilerplate") {
    val d = Seq((1L, "twice\ntwice\nbody"), (2L, "unrelated")).toDF("doc_id", "text")
    val out = Boilerplate.removeFrequentSegments(d, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "twice\ntwice\nbody") // distinct-doc count is 1
  }

  test("chunkTokens splits running text into fixed token lines") {
    val r = Seq("a b c d e").toDF("t")
      .select(Boilerplate.chunkTokens(col("t"), 2).as("c"))
      .as[String].head()
    assert(r == "a b\nc d\ne")
  }

  test("chunkTokens treats newlines and runs of whitespace as one separator") {
    val r = Seq("a\nb  c\t d").toDF("t")
      .select(Boilerplate.chunkTokens(col("t"), 2).as("c"))
      .as[String].head()
    assert(r == "a b\nc d") // input breaks can't masquerade as chunk bounds
  }

  test("NULL text stays NULL, distinguishable from all-boilerplate") {
    val d = Seq((1L, Option("x\ny")), (2L, Option("x\ny")), (3L, Option.empty[String]))
      .toDF("doc_id", "text")
    val out = Boilerplate.removeFrequentSegments(d, "doc_id", "text")
      .as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains("") && out(2L).contains(""))
    assert(out(3L).isEmpty)
  }
}
