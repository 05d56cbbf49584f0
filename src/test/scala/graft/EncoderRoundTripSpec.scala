package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Top-level (encoders need a stable outer scope). */
case class RoundTripInner(tag: String, score: Double)
case class RoundTripDoc(
    id: Long,
    text: String,
    lang: Option[String],
    tokens: Seq[String],
    props: Map[String, Long],
    inner: RoundTripInner,
    payload: Array[Byte])

/** Coder-law analogue (SURVEY §5: the reference's CoderProperties): our
  * "coders" are Spark Encoders, so the law to check is that case-class
  * rows survive the Tungsten encode/decode round-trip — including nested
  * products, Option, Seq, Map, and binary — on randomized values. */
class EncoderRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private val strGen = Gen.chooseNum(0, 20)
    .flatMap(n => Gen.stringOfN(n, Gen.frequency(
      (5, Gen.alphaNumChar), (1, Gen.oneOf(' ', '\'', 'ß', '漢')))))

  private val docGen: Gen[RoundTripDoc] = for {
    id <- Gen.long
    text <- strGen
    lang <- Gen.option(Gen.oneOf("en", "de", "fr"))
    tokens <- Gen.listOfN(3, strGen)
    props <- Gen.mapOfN(3, Gen.zip(strGen, Gen.long))
    score <- Gen.double
    bytes <- Gen.listOfN(8, Gen.chooseNum(-128, 127).map(_.toByte))
  } yield RoundTripDoc(id, text, lang, tokens, props,
    RoundTripInner(text.take(4), score), bytes.toArray)

  test("case-class encoders round-trip randomized nested values") {
    val docs = (0 until 60).flatMap(i => docGen.apply(Gen.Parameters.default, Seed(i.toLong)))
    assert(docs.length >= 40, "generator drought")
    val back = spark.createDataset(docs).collect()
    def fields(d: RoundTripDoc) = // arrays compare by reference → via Seq
      (d.id, d.text, d.lang, d.tokens, d.props, d.inner, d.payload.toSeq)
    docs.zip(back).foreach { case (a, b) => assert(fields(a) == fields(b)) }
  }
}
