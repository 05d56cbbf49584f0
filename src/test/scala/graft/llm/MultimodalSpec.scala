package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  implicit private def sp: SparkSession = spark

  private def docs = Seq(
    (0L, "an image-bearing document"),
    (1L, "an audio-bearing document")
  ).toDF("doc_id", "text")

  test("attachSyntheticMedia produces the typed media struct") {
    val m = Multimodal.attachSyntheticMedia(docs, "doc_id", "text")
    val f = m.select("media.*").schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(f == Map("bytes" -> "binary", "mime" -> "string", "width" -> "int",
      "height" -> "int", "duration_ms" -> "bigint"))
    val mimes = m.select("media.mime").as[String].collect().toSet
    assert(mimes == Set("image/png", "audio/wav"))
  }

  test("decodeFeatures is deterministic, batch-shaped, right-dimensional") {
    val media = Multimodal.attachSyntheticMedia(docs, "doc_id", "text")
      .select(col("doc_id"), col("media.bytes")).as[(Long, Array[Byte])]
    val feats = Multimodal.decodeFeatures(media, dim = 16).collect()
    assert(feats.length == 2)
    assert(feats.forall(_.features.length == 16))
    val again = Multimodal.decodeFeatures(media, dim = 16).collect()
    assert(feats.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
  }

  test("resizeMedia caps output at the geometry budget, deterministic") {
    val media = Multimodal.attachSyntheticMedia(docs, "doc_id", "text")
      .select(col("doc_id"), col("media.bytes")).as[(Long, Array[Byte])]
    val small = Multimodal.resizeMedia(media, 8, 8).collect() // budget = 1
    assert(small.forall(_.bytes.length == 1))
    val big = Multimodal.resizeMedia(media, 1000, 1000).collect() // budget ≥ payload
    assert(big.find(_.id == 0L).get.bytes.toSeq ==
      "an image-bearing document".getBytes("UTF-8").toSeq)
    assert(big.forall(r => r.width == 1000 && r.height == 1000))
  }

  test("sampleFrames yields n frames per item covering the payload") {
    val media = Multimodal.attachSyntheticMedia(docs, "doc_id", "text")
      .select(col("doc_id"), col("media.bytes")).as[(Long, Array[Byte])]
    val frames = Multimodal.sampleFrames(media, n = 4).collect()
    assert(frames.count(_.id == 0L) == 4)
    assert(frames.map(_.frameIdx).toSet == Set(0, 1, 2, 3))
    val total = frames.filter(_.id == 0L).map(_.frame.length).sum
    assert(total >= "an image-bearing document".getBytes.length)
  }
}
