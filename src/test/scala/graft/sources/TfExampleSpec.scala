package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec
import graft.sources.TfExample._

class TfExampleSpec extends SparkSpec {

  private def hex(b: Array[Byte]): String = b.map("%02X".format(_)).mkString

  test("golden wire bytes: Int64List(150) — the published varint example") {
    // Example{features{feature{key:"a" value{int64_list{value:[150]}}}}}
    // 150 varint-encodes as 96 01 (the canonical protobuf-docs example)
    assert(hex(encode(Map("a" -> Int64List(Seq(150L))))) ==
      "0A0D0A0B0A0161" + "1206" + "1A04" + "0A02" + "9601")
  }

  test("golden wire bytes: BytesList and packed FloatList") {
    assert(hex(encode(Map("t" -> BytesList(Seq("hi".getBytes(UTF_8)))))) ==
      "0A0D0A0B0A0174" + "1206" + "0A04" + "0A02" + "6869")
    // 1.5f = 0x3FC00000 little-endian
    assert(hex(encode(Map("f" -> FloatList(Seq(1.5f))))) ==
      "0A0F0A0D0A0166" + "1208" + "1206" + "0A04" + "0000C03F")
  }

  test("encode is deterministic and key-order independent") {
    val a = encode(Map("x" -> Feature.of(1L), "y" -> Feature.of("s"), "z" -> Feature.of(2.0f)))
    val b = encode(Map("z" -> Feature.of(2.0f), "x" -> Feature.of(1L), "y" -> Feature.of("s")))
    assert(hex(a) == hex(b))
  }

  private def normalize(m: Map[String, Feature]): Map[String, Any] = m.view.mapValues {
    case BytesList(vs) => ("b", vs.map(_.toSeq))
    case FloatList(vs) => ("f", vs)
    case Int64List(vs) => ("i", vs)
  }.toMap

  test("round-trip: multi-feature, multi-value, negative ints, empty lists") {
    val rnd = new scala.util.Random(7)
    (0 until 20).foreach { _ =>
      val m: Map[String, Feature] = (0 until 1 + rnd.nextInt(4)).map { i =>
        val name = s"f${rnd.nextInt(8)}_$i"
        val f = rnd.nextInt(3) match {
          case 0 => BytesList(Seq.fill(rnd.nextInt(3))(
            Array.fill(rnd.nextInt(20))(rnd.nextInt(256).toByte)))
          case 1 => FloatList(Seq.fill(rnd.nextInt(5))(rnd.nextFloat()))
          case 2 => Int64List(Seq.fill(rnd.nextInt(5))(rnd.nextLong()))
        }
        name -> f
      }.toMap
      assert(normalize(decode(encode(m))) == normalize(m))
    }
    // negative int64s take the full 10-byte varint path
    val neg = Map("n" -> Int64List(Seq(-1L, Long.MinValue, 0L, Long.MaxValue)))
    assert(normalize(decode(encode(neg))) == normalize(neg))
  }

  test("unknown fields are skipped; truncation raises") {
    val base = encode(Map("k" -> Feature.of(7L)))
    // append an unknown top-level varint field (field 9, wire 0, value 5)
    val extra = base ++ Array[Byte]((9 << 3).toByte, 5)
    assert(normalize(decode(extra)) == normalize(Map("k" -> Int64List(Seq(7L)))))
    intercept[IllegalArgumentException](decode(base.dropRight(1)))
  }

  test("examples survive the full shard pipeline: encode -> gzip TFRecord -> decode") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tfex").toString + "/shards"
    val docs = Seq((1L, "alpha doc"), (2L, "beta π"), (3L, "")).toDF("id", "body")
    val enc = udf((id: Long, body: String) =>
      TfExample.encode(Map("id" -> Feature.of(id), "body" -> Feature.of(body))))
    TfRecordIO.write(docs, enc(col("id"), col("body")), dir, shards = 2,
      compression = "gzip")
    val dec = udf((bytes: Array[Byte]) => {
      val m = TfExample.decode(bytes)
      (TfExample.long(m, "id").get, TfExample.string(m, "body").get)
    })
    val back = TfRecordIO.read(spark, dir)
      .select(dec(col("record")).as("r")).select("r._1", "r._2")
      .as[(Long, String)].collect().toSeq
    assertInAnyOrder(back, Seq((1L, "alpha doc"), (2L, "beta π"), (3L, "")))
  }
}
