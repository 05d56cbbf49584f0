package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.immutable.ListMap

/** Dependency-free `tf.train.Example` codec — the payload format inside
  * TFRecord training shards (tensorflow/core/example/example.proto +
  * feature.proto, a PUBLIC schema):
  * {{{
  *   Example  { Features features = 1; }
  *   Features { map<string, Feature> feature = 1; }
  *   Feature  { oneof kind { BytesList = 1; FloatList = 2; Int64List = 3; } }
  *   BytesList { repeated bytes value = 1; }
  *   FloatList { repeated float value = 1 [packed = true]; }
  *   Int64List { repeated int64 value = 1 [packed = true]; }
  * }}}
  * encoded with the standard protobuf wire format (LEB128 varints,
  * length-delimited submessages, little-endian fixed32 floats). Only the
  * subset above is implemented — exactly what tf.Example uses — with
  * deterministic encoding (features sorted by name, map entries as
  * key=1/value=2 submessages), so byte output is a pure function of the
  * content and safe for content-hash dedup.
  *
  * The decoder is a real wire-format reader: it walks tag/wire-type
  * pairs, skips unknown fields (forward compatible), accepts both packed
  * and unpacked repeated scalars, and raises on truncation. Golden
  * byte-level vectors in TfExampleSpec pin the format against the
  * published wire spec, so shards written here are readable by any
  * standard TFRecord/Example consumer and vice versa.
  */
object TfExample {

  sealed trait Feature
  final case class BytesList(values: Seq[Array[Byte]]) extends Feature
  final case class FloatList(values: Seq[Float]) extends Feature
  final case class Int64List(values: Seq[Long]) extends Feature

  object Feature {
    def of(s: String): Feature = BytesList(Seq(s.getBytes(UTF_8)))
    def of(l: Long): Feature = Int64List(Seq(l))
    def of(f: Float): Feature = FloatList(Seq(f))
    def floats(fs: Seq[Float]): Feature = FloatList(fs)
  }

  // ------------------------------------------------------------ encoding

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0L) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt & 0x7F)
  }

  private def writeTag(out: ByteArrayOutputStream, field: Int, wire: Int): Unit =
    writeVarint(out, (field.toLong << 3) | wire)

  private def writeLenDelim(out: ByteArrayOutputStream, field: Int,
                            body: Array[Byte]): Unit = {
    writeTag(out, field, 2)
    writeVarint(out, body.length.toLong)
    out.write(body)
  }

  private def encodeFeature(f: Feature): Array[Byte] = {
    val inner = new ByteArrayOutputStream()
    f match {
      case BytesList(vs) => // BytesList{repeated bytes value=1} in kind field 1
        vs.foreach(v => writeLenDelim(inner, 1, v))
      case FloatList(vs) => // packed fixed32s
        val packed = ByteBuffer.allocate(4 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
        vs.foreach(packed.putFloat)
        writeLenDelim(inner, 1, packed.array())
      case Int64List(vs) => // packed varints
        val packed = new ByteArrayOutputStream()
        vs.foreach(writeVarint(packed, _))
        writeLenDelim(inner, 1, packed.toByteArray)
    }
    val out = new ByteArrayOutputStream()
    val kindField = f match {
      case _: BytesList => 1
      case _: FloatList => 2
      case _: Int64List => 3
    }
    writeLenDelim(out, kindField, inner.toByteArray)
    out.toByteArray
  }

  /** Serialize one Example. Features are sorted by name for deterministic
    * bytes (protobuf map order is unspecified; sorting makes the output a
    * pure function of content). */
  def encode(features: Map[String, Feature]): Array[Byte] = {
    val featuresMsg = new ByteArrayOutputStream()
    ListMap(features.toSeq.sortBy(_._1): _*).foreach { case (name, f) =>
      val entry = new ByteArrayOutputStream()
      writeLenDelim(entry, 1, name.getBytes(UTF_8))   // map key
      writeLenDelim(entry, 2, encodeFeature(f))       // map value
      writeLenDelim(featuresMsg, 1, entry.toByteArray) // Features.feature
    }
    val example = new ByteArrayOutputStream()
    writeLenDelim(example, 1, featuresMsg.toByteArray) // Example.features
    example.toByteArray
  }

  // ------------------------------------------------------------ decoding

  private final class Reader(bytes: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0
      var result = 0L
      while (true) {
        require(pos < end, s"truncated varint at $pos")
        val b = bytes(pos); pos += 1
        result |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
        require(shift < 64, "varint too long")
      }
      result // unreachable
    }
    def lenDelim(): Reader = {
      val len = varint().toInt
      require(len >= 0 && pos + len <= end, s"truncated field at $pos len=$len")
      val r = new Reader(bytes, pos, pos + len)
      pos += len
      r
    }
    def bytesOf(): Array[Byte] = {
      val len = varint().toInt
      require(len >= 0 && pos + len <= end, s"truncated bytes at $pos len=$len")
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
      pos += len
      out
    }
    def fixed32(): Int = {
      require(pos + 4 <= end, s"truncated fixed32 at $pos")
      val v = ByteBuffer.wrap(bytes, pos, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
      pos += 4
      v
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => require(pos + 8 <= end, "truncated fixed64"); pos += 8
      case 2 => lenDelim()
      case 5 => require(pos + 4 <= end, "truncated fixed32"); pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  private def decodeScalarList(r: Reader, kind: Int): Feature = kind match {
    case 1 =>
      val vs = Seq.newBuilder[Array[Byte]]
      while (r.hasMore) {
        val tag = r.varint()
        if ((tag >> 3).toInt == 1 && (tag & 7) == 2) vs += r.bytesOf()
        else r.skip((tag & 7).toInt)
      }
      BytesList(vs.result())
    case 2 =>
      val vs = Seq.newBuilder[Float]
      while (r.hasMore) {
        val tag = r.varint()
        (tag >> 3).toInt match {
          case 1 if (tag & 7) == 2 => // packed
            val p = r.lenDelim()
            while (p.hasMore) vs += java.lang.Float.intBitsToFloat(p.fixed32())
          case 1 if (tag & 7) == 5 => // unpacked
            vs += java.lang.Float.intBitsToFloat(r.fixed32())
          case _ => r.skip((tag & 7).toInt)
        }
      }
      FloatList(vs.result())
    case 3 =>
      val vs = Seq.newBuilder[Long]
      while (r.hasMore) {
        val tag = r.varint()
        (tag >> 3).toInt match {
          case 1 if (tag & 7) == 2 => // packed
            val p = r.lenDelim()
            while (p.hasMore) vs += p.varint()
          case 1 if (tag & 7) == 0 => // unpacked
            vs += r.varint()
          case _ => r.skip((tag & 7).toInt)
        }
      }
      Int64List(vs.result())
  }

  private def decodeFeature(r: Reader): Option[Feature] = {
    var out: Option[Feature] = None
    while (r.hasMore) {
      val tag = r.varint()
      val field = (tag >> 3).toInt
      if (field >= 1 && field <= 3 && (tag & 7) == 2)
        out = Some(decodeScalarList(r.lenDelim(), field))
      else r.skip((tag & 7).toInt)
    }
    out
  }

  /** Parse an Example's feature map. Unknown fields are skipped (standard
    * proto forward compatibility); truncation raises. */
  def decode(bytes: Array[Byte]): Map[String, Feature] = {
    val root = new Reader(bytes, 0, bytes.length)
    val features = Map.newBuilder[String, Feature]
    while (root.hasMore) {
      val tag = root.varint()
      if ((tag >> 3).toInt == 1 && (tag & 7) == 2) {
        val fs = root.lenDelim() // Features message
        while (fs.hasMore) {
          val ftag = fs.varint()
          if ((ftag >> 3).toInt == 1 && (ftag & 7) == 2) {
            val entry = fs.lenDelim() // map entry
            var name: Option[String] = None
            var feat: Option[Feature] = None
            while (entry.hasMore) {
              val etag = entry.varint()
              (etag >> 3).toInt match {
                case 1 if (etag & 7) == 2 => name = Some(new String(entry.bytesOf(), UTF_8))
                case 2 if (etag & 7) == 2 => feat = decodeFeature(entry.lenDelim())
                case _ => entry.skip((etag & 7).toInt)
              }
            }
            for (n <- name; f <- feat) features += n -> f
          } else fs.skip((ftag & 7).toInt)
        }
      } else root.skip((tag & 7).toInt)
    }
    features.result()
  }

  // --------------------------------------------- convenience accessors

  def string(m: Map[String, Feature], key: String): Option[String] =
    m.get(key).collect { case BytesList(Seq(b)) => new String(b, UTF_8) }
  def long(m: Map[String, Feature], key: String): Option[Long] =
    m.get(key).collect { case Int64List(Seq(v)) => v }
  def floats(m: Map[String, Feature], key: String): Option[Seq[Float]] =
    m.get(key).collect { case FloatList(vs) => vs }
}
