package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** tableChecksum: the fingerprint must be invariant to partitioning and
  * row order (the whole point — replicas don't agree on either), move
  * on any single-row difference, and be immune to the classic
  * concatenation ambiguities (boundary shifts, NULL-vs-"NULL"). */
class ChecksumSpec extends SparkSpec {
  import spark.implicits._

  private def sums(r: Row): Seq[java.math.BigDecimal] =
    (1 until r.length).map(r.getDecimal)

  test("partition- and order-invariant") {
    val df = (1 to 500).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val a = Checksum.tableChecksum(df, Seq("k", "v")).collect()(0)
    val b = Checksum.tableChecksum(df.repartition(7), Seq("k", "v")).collect()(0)
    val c = Checksum.tableChecksum(df.orderBy($"v".desc), Seq("k", "v")).collect()(0)
    assert(sums(a) == sums(b) && sums(a) == sums(c))
    assert(a.getLong(0) == 500L)
  }

  test("a one-row difference moves the row checksum and ONLY the changed column's sum") {
    val base = Seq((1L, "x", 10.0), (2L, "y", 20.0), (3L, "z", 30.0))
    val changed = Seq((1L, "x", 10.0), (2L, "y", 99.0), (3L, "z", 30.0))
    val a = Checksum.tableChecksum(base.toDF("k", "s", "v"), Seq("k", "s", "v")).collect()(0)
    val b = Checksum.tableChecksum(changed.toDF("k", "s", "v"), Seq("k", "s", "v")).collect()(0)
    assert(a.getDecimal(1) != b.getDecimal(1))           // row_checksum moved
    assert(a.getDecimal(2) == b.getDecimal(2))           // checksum_k unchanged
    assert(a.getDecimal(3) == b.getDecimal(3))           // checksum_s unchanged
    assert(a.getDecimal(4) != b.getDecimal(4))           // checksum_v moved
  }

  test("boundary shifts and NULL-vs-'NULL' are distinct") {
    // ('ab','c') vs ('a','bc'): same concatenation, different rows
    val p = Checksum.tableChecksum(Seq(("ab", "c")).toDF("a", "b"), Seq("a", "b")).collect()(0)
    val q = Checksum.tableChecksum(Seq(("a", "bc")).toDF("a", "b"), Seq("a", "b")).collect()(0)
    assert(p.getDecimal(1) != q.getDecimal(1))
    // NULL vs the literal string "NULL"
    val n1 = Checksum.tableChecksum(
      Seq((1L, Option.empty[String])).toDF("k", "s"), Seq("k", "s")).collect()(0)
    val n2 = Checksum.tableChecksum(
      Seq((1L, Option("NULL"))).toDF("k", "s"), Seq("k", "s")).collect()(0)
    assert(n1.getDecimal(1) != n2.getDecimal(1))
    assert(n1.getDecimal(3) != n2.getDecimal(3))
  }

  test("identical multisets with duplicate rows agree; dropping one copy does not") {
    val dup = Seq((1L, "x"), (1L, "x"), (2L, "y"))
    val a = Checksum.tableChecksum(dup.toDF("k", "s"), Seq("k", "s")).collect()(0)
    val b = Checksum.tableChecksum(dup.reverse.toDF("k", "s"), Seq("k", "s")).collect()(0)
    assert(sums(a) == sums(b))
    val c = Checksum.tableChecksum(dup.take(2).toDF("k", "s"), Seq("k", "s")).collect()(0)
    assert(a.getDecimal(1) != c.getDecimal(1))
  }
}
