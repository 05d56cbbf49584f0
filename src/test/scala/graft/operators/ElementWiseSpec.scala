package graft.operators

import graft.SparkSpec
import graft.operators.ElementWise._

class ElementWiseSpec extends SparkSpec {
  import spark.implicits._

  test("partitionIntoManaged releases the shared cache after use") {
    val ds = Seq(1, 2, 3, 4, 5, 6).toDS()
    val (parts, release) = ds.partitionIntoManaged(2)(_ % 2)
    assertInAnyOrder(parts(0).collect().toSeq, Seq(2, 4, 6))
    assertInAnyOrder(parts(1).collect().toSeq, Seq(1, 3, 5))
    release() // must not throw; branches stay usable (recompute, uncached)
    assertInAnyOrder(parts(0).collect().toSeq, Seq(2, 4, 6))
  }

  test("mapElements / flatMapElements / filterElements") {
    val ds = Seq(1, 2, 3, 4).toDS()
    assertInAnyOrder(ds.mapElements(_ * 2).collect().toSeq, Seq(2, 4, 6, 8))
    assertInAnyOrder(ds.flatMapElements(n => Seq.fill(n)(n)).collect().toSeq,
      Seq(1, 2, 2, 3, 3, 3, 4, 4, 4, 4))
    assertInAnyOrder(ds.filterElements(_ % 2 == 0).collect().toSeq, Seq(2, 4))
  }

  test("parDo runs bundle hooks and supports 0..n outputs") {
    val ds = Seq("a b", "", "c").toDS().repartition(2)
    val out = ds.parDo(new DoFn[String, String] {
      private var n = 0
      override def startBundle(): Unit = { n = 0 }
      override def processElement(s: String): IterableOnce[String] = {
        val words = s.split(" ").filter(_.nonEmpty); n += words.length; words
      }
      override def finishBundle(): IterableOnce[String] = Iterator(s"bundle:$n")
    }).collect().toSeq
    assertInAnyOrder(out.filterNot(_.startsWith("bundle:")), Seq("a", "b", "c"))
    // one finishBundle marker per non-empty partition, counts sum to 3
    assert(out.count(_.startsWith("bundle:")) == 2)
    assert(out.filter(_.startsWith("bundle:")).map(_.drop(7).toInt).sum == 3)
  }

  test("withKeys / keys / values / kvSwap") {
    val kv = Seq("apple", "fig").toDS().withKeys(_.length)
    assertInAnyOrder(kv.collect().toSeq, Seq((5, "apple"), (3, "fig")))
    assertInAnyOrder(kv.keys.collect().toSeq, Seq(5, 3))
    assertInAnyOrder(kv.values.collect().toSeq, Seq("apple", "fig"))
    assertInAnyOrder(kv.kvSwap.collect().toSeq, Seq(("apple", 5), ("fig", 3)))
  }

  test("partitionInto fans out by partition fn") {
    val parts = Seq(1, 2, 3, 4, 5, 6).toDS().partitionInto(3)(_ % 3)
    assertInAnyOrder(parts(0).collect().toSeq, Seq(3, 6))
    assertInAnyOrder(parts(1).collect().toSeq, Seq(1, 4))
    assertInAnyOrder(parts(2).collect().toSeq, Seq(2, 5))
  }

  test("flatten unions n datasets; flattenIterables explodes") {
    val out = ElementWise.flatten(Seq(Seq(1, 2).toDS(), Seq(3).toDS(), Seq(4).toDS()))
    assertInAnyOrder(out.collect().toSeq, Seq(1, 2, 3, 4))
    val fl = ElementWise.flattenIterables(Seq(Seq(1, 2), Seq(3)).toDS())
    assertInAnyOrder(fl.collect().toSeq, Seq(1, 2, 3))
  }

  test("multiOutput routes to tagged outputs in one pass") {
    val outs = ElementWise.multiOutput(Seq(1, 2, 3, 4).toDS(), Seq("even", "odd")) {
      n => (if (n % 2 == 0) "even" else "odd", n)
    }
    assertInAnyOrder(outs("even").collect().toSeq, Seq(2, 4))
    assertInAnyOrder(outs("odd").collect().toSeq, Seq(1, 3))
  }

  test("create and reshuffle") {
    val ds = ElementWise.create(spark, Seq(1, 2, 3)).reshuffle(2)
    assert(ds.rdd.getNumPartitions == 2)
    assertInAnyOrder(ds.collect().toSeq, Seq(1, 2, 3))
  }
}
