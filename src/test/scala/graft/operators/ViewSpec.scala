package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Side-input views ([U] T/View.java; SURVEY §2.3): broadcast materializa-
  * tions readable inside closures, plus the relational broadcast join. */
class ViewSpec extends SparkSpec {
  import spark.implicits._

  test("asSingleton broadcasts exactly-one value and rejects multi-row input") {
    val one = View.asSingleton(Seq(42).toDS())
    assert(one.value == 42)
    intercept[IllegalArgumentException] {
      View.asSingleton(Seq(1, 2).toDS())
    }
  }

  test("asList / asMap / asMultimap materialize for closure-side access") {
    val xs = Seq(("a", 1), ("b", 2), ("a", 3))
    assert(View.asList(xs.toDS()).value.toSet == xs.toSet)
    assert(View.asMap(Seq(("a", 1), ("b", 2)).toDS()).value == Map("a" -> 1, "b" -> 2))
    assert(View.asMultimap(xs.toDS()).value == Map("a" -> Seq(1, 3), "b" -> Seq(2)))
  }

  test("closure views fail fast past maxRows instead of OOMing the driver") {
    val big = spark.range(100).map(i => (i, i * 2))
    Seq(
      (() => View.asList(big, maxRows = 10), "asList"),
      (() => View.asMap(big, maxRows = 10), "asMap"),
      (() => View.asMultimap(big, maxRows = 10), "asMultimap")
    ).foreach { case (mk, name) =>
      val e = intercept[IllegalArgumentException](mk())
      assert(e.getMessage.contains("side input exceeds 10 rows"), s"$name guard")
      assert(e.getMessage.contains("broadcastJoin"), s"$name points at the fix")
    }
    // at exactly the bound the views still materialize
    assert(View.asList(big, maxRows = 100).value.length == 100)
  }

  test("a view drives per-element logic inside a map closure") {
    val rates = View.asMap(Seq(("EUR", 1.1), ("GBP", 1.3)).toDS())
    val out = Seq(("EUR", 100.0), ("GBP", 200.0), ("USD", 50.0)).toDS()
      .map { case (ccy, amt) => (ccy, amt * rates.value.getOrElse(ccy, 1.0)) }
      .collect().toMap
    assert(out == Map("EUR" -> 110.00000000000001, "GBP" -> 260.0, "USD" -> 50.0))
  }

  test("broadcastJoin plans a BroadcastHashJoin (big side never shuffles)") {
    val big = spark.range(1000).selectExpr("id", "id % 10 as k")
    val dim = Seq((0L, "zero"), (1L, "one")).toDF("k", "name")
    val joined = View.broadcastJoin(big, dim, Seq("k"))
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(joined.count() == 200)
    assertNoCartesian(joined)
  }
}
