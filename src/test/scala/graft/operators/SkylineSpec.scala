package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** skyline2d: survivors must be exactly the undominated rows (x
  * minimized, y maximized), duplicates of an undominated point all
  * survive, and the decomposed plan (per-x collapse + range-partitioned
  * exclusive prefix max) must equal the O(n²) dominance definition. */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def scalarSkyline(rows: Seq[(String, Double, Double)]): Seq[(String, Double, Double)] =
    rows.filter { case (g, qx, qy) =>
      !rows.exists { case (pg, px, py) =>
        pg == g && px <= qx && py >= qy && (px < qx || py > qy)
      }
    }

  test("hand case: frontier only, duplicates of a frontier point survive") {
    val rows = Seq(
      ("g", 1.0, 1.0),  // frontier (cheapest)
      ("g", 2.0, 5.0),  // frontier
      ("g", 2.0, 5.0),  // duplicate -> also survives
      ("g", 2.0, 4.0),  // dominated by (2,5) at the same x
      ("g", 3.0, 5.0),  // dominated by (2,5): larger x, equal y
      ("g", 4.0, 9.0),  // frontier
      ("g", 5.0, 8.0))  // dominated by (4,9)
    val out = Skyline.skyline2d(rows.toDF("g", "x", "y"), Seq("g"),
        col("x"), col("y"))
      .as[(String, Double, Double)].collect().toSeq
    assertInAnyOrder(out,
      Seq(("g", 1.0, 1.0), ("g", 2.0, 5.0), ("g", 2.0, 5.0), ("g", 4.0, 9.0)))
  }

  test("groups are independent and an empty key seq gives one global skyline") {
    val rows = Seq(("a", 1.0, 1.0), ("a", 2.0, 2.0), ("b", 2.0, 2.0), ("b", 3.0, 1.0))
    val perGroup = Skyline.skyline2d(rows.toDF("g", "x", "y"), Seq("g"),
        col("x"), col("y"))
      .as[(String, Double, Double)].collect().toSeq
    // within a: both survive (trade-off); within b: (3,1) dominated by (2,2)
    assertInAnyOrder(perGroup,
      Seq(("a", 1.0, 1.0), ("a", 2.0, 2.0), ("b", 2.0, 2.0)))
    val global = Skyline.skyline2d(rows.toDF("g", "x", "y"), Seq.empty,
        col("x"), col("y"))
      .as[(String, Double, Double)].collect().toSeq
    assertInAnyOrder(global, Seq(("a", 1.0, 1.0), ("a", 2.0, 2.0), ("b", 2.0, 2.0)))
  }

  test("matches the O(n²) dominance definition on seeded data") {
    val rnd = new scala.util.Random(17)
    val rows = (0 until 600).map { i =>
      (s"g${i % 3}", rnd.nextInt(40).toDouble, rnd.nextInt(40).toDouble)
    }
    val out = Skyline.skyline2d(rows.toDF("g", "x", "y"), Seq("g"),
        col("x"), col("y"))
      .as[(String, Double, Double)].collect().toSeq
    assertInAnyOrder(out, rows.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      scalarSkyline(g)
    })
  }
}
