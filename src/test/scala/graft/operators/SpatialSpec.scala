package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Spatial grid blocking: the decomposed radius join must equal the
  * O(n²) distance-filter definition EXACTLY (boundary inclusive, each
  * pair once), on negative coordinates too (floor division, not
  * truncation); kNN ranks with the deterministic (dist2, id) tiebreak. */
class SpatialSpec extends SparkSpec {
  import spark.implicits._

  test("hand case: boundary-inclusive, cross-cell and same-cell pairs, each once") {
    // radius 10: cells are 10×10
    val pts = Seq(
      (1L, 0L, 0L),    // cell (0,0)
      (2L, 6L, 8L),    // same cell as 1, dist2 = 36+64 = 100 = r² (boundary)
      (3L, 11L, 0L),   // east cell, dist2 to 1 = 121 (out), to 2 = 25+64=89 (in)
      (4L, 9L, 19L),   // north cell, dist2 to 2 = 9+121=130 (out)
      (5L, 40L, 40L))  // far from everything
    val out = Spatial.radiusJoin(pts.toDF("id", "x", "y"), 10L)
      .as[(Long, Long, Long)].collect().toSeq
    assertInAnyOrder(out, Seq((1L, 2L, 100L), (2L, 3L, 89L)))
  }

  test("blocked join ≡ brute-force all-pairs on a pseudo-random set with negative coords") {
    // deterministic LCG points spanning negative and positive space —
    // exercises floorDiv (truncating division would misalign the grid
    // around zero and silently drop cross-boundary pairs)
    val pts = (1 to 300).map { i =>
      val x = (i * 48271L % 2000L) - 1000L
      val y = (i * 16807L % 2000L) - 1000L
      (i.toLong, x, y)
    }
    val df = pts.toDF("id", "x", "y")
    val r = 150L
    val blocked = Spatial.radiusJoin(df, r)
      .as[(Long, Long, Long)].collect().toSet
    val brute = (for {
      (ia, xa, ya) <- pts; (ib, xb, yb) <- pts
      if ia < ib
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= r * r
    } yield (ia, ib, d2)).toSet
    assert(brute.nonEmpty, "degenerate fixture: no qualifying pairs")
    assert(blocked === brute)
  }

  test("knn ranks by (dist2, id), caps at k, and isolated points emit nothing") {
    val pts = Seq(
      (10L, 0L, 0L),
      (11L, 3L, 0L),   // dist2 9
      (12L, 0L, 3L),   // dist2 9 — tie with 11, lower id ranks first
      (13L, 4L, 0L),   // dist2 16
      (14L, 5L, 0L),   // dist2 25 — cut by k=3? no: k=3 keeps 11,12,13
      (99L, 1000L, 1000L)) // isolated
    val out = Spatial.knnWithinRadius(pts.toDF("id", "x", "y"), 100L, 3)
      .filter(col("id") === 10L)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._4)
    assert(out === Seq((10L, 11L, 9L, 1L), (10L, 12L, 9L, 2L), (10L, 13L, 16L, 3L)))
    val iso = Spatial.knnWithinRadius(pts.toDF("id", "x", "y"), 100L, 3)
      .filter(col("id") === 99L).count()
    assert(iso === 0L)
  }

  test("knn ≡ brute-force bounded ranking on the pseudo-random set") {
    val pts = (1 to 200).map { i =>
      val x = (i * 48271L % 1000L) - 500L
      val y = (i * 16807L % 1000L) - 500L
      (i.toLong, x, y)
    }
    val r = 120L
    val k = 4
    val blocked = Spatial.knnWithinRadius(pts.toDF("id", "x", "y"), r, k)
      .as[(Long, Long, Long, Long)].collect().toSet
    val brute = pts.flatMap { case (ia, xa, ya) =>
      pts.filter(_._1 != ia)
        .map { case (ib, xb, yb) =>
          (ib, (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)) }
        .filter(_._2 <= r * r)
        .sortBy { case (ib, d2) => (d2, ib) }
        .take(k).zipWithIndex
        .map { case ((ib, d2), idx) => (ia, ib, d2, idx + 1L) }
    }.toSet
    assert(brute.nonEmpty)
    assert(blocked === brute)
  }

  test("containsJoin: boundary-inclusive containment, multi-cell rects, empty rects") {
    val pts = Seq(
      (1L, 0L, 0L), (2L, 10L, 10L), (3L, -5L, 7L), (4L, 25L, 25L))
    // rect 100 spans cells; rect 200 exactly touches point 2 at its corner;
    // rect 300 is degenerate (xmin > xmax) and must match nothing
    val rects = Seq(
      (100L, -6L, -1L, 11L, 12L),
      (200L, 10L, 10L, 30L, 30L),
      (300L, 5L, 5L, -5L, 9L))
    val out = Spatial.containsJoin(
        pts.toDF("id", "x", "y"), rects.toDF("rid", "xmin", "ymin", "xmax", "ymax"),
        cellSize = 8L)
      .select("id", "rid").as[(Long, Long)].collect().toSeq
    assertInAnyOrder(out,
      Seq((1L, 100L), (2L, 100L), (3L, 100L), (2L, 200L), (4L, 200L)))
  }

  test("containsJoin ≡ brute-force on pseudo-random points and rects (negative coords)") {
    val pts = (1 to 250).map { i =>
      (i.toLong, (i * 48271L % 2000L) - 1000L, (i * 16807L % 2000L) - 1000L)
    }
    val rects = (1 to 40).map { j =>
      val cx = (j * 69621L % 2000L) - 1000L
      val cy = (j * 40692L % 2000L) - 1000L
      val w = j * 7L % 180L + 20L
      (j.toLong, cx - w, cy - w, cx + w, cy + w)
    }
    val out = Spatial.containsJoin(
        pts.toDF("id", "x", "y"), rects.toDF("rid", "xmin", "ymin", "xmax", "ymax"),
        cellSize = 100L)
      .select("id", "rid").as[(Long, Long)].collect().toSet
    val brute = (for {
      (i, x, y) <- pts
      (rj, xmin, ymin, xmax, ymax) <- rects
      if x >= xmin && x <= xmax && y >= ymin && y <= ymax
    } yield (i, rj)).toSet
    assert(brute.nonEmpty)
    assert(out === brute)
  }
}
