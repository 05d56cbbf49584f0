package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial joins by uniform grid blocking — the spatial analog of LSH
  * banding: bucket points into radius-sized grid cells, generate
  * candidate pairs only between a cell and its geometric neighborhood,
  * then verify the exact distance predicate per candidate. The all-pairs
  * O(n²) cross join never happens; candidate volume is density-bounded
  * (points-per-cell²·cells), which is the property that survives a
  * 1000-executor scale-up (Bentley's uniform-grid method; the same shape
  * MapReduce spatial joins — SJMR, Zhang et al. ICDCS 2009 — shard by).
  *
  * Arithmetic contract: coordinates are exact LONGS in caller-chosen
  * micro-units (e.g. micro-degrees·cos-corrected, or millimeters — the
  * engine never sees floats), and every distance is the exact integer
  * squared Euclidean distance. No sqrt, no epsilon, no float rounding:
  * the grid decomposition provably returns the IDENTICAL pair set a
  * direct O(n²) distance filter would, and the DuckDB oracle states that
  * direct form.
  *
  * Overflow: |coordinates| must stay ≤ ~1.5·10⁹ (coordinate deltas are
  * squared in long arithmetic); micro-degree and millimeter encodings
  * of Earth-scale data fit with orders of magnitude to spare.
  *
  * Skew: a uniform grid inherits the data's density skew — a cell over
  * a megacity can hold millions of points while rural cells hold none.
  * The candidate generator is a plain equi-join on cell keys, so AQE
  * skew-join splitting applies as-is; beyond that, halve the cell size
  * (more cells, same neighborhood guarantee via the offset list) or
  * salt the hottest cells the way Skew.saltedJoin does.
  */
object Spatial {

  /** Exact floor division for longs of any sign (Spark's `div` truncates
    * toward zero; pmod is always non-negative, so this is exact). */
  private def floorDiv(x: Column, d: Long): Column =
    ((x - pmod(x, lit(d))) / lit(d)).cast("long")

  private def dist2(xa: Column, ya: Column, xb: Column, yb: Column): Column =
    (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)

  /** All unordered point pairs within `radius`: (id_a, id_b, dist2) with
    * id_a < id_b and dist2 = (xa−xb)² + (ya−yb)² ≤ radius².
    *
    * Cell size = radius, so any pair within radius lands in the same or
    * an adjacent cell (3×3 coverage). Each pair is generated EXACTLY
    * once, not 9 times and not twice: the probe side replicates into
    * only the lexicographically-forward half of its neighborhood — self,
    * east, and the three northern cells — so a cross-cell pair is seen
    * from exactly one of its two cells, and same-cell pairs are ordered
    * by id. Replication factor 5 on ids+coords (never a payload), one
    * shuffle on cell keys, then a codegen'd integer filter.
    *
    * @param points (id: long — unique, x: long, y: long)
    */
  def radiusJoin(points: DataFrame, radius: Long): DataFrame = {
    require(radius > 0, s"radius must be positive, got $radius")
    val p = points.select(col("id").cast("long").as("id"),
      col("x").cast("long").as("x"), col("y").cast("long").as("y"))
    val withCell = p
      .withColumn("__cx", floorDiv(col("x"), radius))
      .withColumn("__cy", floorDiv(col("y"), radius))
    // forward half-neighborhood in (cy, cx) lexicographic order
    val offsets = Seq((0, 0), (1, 0), (-1, 1), (0, 1), (1, 1))
    val probe = withCell.select(
      col("id").as("id_p"), col("x").as("xp"), col("y").as("yp"),
      explode(array(offsets.map { case (dx, dy) =>
        struct((col("__cx") + dx).as("cx"), (col("__cy") + dy).as("cy"),
          lit(dx == 0 && dy == 0).as("same"))
      }: _*)).as("__n"))
      .select(col("id_p"), col("xp"), col("yp"),
        col("__n.cx").as("__cx"), col("__n.cy").as("__cy"),
        col("__n.same").as("__same"))
    probe.join(withCell, Seq("__cx", "__cy"))
      .filter((!col("__same") || col("id_p") < col("id")) &&
        dist2(col("xp"), col("yp"), col("x"), col("y")) <= lit(radius) * lit(radius))
      .select(
        least(col("id_p"), col("id")).as("id_a"),
        greatest(col("id_p"), col("id")).as("id_b"),
        dist2(col("xp"), col("yp"), col("x"), col("y")).as("dist2"))
  }

  /** Bounded k-nearest-neighbors: for each point, its k nearest OTHER
    * points among those within `radius`, ranked 1..k by (dist2, id) —
    * the deterministic tiebreak makes the result replayable. Points
    * with fewer than k in-radius neighbors emit fewer rows; the radius
    * bound is what keeps the operator one grid join instead of an
    * unbounded all-pairs scan (unbounded exact kNN at scale wants a
    * space-filling-curve index — see ZOrder — or an ANN structure — see
    * Similarity).
    *
    * Probe side replicates into its full 3×3 neighborhood (each probe
    * must see ALL its candidates to rank them); the per-probe top-k is a
    * row_number window partitioned by the probe id — no global order,
    * partition cardinality = candidate count, density-bounded.
    *
    * @param points (id: long — unique, x: long, y: long)
    * @return (id, neighbor_id, dist2, rnk)
    */
  def knnWithinRadius(points: DataFrame, radius: Long, k: Int): DataFrame = {
    require(radius > 0, s"radius must be positive, got $radius")
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val p = points.select(col("id").cast("long").as("id"),
      col("x").cast("long").as("x"), col("y").cast("long").as("y"))
    val withCell = p
      .withColumn("__cx", floorDiv(col("x"), radius))
      .withColumn("__cy", floorDiv(col("y"), radius))
    val offsets = for { dx <- -1 to 1; dy <- -1 to 1 } yield (dx, dy)
    val probe = withCell.select(
      col("id").as("id_p"), col("x").as("xp"), col("y").as("yp"),
      explode(array(offsets.map { case (dx, dy) =>
        struct((col("__cx") + dx).as("cx"), (col("__cy") + dy).as("cy"))
      }: _*)).as("__n"))
      .select(col("id_p"), col("xp"), col("yp"),
        col("__n.cx").as("__cx"), col("__n.cy").as("__cy"))
    val cand = probe.join(withCell, Seq("__cx", "__cy"))
      .filter(col("id_p") =!= col("id") &&
        dist2(col("xp"), col("yp"), col("x"), col("y")) <= lit(radius) * lit(radius))
      .select(col("id_p"), col("id").as("neighbor_id"),
        dist2(col("xp"), col("yp"), col("x"), col("y")).as("dist2"))
    val w = Window.partitionBy(col("id_p"))
      .orderBy(col("dist2"), col("neighbor_id"))
    cand.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("id_p").as("id"), col("neighbor_id"), col("dist2"),
        col("rnk").cast("long").as("rnk"))
  }

  /** Point-in-rectangle containment join: every (point, rect) pair with
    * xmin ≤ x ≤ xmax ∧ ymin ≤ y ≤ ymax — the geofencing / region-rollup
    * primitive (points × admin boxes, events × store catchments).
    *
    * Rectangles replicate onto every grid cell their bbox covers
    * (`sequence` × `sequence`, bounded by rect-size/cellSize per axis);
    * each point lives in EXACTLY one cell, so the cell equi-join sees
    * each candidate pair exactly once — no dedup pass. Choose cellSize
    * near the typical rect size: smaller cells multiply rect replicas,
    * larger cells multiply per-cell candidates. Same exact-long
    * arithmetic and skew posture as radiusJoin (AQE splits hot cells).
    *
    * @param points (id: long — unique, x: long, y: long)
    * @param rects  (rid: long — unique, xmin, ymin, xmax, ymax: long,
    *               xmin ≤ xmax and ymin ≤ ymax; violations yield no
    *               pairs, matching the empty rectangle they denote)
    * @return (id, rid, x, y) — one row per containment
    */
  def containsJoin(points: DataFrame, rects: DataFrame,
                   cellSize: Long): DataFrame = {
    require(cellSize > 0, s"cellSize must be positive, got $cellSize")
    val p = points.select(col("id").cast("long").as("id"),
        col("x").cast("long").as("x"), col("y").cast("long").as("y"))
      .withColumn("__cx", floorDiv(col("x"), cellSize))
      .withColumn("__cy", floorDiv(col("y"), cellSize))
    val r = rects.select(col("rid").cast("long").as("rid"),
        col("xmin").cast("long").as("xmin"), col("ymin").cast("long").as("ymin"),
        col("xmax").cast("long").as("xmax"), col("ymax").cast("long").as("ymax"))
      .filter(col("xmin") <= col("xmax") && col("ymin") <= col("ymax"))
      .withColumn("__cx",
        explode(sequence(floorDiv(col("xmin"), cellSize),
          floorDiv(col("xmax"), cellSize))))
      .withColumn("__cy",
        explode(sequence(floorDiv(col("ymin"), cellSize),
          floorDiv(col("ymax"), cellSize))))
    p.join(r, Seq("__cx", "__cy"))
      .filter(col("x").between(col("xmin"), col("xmax")) &&
        col("y").between(col("ymin"), col("ymax")))
      .select(col("id"), col("rid"), col("x"), col("y"))
  }
}
