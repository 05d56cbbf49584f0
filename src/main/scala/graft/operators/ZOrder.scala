package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-dimension data-layout tool
  * for 100 TB tables (the Delta/Iceberg `OPTIMIZE ZORDER BY` shape,
  * built from public bit-interleaving arithmetic).
  *
  * A table range-partitioned and sorted by ONE column skips files only
  * for predicates on that column; interleaving the bits of two (or
  * more) key columns gives a single sort key whose contiguous ranges
  * are small HYPER-RECTANGLES in key space, so parquet min/max file and
  * row-group stats prune scans for box predicates on EITHER column.
  * At 1000 executors this is the difference between "every filter on a
  * secondary key scans 100 TB" and "it scans the files whose bounding
  * box intersects the predicate".
  *
  * Everything here is pure Column arithmetic (shifts/masks — codegen'd,
  * no UDF, replayable bit-for-bit in any SQL engine, which is what lets
  * the gate oracle-check it).
  */
object ZOrder {

  /** Spread the low 16 bits of `v` to the even bit positions of a
    * 32-bit value: bit i of (v & 0xFFFF) lands at bit 2i. The classic
    * magic-mask doubling network (public domain "Interleave bits by
    * Binary Magic Numbers" — Stanford Bit Twiddling Hacks). */
  def spread16(v: Column): Column = {
    val a = v.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit keys: x on even bits, y on odd.
    * Callers clamp/scale wider domains to 16 bits first (at 100 TB the
    * leading 16 bits of each dimension decide file placement; finer
    * bits only reorder within a file). */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Spread the low 21 bits of `v` to every 3rd bit position (the 3-D
    * sibling of [[spread16]]; same public magic-mask network with the
    * standard 3-spacing constants). */
  def spread21(v: Column): Column = {
    val a = v.bitwiseAND(lit(0x1FFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 32)).bitwiseAND(lit(0x1F00000000FFFFL))
    val c = b.bitwiseOR(shiftleft(b, 16)).bitwiseAND(lit(0x1F0000FF0000FFL))
    val d = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x100F00F00F00F00FL))
    val e = d.bitwiseOR(shiftleft(d, 4)).bitwiseAND(lit(0x10C30C30C30C30C3L))
    e.bitwiseOR(shiftleft(e, 2)).bitwiseAND(lit(0x1249249249249249L))
  }

  /** 63-bit Morton code of three 21-bit keys — box predicates on any of
    * THREE columns prune files. Same normalization rule as 2-D: scale
    * all dimensions to equal bit widths first. */
  def zValue3(x: Column, y: Column, z: Column): Column =
    spread21(x)
      .bitwiseOR(shiftleft(spread21(y), 1))
      .bitwiseOR(shiftleft(spread21(z), 2))

  /** Min-max scale a dimension onto the full 16-bit range. The curve
    * interleaves bit POSITIONS, so dimensions must occupy equal bit
    * widths or the wider one dominates file placement and the narrow
    * one never prunes — production z-order (Delta's OPTIMIZE) rank- or
    * range-normalizes every column for exactly this reason. Integer
    * arithmetic, deterministic; bounds come from stats or domain
    * knowledge (one tiny agg at write time). */
  def scaleTo16(v: Column, lo: Long, hi: Long): Column = {
    val span = math.max(1L, hi - lo)
    // exact for spans < 2^37: numerator < 2^53 stays integral in double,
    // and fp division is correctly rounded, so floor matches integer div
    floor((v.cast("long") - lit(lo)).cast("double") * lit(65535.0) / lit(span.toDouble))
      .cast("long")
  }

  /** Cluster a DataFrame for writing: range-partition into `numFiles`
    * output files by the z-value of (x, y), sorting within each
    * partition, so every written file covers one contiguous z-range =
    * one small (x, y) bounding box. One range exchange (sampling pass +
    * shuffle) — identical cost shape to a plain global sort-by-key. */
  def clusterByZ(df: DataFrame, numFiles: Int, x: Column, y: Column): DataFrame = {
    val z = zValue(x, y)
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
  }

  /** Per-file (x_min, x_max, y_min, y_max) of a written layout — the
    * stats parquet footers keep, collected once (one row per file) so
    * any number of box probes evaluate driver-side without re-scanning. */
  def fileStats(written: DataFrame, x: Column, y: Column): Array[(Long, Long, Long, Long)] =
    written
      .groupBy(input_file_name().as("file"))
      .agg(min(x).as("x_min"), max(x).as("x_max"),
        min(y).as("y_min"), max(y).as("y_max"))
      .collect()
      .map(r => (r.getAs[Long]("x_min"), r.getAs[Long]("x_max"),
        r.getAs[Long]("y_min"), r.getAs[Long]("y_max")))

  /** Files whose bounding box intersects [xLo,xHi]×[yLo,yHi] — the scan
    * planner's footer-stats pruning arithmetic. */
  def touched(stats: Array[(Long, Long, Long, Long)],
              xLo: Long, xHi: Long, yLo: Long, yHi: Long): Int =
    stats.count { case (xMin, xMax, yMin, yMax) =>
      xMax >= xLo && xMin <= xHi && yMax >= yLo && yMin <= yHi
    }

  /** One-box convenience over [[fileStats]]/[[touched]]; prefer those
    * directly when probing several boxes on one layout. */
  def filesTouched(written: DataFrame, x: Column, y: Column,
                   xLo: Long, xHi: Long, yLo: Long, yHi: Long): (Long, Long) = {
    val stats = fileStats(written, x, y)
    (touched(stats, xLo, xHi, yLo, yHi).toLong, stats.length.toLong)
  }
}
