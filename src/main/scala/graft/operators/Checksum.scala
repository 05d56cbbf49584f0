package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-free table fingerprinting — the anti-entropy primitive: did
  * two replicas / two engines / two snapshot generations materialize
  * the SAME multiset of rows, answered in ONE scan with no sort and no
  * shuffle beyond a 1-row aggregation.
  *
  * Each row hashes to a 60-bit integer (the first 15 hex chars of an
  * md5 over the U+0001-joined canonical column strings — the portable
  * md5 device the DP-noise oracle proved cross-engine); the table
  * fingerprint is the SUM of row hashes as DECIMAL(38,0). Addition is
  * commutative/associative, so the result is partition-count- and
  * order-invariant — exactly reproducible on any engine from the same
  * rows — and any single-row difference moves it with probability
  * ~1 − 2⁻⁶⁰. Per-column sums localize WHICH column diverged before
  * anyone diffs rows.
  *
  * Scale posture: one pass, map-side partial sums, a 1-row result.
  * At 10¹² rows the sum stays < 2^100 ≪ DECIMAL(38)'s 2^126. Cost is
  * one md5 per emitted sum per row (the CROSS-ENGINE portability
  * price — md5 is the one hash both engines spell identically);
  * same-engine replica comparison should swap h60 for xxhash64, which
  * is codegen'd and ~an order of magnitude cheaper per row.
  *
  * Cross-engine contract: parity requires ENGINE-IDENTICAL canonical
  * strings. Integers, strings, and timestamps cast identically on
  * Spark and DuckDB; raw DOUBLE→string does NOT (Java uses scientific
  * notation outside [10⁻³, 10⁷)) — route doubles through
  * DECIMAL(p,s) first (the registered query shows the shape). NULL
  * encodes as a U+0001-prefixed sentinel no real string equals (and
  * columns join on U+0001, not bare concatenation), so ('a', NULL) /
  * (NULL, 'a') / ('a' + sentinel-lookalike, …) all hash differently.
  */
object Checksum {

  private val Sep = "\u0001"
  private val NullSentinel = "\u0001NULL"

  private def canon(c: Column): Column =
    coalesce(c.cast("string"), lit(NullSentinel))

  /** 60-bit portable row hash of a canonical string column. */
  private def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("decimal(38,0)")

  /** One row: n_rows, row_checksum, plus checksum_<col> per column.
    * `cols` must already be canonical (see the class doc). */
  def tableChecksum(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to fingerprint")
    val rowStr = concat_ws(Sep, cols.map(c => canon(col(c))): _*)
    val aggs = sum(h60(rowStr)).as("row_checksum") +:
      cols.map(c => sum(h60(canon(col(c)))).as(s"checksum_$c"))
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }
}
