package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash-parity helpers shared by all declared queries (BASELINE.md).
  *
  * Double aggregation order differs between Spark (parallel partial aggs)
  * and the DuckDB oracle (sequential), so float sums drift in the last ulps.
  * Routing through DECIMAL makes the sum exact and order-independent; the
  * final cast back to double is then bit-identical on both engines.
  */
object QueryUtil {
  /** Exact sum of a double column via DECIMAL(18,4). */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,4)")).cast("double")

  /** Exact sum at 6-decimal precision (for price*discount products). */
  def dsum6(c: Column): Column = sum(c.cast("decimal(22,6)")).cast("double")

  /** Deterministic average: exact decimal sum, then one double division. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Multiset symmetric-difference size as a 1-row frame — the
    * "A ≡ B exactly" audit in ONE aggregation pass instead of two
    * exceptAll jobs (each a full shuffle + driver action): tag the rows
    * ±1, group by every column, sum |net|. Column sets must match. */
  def symmetricDiffCount(a: org.apache.spark.sql.DataFrame,
                         b: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cols = a.columns.toSeq
    val tagged = a.withColumn("__s", lit(1L))
      .unionByName(b.select(cols.map(col): _*).withColumn("__s", lit(-1L)))
    tagged.groupBy(cols.map(col): _*)
      .agg(sum(col("__s")).as("__d"))
      .agg(coalesce(sum(abs(col("__d"))), lit(0L)).as("__mismatch"))
  }
}
