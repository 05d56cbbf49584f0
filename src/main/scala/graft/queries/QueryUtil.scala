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
}
