package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-skew diagnosis for shuffle planning — measure the hot keys
  * BEFORE choosing a salt factor instead of guessing one.
  *
  * At 100 TB a join or aggregation on a key whose heaviest value owns
  * 20% of the rows stalls on one reducer regardless of cluster size;
  * the remedies (`Grouping.saltedJoin`, `Combine.sumWithHotKeyFanout`,
  * AQE skew split) all take a fan-out parameter someone has to pick.
  * This report derives it from the data: exact counts and shares for
  * every key above `minShare`, plus the integer fan-out that would
  * level that key across average-sized partitions.
  *
  * Scale shape: the long tail never shuffles — a Misra-Gries pass
  * (partial-aggregated per partition, summary-sized merge) nominates
  * candidates, the exact recount touches only candidate rows via a
  * broadcast semi-join, and the total rides a 1-row broadcast. MG is
  * complete for every key above N/(capacity+1) < minShare·N, so no
  * qualifying key can be missed.
  */
object Skew {

  /** One row per key with exact share ≥ `minShare`: (key_value, n_rows,
    * share, suggested_salt), heaviest first. `suggested_salt` =
    * ⌈n_rows / (total/parallelism)⌉ — the number of average-partition
    * units the key occupies at the given shuffle parallelism; 1 means
    * the key already fits a partition, k > 1 means salt it k ways
    * (integer arithmetic, so the recommendation replays exactly in any
    * engine). */
  def keySkewReport(df: DataFrame, key: Column, minShare: Double = 0.01,
                    parallelism: Int = 200, slack: Int = 2): DataFrame = {
    require(parallelism > 0, "parallelism must be positive")
    // the completeness-critical MG-prune/recount pipeline lives in
    // HeavyHitters (one copy of the N/(capacity+1) argument); this op
    // only adds the share/salt projection
    graft.llm.HeavyHitters.frequentValuesWithTotal(df, key, minShare, slack)
      .select(col("value").as("key_value"), col("n").as("n_rows"),
        (col("n").cast("double") / col("total")).as("share"),
        // SQL `div`, not `/`: Spark's slash on longs routes through
        // doubles, which is off-by-one-able past 2^53 — the exact
        // integer ceil is what "replays exactly in any engine" means
        expr(s"(n * $parallelism + total - 1) div total")
          .cast("long").as("suggested_salt"))
      .orderBy(col("n_rows").desc, col("key_value"))
  }
}
