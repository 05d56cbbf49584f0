package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** First-order Markov transition estimation over per-key event
  * sequences — the "what do users do next" primitive behind session-flow
  * analysis, next-action prediction features, and funnel discovery.
  *
  * Scale posture: ONE per-key window pass pairs each event with its
  * successor (lead over the key partition — partition cardinality is the
  * per-key event count, never corpus-global), then a map-combinable hash
  * aggregation counts (from, to) pairs. The per-from normalizer rides a
  * second window over the AGGREGATED frame — |states|² rows, trivially
  * small however large the input — so the heavy data is touched exactly
  * once and shuffled exactly twice (key partition, then pair keys).
  *
  * Determinism: successor order is (orderCol, idCol) — the unique id
  * breaks timestamp ties, so simultaneous events produce one replayable
  * chain instead of frame-order nondeterminism. Counts are exact longs;
  * each probability is ONE double division of two exact longs, so the
  * matrix replays bit-for-bit on any engine.
  *
  * A key's LAST event has no successor and contributes no pair (the
  * standard maximum-likelihood estimate conditions on a next event
  * existing).
  */
object Markov {

  /** Per-(from, to) transition counts and row-stochastic probabilities.
    *
    * @param events   one row per event
    * @param keyCol   chain identity (e.g. user) — transitions never
    *                 cross keys
    * @param orderCol event-order column (e.g. epoch micros)
    * @param idCol    unique id, the deterministic tiebreak
    * @param stateCol the state label column
    * @return (from_state, to_state, n, p) with Σp = 1 per from_state
    */
  def transitions(events: DataFrame, keyCol: String, orderCol: String,
                  idCol: String, stateCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seq = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol), col(idCol))
    val pairs = events
      .select(col(keyCol), col(orderCol), col(idCol),
        col(stateCol).as("from_state"))
      .withColumn("to_state", lead(col("from_state"), 1).over(seq))
      .filter(col("to_state").isNotNull)
    val counts = pairs.groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
    // |states|² rows from here on — the window is over a tiny frame
    val perFrom = Window.partitionBy(col("from_state"))
    counts.withColumn("p",
        col("n").cast("double") / sum(col("n")).over(perFrom).cast("double"))
  }
}
