package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-pair mining + association rules — the first (and in
  * practice dominant) level of Apriori (Agrawal & Srikant, "Fast
  * Algorithms for Mining Association Rules", VLDB 1994) re-expressed
  * relationally: items are pruned to the frequent set BEFORE the
  * pair join (the apriori property: an infrequent item cannot be in a
  * frequent pair), so the basket self-join fans out only over
  * frequent items per basket — bounded by basket width, never by
  * catalog size.
  *
  * Scale posture: one distinct over (basket, item), one hash
  * aggregation for item supports, one basket-key equi-join for pairs
  * (fan-out ≤ frequent-items-per-basket², map-side combinable), one
  * pair aggregation. The frequent-item set and the 1-row basket count
  * broadcast. No windows, no cartesians.
  *
  * Arithmetic contract: supports are exact BIGINT counts; the support
  * threshold is exact integer arithmetic ⌈nB·num/den⌉ =
  * (nB·num + den − 1) DIV den; confidence and lift are each ONE double
  * division over exactly-representable integer products (< 2⁵³), so
  * every metric replays bit-for-bit in the oracle.
  */
object Association {

  /** Frequent item pairs with confidence both directions and lift.
    *
    * @param baskets    one row per basket-item incidence (duplicates
    *                   collapse: support is "baskets containing", not
    *                   "times bought")
    * @param basketCol  basket id column name
    * @param itemCol    item id column name
    * @param minSupNum  minimum relative support numerator
    * @param minSupDen  minimum relative support denominator — items and
    *                   pairs must appear in ≥ ⌈nB·num/den⌉ baskets
    * @return (item_a, item_b, n_baskets, n_a, n_b, n_ab,
    *          conf_a_to_b, conf_b_to_a, lift) with item_a < item_b,
    *         one row per frequent pair
    */
  def frequentPairs(baskets: DataFrame, basketCol: String, itemCol: String,
                    minSupNum: Long, minSupDen: Long): DataFrame = {
    require(minSupNum > 0 && minSupDen > 0, "support fraction must be positive")
    // distinct + snapshot: the incidence list feeds the item supports,
    // both sides of the pair join, and the basket count — without the
    // checkpoint each consumer re-runs the upstream distinct shuffle
    val bi = baskets
      .select(col(basketCol).as("__b"), col(itemCol).cast("long").as("__i"))
      .distinct()
      .localCheckpoint()
    val nB = bi.agg(countDistinct(col("__b")).as("n_baskets"))
    val nBb = broadcast(nB.select(col("n_baskets"),
      expr(s"(n_baskets * $minSupNum + ${minSupDen - 1}) DIV $minSupDen").as("__thr")))
    // apriori prune: only frequent items enter the pair join
    val freq = bi.groupBy(col("__i")).agg(count(lit(1)).as("__n"))
      .crossJoin(nBb)
      .filter(col("__n") >= col("__thr"))
      .select(col("__i"), col("__n"))
      .localCheckpoint() // small: ≤ |frequent items|
    val fi = bi.join(broadcast(freq), "__i")
    val pairs = fi.as("x").join(fi.as("y"),
        col("x.__b") === col("y.__b") && col("x.__i") < col("y.__i"))
      .groupBy(col("x.__i").as("item_a"), col("y.__i").as("item_b"))
      .agg(count(lit(1)).as("n_ab"),
        first(col("x.__n")).as("n_a"), first(col("y.__n")).as("n_b"))
      .crossJoin(nBb)
      .filter(col("n_ab") >= col("__thr"))
    pairs.select(col("item_a"), col("item_b"), col("n_baskets"),
      col("n_a"), col("n_b"), col("n_ab"),
      round(col("n_ab").cast("double") / col("n_a"), 6).as("conf_a_to_b"),
      round(col("n_ab").cast("double") / col("n_b"), 6).as("conf_b_to_a"),
      round((col("n_ab") * col("n_baskets")).cast("double") /
        (col("n_a") * col("n_b")).cast("double"), 6).as("lift"))
  }
}
