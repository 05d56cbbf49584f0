package graft

import graft.queries._

/** The driver-contract discipline, asserted mechanically:
  *
  *  - every registered query has an oracle and every oracle names a
  *    registered query (a typo'd oracle key would otherwise be IGNORED
  *    silently — the query would grade rows-only and the round's gate
  *    would weaken without anyone noticing);
  *  - no two query modules register the same name (SparkEntry merges
  *    with `Map ++`, which silently keeps the LAST definition — a name
  *    collision would shadow a query and its oracle without any error).
  */
class EntryContractSpec extends SparkSpec {

  test("oracleSql keys and queries keys are the SAME set") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles for unregistered queries: ${(o -- q).toSeq.sorted}")
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
  }

  test("no query name collides across modules (Map ++ would silently shadow)") {
    val parts = Seq(
      "BatchQueries" -> BatchQueries.defs.keySet,
      "WindowQueries" -> WindowQueries.defs.keySet,
      "LlmQueries" -> LlmQueries.defs.keySet,
      "IoQueries" -> IoQueries.defs.keySet,
      "CurationQueries" -> CurationQueries.defs.keySet,
      "WebQueries" -> WebQueries.defs.keySet,
      "AnalyticsQueries" -> AnalyticsQueries.defs.keySet,
      "WarehouseQueries" -> WarehouseQueries.defs.keySet,
      "GeoQueries" -> GeoQueries.defs.keySet,
      "StatsQueries" -> StatsQueries.defs.keySet)
    val dupes = parts.flatMap { case (m, ks) => ks.map(_ -> m) }
      .groupBy(_._1).filter(_._2.size > 1)
    assert(dupes.isEmpty,
      s"query names registered in more than one module: " +
        dupes.map { case (k, ms) => s"$k in ${ms.map(_._2).mkString("+")}" }.mkString(", "))
    // and the merged map must be exactly the sum of the parts + the two
    // inline flagship queries
    val partTotal = parts.map(_._2.size).sum + 2 // q1_agg, q_wordcount
    assert(SparkEntry.queries.size == partTotal,
      s"merged ${SparkEntry.queries.size} != parts $partTotal — a module " +
        "shadowed a core query or a name collided")
  }
}
