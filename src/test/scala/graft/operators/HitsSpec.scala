package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Graph.hits: hand-worked bipartite case, L1 normalization invariant,
  * and the scalar fixed-point replay. */
class HitsSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000000L

  private def run(edges: Seq[(Long, Long, Long)], iters: Int) =
    Graph.hits(edges.toDF("src", "dst", "w"), iters)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  /** Scalar replay of the exact integer fixed-point updates. */
  private def scalar(edges: Seq[(Long, Long, Long)], iters: Int) = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    var hub = nodes.map(_ -> BigInt(Scale / nodes.size)).toMap
    var auth = Map.empty[Long, BigInt]
    def normalize(raw: Map[Long, BigInt]): Map[Long, BigInt] = {
      val tot = raw.values.sum
      nodes.map(n => n -> raw.getOrElse(n, BigInt(0)) * Scale / tot).toMap
    }
    for (_ <- 1 to iters) {
      auth = normalize(edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map(e => hub(e._1) * e._3).sum })
      hub = normalize(edges.groupBy(_._1).map { case (s, es) =>
        s -> es.map(e => auth(e._2) * e._3).sum })
    }
    nodes.map(n => n -> (auth.getOrElse(n, BigInt(0)).toLong,
      hub.getOrElse(n, BigInt(0)).toLong)).toMap
  }

  test("bipartite star: the heavy authority dominates; hubs are the buyers") {
    // buyers 1,2 -> item 10 (w 3, 1); buyer 2 -> item 11 (w 1)
    val edges = Seq((1L, 10L, 3L), (2L, 10L, 1L), (2L, 11L, 1L))
    val out = run(edges, 3)
    // item 10 has more weighted in-links than 11
    assert(out(10L)._1 > out(11L)._1)
    // pure sources have authority 0; pure sinks have hub 0
    assert(out(1L)._1 === 0L && out(2L)._1 === 0L)
    assert(out(10L)._2 === 0L && out(11L)._2 === 0L)
    // L1 normalization: each vector sums to ~Scale (integer rounding)
    val aSum = out.values.map(_._1).sum
    val hSum = out.values.map(_._2).sum
    assert(math.abs(aSum - Scale) <= out.size)
    assert(math.abs(hSum - Scale) <= out.size)
  }

  test("matches the scalar fixed-point replay exactly") {
    val edges = (1 to 20).map { i =>
      ((i % 5).toLong, (10 + i % 7).toLong, (1 + i % 3).toLong)
    }.distinct
    assert(run(edges, 3) === scalar(edges, 3))
  }
}
