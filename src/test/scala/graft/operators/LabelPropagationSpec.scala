package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Graph.labelPropagation: two weight-dense cliques with a weak bridge
  * split into two communities (where connected components would merge
  * them); deterministic tie-breaks; isolated self-labels. */
class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long, Long)], iters: Int) =
    Graph.labelPropagation(edges.toDF("a", "b", "w"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("weakly-bridged cliques split into two communities; CC would not") {
    // clique {1,2,3} (w 10), clique {7,8,9} (w 10), bridge 3-7 (w 1)
    val clique = (ns: Seq[Long], w: Long) =>
      for (i <- ns; j <- ns if i < j) yield (i, j, w)
    val edges = clique(Seq(1L, 2L, 3L), 10L) ++
      clique(Seq(7L, 8L, 9L), 10L) :+ (3L, 7L, 1L)
    val out = run(edges, 4)
    assert(out(1L) === out(2L) && out(2L) === out(3L))
    assert(out(7L) === out(8L) && out(8L) === out(9L))
    assert(out(1L) !== out(7L), s"bridge merged the communities: $out")
    // CC over the same edges DOES merge them — the distinguishing test
    val nodeIds = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val cc = graft.llm.Dedup.connectedComponents(
        nodeIds.toDF("id"),
        edges.map(e => (e._1, e._2)).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(1L) === cc(9L))
  }

  test("tie on weight breaks to the smallest label, deterministically") {
    // node 5 sees labels 1 and 9 with equal weight -> adopts 1
    val edges = Seq((1L, 5L, 3L), (9L, 5L, 3L))
    val out = run(edges, 1)
    assert(out(5L) === 1L)
  }
}
