package graft.llm

import graft.SparkSpec

/** The relational unrolled-greedy selections must equal dense scalar
  * references BIT-FOR-BIT (same double accumulation order as the
  * VectorFunctions kernels) — the same contract the DuckDB oracles
  * replay at the query layer. */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  // scalar twins of the native kernels: left-fold double accumulation
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def cos(a: Array[Float], b: Array[Float]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  private def sq(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) {
      val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
    }
    s
  }

  private def corpus(n: Int, dim: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(7)
    (0 until n).map(i => i.toLong -> Array.fill(dim)(rnd.nextFloat() * 2 - 1))
  }

  test("mmrRerank equals the scalar greedy (ids, ranks, and scores)") {
    val vecs = corpus(60, 16)
    val emb = vecs.toDF("vec_id", "embedding")
    val nProbes = 4; val topN = 8; val k = 4; val lam = 0.75
    val got = Selection.mmrRerank(emb, emb.filter($"vec_id" < nProbes), topN, k, lam)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap

    val byId = vecs.toMap
    for (p <- 0L until nProbes) {
      val rels = vecs.filter(_._1 != p)
        .map { case (id, v) => id -> cos(byId(p), v) }
        .sortBy { case (id, rel) => (-rel, id) }
        .take(topN)
      var selected = List.empty[Long]
      for (rank <- 1 to k) {
        val (pick, mmr) =
          if (rank == 1) { val (id, rel) = rels.head; (id, lam * rel) }
          else {
            rels.filterNot { case (id, _) => selected.contains(id) }
              .map { case (id, rel) =>
                val maxSim = selected.map(s => cos(byId(id), byId(s))).max
                (id, lam * rel - (1 - lam) * maxSim)
              }
              .minBy { case (id, m) => (-m, id) }
          }
        selected :+= pick
        val (gid, grel, gmmr) = got((p, rank.toLong))
        assert(gid == pick, s"probe $p rank $rank: got $gid want $pick")
        assert(grel == rels.find(_._1 == pick).get._2)
        assert(gmmr == mmr, s"probe $p rank $rank mmr: $gmmr vs $mmr")
      }
    }
  }

  test("kCenterGreedy equals the scalar farthest-point traversal") {
    val vecs = corpus(80, 12)
    val emb = vecs.toDF("vec_id", "embedding")
    val k = 5
    val rows = Selection.kCenterGreedy(emb, k)
      .collect().sortBy(_.getLong(0))
    assert(rows.length == k)

    val byId = vecs.toMap
    var centers = List(0L) // seed = lowest vec_id
    var mind = vecs.map { case (id, v) => id -> sq(v, byId(0L)) }.toMap
    assert(rows.head.getLong(1) == 0L && rows.head.isNullAt(2))
    for (rank <- 2 to k) {
      val (pick, gain) = mind.toSeq.minBy { case (id, d) => (-d, id) }
      centers :+= pick
      mind = mind.map { case (id, d) => id -> math.min(d, sq(byId(id), byId(pick))) }
      val row = rows(rank - 1)
      assert(row.getLong(1) == pick, s"rank $rank: got ${row.getLong(1)} want $pick")
      assert(row.getDouble(2) == gain)
    }
    val radius = mind.values.max
    rows.foreach(r => assert(r.getDouble(3) == radius))
    // farthest-point gains are nonincreasing (the 2-approx certificate)
    val gains = rows.drop(1).map(_.getDouble(2))
    assert(gains.zip(gains.drop(1)).forall { case (a, b) => a >= b })
    assert(gains.last >= radius)
  }

  test("mmrRerank rejects k > topN; kCenterGreedy rejects k < 1") {
    val emb = corpus(10, 4).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException](Selection.mmrRerank(emb, emb, 3, 4, 0.5))
    intercept[IllegalArgumentException](Selection.kCenterGreedy(emb, 0))
  }
}
