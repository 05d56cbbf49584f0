package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math over ARRAY<FLOAT>/ARRAY<DOUBLE> embeddings.
  *
  * Pure Column expressions (zip_with/aggregate) — no UDFs, so the arithmetic
  * stays in codegen and the plan stays columnar. Inputs are cast to
  * array<double> so accumulation happens in double regardless of the stored
  * element type; the left-fold order of `aggregate` is deterministic, which
  * keeps scores reproducible run-to-run.
  */
object VectorFunctions {

  private def asD(c: Column): Column = c.cast("array<double>")

  /** Σ aᵢ·bᵢ (double accumulation, sequential fold). Native Expression —
    * the aggregate(zip_with(…)) form is an interpreted HOF allocating a
    * product array per pair; the tight loop is ~100× cheaper on pair-
    * scoring hot paths at identical IEEE operation order. */
  def dot(a: Column, b: Column): Column = ShingleExprs.dot(asD(a), asD(b))

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared euclidean distance. Native Expression (ShingleExprs.SqDistance)
    * — same IEEE accumulation order as the aggregate(zip_with(…)) form it
    * replaces, so assignment/oracle values are unchanged; the interpreted
    * HOF allocated a difference array per scored pair on the
    * nearest-centroid hot path. */
  def sqDist(a: Column, b: Column): Column = ShingleExprs.sqDistance(asD(a), asD(b))

  /** Unit-normalized copy of the vector: cosine(a, b) = dot(â, b̂), so
    * normalizing each row once turns every pairwise cosine into a single
    * dot — 3× fewer array folds on the pair-scoring hot path. Native
    * single-pass expression (the transform-lambda form re-evaluates the
    * norm subtree per element). */
  def normalized(v: Column): Column = ShingleExprs.l2Normalize(asD(v))

  /** Signed-random-projection bit signature (hyperplane LSH): bit p is the
    * sign of ⟨v, plane_p⟩. Planes are deterministic (seeded) so signatures
    * are stable across runs and executors. Returns an int bucket id in
    * [0, 2^planes.length); a NULL vector returns a NULL bucket — each
    * sign test would otherwise default to bit 0, silently piling every
    * null row (failed decodes, absent embeddings) into one degenerate
    * bucket-0 whose self-join is quadratic. A null bucket drops out of
    * every equi-join instead. */
  def srpBucket(v: Column, planes: Seq[Seq[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      when(dot(v, typedlit(p)) >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
    when(v.isNull, lit(null)).otherwise(bits)
  }

  /** Deterministic unit-ish hyperplanes for [[srpBucket]]. */
  def makePlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }
}
