package graft.operators

import scala.reflect.ClassTag

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.broadcast

/** Side inputs (SURVEY.md §2.3 View row; [U] sdk/.../transforms/View.java).
  *
  * Dataflow materializes a PCollection as a broadcast view
  * (singleton/iterable/list/map/multimap) readable from inside DoFns. Two
  * Spark renderings:
  *
  *  - the *relational* one — keep it a DataFrame and broadcast-hash-join it
  *    ([[broadcastJoin]]); preferred, stays distributed and codegen'd;
  *  - the *closure* one — collect to the driver and `sc.broadcast`, for
  *    logic that genuinely needs random access inside a lambda. This is a
  *    driver collect: only for side inputs that are small by construction
  *    (the same constraint Dataflow's View imposes in practice).
  */
object View {

  /** View.asSingleton: exactly-one-element dataset → broadcast value. */
  def asSingleton[T: ClassTag](ds: Dataset[T]): Broadcast[T] = {
    val rows = ds.take(2)
    require(rows.length == 1, s"asSingleton needs exactly 1 element, saw ${rows.length}")
    ds.sparkSession.sparkContext.broadcast(rows(0))
  }

  /** Default row bound for the closure views below. Side inputs are for
    * small-by-construction data; a view over a corpus-sized dataset is
    * the classic misuse that OOMs the driver at scale, so every
    * collecting view fails fast past this bound instead (override
    * per-call when a larger broadcast is a deliberate choice). */
  val DefaultMaxRows: Int = 1000000

  /** `take(max+1)` bounded collect: never pulls more than one row past
    * the bound onto the driver, so the failure mode is an error message,
    * not an OOM. */
  private def boundedCollect[T](ds: Dataset[T], maxRows: Int, what: String): Array[T] = {
    require(maxRows > 0, s"$what maxRows must be positive")
    val rows = ds.take(maxRows + 1)
    require(rows.length <= maxRows,
      s"$what side input exceeds $maxRows rows - closure views collect to the " +
        "driver and are for small-by-construction data; use broadcastJoin " +
        "(relational, stays distributed) or raise maxRows deliberately")
    rows
  }

  /** View.asList / View.asIterable. */
  def asList[T: ClassTag](ds: Dataset[T], maxRows: Int = DefaultMaxRows): Broadcast[Seq[T]] =
    ds.sparkSession.sparkContext.broadcast(boundedCollect(ds, maxRows, "asList").toSeq)

  /** View.asMap: unique-keyed KV → broadcast Map. */
  def asMap[K, V](ds: Dataset[(K, V)], maxRows: Int = DefaultMaxRows): Broadcast[Map[K, V]] = {
    val rows = boundedCollect(ds, maxRows, "asMap")
    // Beam's View.asMap rejects duplicate keys (use asMultimap for those);
    // silently keeping the collect-order-last value would be partition-
    // order nondeterminism smuggled into a broadcast side input
    val dups = rows.groupBy(_._1).collect { case (k, vs) if vs.length > 1 => k }
    require(dups.isEmpty,
      s"View.asMap requires unique keys; duplicates: ${dups.take(5).mkString(", ")}")
    ds.sparkSession.sparkContext.broadcast(rows.toMap)
  }

  /** View.asMultimap. */
  def asMultimap[K, V: ClassTag](ds: Dataset[(K, V)],
                                 maxRows: Int = DefaultMaxRows): Broadcast[Map[K, Seq[V]]] = {
    val m = boundedCollect(ds, maxRows, "asMultimap")
      .groupBy(_._1).map { case (k, kvs) => (k, kvs.map(_._2).toSeq) }
    ds.sparkSession.sparkContext.broadcast(m)
  }

  /** The relational side input: force a broadcast-hash join against a small
    * dim so the big side never shuffles. */
  def broadcastJoin(big: DataFrame, small: DataFrame, on: Seq[String],
                    how: String = "inner"): DataFrame =
    big.join(broadcast(small), on, how)
}
