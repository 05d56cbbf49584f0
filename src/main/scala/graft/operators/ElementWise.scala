package graft.operators

import scala.reflect.ClassTag

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/** Element-wise transform capabilities (SURVEY.md §2.1).
  *
  * The reference's primitive is ParDo over a DoFn with
  * startBundle/processElement/finishBundle hooks and 0..n outputs per input
  * ([U] sdk/.../transforms/ParDo.java, DoFn.java — see SURVEY.md §0 for the
  * citation convention). Spark-first mapping: a *bundle* is a partition, so
  * ParDo is `mapPartitions` with the hooks at partition boundaries; the
  * simple 1:1 / 1:n shapes are plain `map`/`flatMap`, and anything
  * relationally expressible should bypass this API entirely and use Column
  * expressions (codegen beats closures at scale — prefer
  * graft.functions.* for that path).
  */
object ElementWise {

  // tracked-persist registry (the llm-module convention): caches created
  // by partitionInto live here so sweep harnesses can flush them
  private val persisted = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]
  private def track[T](ds: Dataset[T]): Dataset[T] = persisted.synchronized {
    persisted += ds
    ds.cache()
  }
  private def untrack(ds: Dataset[_]): Unit = persisted.synchronized {
    persisted -= ds; ()
  }
  /** Unpersist every cache this module created (sweep/REPL hygiene). */
  def releasePersistedState(): Unit = persisted.synchronized {
    persisted.foreach(_.unpersist())
    persisted.clear()
  }

  /** Dataflow-style DoFn: per-bundle setup/teardown + 0..n outputs per
    * element. finishBundle may emit trailing elements (e.g. flush buffers).
    * Mirrors [U] sdk/.../transforms/DoFn.java semantics. */
  trait DoFn[-I, +O] extends Serializable {
    def startBundle(): Unit = ()
    def processElement(input: I): IterableOnce[O]
    def finishBundle(): IterableOnce[O] = Iterator.empty
  }

  /** ParDo: one bundle per partition; hooks run at partition boundaries.
    * The `++` keeps finishBundle lazy until the input iterator is drained. */
  def parDo[I, O: Encoder](ds: Dataset[I])(fn: DoFn[I, O]): Dataset[O] =
    ds.mapPartitions { it =>
      fn.startBundle()
      it.flatMap(fn.processElement) ++ fn.finishBundle().iterator
    }

  implicit final class ElementWiseOps[T](private val ds: Dataset[T]) extends AnyVal {

    /** MapElements ([U] T/MapElements.java): 1:1. */
    def mapElements[U: Encoder](f: T => U): Dataset[U] = ds.map(f)

    /** FlatMapElements ([U] T/FlatMapElements.java): 1:n. */
    def flatMapElements[U: Encoder](f: T => IterableOnce[U]): Dataset[U] =
      ds.flatMap(f(_).iterator)

    /** Filter ([U] T/Filter.java): keep where p holds. */
    def filterElements(p: T => Boolean): Dataset[T] = ds.filter(p)

    /** WithKeys ([U] T/WithKeys.java): attach a key fn → KV dataset. */
    def withKeys[K](f: T => K)(implicit e: Encoder[(K, T)]): Dataset[(K, T)] =
      ds.map(t => (f(t), t))(e)

    /** ParDo with bundle hooks. */
    def parDo[O: Encoder](fn: DoFn[T, O]): Dataset[O] =
      ElementWise.parDo(ds)(fn)

    /** Partition ([U] T/Partition.java): fan out into n datasets by a
      * partition fn. The parent is cached once; each output is a filter over
      * it, so the source is scanned once, not n times. The cache lives until
      * the session ends — long-lived pipelines that fan out repeatedly
      * should use [[partitionIntoManaged]] and release it. */
    def partitionInto(n: Int)(f: T => Int): IndexedSeq[Dataset[T]] =
      partitionIntoManaged(n)(f)._1

    /** [[partitionInto]] plus a release handle that unpersists the shared
      * parent once every branch has been consumed. The parent is also
      * registered with [[ElementWise.releasePersistedState]] so sweep
      * harnesses (Bench/Verify) that run hundreds of queries per session
      * can flush it between queries like the llm-module caches. */
    def partitionIntoManaged(n: Int)(f: T => Int): (IndexedSeq[Dataset[T]], () => Unit) = {
      require(n > 0, "partitionInto needs n > 0")
      val parent = ElementWise.track(ds)
      ((0 until n).map(i => parent.filter((t: T) => f(t) == i)),
        () => { parent.unpersist(); ElementWise.untrack(parent) })
    }

    /** Reshuffle ([U] UT/Reshuffle.java): redistribute; an Exchange is
      * already a stage/fusion break in Spark, which is the semantic point. */
    def reshuffle(numPartitions: Int): Dataset[T] = ds.repartition(numPartitions)
  }

  implicit final class KVOps[K, V](private val ds: Dataset[(K, V)]) extends AnyVal {
    /** Keys ([U] T/Keys.java). */
    def keys(implicit e: Encoder[K]): Dataset[K] = ds.map(_._1)
    /** Values ([U] T/Values.java). */
    def values(implicit e: Encoder[V]): Dataset[V] = ds.map(_._2)
    /** KvSwap ([U] T/KvSwap.java). */
    def kvSwap(implicit e: Encoder[(V, K)]): Dataset[(V, K)] = ds.map(_.swap)
  }

  /** Create ([U] T/Create.java): literal in-memory dataset. */
  def create[T: Encoder](spark: SparkSession, data: Seq[T]): Dataset[T] =
    spark.createDataset(data)

  /** Create.timestamped: literal elements with explicit event timestamps —
    * the shape trigger/window tests feed (value, eventTime) streams with. */
  def createTimestamped[T](spark: SparkSession,
                           data: Seq[(T, java.sql.Timestamp)])(
      implicit e: Encoder[(T, java.sql.Timestamp)]): Dataset[(T, java.sql.Timestamp)] =
    spark.createDataset(data)

  /** Flatten.pCollections ([U] T/Flatten.java): n-way union. */
  def flatten[T](dss: Seq[Dataset[T]]): Dataset[T] = {
    require(dss.nonEmpty, "flatten of zero datasets")
    dss.reduce(_ union _)
  }

  /** Flatten.iterables: flatten element-level collections. */
  def flattenIterables[T: Encoder: ClassTag](ds: Dataset[Seq[T]]): Dataset[T] =
    ds.flatMap(identity[Seq[T]])

  /** Multi-output ParDo ([U] T/ParDo.java withOutputTags): route each
    * element to one of n tagged outputs in a single pass over a cached
    * parent. Returns tag → dataset. See [[multiOutputManaged]] for a
    * release handle on the shared cache. */
  def multiOutput[I, O: Encoder](ds: Dataset[I], tags: Seq[String])(
      route: I => (String, O))(implicit e: Encoder[(String, O)]): Map[String, Dataset[O]] =
    multiOutputManaged(ds, tags)(route)._1

  /** [[multiOutput]] plus a release handle for the cached tagged parent. */
  def multiOutputManaged[I, O: Encoder](ds: Dataset[I], tags: Seq[String])(
      route: I => (String, O))(
      implicit e: Encoder[(String, O)]): (Map[String, Dataset[O]], () => Unit) = {
    val tagged = ElementWise.track(ds.map(route))
    (tags.map { tag =>
      tag -> tagged.filter((kv: (String, O)) => kv._1 == tag).map(_._2)
    }.toMap,
      () => { tagged.unpersist(); ElementWise.untrack(tagged) })
  }
}
