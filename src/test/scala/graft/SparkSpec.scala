package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole suite (sessions are expensive;
  * the reference's TestPipeline is similarly shared per JVM). */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // transformWithState requires the RocksDB state store
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh-").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Base spec: DataflowAssert.containsInAnyOrder ≡ multiset equality
  * (SURVEY.md §5, [U] sdk/.../testing/DataflowAssert.java). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark

  def assertInAnyOrder[T](actual: Iterable[T], expected: Iterable[T]): Unit = {
    val a = actual.groupBy(identity).view.mapValues(_.size).toMap
    val e = expected.groupBy(identity).view.mapValues(_.size).toMap
    assert(a == e, s"\nactual:   ${actual.toSeq}\nexpected: ${expected.toSeq}")
  }

  /** Scale guard: the physical plan must not contain an all-pairs join.
    * Catches the degenerate-self-join class of bug (a trivially-true join
    * condition silently planning as CartesianProduct). */
  def assertNoCartesian(df: org.apache.spark.sql.DataFrame): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"plan contains an all-pairs join:\n$plan")
  }
}
