package graft.spark

import graft.SparkSpec
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** checkpointObserved must (1) return the exact aggregate values, (2)
  * really checkpoint (lineage cut to an RDD scan), and (3) run ONE
  * Spark job — the whole point is folding the convergence-flag action
  * into the checkpoint materialization. */
class CheckpointOpsSpec extends SparkSpec {
  import spark.implicits._

  test("checkpointCounted: exact count, checkpointed plan, one job") {
    val df = (1L to 97L).toDF("v").filter($"v" % 3 === 0)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val (ck, n) = CheckpointOps.checkpointCounted(df)
      // the listener bus is async — poll briefly for the job-start event
      val deadline = System.currentTimeMillis() + 5000
      while (jobs.get() < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      Thread.sleep(300) // settle: a stray SECOND job event must be seen
      assert(n == 32L)
      assert(jobs.get() == 1,
        s"expected the count to ride the checkpoint job, saw ${jobs.get()} jobs")
      // the returned frame is materialized: its plan is an RDD scan, and
      // re-reading it agrees with the observed count
      assert(ck.queryExecution.optimizedPlan.collectLeaves()
        .exists(_.getClass.getSimpleName.contains("LogicalRDD")),
        s"expected a checkpointed (LogicalRDD) plan:\n${ck.queryExecution.optimizedPlan}")
      assert(ck.count() == 32L)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("checkpointObserved: multiple metrics, nullable aggregate on empty frame") {
    val df = Seq.empty[Long].toDF("v")
    val (ck, m) = CheckpointOps.checkpointObserved(df,
      Seq(count(lit(1)).as("n"), sum($"v").as("s")))
    assert(m("n") == 0L)
    assert(m("s") == null) // sum over empty = null — callers coalesce
    assert(ck.count() == 0L)
  }

  test("checkpointObserved: changed-flag style metric matches a separate action") {
    val df = Seq((1L, true), (2L, false), (3L, true)).toDF("id", "changed")
    val (ck, m) = CheckpointOps.checkpointObserved(df,
      Seq(sum(when($"changed", 1L).otherwise(0L)).as("nc")))
    assert(m("nc") == 2L)
    assert(ck.filter($"changed").count() == 2L)
  }
}
