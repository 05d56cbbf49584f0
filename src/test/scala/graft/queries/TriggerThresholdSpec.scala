package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Pins the BRANCH DIVERSITY of the data-derived trigger thresholds
  * (VERDICT r11 tasks 2+5): the q_trigger_algebra / q_trigger_composite
  * gates only prove their composite semantics if the fixture actually
  * takes every branch of the pane schedule. A threshold that goes dead
  * at some sf (the round-10 literal 340 did at sf0.001) would leave the
  * gate green while silently exercising nothing. */
class TriggerThresholdSpec extends SparkSpec {

  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  /** Per-(key, 2-cell window) half counts (n1, n2) of the events table
    * on the gates' adaptive grid. */
  private def halves(dir: String, cellUs: Long) = {
    Tables(spark, dir).events
      .groupBy(col("event_type"),
        (unix_micros(col("ts")) / (2 * cellUs)).cast("long").as("w"))
      .agg(
        sum(when((unix_micros(col("ts")) / cellUs).cast("long") % 2 === 0, 1L)
          .otherwise(0L)).as("n1"),
        sum(when((unix_micros(col("ts")) / cellUs).cast("long") % 2 === 1, 1L)
          .otherwise(0L)).as("n2"))
      .select(col("n1"), col("n2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  test("q_trigger_algebra's AfterEach takes both first-sub branches at every sf") {
    sfDirs.foreach { dir =>
      val cellUs = TriggerGateQueries.gridCellUs(spark, dir)
      val (med, _) = TriggerGateQueries.halfCountStats(spark, dir, cellUs)
      val e = math.max(1L, med * 9 / 20)
      val hw = halves(dir, cellUs)
      val immediate = hw.count { case (n1, _) => n1 >= e }
      val cumulative = hw.count { case (n1, n2) => n1 < e && n1 + n2 >= e }
      val secondSub = hw.count { case (n1, n2) => n1 >= e && n2 >= e }
      assert(immediate > 0, s"$dir: no window fires sub 1 in its first half (e=$e)")
      assert(cumulative > 0, s"$dir: no window waits for the cumulative count (e=$e)")
      assert(secondSub > 0, s"$dir: sub 2 never fires (e=$e)")
    }
  }

  test("q_trigger_panes' late-holdout slice is non-empty at every sf") {
    // replicates setupFeed's slice arithmetic: cell c1 = the first
    // window's second cell, slice = its last fifth ∩ event_id%17=0. An
    // empty slice leaves the LATE-pane path unexercised while gate and
    // oracle stay consistently green (ADVICE r12) — the same dead-branch
    // mode the data-derived thresholds fixed for the composite gates.
    sfDirs.foreach { dir =>
      val cellUs = TriggerGateQueries.gridCellUs(spark, dir)
      val ev = Tables(spark, dir).events
      val c0 = ev.agg(min((unix_micros(col("ts")) / cellUs).cast("long")))
        .head().getLong(0)
      val c1 = (c0 / 2) * 2 + 1
      val n = ev.filter(
        (unix_micros(col("ts")) / cellUs).cast("long") === c1 &&
          pmod(unix_micros(col("ts")), lit(cellUs)) >= lit(cellUs * 4 / 5) &&
          pmod(col("event_id"), lit(17)) === 0).count()
      assert(n > 0, s"$dir: late-holdout slice empty (c1=$c1, cellUs=$cellUs)")
    }
  }

  test("q_trigger_composite's OrFinally takes both finish branches at every sf") {
    sfDirs.foreach { dir =>
      val cellUs = TriggerGateQueries.gridCellUs(spark, dir)
      val (med, p80) = TriggerGateQueries.halfCountStats(spark, dir, cellUs)
      val t = math.max(1L, med * 3 / 4)
      val d = math.max(t + 1, p80)
      val hw = halves(dir, cellUs)
      val finishedAtH0 = hw.count { case (n1, _) => n1 >= t && n1 >= d }
      val secondEarly = hw.count { case (n1, n2) =>
        !(n1 >= t && n1 >= d) && n2 > 0 &&
          (if (n1 >= t) n2 else n1 + n2) >= t
      }
      assert(finishedAtH0 > 0,
        s"$dir: the until-trigger never finishes a window early (t=$t d=$d)")
      assert(secondEarly > 0,
        s"$dir: no window fires a second EARLY pane (t=$t d=$d)")
    }
  }
}
