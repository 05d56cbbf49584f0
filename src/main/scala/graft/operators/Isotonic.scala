package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-key isotonic regression — the pool-adjacent-violators algorithm
  * (PAVA; Barlow, Bartholomew, Bremner & Brunk 1972), the standard
  * monotone-calibration fit for ML score → probability curves and
  * monotone trend extraction.
  *
  * Exactness: the merge DECISIONS are exact-rational comparisons —
  * block means compare as cross-multiplied BigDecimals of the
  * DECIMAL(18,4) inputs (never a float `<` whose last-ulp could merge a
  * different block structure on a different engine). Each fitted value
  * is then ONE double division of the exact block sum by the exact
  * block weight. The oracle does not replay PAVA: it evaluates the
  * independent max-min characterization fitted[i] = max_{j≤i} min_{k≥i}
  * mean(y[j..k]) directly from DECIMAL prefix sums — a genuinely
  * different derivation whose agreement proves the pooling (double
  * rounding is monotone, so the max-min over the oracle's rounded means
  * equals the rounded max-min up to the shared 6-dp output mask).
  *
  * Execution contract: PAVA is inherently sequential WITHIN a key, so
  * each key's series folds in memory inside one task (flatMapGroups) —
  * the same bounded-series contract as the trigger/session engines.
  * This is the right trade at scale: series (calibration grids, per-key
  * time series) are thousands of points while keys are many, so
  * parallelism comes from the key shuffle, and no multi-pass relational
  * PAVA (O(n) full-data passes per merge round) could compete.
  * The order column must be UNIQUE per key (violations throw — a
  * silent tie would make the fold order, and thus the fit,
  * nondeterministic); weights must be positive.
  *
  * @return input rows with `o` (order), `y` (double), `fitted`
  *         (monotone non-decreasing per key, 6 dp)
  */
object Isotonic {

  def fit(df: DataFrame, keys: Seq[String], order: Column, value: Column,
          weight: Column = lit(1L)): DataFrame = {
    require(keys.nonEmpty, "Isotonic.fit needs at least one key column")
    val nk = keys.length
    val prepared = df.select(
      keys.map(col) ++ Seq(order.cast("long").as("__o"),
        value.cast("decimal(18,4)").as("__y"),
        weight.cast("long").as("__w")): _*)
      .filter(col("__o").isNotNull && col("__y").isNotNull &&
        col("__w").isNotNull)
    val outSchema = StructType(prepared.schema.fields.take(nk) ++ Seq(
      StructField("o", LongType), StructField("y", DoubleType),
      StructField("fitted", DoubleType)))
    val fittedRaw = prepared
      .groupByKey { r =>
        (0 until nk).map(i => String.valueOf(r.get(i))).mkString("\u0001")
      }(Encoders.STRING)
      .flatMapGroups { (_: String, it: Iterator[Row]) =>
        val rows = it.toArray.sortBy(_.getLong(nk))
        var prevO = Long.MinValue
        // blocks as (Σw·y exact, Σw, count of rows pooled)
        val sums = ArrayBuffer.empty[java.math.BigDecimal]
        val ws = ArrayBuffer.empty[Long]
        val sizes = ArrayBuffer.empty[Int]
        rows.foreach { r =>
          val o = r.getLong(nk)
          require(o != prevO,
            s"Isotonic.fit: duplicate order value $o within a key group")
          prevO = o
          val y = r.getDecimal(nk + 1)
          val w = r.getLong(nk + 2)
          require(w > 0, s"Isotonic.fit: non-positive weight $w")
          sums += y.multiply(java.math.BigDecimal.valueOf(w))
          ws += w; sizes += 1
          // pool while the previous block's mean EXCEEDS this one's:
          // sumPrev/wPrev > sumCur/wCur ⇔ sumPrev·wCur > sumCur·wPrev
          var done = false
          while (!done && sums.length >= 2) {
            val n = sums.length
            val prevX = sums(n - 2).multiply(java.math.BigDecimal.valueOf(ws(n - 1)))
            val curX = sums(n - 1).multiply(java.math.BigDecimal.valueOf(ws(n - 2)))
            if (prevX.compareTo(curX) > 0) {
              sums(n - 2) = sums(n - 2).add(sums(n - 1)); sums.remove(n - 1)
              ws(n - 2) += ws(n - 1); ws.remove(n - 1)
              sizes(n - 2) += sizes(n - 1); sizes.remove(n - 1)
            } else done = true
          }
        }
        val fitted = new Array[Double](rows.length)
        var pos = 0
        for (b <- sums.indices) {
          val f = sums(b).doubleValue() / ws(b).toDouble
          for (_ <- 0 until sizes(b)) { fitted(pos) = f; pos += 1 }
        }
        rows.iterator.zipWithIndex.map { case (r, i) =>
          // Seq[Any], NOT Seq(...): a bare Seq(Long, Double, Double)
          // unifies to Seq[Double] and silently widens the order value
          Row.fromSeq((0 until nk).map(r.get) ++ Seq[Any](
            r.getLong(nk), r.getDecimal(nk + 1).doubleValue(), fitted(i)))
        }
      }(Encoders.row(outSchema))
    fittedRaw.withColumn("fitted", round(col("fitted"), 6))
  }
}
