package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Anova.oneWayF: hand-worked three-group F; Brown-Forsythe hand-worked
  * variance contrast; degenerate groups go NULL; out-of-contract values
  * drop consistently (the Moments try_cast rule). */
class AnovaSpec extends SparkSpec {
  import spark.implicits._

  private def runF(rows: Seq[(String, String, Double)], groups: Seq[String]) =
    Anova.oneWayF(rows.toDF("k", "g", "v"), Seq("k"), col("g"), groups, col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))))
      .toMap

  test("hand-worked three groups: SSB 42, SSW 6, F 21") {
    // A=(1,2,3) B=(2,3,4) C=(6,7,8): means 2,3,7, grand 4
    val rows = Seq("A" -> 1.0, "A" -> 2.0, "A" -> 3.0,
      "B" -> 2.0, "B" -> 3.0, "B" -> 4.0,
      "C" -> 6.0, "C" -> 7.0, "C" -> 8.0).map { case (g, v) => ("x", g, v) }
    val (n, ssb, ssw, f) = runF(rows, Seq("A", "B", "C"))("x")
    assert(n === 9L)
    assert(math.abs(ssb.get - 42.0) < 1e-9)
    assert(math.abs(ssw.get - 6.0) < 1e-9)
    assert(math.abs(f.get - 21.0) < 1e-9)
  }

  test("an empty listed group, or zero SSW, yields NULL F") {
    val rows = Seq(("x", "A", 1.0), ("x", "A", 2.0), ("x", "B", 3.0))
    assert(runF(rows, Seq("A", "B", "C"))("x")._4 === None) // C empty
    val const = Seq(("x", "A", 2.0), ("x", "A", 2.0),
      ("x", "B", 2.0), ("x", "B", 2.0), ("x", "B", 2.0))
    assert(runF(const, Seq("A", "B"))("x")._4 === None) // ssw = 0
  }

  test("out-of-contract values (|x| >= 10^4) drop from n AND the sums") {
    val clean = Seq(("x", "A", 1.0), ("x", "A", 2.0), ("x", "A", 3.0),
      ("x", "B", 2.0), ("x", "B", 4.0))
    val dirty = clean :+ (("x", "A", 99999.0))
    assert(runF(dirty, Seq("A", "B")) === runF(clean, Seq("A", "B")))
  }

  test("Brown-Forsythe hand-worked: unequal spread flags, F 3.0") {
    // A = (0,0,10,10): lower median 0 -> z = (0,0,10,10), z-mean 5,
    // Szz = 100; B = (5,5,5,5): z = 0, z-mean 0.
    // SSB = 4*2.5^2 + 4*2.5^2 = 50, SSW = 100, F = (50/1)/(100/6) = 3
    val rows = Seq(("x", "A", 0.0), ("x", "A", 0.0), ("x", "A", 10.0),
      ("x", "A", 10.0), ("x", "B", 5.0), ("x", "B", 5.0),
      ("x", "B", 5.0), ("x", "B", 5.0))
    val out = Anova.brownForsythe(rows.toDF("k", "g", "v"), Seq("k"),
        col("g"), Seq("A", "B"), col("v"))
      .collect().head
    assert(out.getLong(1) === 8L)
    assert(math.abs(out.getDouble(3) - 50.0) < 1e-9)
    assert(math.abs(out.getDouble(4) - 100.0) < 1e-9)
    assert(math.abs(out.getDouble(5) - 3.0) < 1e-9)
  }

  test("Brown-Forsythe uses the LOWER median on even groups") {
    // A = (1,2,9,10): lower median 2 (interpolated would be 5.5);
    // z = (1,0,7,8) — a distinguishing fingerprint of the convention
    val rows = Seq(("x", "A", 1.0), ("x", "A", 2.0), ("x", "A", 9.0),
      ("x", "A", 10.0), ("x", "B", 3.0), ("x", "B", 4.0))
    val out = Anova.brownForsythe(rows.toDF("k", "g", "v"), Seq("k"),
        col("g"), Seq("A", "B"), col("v")).collect().head
    // z_A = (1,0,7,8): mean 4, Szz = 9+16+9+16 = 50
    // z_B = (1,0) (median of (3,4) lower = 3): mean 0.5, Szz = 0.5
    // grand z-mean = 17/6; SSB = 4*(4-17/6)^2 + 2*(0.5-17/6)^2
    val ssbExp = 4 * math.pow(4 - 17.0 / 6, 2) + 2 * math.pow(0.5 - 17.0 / 6, 2)
    assert(math.abs(out.getDouble(3) - ssbExp) < 1e-6)
    assert(math.abs(out.getDouble(4) - 50.5) < 1e-9)
  }
}
