package graft

import org.apache.spark.sql.functions._

import graft.functions.PortableLog

/** Pins the cross-engine determinism contract of [[PortableLog]]: the SQL
  * fragments must produce the BIT-IDENTICAL double to the plain-Scala
  * reference sequence (`lnRef`/`log2Ref`/`log10RatioRef`) for every input —
  * if they do, any IEEE-754 engine evaluating the same fragment agrees, and
  * the floor-quantized decimals on the oracle comparison surface can never
  * flip with the oracle engine's libm build (the round-8 classifier bug
  * class). Also pins accuracy against java.lang.Math to 1e-8 so the
  * surrogate stays a genuine logarithm semantically.
  */
class PortabilitySpec extends SparkSpec {

  // powers of two and their neighbours (range-reduction edges), small counts,
  // large counts, and a dense band — the inputs count columns actually take
  private val probes: Seq[Long] =
    (1L to 512L) ++
      (1 to 50).map(i => (1L << (i % 50)) max 1L).flatMap(p => Seq(p - 1, p, p + 1)).filter(_ >= 1) ++
      Seq(999999L, 1000000L, 12345678L, 987654321L, (1L << 52) - 1, 1L << 52)

  test("Spark fragment == plain-Scala reference, bit for bit (ln / log2)") {
    import spark.implicits._
    val df = probes.toDF("n")
      .select(col("n"),
        expr(PortableLog.lnSql("n", spark = true)).as("ln_sql"),
        expr(PortableLog.log2Sql("n", spark = true)).as("l2_sql"))
      .collect()
    df.foreach { r =>
      val n = r.getLong(0)
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(PortableLog.lnRef(n)),
        s"ln($n): sql=${r.getDouble(1)} ref=${PortableLog.lnRef(n)}")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(PortableLog.log2Ref(n)),
        s"log2($n): sql=${r.getDouble(2)} ref=${PortableLog.log2Ref(n)}")
    }
  }

  test("Spark log10-ratio fragment == reference, bit for bit") {
    import spark.implicits._
    val pairs = for (a <- Seq(1L, 3L, 7L, 58L, 196L, 999L, 65536L, 999999L);
                     b <- Seq(1L, 2L, 58L, 1000L, 987654L)) yield (a, b)
    val df = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        expr(PortableLog.log10RatioSql("a", "b", spark = true)).as("l"))
      .collect()
    df.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(PortableLog.log10RatioRef(a, b)),
        s"log10($a/$b): sql=${r.getDouble(2)} ref=${PortableLog.log10RatioRef(a, b)}")
    }
  }

  test("surrogate is an accurate logarithm (vs java.lang.Math, 1e-8)") {
    probes.foreach { n =>
      assert(math.abs(PortableLog.lnRef(n) - math.log(n.toDouble)) <
        1e-8 * math.max(1.0, math.abs(math.log(n.toDouble))),
        s"lnRef($n) drifted from Math.log")
    }
  }

  test("floor-quantization of the identical double is boundary-proof") {
    import spark.implicits._
    // perturb counts across every power-of-two edge: quantization flips
    // BETWEEN inputs are fine; within one input the fragment and the
    // reference must land in the same 1e-6 cell because the doubles are
    // bit-identical (asserted above) — this pins the end-to-end decimal
    val df = probes.toDF("n")
      .select(col("n"), expr(PortableLog.floorDec6Sql(
        PortableLog.log2Sql("n", spark = true), spark = true)).as("d"))
      .collect()
    df.foreach { r =>
      val n = r.getLong(0)
      val expected = java.math.BigDecimal.valueOf(
        math.floor(PortableLog.log2Ref(n) * 1000000.0).toLong, 6)
      assert(r.getDecimal(1).compareTo(expected) == 0,
        s"dec6(log2($n)): sql=${r.getDecimal(1)} ref=$expected")
    }
  }

  test("planted .xxxx50 ties: the floor idiom is stable where round(double, 4) is engine-defined") {
    import spark.implicits._
    // exact .5-at-the-5th-decimal ratios — the HALF_UP tie class the r10
    // sweep moved off every hash surface (Dedup/Similarity/TextAnalysis/
    // Profiling). round(x, 4) on these depends on whether an engine rounds
    // the DECIMAL rendering (→ up) or the exact binary value (→ either
    // side); floor(x·10⁴)/10⁴ is one IEEE multiply + floor of the identical
    // double — a single deterministic answer on every engine.
    val ties = Seq(
      (1L, 1.0, 16.0),   // 1/16  = 0.0625       → 4dp tie .000050-class scaled
      (2L, 5.0, 8.0),    // 5/8   = 0.625
      (3L, 10001.0, 200000.0), // 0.050005 — a true 5th-decimal .5 tie
      (4L, 3.0, 32.0),   // 0.09375
      (5L, -10001.0, 200000.0)) // negative tie — floor ≠ truncate here
      .toDF("id", "num", "den")
      .select(col("id"),
        (floor((col("num") / col("den")) * 10000).cast("double") / 10000.0)
          .as("f"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // same arithmetic in plain Scala (strict IEEE on Java 17) — bit-equal
    def ref(n: Double, d: Double) = math.floor(n / d * 10000) / 10000
    assert(ties(1L) == ref(1.0, 16.0) && ties(1L) == 0.0625)
    assert(ties(2L) == ref(5.0, 8.0) && ties(2L) == 0.625)
    assert(ties(3L) == ref(10001.0, 200000.0) && ties(3L) == 0.05)
    assert(ties(4L) == ref(3.0, 32.0) && ties(4L) == 0.0937)
    assert(ties(5L) == ref(-10001.0, 200000.0) && ties(5L) == -0.0501,
      s"negative tie must floor DOWN, got ${ties(5L)}")
  }
}
