package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Unit specs for the custom Catalyst expressions (SURVEY.md §2.10). */
class FunctionsSpec extends SparkSpec {

  private def vec(xs: Float*): Array[Float] = xs.toArray

  test("cosine_sim matches hand-computed values (interpreted and codegen paths)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (vec(1f, 0f), vec(0f, 1f), 0.0),
      (vec(1f, 0f), vec(1f, 0f), 1.0),
      (vec(1f, 2f, 3f), vec(4f, 5f, 6f), 0.9746318),
      (vec(0f, 0f), vec(1f, 1f), 0.0) // zero vector → 0.0, not NaN
    ).toDF("a", "b", "expected")
    val rows = df.select(GraftFunctions.cosineSim(col("a"), col("b")), col("expected"))
      .collect()
    rows.foreach { case Row(got: Double, want: Double) =>
      assert(math.abs(got - want) < 1e-6, s"got $got want $want")
    }
    // SQL-text path exercises the registry
    df.createOrReplaceTempView("__cos_t")
    val viaSql = spark.sql("SELECT cosine_sim(a, b) FROM __cos_t").collect().map(_.getDouble(0))
    assert(viaSql.length == 4)
  }

  test("cosine_sim is null-safe") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Option(vec(1f, 2f)), Option.empty[Array[Float]])).toDF("a", "b")
    val r = df.select(GraftFunctions.cosineSim(col("a"), col("b"))).collect()
    assert(r.head.isNullAt(0))
  }

  test("rh_bits is deterministic, in range, and scale-invariant") {
    GraftFunctions.registerRhBits(spark, numBits = 16, seed = 7L)
    import spark.implicits._
    val df = Seq(vec(1f, 2f, 3f), vec(1f, 2f, 3f), vec(2f, 4f, 6f), vec(9f, -1f, 4f))
      .toDF("v")
    val bits = df.select(GraftFunctions.rhBits(col("v"), 16, 7L)).collect().map(_.getLong(0))
    assert(bits(0) == bits(1), "same vector must hash identically")
    assert(bits(0) == bits(2), "signature depends on direction only (scale-invariant)")
    assert(bits.forall(b => b >= 0 && b < (1L << 16)))
    assert(bits(0) != bits(3), "different directions should differ (whp)")
  }

  test("word_ngrams explodes lower-cased n-grams") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq("The quick  Brown fox").toDF("t")
    val grams = df.select(GraftFunctions.wordNGrams(col("t"), 2).as("g"))
      .collect().map(_.getString(0)).toSeq
    assert(grams == Seq("the quick", "quick brown", "brown fox"))
    // n longer than the document → empty, not error
    val none = df.select(GraftFunctions.wordNGrams(col("t"), 9)).collect()
    assert(none.isEmpty)
  }

  test("geomean UDAF matches exp(avg(ln(x)))") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(1.0, 10.0, 100.0).toDF("x")
    val gm = df.agg(GraftFunctions.geoMean(col("x"))).collect().head.getDouble(0)
    assert(math.abs(gm - 10.0) < 1e-9)
  }

  test("current_engine returns the engine constant") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT current_engine()").collect().head.getString(0)
    assert(r == "graft")
  }
}
