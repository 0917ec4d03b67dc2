package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: alternating A/B of fuzzy k=2 verify strategies in one JVM.
  * sbt "Test/runMain graft.ProfileFuzzy"
  */
object ProfileFuzzy {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val cust = spark.read.parquet(s"$d/customer.parquet")

    // OLD strategy: verify per collision, distinct at the end
    def verifyPerCollision(k: Int) = {
      val ids = cust.select(col("c_custkey").cast("long").as("id"), col("c_name").as("s"))
      val reps = ids.select("s").distinct()
      val d1 = "transform(sequence(1, length(s)), " +
        "i -> concat(substring(s, 1, i - 1), substring(s, i + 1, length(s))))"
      val neighborhood = s"array_distinct(concat(array(s), $d1, " +
        s"flatten(transform($d1, v -> case when length(v) >= 1 then " +
        "transform(sequence(1, length(v)), " +
        "j -> concat(substring(v, 1, j - 1), substring(v, j + 1, length(v)))) " +
        "else cast(array() as array<string>) end))))"
      val variants = reps.select(col("s"), explode(expr(neighborhood)).as("v"))
        .select(col("s"), xxhash64(col("v")).as("vh"))
      val repPairs = variants.as("x").join(variants.as("y"), "vh")
        .filter(col("x.s") < col("y.s"))
        .select(col("x.s").as("sa"), col("y.s").as("sb"),
          levenshtein(col("x.s"), col("y.s")).as("dist"))
        .filter(col("dist") <= k)
        .distinct()
      val byStr = (a: String, i: String) => ids.select(col("id").as(i), col("s").as(a))
      repPairs.join(byStr("sa", "ia"), "sa").join(byStr("sb", "ib"), "sb")
        .select(least(col("ia"), col("ib")).as("id_a"),
          greatest(col("ia"), col("ib")).as("id_b"), col("dist"))
        .unionByName(ids.as("x").join(ids.as("y"), "s")
          .filter(col("x.id") < col("y.id"))
          .select(col("x.id").as("id_a"), col("y.id").as("id_b"), lit(0).as("dist")))
    }

    // NEW strategy is the shipped pairsWithin (distinct-first + len filter)
    for (i <- 1 to 3) {
      time(s"old verify-per-collision #$i")(noop(verifyPerCollision(2)))
      time(s"new distinct-first       #$i")(noop(
        graft.operators.FuzzyJoin.pairsWithin(cust, "c_custkey", "c_name", k = 2)))
    }
    spark.stop()
  }
}
