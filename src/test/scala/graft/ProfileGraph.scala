package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: planted-skew profiles for the round-9 graph/containment paths —
  *  1. containment prefix filter vs a HOT-SHINGLE flood: 90% of docs share
  *     two boilerplate shingles (df ≈ n) while being otherwise unique. The
  *     df-ascending prefix ordering must push the hot shingles OUT of every
  *     prefix, so the candidate join stays ~empty and runtime tracks the
  *     corpus linearly — the naive shingle self-join would owe
  *     ~C(0.9n, 2) rows on the hot postings alone.
  *  2. pageRank under in-degree skew (90% of edges point at ONE host) and
  *     out-degree skew (one host links to 100k others): per-iteration
  *     shuffles are plain hash aggregates with map-side combine, so both
  *     floods must run flat vs the uniform graph.
  * sbt "Test/runMain graft.ProfileGraph [nDoc] [nEdge]"
  */
object ProfileGraph {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-52s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val nDoc = args.headOption.map(_.toInt).getOrElse(200000)
    val nEdge = args.lift(1).map(_.toInt).getOrElse(2000000)

    // --- 1. containment hot-shingle flood --------------------------------
    // each doc: 10 unique words (from its id) + for 90% the same 6-word
    // boilerplate tail → two shared trigram shingles with df ≈ 0.9n plus a
    // bridging one; unique heads keep every pair far below any threshold
    def uw(i: Int) = concat(lit("w"), ((col("id") * 31 + i) % 1000000000L).cast("string"))
    val uniqueHead = concat_ws(" ", (0 until 10).map(uw): _*)
    val docsHot = spark.range(nDoc).select(col("id").as("doc_id"),
      when(col("id") % 10 =!= 0,
        concat(uniqueHead, lit(" the quick brown fox jumps over")))
        .otherwise(uniqueHead).as("text"))
      .repartition(32).cache()
    val docsFlat = spark.range(nDoc).select(col("id").as("doc_id"),
      uniqueHead.as("text")).repartition(32).cache()
    println(s"[prof] docs: ${docsHot.count()} hot / ${docsFlat.count()} flat")

    for (i <- 1 to 2) {
      time(s"containmentPairs no-hot-shingle baseline #$i") {
        val c = graft.operators.Dedup.containmentPairs(
          docsFlat, "doc_id", "text", n = 3, threshold = 0.9).count()
        println(s"[prof]   pairs=$c")
      }
      time(s"containmentPairs 90%-hot-shingle flood   #$i") {
        val c = graft.operators.Dedup.containmentPairs(
          docsHot, "doc_id", "text", n = 3, threshold = 0.9).count()
        println(s"[prof]   pairs=$c")
      }
    }
    docsHot.unpersist(); docsFlat.unpersist()

    // --- 2. pageRank degree floods ---------------------------------------
    def host(c: org.apache.spark.sql.Column) = concat(lit("h"), c.cast("string"))
    val uniform = spark.range(nEdge).select(
      host(pmod(xxhash64(col("id")), lit(100000L))).as("src_host"),
      host(pmod(xxhash64(col("id"), lit(1)), lit(100000L))).as("dst_host"))
      .repartition(32).cache()
    // 90% of edges land on ONE dst; one src fans out to 100k dsts
    val skewed = spark.range(nEdge).select(
      when(col("id") % 100 === 0, host(lit(999999)))
        .otherwise(host(pmod(xxhash64(col("id")), lit(100000L)))).as("src_host"),
      when(col("id") % 10 =!= 0, host(lit(0)))
        .otherwise(host(pmod(xxhash64(col("id"), lit(1)), lit(100000L)))).as("dst_host"))
      .repartition(32).cache()
    println(s"[prof] edges: ${uniform.count()} uniform / ${skewed.count()} skewed")

    for (i <- 1 to 2) {
      time(s"pageRank 3 iters uniform 100k hosts      #$i") {
        graft.operators.Links.pageRank(uniform, iters = 3)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"pageRank 3 iters 90%-one-dst skew        #$i") {
        graft.operators.Links.pageRank(skewed, iters = 3)
          .write.format("noop").mode("overwrite").save()
      }
    }

    // --- 3. trustRank under the same floods ------------------------------
    // same recurrence + one broadcast seed mark; must track pageRank's
    // times on both graphs (100 seed hosts out of 100k)
    val seeds = spark.range(100).select(host(col("id") * 1000L).as("host"))
      .cache()
    seeds.count()
    for (i <- 1 to 2) {
      time(s"trustRank 3 iters uniform 100k hosts     #$i") {
        graft.operators.Links.trustRank(uniform, seeds, iters = 3)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"trustRank 3 iters 90%-one-dst skew       #$i") {
        graft.operators.Links.trustRank(skewed, seeds, iters = 3)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // --- 4. labelPropagate under the same floods -------------------------
    // per round: labels⋈edges join + count/max/min keyed aggregates, all
    // map-side combinable — the hot host's (host, label) count rows are
    // bounded by its distinct NEIGHBOR LABELS, not its edge count, so the
    // 90%-one-dst flood must track the uniform graph
    for (i <- 1 to 2) {
      time(s"labelPropagate 3 iters uniform 100k hosts#$i") {
        graft.operators.Links.labelPropagate(uniform, iters = 3)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"labelPropagate 3 iters 90%-one-dst skew  #$i") {
        graft.operators.Links.labelPropagate(skewed, iters = 3)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
