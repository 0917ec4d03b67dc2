package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: round count + per-round cost of the star-contraction clusters
  * loop on the sf0.1 image-phash graph.
  * sbt "Test/runMain graft.ProfileImage"
  */
object ProfileImage {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = graft.sources.Tables(spark, d, "documents")
    val hashes = graft.sources.Multimodal.imageHash(
      graft.sources.Multimodal.asMedia(docs, "doc_id", "text")).cache()
    val pairs = graft.operators.Dedup.hammingPairs(
      hashes, "doc_id", "phash", maxHamming = 8, maxBucket = Int.MaxValue).cache()
    pairs.count()

    val uniq = pairs.select(
      greatest(col("doc_a"), col("doc_b")).as("u"),
      least(col("doc_a"), col("doc_b")).as("v"))
      .distinct()
      .localCheckpoint()
    var edges = uniq.filter(col("u") =!= col("v")).localCheckpoint()
    var converged = edges.isEmpty
    var i = 0
    while (!converged && i < 30) {
      val t0 = System.nanoTime()
      val bidir = edges
        .unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = bidir.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val ls = bidir.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
      val mins2 = ls.groupBy("u").agg(min("v").as("m"))
      val ss = ls.join(mins2, "u")
        .select(explode(array(
          struct(col("u").as("a"), col("m").as("b")),
          struct(col("v").as("a"), col("m").as("b")))).as("e"))
        .select(col("e.a").as("u"), col("e.b").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      val next = ss.localCheckpoint()
      val t1 = System.nanoTime()
      converged = next.except(edges).unionByName(edges.except(next)).isEmpty
      edges = next
      i += 1
      println(f"[diag] round $i%2d edges=${edges.count()}%6d  star=${(t1 - t0) / 1e9}%5.2f s check=${(System.nanoTime() - t1) / 1e9}%5.2f s")
    }
    println(s"[diag] converged after $i rounds")
    spark.stop()
  }
}
