package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.Similarity
import graft.sources.Tables

/** Similarity search: brute-force exactness and the two approximate paths
  * (LSH buckets, IVF cells) recalling what brute force finds.
  */
class SimilaritySpec extends SparkSpec {

  private def emb = Tables(spark, sfDir, "embeddings")

  test("brute-force top-k is the exact reference ranking") {
    GraftFunctions.register(spark)
    val top = Similarity.bruteForceTopK(emb, "vec_id", "embedding", queryId = 0L, k = 5)
      .collect()
    assert(top.length == 5)
    val scores = top.map(_.getDouble(1))
    assert(scores.sameElements(scores.sorted.reverse), "must be sorted by cos desc")
    assert(!top.map(_.getLong(0)).contains(0L), "query vector excluded")
  }

  test("IVF top-k recalls most of the brute-force top-k") {
    GraftFunctions.register(spark)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10,
      nlist = 8, nprobe = 4)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall too low: $recall (exact=$exact ivf=$ivf)")
  }

  test("IVF with nprobe = nlist degenerates to exact search") {
    GraftFunctions.register(spark)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val full = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10,
      nlist = 8, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(full.sameElements(exact), "probing every cell must equal brute force")
  }
}
