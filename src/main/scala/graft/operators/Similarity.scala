package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Similarity search over an embedding column (north-star extension,
  * SURVEY.md §2.13).
  *
  * - `bruteForceTopK`: exact cosine top-k. The query vector is broadcast (one row),
  *   the scan streams through whole-stage codegen (CosineSimilarity has doGenCode),
  *   and top-k is `TakeOrderedAndProject` — no full sort, no extra shuffle. This is
  *   the correct-baseline path and already the right 100 TB plan for single-query
  *   scoring: one pass over the data.
  * - `annTopK`: sign-random-projection LSH. Vectors are bucketed by `tables`
  *   independent signature prefixes; only bucket-mates of the query are scored.
  *   At 100 TB the bucketed table would be pre-materialized (partitioned by
  *   (table, bucket)) so a probe touches a tiny partition subset.
  */
object Similarity {

  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("qv"))
    emb.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol).cast("long").as("vec_id"),
        round(GraftFunctions.cosineSim(col(vecCol), col("qv")), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Approximate top-k: LSH multi-table bucketing, exact re-rank of candidates. */
  def annTopK(spark: SparkSession, emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, tables: Int = 8, bitsPerTable: Int = 8): DataFrame = {
    val numBits = tables * bitsPerTable
    require(numBits <= 64, "tables * bitsPerTable must fit in 64 bits")
    GraftFunctions.registerRhBits(spark, numBits, seed = 7L)

    val sigd = emb.select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("v"),
      GraftFunctions.rhBits(col(vecCol), numBits, 7L).as("sig"))
    val tableCols = (0 until tables).map { t =>
      struct(lit(t).as("t"),
        shiftright(col("sig"), t * bitsPerTable)
          .bitwiseAND(lit((1L << bitsPerTable) - 1)).as("bucket"))
    }
    val buckets = sigd
      .select(col("vec_id"), col("v"), explode(array(tableCols: _*)).as("b"))
      .select(col("vec_id"), col("v"), col("b.t").as("t"), col("b.bucket").as("bucket"))

    val qb = buckets.filter(col("vec_id") === queryId)
      .select(col("t"), col("bucket"), col("v").as("qv"))
    buckets.filter(col("vec_id") =!= queryId)
      .join(broadcast(qb), Seq("t", "bucket"))
      .select(col("vec_id"),
        round(GraftFunctions.cosineSim(col("v"), col("qv")), 4).as("cos"))
      .groupBy("vec_id").agg(max("cos").as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }
}
