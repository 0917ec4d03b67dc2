package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic (embedding-space) deduplication — the SemDeDup recipe (Abbas et
  * al. 2023): coarse-cluster the embedding space, then prune near-duplicate
  * vectors WITHIN each cluster, so the pairwise stage never leaves a cell and
  * no O(n²) comparison forms. The reference engine has no counterpart; this is
  * a north-star extension operator (SURVEY.md §2.13).
  *
  * Determinism contract (what makes both stages hash-oracle-able in an
  * external SQL engine):
  *  - Seeds are the `k` vectors with the smallest (md5(vec_id), vec_id) — an
  *    engine-portable pseudo-random draw, the same trick as
  *    [[Pipelines.hashSample]].
  *  - Distances are squared-L2 over components quantized by
  *    `floor(x · 1e6 + 0.5)`: float→double widening is exact, the multiply,
  *    add and floor are single IEEE ops any engine reproduces bit-for-bit,
  *    and every quantized component is an integer below 2^31 — so the squared
  *    distance (≤ 64 · (2·6e5)² ≈ 9e13 here) stays an EXACT integer in double
  *    arithmetic, summation order irrelevant. Argmin ties break on the
  *    smaller seed id. No engine-private RNG, no order-dependent float sums.
  *
  * Scale shape (100 TB): seeds are k rows — a global top-k (TakeOrdered) then
  * a broadcast; assignment is one narrow pass computing k distances per row
  * (exactly IVF's coarse quantizer, `Similarity.ivfTopK`); the within-cell
  * prune self-joins on the cell key, so reducer width is bounded by the
  * widest cell — k is the knob (pick k ≈ n / targetCellSize; SemDeDup uses
  * n/cell ≈ 1e4 at web scale). For corpora where a cell could still run hot,
  * compose with [[Dedup.embeddingPairs]]' LSH blocking inside the cell; the
  * keep-first rule below stays well-defined because it only needs each
  * dropped row to have SOME smaller-id near-duplicate, not the full pair set.
  */
object Semantic {

  private def quantized(vecCol: String): org.apache.spark.sql.Column =
    expr(s"transform($vecCol, x -> floor(cast(x as double) * 1000000.0d + 0.5d))")

  /** (vec_id, cell, dist2): every vector assigned to its nearest of `k`
    * deterministic seed vectors (cell = the seed's vec_id), with the exact
    * integer quantized squared-L2 distance. Null-embedding rows are excluded
    * (they have no position in the space). This is the deterministic coarse
    * quantizer SemDeDup and IVF both start from.
    */
  def assignCells(emb: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val vecs = emb
      .filter(col(vecCol).isNotNull)
      .select(Keys.id(emb, idCol).as("vec_id"), quantized(vecCol).as("qv"))
    val seeds = vecs
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(k)
      .select(col("vec_id").as("seed_id"), col("qv").as("sv"))
    vecs.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("seed_id"),
        aggregate(zip_with(col("qv"), col("sv"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x).as("d2"))
      // min(struct(...)) = lexicographic argmin: smallest distance, then
      // smallest seed id — the engine-portable tie-break
      .groupBy("vec_id")
      .agg(min(struct(col("d2"), col("seed_id"))).as("m"))
      .select(col("vec_id"), col("m.seed_id").as("cell"),
        col("m.d2").cast("long").as("dist2"))
  }

  /** Semantic dedup survivors: (vec_id, cell) of every vector NOT pruned by
    * the within-cell keep-first rule — a vector is dropped iff some SMALLER-id
    * vector in the same cell has cosine similarity ≥ `threshold` with it.
    * Keep-first on ids is the same deterministic cut [[Pipelines.dedupNear]]
    * and [[Pipelines.dedupLines]] use, and unlike "drop everything near the
    * centroid-closest point" it needs no float centroid (whose summation
    * order no two engines agree on).
    */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, threshold: Double): DataFrame = {
    import graft.functions.GraftFunctions.cosineSim
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val assigned = assignCells(emb, idCol, vecCol, k).select("vec_id", "cell")
    val vecs = emb.filter(col(vecCol).isNotNull)
      .select(Keys.id(emb, idCol).as("vec_id"), col(vecCol).as("v"))
    val cells = assigned.join(vecs, "vec_id")
    // within-cell pairs only: the self-join key is the cell, so candidate
    // volume is sum(cell²), never n² — k bounds the widest reducer
    val drops = cells.as("a")
      .join(cells.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .filter(cosineSim(col("a.v"), col("b.v")) >= threshold)
      .select(col("b.vec_id").as("vec_id"))
      .distinct()
    assigned.join(drops, Seq("vec_id"), "left_anti")
  }
}
