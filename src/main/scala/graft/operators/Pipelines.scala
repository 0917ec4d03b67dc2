package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation (the north-star use case, SURVEY.md §2.13):
  * quality gate → language gate → exact dedup, composed from the individual
  * operators so the whole pipeline stays one declarative plan.
  *
  * Plan shape: the quality and language stages are narrow (pure projections and
  * filters over each document — they fuse into one codegen'd pass over the
  * corpus); the only shuffle is the dedup groupBy on the text fingerprint. At
  * 100 TB that is a single map-heavy stage plus one hash-partitioned exchange
  * of (fingerprint, doc_id) pairs — the minimum any dedup needs.
  */
object Pipelines {

  /** Curate a document corpus: keep docs passing the quality thresholds, in the
    * wanted language, and unique by normalized text (smallest doc_id wins).
    * Returns (doc_id) of survivors.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 5, maxTokens: Int = 100000,
      lang: String = "en"): DataFrame = {
    val stats = TextAnalysis.qualityStats(docs, idCol, textCol)
      .filter(col("n_tokens").between(minTokens, maxTokens))
      .select("doc_id")
    val language = TextAnalysis.languageId(docs, idCol, textCol)
      .filter(col("lang_pred") === lang)
      .select("doc_id")
    val candidates = docs
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__text"))
      .join(stats, "doc_id")
      .join(language, "doc_id")
    Dedup.exact(candidates, "doc_id", "__text")
  }
}
