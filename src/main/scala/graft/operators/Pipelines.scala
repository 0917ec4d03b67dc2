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
    *
    * Both gates are column expressions evaluated in the same narrow stage — no
    * self-joins of the corpus — so the plan is exactly: one codegen'd
    * scan+filter pass, then the dedup exchange.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 5, maxTokens: Int = 100000,
      lang: String = "en"): DataFrame = {
    val text = col(textCol)
    val nTokens = size(filter(split(lower(text), "\\s+"), w => length(w) > 0))
    val kept = docs
      .filter(nTokens.between(minTokens, maxTokens) &&
        TextAnalysis.langPred(text) === lang)
      .select(Keys.id(docs, idCol).as("doc_id"), text.as("__text"))
    Dedup.exact(kept, "doc_id", "__text")
  }
}
