package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Trained quality classifier — fastText-shaped: hashed word-unigram features
  * + logistic regression (Joulin 2016's bag-of-hashed-ngrams linear model),
  * trained by full-batch gradient descent for a FIXED number of iterations.
  *
  * Everything is engine-portable-deterministic, the bigram-LM discipline:
  *  - features are md5-hashed buckets (`conv(substr(md5(word),1,8),16,10) %
  *    nBuckets`) — the same md5 idiom every sampler here uses, restatable in
  *    any SQL engine; feature value is PRESENCE (0/1), so all dot products
  *    are exact decimal sums with no float-summation order sensitivity;
  *  - model state (weights, bias, margins, errors) lives as DECIMAL(18,6);
  *    the only double excursions are the sigmoid and the gradient step, each
  *    immediately `round(_, 6)`-ed back — IEEE multiply/divide are identical
  *    everywhere, and the 6dp rounding absorbs libm exp() ulp differences
  *    (the proven tf-idf/bigram-LM pattern);
  *  - full-batch GD from all-zero weights: no sampling, no shuffle-order
  *    dependence, so (corpus, label rule, hyperparams) fully determine the
  *    model and a SQL oracle can unroll the training loop as one CTE chain
  *    per iteration.
  *
  * Scale shape: the corpus is read ONCE into a cached (doc_id, f) feature
  * frame plus a (doc_id, y) label frame (caller releases per the [[Caches]]
  * contract). Each iteration is: broadcast the (nBuckets+1)-row weight table
  * to the features (a broadcast hash join — the corpus never re-shuffles on
  * anything but the map-side-combinable doc_id/f aggregates), one
  * margin-per-doc aggregate, one gradient-per-feature aggregate, and a
  * driver collect of EXACTLY nBuckets+1 rows (bounded plan-time metadata,
  * the IVF-codebook pattern — never a corpus collect). Iterations are a
  * handful of sequential tiny-output jobs; at 100 TB each is one scan-free
  * pass over the cached narrow features.
  */
object QualityClassifier {

  private val Dec = DecimalType(18, 6)

  /** DISTINCT (doc_id, f) presence features over whitespace words; with
    * `wordBigrams` the adjacent-word bigrams ("w1 w2") hash into the SAME
    * bucket space — fastText's n-gram trick, which lets the linear model see
    * local word order at zero architectural cost.
    */
  def features(docs: DataFrame, idCol: String, textCol: String,
      nBuckets: Int, wordBigrams: Boolean = false): DataFrame = {
    val grams =
      if (wordBigrams)
        expr("concat(ws, case when size(ws) >= 2 then " +
          "transform(sequence(1, size(ws) - 1), " +
          "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1))) " +
          "else cast(array() as array<string>) end)")
      else col("ws")
    docs.select(Keys.id(docs, idCol).as("doc_id"),
      filter(split(lower(coalesce(col(textCol), lit(""))), "\\s+"),
        w => length(w) > 0).as("ws"))
      .select(col("doc_id"), explode(grams).as("w"))
      .select(col("doc_id"),
        expr(s"cast(conv(substring(md5(w), 1, 8), 16, 10) as bigint) % $nBuckets")
          .as("f"))
      .distinct()
  }

  /** Train and return the model as (f, w): one row per feature bucket plus
    * the bias at f = -1, w DECIMAL(18,6). `label` must be a 0/1 integer
    * expression over `docs`' columns (the training signal — e.g. an
    * editorial-source flag, a language gate, a heuristic quality rule the
    * model smooths and generalizes).
    */
  def train(docs: DataFrame, idCol: String, textCol: String, label: Column,
      nBuckets: Int = 256, iters: Int = 3, lr: Double = 0.5,
      wordBigrams: Boolean = false): DataFrame = {
    require(nBuckets > 0 && iters >= 1 && lr > 0, "bad hyperparameters")
    val spark = docs.sparkSession
    import spark.implicits._

    val labels = docs.select(Keys.id(docs, idCol).as("doc_id"),
      label.cast(Dec).as("y")).cache()
    val feats = features(docs, idCol, textCol, nBuckets, wordBigrams).cache()
    val n = labels.count()
    require(n > 0, "empty training corpus")

    // weights live on the driver between iterations: nBuckets+1 decimals —
    // bounded model state, not data
    var bias = BigDecimal(0).setScale(6)
    var w: Map[Long, BigDecimal] =
      (0L until nBuckets.toLong).map(_ -> BigDecimal(0).setScale(6)).toMap

    for (_ <- 1 to iters) {
      val wDf = w.toSeq.toDF("f", "w_raw")
        .select(col("f"), col("w_raw").cast(Dec).as("w"))
      // margin per doc: z = b + Σ_{f ∈ doc} w_f — exact decimal sum
      val zs = labels.join(
        feats.join(broadcast(wDf), "f")
          .groupBy("doc_id").agg(sum("w").cast(Dec).as("s")),
        Seq("doc_id"), "left")
        .select(col("doc_id"), col("y"),
          (lit(bias).cast(Dec) + coalesce(col("s"), lit(0).cast(Dec)))
            .cast(Dec).as("z"))
      // sigmoid excursion to double, rounded straight back to 6dp
      val errs = zs.select(col("doc_id"),
        (round(lit(1.0) / (lit(1.0) + exp(-col("z").cast("double"))), 6)
          .cast(Dec) - col("y")).cast(Dec).as("err"))
        .cache()
      // gradient: presence features ⇒ g_f = Σ_{docs ∋ f} err — exact decimal
      val grads = feats.join(errs, "doc_id")
        .groupBy("f").agg(sum("err").cast(Dec).as("g"))
        // the update arithmetic runs as a Spark expression so round()
        // semantics are byte-identical to every other decimal query here
        .select(col("f"),
          round(lit(0.0) + col("g").cast("double") * lit(lr) / lit(n.toDouble), 6)
            .cast(Dec).as("step"))
        .collect().map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap
      val biasStepRow = errs.agg(
        round(sum("err").cast("double") * lit(lr) / lit(n.toDouble), 6)
          .cast(Dec)).head()
      errs.unpersist()
      w = w.map { case (f, wf) =>
        (f, (wf - grads.getOrElse(f, BigDecimal(0))).setScale(6))
      }
      bias = (bias - BigDecimal(biasStepRow.getDecimal(0))).setScale(6)
    }
    (w.toSeq :+ (-1L -> bias)).toDF("f", "w_raw")
      .select(col("f"), col("w_raw").cast(Dec).as("w"))
  }

  /** Score docs under a trained (f, w) model: (doc_id, score, pred) with
    * score = b + Σ w_f (DECIMAL(18,6)) and pred = score > 0. One broadcast
    * join + one map-side-combinable sum per doc.
    */
  def score(docs: DataFrame, idCol: String, textCol: String, model: DataFrame,
      nBuckets: Int = 256, wordBigrams: Boolean = false): DataFrame = {
    val bias = model.filter(col("f") === -1L).select(col("w").cast(Dec))
    val feats = features(docs, idCol, textCol, nBuckets, wordBigrams)
    docs.select(Keys.id(docs, idCol).as("doc_id"))
      .join(feats.join(broadcast(model.filter(col("f") >= 0)), "f")
        .groupBy("doc_id").agg(sum("w").cast(Dec).as("s")),
        Seq("doc_id"), "left")
      .crossJoin(broadcast(bias.select(col("w").as("b"))))
      .select(col("doc_id"),
        (col("b") + coalesce(col("s"), lit(0).cast(Dec))).cast(Dec).as("score"))
      .withColumn("pred", col("score") > 0)
  }

  /** Train on `docs` with `label`, then score the same corpus — the
    * self-contained query surface.
    */
  def trainAndScore(docs: DataFrame, idCol: String, textCol: String,
      label: Column, nBuckets: Int = 256, iters: Int = 3,
      lr: Double = 0.5, wordBigrams: Boolean = false): DataFrame =
    score(docs, idCol, textCol,
      train(docs, idCol, textCol, label, nBuckets, iters, lr, wordBigrams),
      nBuckets, wordBigrams)
}
