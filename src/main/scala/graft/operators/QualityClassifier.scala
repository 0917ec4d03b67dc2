package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Trained quality classifier — fastText-shaped: hashed word-unigram features
  * + a linear model with a sigmoid-shaped link (Joulin 2016's
  * bag-of-hashed-ngrams linear model), trained by full-batch gradient descent
  * for a FIXED number of iterations.
  *
  * Everything is engine-portable-deterministic — and, unlike the r8 version,
  * contains NO transcendental anywhere (round 8 proved that `round(exp(z), 6)`
  * inherits the ORACLE ENGINE's libm: one ulp difference in `exp()` near a
  * rounding boundary flips a 6th decimal, and one flipped sigmoid propagates
  * through the remaining GD iterations — green under one DuckDB build, red
  * under another). The whole training loop now runs in fixed-point 1e-6
  * integer arithmetic:
  *  - features are md5-hashed buckets (`conv(substr(md5(word),1,8),16,10) %
  *    nBuckets`) — the same md5 idiom every sampler here uses, restatable in
  *    any SQL engine; feature value is PRESENCE (0/1), so all dot products
  *    are exact integer sums with no float-summation order sensitivity;
  *  - the logistic link is replaced by the algebraic sigmoid
  *    sig(z) = 0.5 + z / (2 * (1 + |z|)) — same range (0,1), same symmetry
  *    around (0, 0.5), same monotone S shape, so GD trains the same
  *    separator — evaluated as `500000 + sign(z6) * ((|z6| * 1000000) div
  *    (2000000 + 2*|z6|))` over 1e-6-unit integers. Integer division with
  *    NON-NEGATIVE operands is truncation = floor in every engine (Spark
  *    `div`, DuckDB `//`, Java `/`), so the quantization is bit-identical
  *    everywhere — the `dup_frac` discipline ([[Pipelines.duplicateSpans]]);
  *  - the gradient step lr * g / n is likewise `(|g6| * lr6) div (n *
  *    1000000)` with the sign applied outside the division;
  *  - full-batch GD from all-zero weights: no sampling, no shuffle-order
  *    dependence, so (corpus, label rule, hyperparams) fully determine the
  *    model and a SQL oracle can unroll the training loop as one CTE chain
  *    per iteration.
  *
  * Scale shape: the corpus is read ONCE into a cached (doc_id, f) feature
  * frame plus a (doc_id, y6) label frame (caller releases per the [[Caches]]
  * contract). Each iteration is: broadcast the (nBuckets+1)-row weight table
  * to the features (a broadcast hash join — the corpus never re-shuffles on
  * anything but the map-side-combinable doc_id/f aggregates), one
  * margin-per-doc aggregate, one gradient-per-feature aggregate, and a
  * driver collect of EXACTLY nBuckets+1 rows (bounded plan-time metadata,
  * the IVF-codebook pattern — never a corpus collect). Iterations are a
  * handful of sequential tiny-output jobs; at 100 TB each is one scan-free
  * pass over the cached narrow features. Training corpora are bounded (see
  * [[train]]'s `n` guard): quality classifiers train on a curated REFERENCE
  * set (the fastText/CCNet practice), and the fitted model then scores the
  * full 100 TB corpus via [[score]]'s single broadcast join.
  */
object QualityClassifier {

  private val Dec = DecimalType(18, 6)

  /** 1e-6 fixed-point unit: every model value w is carried as w6 = w * 1e6. */
  private val Scale = 1000000L

  /** Algebraic sigmoid minus label, in 1e-6 units, as a portable SQL
    * fragment over columns `z6` and `y6`: no libm, div on non-negative
    * operands only. sig6(0) = 500000 regardless of the CASE branch (the
    * quotient is 0), so the sign convention at z6 = 0 is immaterial.
    */
  private val errExprSql: String =
    "(500000L + (CASE WHEN z6 < 0 THEN -1L ELSE 1L END) * " +
      "((abs(z6) * 1000000L) div (2000000L + 2L * abs(z6)))) - y6"

  /** Gradient step in 1e-6 units over column `g6`: sign(g6) * ((|g6| * lr6)
    * div (n * 1e6)) — truncation toward zero, identical cross-engine.
    */
  private def stepExprSql(lr6: Long, n: Long): String =
    s"(CASE WHEN g6 < 0 THEN -1L ELSE 1L END) * " +
      s"((abs(g6) * ${lr6}L) div (${n}L * 1000000L))"

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
    Par.spread(docs).select(Keys.id(docs, idCol).as("doc_id"),
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
    * model smooths and generalizes). `lr` is interpreted at 6dp precision
    * (it becomes the fixed-point lr6 = lr * 1e6).
    */
  def train(docs: DataFrame, idCol: String, textCol: String, label: Column,
      nBuckets: Int = 256, iters: Int = 3, lr: Double = 0.5,
      wordBigrams: Boolean = false): DataFrame = {
    require(nBuckets > 0 && iters >= 1 && lr > 0, "bad hyperparameters")
    val lr6 = math.rint(lr * Scale).toLong
    require(lr6 > 0 && math.abs(lr6 / Scale.toDouble - lr) < 1e-12,
      s"lr must be expressible at 6dp precision, got $lr")
    val spark = docs.sparkSession
    import spark.implicits._

    val labels = docs.select(Keys.id(docs, idCol).as("doc_id"),
      (label.cast("bigint") * lit(Scale)).as("y6")).cache()
    val feats = features(docs, idCol, textCol, nBuckets, wordBigrams).cache()
    val n = labels.count()
    require(n > 0, "empty training corpus")
    // |g6| <= n * 1e6, so |g6| * lr6 must stay inside a signed 64-bit long:
    // full-batch GD is for bounded REFERENCE corpora (subsample upstream
    // with hashSample for anything bigger — the fastText/CCNet practice)
    require(n <= Long.MaxValue / (Scale * math.max(lr6, Scale)),
      s"training corpus too large for exact fixed-point GD (n=$n); " +
        "subsample the reference set upstream")

    // weights live as an (nBuckets+1)-row frame (bias at f = -1), the whole
    // GD recurrence chained IN-PLAN with a lazy localCheckpoint per round —
    // no blocking collect per iteration (r16 opt round; the Links.hits
    // treatment: r15 had already halved this loop from two collects per
    // iteration to one, this removes the last). Bounded model state per
    // round, identical exact fixed-point integers, materialized once by the
    // caller's first action.
    var wDf = ((0L until nBuckets.toLong).map(_ -> 0L) :+ (-1L -> 0L))
      .toDF("f", "w6").localCheckpoint(eager = false)

    for (_ <- 1 to iters) {
      val biasDf = wDf.filter(col("f") === -1L).select(col("w6").as("b6"))
      // margin per doc: z6 = b6 + Σ_{f ∈ doc} w6_f — exact integer sum; the
      // bias rides a broadcast 1-row cross join instead of a collected literal
      val zs = labels.crossJoin(broadcast(biasDf))
        .join(
          feats.join(broadcast(wDf.filter(col("f") >= 0L)), "f")
            .groupBy("doc_id").agg(sum("w6").as("s6")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), col("y6"),
          (col("b6") + coalesce(col("s6"), lit(0L))).as("z6"))
      // algebraic sigmoid, all-integer — no libm anywhere; checkpointed (not
      // cached) because both gradient branches below read it
      val errs = zs.select(col("doc_id"), expr(errExprSql).as("err6"))
        .localCheckpoint(eager = false)
      // gradient: presence features ⇒ g6_f = Σ_{docs ∋ f} err6 — exact.
      // The bias gradient rides the SAME frame as the f = -1 row (features
      // are non-negative buckets, so -1 never collides).
      val steps = feats.join(errs, "doc_id")
        .groupBy("f").agg(sum("err6").as("g6"))
        .unionByName(errs.agg(sum("err6").as("g6"))
          .select(lit(-1L).as("f"), col("g6")))
        .select(col("f"), expr(stepExprSql(lr6, n)).as("step6"))
      wDf = wDf.join(steps, Seq("f"), "left")
        .select(col("f"),
          (col("w6") - coalesce(col("step6"), lit(0L))).as("w6"))
        .localCheckpoint(eager = false)
    }
    // w6 / 1e6 at 6dp is exact; the cast to DECIMAL(18,6) matches the old
    // BigDecimal.valueOf(v, 6) surface bit-for-bit
    wDf.select(col("f"),
      (col("w6").cast(DecimalType(24, 0)) / lit(1000000L)).cast(Dec).as("w"))
  }

  /** Score docs under a trained (f, w) model: (doc_id, score_e6, pred) with
    * score_e6 = (b + Σ w_f) in exact 1e-6 BIGINT micro-units (the model's
    * own fixed-point scale — divide by 1e6 for display) and pred =
    * score_e6 > 0. The surface is a plain BIGINT, not a DECIMAL: round 9
    * proved the driver's oracle build diverges on DECIMAL-typed comparison
    * columns even when the values agree, so micro-units ARE the contract.
    * One broadcast join + one map-side-combinable sum per doc. The bias row
    * (f = -1) is read driver-side (1 row) and inlined as a literal — a
    * model frame without exactly one bias row is a caller error, not a
    * silent empty result.
    */
  def score(docs: DataFrame, idCol: String, textCol: String, model: DataFrame,
      nBuckets: Int = 256, wordBigrams: Boolean = false): DataFrame = {
    val biasRows = model.filter(col("f") === -1L)
      .select((col("w").cast(Dec) * lit(Scale)).cast("long")).collect()
    require(biasRows.length == 1,
      s"model must contain exactly one bias row (f = -1), found ${biasRows.length}")
    val bias6 = biasRows(0).getLong(0)
    val feats = features(docs, idCol, textCol, nBuckets, wordBigrams)
    docs.select(Keys.id(docs, idCol).as("doc_id"))
      .join(feats.join(broadcast(model.filter(col("f") >= 0)
        .select(col("f"), (col("w").cast(Dec) * lit(Scale)).cast("long")
          .as("w6"))), "f")
        .groupBy("doc_id").agg(sum("w6").as("s6")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        (lit(bias6) + coalesce(col("s6"), lit(0L))).as("score_e6"))
      .withColumn("pred", col("score_e6") > 0)
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

  /** Classifier EVALUATION over a labeled holdout — the table you actually
    * read before trusting a quality gate at 100 TB: for each candidate
    * decision threshold, the exact confusion counts (pred = score >
    * threshold) and precision / recall / F1. Counts are plain integer sums;
    * the three ratios are floor-quantized to 4dp via integer `div` (the
    * `dup_frac` discipline — no double division, no rounding tie class), so
    * the whole table is an engine-portable function of (scored, labels,
    * thresholds). Empty denominators (a threshold above every score, a
    * label-free holdout) yield 0.0, keeping the grid total.
    *
    * `scored` carries [[score]]'s BIGINT `score_e6` micro-unit column plus
    * the label; thresholds are interpreted at 6dp precision like every model
    * constant here (they compare directly against the e6 units). Scale shape: one explode of |thresholds| small rows per doc and
    * ONE map-side-combinable groupBy — |thresholds| output rows, no window,
    * no second pass.
    */
  def evaluate(scored: DataFrame, scoreCol: String, label: Column,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val t6s = thresholds.map { t =>
      val t6 = math.rint(t * Scale).toLong
      require(math.abs(t6 / Scale.toDouble - t) < 1e-12,
        s"threshold must be expressible at 6dp precision, got $t")
      t6
    }
    require(t6s.distinct.size == t6s.size, "duplicate thresholds")
    scored
      .select(col(scoreCol).cast("long").as("z6"),
        coalesce(label.cast("int"), lit(0)).as("y"))
      .select(col("z6"), col("y"),
        explode(array(t6s.map(lit(_)): _*)).as("threshold_e6"))
      .groupBy("threshold_e6").agg(
        sum(when(col("z6") > col("threshold_e6") && col("y") === 1, 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("z6") > col("threshold_e6") && col("y") === 0, 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("z6") <= col("threshold_e6") && col("y") === 1, 1L)
          .otherwise(0L)).as("fn"),
        sum(when(col("z6") <= col("threshold_e6") && col("y") === 0, 1L)
          .otherwise(0L)).as("tn"))
      .select(col("threshold_e6"), col("tp"), col("fp"), col("fn"), col("tn"),
        expr("case when tp + fp = 0 then 0.0 else " +
          "cast((tp * 10000) div (tp + fp) as double) / 10000.0 end")
          .as("precision"),
        expr("case when tp + fn = 0 then 0.0 else " +
          "cast((tp * 10000) div (tp + fn) as double) / 10000.0 end")
          .as("recall"),
        // F1 = 2tp / (2tp + fp + fn): the harmonic mean computed from raw
        // counts, so no intermediate-quantization error compounds
        expr("case when 2 * tp + fp + fn = 0 then 0.0 else " +
          "cast((2 * tp * 10000) div (2 * tp + fp + fn) as double) / 10000.0 end")
          .as("f1"))
  }

  /** CALIBRATION buckets over a labeled holdout: map each score through the
    * model's own algebraic sigmoid to a probability p ∈ (0,1) (the same
    * 1e-6 fixed-point link [[train]] optimizes — no libm), cut [0,1) into
    * `nBins` equal bins, and per bin report the doc count, positive count,
    * floor-mean predicted probability (1e-6 units), and the observed
    * positive fraction at 4dp. A well-calibrated gate has mean_p6/1e6 ≈
    * frac_pos per bin; a miscalibrated one tells you which score region not
    * to trust. All integer arithmetic — engine-portable like [[evaluate]].
    * One narrow projection + one map-side-combinable groupBy.
    */
  def calibration(scored: DataFrame, scoreCol: String, label: Column,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, "need at least 2 calibration bins")
    scored
      .select(col(scoreCol).cast("long").as("z6"),
        coalesce(label.cast("bigint"), lit(0L)).as("y"))
      // the algebraic sigmoid in 1e-6 units: p6 ∈ (0, 1e6) exclusive, so
      // the bin index lands in [0, nBins-1] with no boundary clamp needed
      .withColumn("p6", expr("500000L + (case when z6 < 0 then -1L else 1L end)" +
        " * ((abs(z6) * 1000000L) div (2000000L + 2L * abs(z6)))"))
      .withColumn("bin", expr(s"cast((p6 * ${nBins}L) div 1000000L as int)"))
      .groupBy("bin").agg(
        count(lit(1)).as("n"),
        sum("y").as("n_pos"),
        sum("p6").as("__sp6"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("__sp6 div n").as("mean_p6"),
        expr("cast((n_pos * 10000) div n as double) / 10000.0").as("frac_pos"))
  }

  /** Exact ROC-AUC over a labeled holdout — the threshold-free ranking
    * grade next to [[evaluate]]'s fixed grid: the tie-aware Mann-Whitney
    * statistic, AUC = [Σ_s np_s·(nbelow_s + nn_s/2)] / (P·N), carried in 2×
    * integer units (u2 = Σ np_s·(2·nbelow_s + nn_s), AUC = u2 / 2PN) so
    * ties contribute exactly ½ with no fractional arithmetic.
    *
    * AUC is computed on the model's 1e-6 fixed-point sigmoid probability
    * scale (the [[calibration]] link). The quantized sigmoid is NON-DECREASING
    * in the score — equal-p6 scores tie — and it SATURATES: past |z| of a
    * few hundred its ~1/(2(1+|z|)²) resolution collapses well-separated
    * scores into the same p6, so this AUC is exact for the QUANTIZED
    * ranking and a (tie-credited) lower bound on the raw-score AUC. The
    * saturation is also the scale enabler: the codomain is the INTEGERS
    * (0, 1e6), which
    * caps the distinct-score table at <1e6 rows REGARDLESS of corpus size.
    * That bound is what justifies the one global cumulative-sum window
    * below: it runs over the per-score aggregate (a bounded sidecar, the
    * `Similarity` nlist/m·ksub discipline), never over the corpus; the only
    * data-sized operation is the map-side-combinable groupBy("p6").
    * Pair counts overflow BIGINT at web scale (P·N > 9e18 once P,N > 3e9),
    * so u2 and the final ratio run INTERNALLY in DECIMAL(38,0) — Spark's
    * IntegralDivide on decimals mirrors the oracle's HUGEINT `//` on
    * non-negative operands.
    *
    * Output: ONE row (n_pos, n_neg, u2 BIGINT, auc) with auc
    * floor-quantized to 6dp (0.0 when a class is empty — [[evaluate]]'s
    * empty-denominator convention). The u2 SURFACE is a BIGINT (the round-9
    * DECIMAL-off-the-hash-surface contract): exact while u2 = 2·Σ pairs
    * < 2^63, i.e. P·N < 4.6e18 — billions of docs per class. AUC holdouts
    * are curated LABELED sets, orders of magnitude below corpus scale, so
    * the bound is comfortable; the internal arithmetic stays DECIMAL(38,0)
    * regardless, and `auc` itself never overflows.
    */
  def auc(scored: DataFrame, scoreCol: String, label: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perScore = scored
      .select(col(scoreCol).cast("long").as("z6"),
        coalesce(label.cast("bigint"), lit(0L)).as("y"))
      .withColumn("p6", expr("500000L + (case when z6 < 0 then -1L else 1L end)" +
        " * ((abs(z6) * 1000000L) div (2000000L + 2L * abs(z6)))"))
      .groupBy("p6").agg(
        sum(col("y")).as("np"),
        sum(lit(1L) - col("y")).as("nn"))
    val w = Window.orderBy("p6").rowsBetween(Window.unboundedPreceding, -1)
    perScore
      .withColumn("nbelow", coalesce(sum(col("nn")).over(w), lit(0L)))
      .agg(
        sum("np").cast(DecimalType(38, 0)).as("__p"),
        sum("nn").cast(DecimalType(38, 0)).as("__n"),
        sum(expr("cast(np as decimal(38,0)) * " +
          "(2 * cast(nbelow as decimal(38,0)) + nn)"))
          .cast(DecimalType(38, 0)).as("u2"))
      .select(col("__p").cast("long").as("n_pos"),
        col("__n").cast("long").as("n_neg"), col("u2").cast("long").as("u2"),
        expr("case when __p = 0 or __n = 0 then 0.0 else " +
          "cast((u2 * 1000000) div (2 * __p * __n) as double) / 1000000.0 end")
          .as("auc"))
  }
}
