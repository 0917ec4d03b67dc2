package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.functions._

import graft.operators.QualityClassifier

/** The trained classifier vs an INDEPENDENT plain-Scala implementation of the
  * same spec (hashed word presence, full-batch GD, 6dp decimal model state),
  * plus a does-it-actually-learn check.
  */
class QualityClassifierSpec extends SparkSpec {

  private val nBuckets = 64
  private val iters = 3
  private val lr = 0.5

  // deterministic toy corpus: "good" docs share quality words, "bad" docs
  // share junk words, some overlap so the problem is not trivially separable
  private val corpus: Seq[(Long, String, Int)] = (0L until 40L).map { i =>
    if (i % 2 == 0)
      (i, s"clear thorough prose with citations item$i shared filler words", 1)
    else
      (i, s"click here buy now spam spam item$i shared filler words", 0)
  }

  /** Independent reference: scala.collection implementation, java.math
    * decimals, Math.exp — no Spark.
    */
  private def reference(): (Map[Long, JBigDecimal], JBigDecimal) = {
    def bucket(w: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % nBuckets
    }
    val feats: Map[Long, Set[Long]] = corpus.map { case (id, text, _) =>
      id -> text.toLowerCase.split("\\s+").filter(_.nonEmpty).map(bucket).toSet
    }.toMap
    val ys: Map[Long, Int] = corpus.map(t => t._1 -> t._3).toMap
    val n = corpus.size.toDouble
    // shortest-decimal-repr rounding — the documented semantics Spark's
    // round() applies to doubles (BigDecimal.valueOf)
    def r6(x: Double): JBigDecimal =
      JBigDecimal.valueOf(x).setScale(6, RoundingMode.HALF_UP)
    var w = (0L until nBuckets.toLong)
      .map(_ -> JBigDecimal.ZERO.setScale(6)).toMap
    var b = JBigDecimal.ZERO.setScale(6)
    for (_ <- 1 to iters) {
      val errs: Map[Long, JBigDecimal] = corpus.map { case (id, _, _) =>
        val z = feats(id).foldLeft(b)((acc, f) => acc.add(w(f)))
        val p = r6(1.0 / (1.0 + math.exp(-z.doubleValue)))
        id -> p.subtract(new JBigDecimal(ys(id)).setScale(6))
      }.toMap
      val grad: Map[Long, JBigDecimal] = errs.toSeq
        .flatMap { case (id, e) => feats(id).map(_ -> e) }
        .groupBy(_._1)
        .view.mapValues(_.map(_._2).reduce(_ add _)).toMap
      w = w.map { case (f, wf) =>
        val g = grad.getOrElse(f, JBigDecimal.ZERO)
        f -> wf.subtract(r6(g.doubleValue * lr / n))
      }
      val ge = errs.values.reduce(_ add _)
      b = b.subtract(r6(ge.doubleValue * lr / n))
    }
    (w, b)
  }

  test("train matches the independent reference weight for weight") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text", "y")
    val model = QualityClassifier.train(docs, "doc_id", "text", col("y"),
      nBuckets = nBuckets, iters = iters, lr = lr)
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val (refW, refB) = reference()
    assert(model(-1L).compareTo(refB) == 0,
      s"bias: got ${model(-1L)}, ref $refB")
    for (f <- 0L until nBuckets.toLong)
      assert(model(f).compareTo(refW(f)) == 0,
        s"w[$f]: got ${model(f)}, ref ${refW(f)}")
    graft.operators.Caches.release(spark)
  }

  test("the trained model separates the planted signal") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text", "y")
    val scored = QualityClassifier.trainAndScore(docs, "doc_id", "text",
      col("y"), nBuckets = nBuckets, iters = iters, lr = lr)
      .join(docs.select(col("doc_id"), col("y")), "doc_id")
      .select(col("y"), col("pred").cast("int").as("p"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    val acc = scored.count { case (y, p) => y == p }.toDouble / scored.length
    assert(acc >= 0.9, s"3 GD iterations must learn the planted signal, acc=$acc")
    graft.operators.Caches.release(spark)
  }

  test("word-bigram features separate order-dependent labels unigrams cannot") {
    import spark.implicits._
    // both classes have IDENTICAL word multisets — only adjacency differs —
    // so unigram presence features give every doc the same score, while
    // bigram features ("good not" vs "bad not") separate them
    val docs = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, "the meal was good not bad overall we think", 1)
      else (i, "the meal was bad not good overall we think", 0)
    }.toDF("doc_id", "text", "y")
    def accuracy(bigrams: Boolean): Double = {
      val scored = QualityClassifier.trainAndScore(docs, "doc_id", "text",
        col("y"), nBuckets = nBuckets, iters = iters, lr = lr,
        wordBigrams = bigrams)
        .join(docs.select(col("doc_id"), col("y")), "doc_id")
        .select(col("y"), col("pred").cast("int").as("p"))
        .collect().map(r => (r.getInt(0), r.getInt(1)))
      graft.operators.Caches.release(spark)
      scored.count { case (y, p) => y == p }.toDouble / scored.length
    }
    assert(accuracy(bigrams = false) <= 0.6,
      "unigram features must NOT separate an order-only signal")
    assert(accuracy(bigrams = true) >= 0.9,
      "bigram features must separate the order signal")
  }

  test("empty-text docs score the bias alone and survive") {
    import spark.implicits._
    val docs = (corpus :+ ((99L, "", 1))).toDF("doc_id", "text", "y")
    val scored = QualityClassifier.trainAndScore(docs, "doc_id", "text",
      col("y"), nBuckets = nBuckets, iters = iters, lr = lr)
    assert(scored.count() == corpus.size + 1)
    graft.operators.Caches.release(spark)
  }
}
