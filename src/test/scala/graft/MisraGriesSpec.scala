package graft

import scala.util.Random

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.functions.{MisraGries, MgSummary}
import graft.operators.TextAnalysis

/** Misra-Gries sketch bounds vs exact counts on generated skewed streams,
  * and the two-pass ngramHeavyHitters operator vs a brute-force exact
  * count — the sketch may only bound the CANDIDATE set, never the output.
  */
class MisraGriesSpec extends SparkSpec {

  import spark.implicits._

  /** A Zipf-ish stream: item `i` of `v` appears ~ n/(i+1) times,
    * deterministically shuffled.
    */
  private def zipfStream(n: Int, v: Int, seed: Long): Seq[String] = {
    val items = (0 until v).flatMap { i =>
      Seq.fill(n / (i + 1))(s"w$i")
    }
    new Random(seed).shuffle(items)
  }

  private def mgSummary(stream: Seq[String], k: Int,
      parts: Int): MgSummary =
    spark.createDataset(stream)(Encoders.STRING)
      .repartition(parts)
      .select(new MisraGries(k).toColumn)
      .head()

  test("MG bounds: superset of >total/k items, undercount <= total/k") {
    for (seed <- 1L to 3L; k <- Seq(8, 32)) {
      val stream = zipfStream(2000, 50, seed)
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val s = mgSummary(stream, k, parts = 5)
      assert(s.total == stream.size)
      val bound = s.total / k
      // every item with true count > total/k is present
      val mustHave = exact.collect { case (w, c) if c > bound => w }.toSet
      assert(mustHave.subsetOf(s.items.keySet),
        s"k=$k seed=$seed missing ${mustHave -- s.items.keySet}")
      // estimates undercount by at most total/k, never overcount
      s.items.foreach { case (w, est) =>
        val c = exact(w)
        assert(est <= c && c - est <= bound,
          s"k=$k seed=$seed item $w est=$est true=$c bound=$bound")
      }
      // bounded memory: at most k-1 counters survive
      assert(s.items.size <= k - 1)
    }
  }

  test("MG superset guarantee holds under any partitioning (merge order)") {
    val stream = zipfStream(3000, 40, seed = 7L)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val k = 16
    val keySets = Seq(1, 3, 8).map { parts =>
      val s = mgSummary(stream, k, parts)
      val mustHave =
        exact.collect { case (w, c) if c > s.total / k => w }.toSet
      assert(mustHave.subsetOf(s.items.keySet), s"parts=$parts")
      s.items.keySet
    }
    // residual counts are merge-order-dependent but the guarantee is not;
    // single-partition MG is the canonical sequential algorithm
    assert(keySets.forall(_.size <= k - 1))
  }

  test("ngramHeavyHitters == exact group-count on a planted corpus") {
    val rnd = new Random(11)
    val docs = (0 until 300).map { i =>
      val noise = Seq.fill(10)("n" + rnd.nextInt(500)).mkString(" ")
      val boiler = if (i % 2 == 0) " click here to subscribe now" else ""
      (i.toLong, s"$noise$boiler")
    }.toDF("doc_id", "text")
    val got = TextAnalysis.ngramHeavyHitters(docs, "text",
      n = 3, minCount = 20L, k = 512)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // brute force: full explode + count, no sketch anywhere
    val exact = docs
      .select(explode(expr(
        "transform(sequence(1, size(split(lower(text), '\\\\s+')) - 2), " +
          "i -> concat_ws(' ', slice(split(lower(text), '\\\\s+'), i, 3)))"))
        .as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact, s"got ${got.size} exact ${exact.size}")
    // the planted template's trigrams are found with exact counts
    assert(got("click here to") == 150L)
    assert(got("to subscribe now") == 150L)
  }

  test("ngram count state: merged rounds report == one-shot heavy hitters") {
    val rnd = new Random(23)
    val docs = (0 until 400).map { i =>
      val noise = Seq.fill(8)("n" + rnd.nextInt(300)).mkString(" ")
      val boiler = if (i % 3 == 0) " terms of service apply here" else ""
      (i.toLong, s"$noise$boiler")
    }.toDF("doc_id", "text")
    val oneShot = TextAnalysis.ngramHeavyHitters(docs, "text",
      n = 3, minCount = 25L, k = 2048)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val st = TextAnalysis.ngramCountState(
      docs.filter(col("doc_id") < 150), "text", n = 3)
    val rolled = TextAnalysis.ngramHeavyHittersReport(
      TextAnalysis.ngramCountIncremental(
        docs.filter(col("doc_id") >= 150), "text", 3, st), minCount = 25L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rolled == oneShot)
    assert(rolled("terms of service") == 134L)
  }

  test("voided superset guarantee throws instead of silently dropping") {
    val docs = (0 until 50).map(i => (i.toLong, s"a b c d e f g$i"))
      .toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      TextAnalysis.ngramHeavyHitters(docs, "text",
        n = 3, minCount = 2L, k = 2)
    }
    assert(ex.getMessage.contains("superset"))
  }
}
