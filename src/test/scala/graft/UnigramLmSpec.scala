package graft

import graft.operators.UnigramLm

/** Unigram-LM tokenizer training (Kudo 2018, hard-EM variant): the Catalyst
  * implementation must equal an INDEPENDENT plain-Scala implementation of
  * the same algorithm — seed (alphabet + heaviest substrings), fixed
  * Viterbi-EM iterations under floor-quantized 1e-6 log10 costs with the
  * longer-piece tie rule, final prune — on vocabulary, counts, and
  * per-document token counts. The [[BpeSpec]] discipline.
  */
class UnigramLmSpec extends SparkSpec {

  // ---- independent reference implementation (plain Scala collections) ----
  private def refCost(cnt: Long, total: Long): Long =
    math.floor(StrictMath.log10(total.toDouble / cnt.toDouble) * 1e6).toLong

  private val RefInf = 1000000000000L

  private def refViterbi(w: String, costs: Map[String, Long], maxLen: Int): List[String] = {
    val n = w.length
    val dpC = Array.fill(n + 1)(0L)
    val dpJ = Array.fill(n + 1)(0)
    for (i <- 1 to n) {
      var bestC = 9000000000000000000L
      var bestJ = 0
      // ascending start, strict <, so ties keep the smaller start (longer piece)
      for (j <- math.max(1, i - maxLen + 1) to i) {
        val piece = w.substring(j - 1, i)
        val c = dpC(j - 1) + costs.getOrElse(piece, RefInf)
        if (c < bestC) { bestC = c; bestJ = j }
      }
      dpC(i) = bestC; dpJ(i) = bestJ
    }
    var pos = n
    var out = List.empty[String]
    while (pos > 0) {
      val j = dpJ(pos)
      out = w.substring(j - 1, pos) :: out
      pos = j - 1
    }
    out
  }

  /** Reference trainer over a word-frequency table. */
  private def refTrain(words: Map[String, Long], vocabSize: Int, maxLen: Int,
      seedSize: Int, iters: Int): Seq[(String, Long)] = {
    val subCounts = scala.collection.mutable.Map.empty[String, Long]
    for ((w, cnt) <- words; i <- 0 until w.length;
         j <- (i + 1) to math.min(w.length, i + maxLen))
      subCounts(w.substring(i, j)) = subCounts.getOrElse(w.substring(i, j), 0L) + cnt
    val chars = subCounts.filter(_._1.length == 1).toSeq
    val multi = subCounts.filter(_._1.length > 1).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(seedSize)
    var vocab: Seq[(String, Long)] = chars ++ multi
    for (_ <- 1 to iters) {
      val total = vocab.map(_._2).sum
      val costs = vocab.map { case (p, n) => p -> refCost(n, total) }.toMap
      val used = scala.collection.mutable.Map.empty[String, Long]
      for ((w, cnt) <- words; p <- refViterbi(w, costs, maxLen))
        used(p) = used.getOrElse(p, 0L) + cnt
      vocab = vocab.flatMap { case (p, _) =>
        if (p.length == 1) Some(p -> math.max(1L, used.getOrElse(p, 0L)))
        else used.get(p).map(p -> _)
      }
    }
    val (cs, mu) = vocab.partition(_._1.length == 1)
    (cs ++ mu.sortBy { case (p, n) => (-n, p) }
      .take(math.max(0, vocabSize - cs.size)))
      .sortBy { case (p, n) => (-n, p) }
  }

  private def wordFreqs(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(t => Option(t).getOrElse("").toLowerCase
      .split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }

  test("trainVocab equals the independent plain-Scala hard-EM on a structured corpus") {
    import spark.implicits._
    // repeated morphemes so multi-char pieces genuinely win: un- re- -ing -ed
    val texts = Seq(
      "unending unending rendering rendering rendered",
      "rethinking rethinking rethought undoing undoing",
      "doing doing doing thinking thinking ending ended",
      "render rethink undo redo redo reed reed reed")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = UnigramLm.trainVocab(docs, "doc_id", "text",
      vocabSize = 24, maxPieceLen = 6, seedSize = 40, iters = 3)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    val want = refTrain(wordFreqs(texts), vocabSize = 24, maxLen = 6,
      seedSize = 40, iters = 3)
    assert(got == want, s"\ngot:  $got\nwant: $want")
    // multi-char pieces actually learned (not a char-only degenerate vocab)
    assert(got.exists(_._1.length > 1), "no multi-char piece survived")
  }

  test("tokenCounts equals reference Viterbi counts; total over null/empty docs; deterministic") {
    import spark.implicits._
    val texts = Seq(
      "banana bandana banana cabana", "ban ban band banded bandana",
      "an an an ana ana cab cab", null, "   ")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val vocabSize = 16; val maxLen = 5; val seedSize = 30; val iters = 2
    val got = UnigramLm.tokenCounts(docs, "doc_id", "text",
      vocabSize, maxLen, seedSize, iters)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val vocab = refTrain(wordFreqs(texts), vocabSize, maxLen, seedSize, iters)
    val total = vocab.map(_._2).sum
    val costs = vocab.map { case (p, n) => p -> refCost(n, total) }.toMap
    val want = texts.zipWithIndex.map { case (t, i) =>
      val ws = Option(t).getOrElse("").toLowerCase.split("\\s+").filter(_.nonEmpty)
      (i.toLong, ws.length.toLong,
        ws.map(w => refViterbi(w, costs, maxLen).length.toLong).sum)
    }.sortBy(_._1)
    assert(got.toSeq == want, s"\ngot:  ${got.toSeq}\nwant: $want")
    // deterministic across re-runs
    val again = UnigramLm.tokenCounts(docs, "doc_id", "text",
      vocabSize, maxLen, seedSize, iters)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(again.toSeq == got.toSeq)
  }

  test("random corpora: engine == reference on vocab and counts; segmentation covers every word") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val alphabet = "abcde"
    val stems = Seq.fill(8)((1 to (2 + rnd.nextInt(3)))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val texts = Seq.fill(20)(Seq.fill(6)(
      stems(rnd.nextInt(stems.length)) + stems(rnd.nextInt(stems.length))).mkString(" "))
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val vocabSize = 20; val maxLen = 4; val seedSize = 25; val iters = 2
    val gotV = UnigramLm.trainVocab(docs, "doc_id", "text",
      vocabSize, maxLen, seedSize, iters)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    val wantV = refTrain(wordFreqs(texts), vocabSize, maxLen, seedSize, iters)
    assert(gotV == wantV)
    val gotC = UnigramLm.tokenCounts(docs, "doc_id", "text",
      vocabSize, maxLen, seedSize, iters)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // closure: every doc segments (alphabet always in vocab), counts >= words
    val words = wordFreqs(texts)
    texts.zipWithIndex.foreach { case (t, i) =>
      val nw = t.split("\\s+").count(_.nonEmpty)
      assert(gotC(i.toLong) >= nw, s"doc $i under-segmented")
    }
    assert(words.keys.forall(w => w.forall(c => wantV.exists(_._1 == c.toString))),
      "alphabet closure violated")
  }

  test("adaptive cost lookup: map literal and broadcast-join paths segment identically") {
    import spark.implicits._
    // words chosen so segmentation exercises ties, OOV chars, and pieces of
    // every length up to maxPieceLen
    val words = Seq(("ababab", 3L), ("abcabc", 2L), ("zzq", 1L), ("a", 5L),
      ("xyxyxy", 2L), ("abab", 4L)).toDF("w", "cnt")
    val costs = Map("a" -> 100L, "b" -> 120L, "c" -> 300L, "x" -> 90L,
      "y" -> 95L, "ab" -> 150L, "abab" -> 260L, "xy" -> 130L, "bc" -> 210L)
    def rows(forceJoin: Boolean) =
      UnigramLm.segmentTypes(words, costs, maxPieceLen = 4, forceJoin = forceJoin)
        .collect().map(r => (r.getString(0), r.getSeq[String](2).mkString("|")))
        .sortBy(_._1).toSeq
    val lit = rows(forceJoin = false)   // 9 entries <= threshold: literal path
    val join = rows(forceJoin = true)
    assert(lit == join, s"paths diverge:\nlit  = $lit\njoin = $join")
    // OOV word still segments on both paths: one Inf beats three chained
    // Infs, so the whole word survives as a single non-piece
    assert(lit.exists { case (w, ps) => w == "zzq" && ps == "zzq" })
  }
}
