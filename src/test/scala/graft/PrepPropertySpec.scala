package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Pipelines, TextAnalysis}
import graft.sources.Tables

/** Property-based invariants for the training-data prep operators — the
  * algebraic laws a user relies on, checked over generated corpora and
  * parameters rather than one fixture:
  *
  *  - hashSample is MONOTONE in the rate: the kept-set at a lower rate is a
  *    subset of the kept-set at any higher rate (so mixture ratios can be
  *    tightened without resampling churn).
  *  - chunkWindows COVERS the document: every word appears in some chunk, and
  *    consecutive chunks overlap by exactly width - stride words (except the
  *    final partial tail).
  *  - dedupLines CONSERVES lines (kept + dropped = total) and at drop-all
  *    semantics no surviving line is duplicated anywhere in the output corpus.
  */
class PrepPropertySpec extends SparkSpec {

  private val params = Gen.Parameters.default

  test("hashSample: kept-set grows monotonically with the rate") {
    val docs = Tables(spark, sfDir, "documents")
    val rates = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    val kept = rates.map { r =>
      Pipelines.hashSample(docs, "doc_id", "source", Map.empty, defaultRate = r)
        .collect().map(_.getLong(0)).toSet
    }
    kept.sliding(2).foreach {
      case Seq(lo, hi) =>
        assert(lo.subsetOf(hi),
          s"rate increase lost ${lo.diff(hi).size} docs — sampling is not monotone")
      case _ =>
    }
    assert(kept.head.nonEmpty && kept.last.size > kept.head.size)
  }

  test("chunkWindows: coverage and exact overlap for random width/stride/doc lengths") {
    import spark.implicits._
    val caseGen = for {
      width <- Gen.choose(2, 12)
      stride <- Gen.choose(1, width)
      nWords <- Gen.choose(1, 40)
    } yield (width, stride, nWords)
    val cases = (0 until 30).flatMap(i => caseGen.apply(params, Seed(7000L + i)))
    assert(cases.size >= 25)
    for (((width, stride, nWords), idx) <- cases.zipWithIndex) {
      val words = (0 until nWords).map(i => s"t$i")
      val docs = Seq((idx.toLong, words.mkString(" "))).toDF("doc_id", "text")
      val chunks = TextAnalysis.chunkWindows(docs, "doc_id", "text", width, stride)
        .collect().sortBy(_.getInt(1)).map(_.getString(3).split(" ").toSeq)
      // coverage: every word in some chunk
      assert(chunks.flatten.toSet == words.toSet,
        s"case $idx (w=$width s=$stride n=$nWords): coverage hole")
      // overlap: chunk i starts exactly stride words after chunk i-1
      chunks.toSeq.sliding(2).zipWithIndex.foreach {
        case (Seq(_, b), i) =>
          assert(b.head == words(stride * (i + 1)),
            s"case $idx: chunk ${i + 1} starts at ${b.head}, expected ${words(stride * (i + 1))}")
        case _ =>
      }
      // full windows have exactly `width` words; only the last may be shorter
      chunks.dropRight(1).foreach(c => assert(c.size == width))
    }
  }

  test("dedupLines: window and aggregate counting paths agree exactly, random + extreme-dup corpora") {
    import spark.implicits._
    val lineGen = Gen.oneOf((0 until 8).map(i => s"shared line $i") ++
      (0 until 100).map(i => s"unique line $i"))
    val corpusGen = Gen.listOfN(15, Gen.listOfN(6, lineGen))
    val random = corpusGen.apply(params, Seed(4200L)).get
      .zipWithIndex.map { case (ls, i) => (i.toLong, ls.distinct.mkString("\n")) }
    // the corpus shape the aggregate default exists for: one line duplicated
    // across (almost) every doc, plus a null-text doc for the totality edge
    val extreme = (100L until 400L).map(i => (i, s"boilerplate footer\npayload $i")) ++
      Seq((900L, null.asInstanceOf[String]))
    for {
      corpus <- Seq(random, extreme.toList)
      keepFirst <- Seq(false, true)
    } {
      val docs = corpus.toDF("doc_id", "text")
      def run(agg: Boolean) = Pipelines.dedupLines(docs, "doc_id", "text",
        minCount = 2, keepFirst = keepFirst, aggregateCounts = agg)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      val agg = run(agg = true)
      val win = run(agg = false)
      assert(agg == win,
        s"keepFirst=$keepFirst: aggregate and window paths diverge:\n$agg\nvs\n$win")
      assert(agg.map(_._1) == corpus.map(_._1).sorted.toSeq, "output must be total")
    }
  }

  test("dedupLines: conservation and no surviving duplicates, random corpora") {
    import spark.implicits._
    val lineGen = Gen.oneOf((0 until 8).map(i => s"shared line $i") ++
      (0 until 100).map(i => s"unique line $i"))
    val corpusGen = Gen.listOfN(15, Gen.listOfN(6, lineGen))
    for (seed <- 0 until 3) {
      val corpus = corpusGen.apply(params, Seed(9000L + seed)).get
        .zipWithIndex.map { case (ls, i) => (i.toLong, ls.distinct.mkString("\n")) }
      val docs = corpus.toDF("doc_id", "text")
      val nLinesIn = corpus.map(_._2.split("\n", -1).length.toLong).sum
      val out = Pipelines.dedupLines(docs, "doc_id", "text", minCount = 2)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      assert(out.length == corpus.size, "every doc must survive (possibly empty)")
      assert(out.map(r => r._3 + r._4).sum == nLinesIn, "kept + dropped != total lines")
      val survivors = out.flatMap(r =>
        if (r._2.isEmpty) Seq.empty[String] else r._2.split("\n", -1).toSeq)
      val dups = survivors.groupBy(identity).filter(_._2.length >= 2)
      assert(dups.isEmpty, s"duplicated lines survived drop-all dedup: ${dups.keys}")
    }
  }
}
