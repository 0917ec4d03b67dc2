package graft

import org.apache.spark.sql.Row

import graft.operators.TextAnalysis

/** The published rule sets (Gopher A1.1, C4 §2.2) pinned on hand-built cases
  * — each rule violated in isolation so the per-rule flags are checked, not
  * just the conjunction.
  */
class QualityGatesSpec extends SparkSpec {

  private val goodProse =
    "the quick brown fox jumps over a lazy dog and we have seen that " +
      "it keeps running with steady pace to the far side of this field " +
      "while every other animal just watches it go by today"

  private def gopherRow(text: String): Row = {
    import spark.implicits._
    TextAnalysis.gopherGate(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text", minWords = 20).head()
  }

  test("gopherGate: clean prose passes every rule") {
    val r = gopherRow(goodProse)
    assert((2 to 8).forall(r.getBoolean), r.toString)
    assert(r.getBoolean(9), "passed must be the conjunction")
  }

  test("gopherGate: each rule fails in isolation") {
    // too few words
    assert(!gopherRow("short text only").getBoolean(2))
    // mean word length out of [3, 10]: all 1-char words
    assert(!gopherRow(Seq.fill(30)("a").mkString(" ")).getBoolean(3))
    // symbol ratio: a '#' per word
    assert(!gopherRow(goodProse + " " + Seq.fill(30)("#").mkString(" ")).getBoolean(4))
    // > 90% bullet lines
    val bullets = Seq.fill(20)("- " + goodProse.take(30)).mkString("\n")
    assert(!gopherRow(bullets).getBoolean(5))
    // > 30% ellipsis-ended lines
    val ell = (goodProse + "\n" + goodProse + "...\n" + goodProse + "...")
    assert(!gopherRow(ell).getBoolean(6))
    // < 80% alphabetic words
    assert(!gopherRow(goodProse + " " + (1 to 60).map(_.toString).mkString(" ")).getBoolean(7))
    // non-Latin scripts ARE alphabetic (Gopher: "contains at least one
    // alphabetic character" — \p{L}, not [a-z])
    assert(gopherRow(goodProse + " " +
      Seq.fill(30)("слово λέξη 言葉").mkString(" ")).getBoolean(7))
    // < 2 stop words
    assert(!gopherRow(Seq.fill(25)("zebra quokka").mkString(" ")).getBoolean(8))
  }

  test("readability: hand-computed Flesch/FK; empty and null docs guarded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The cat sat. The dog ran! Did it?"),
      (2L, ""),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.readability(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // doc 1: W=8, S=3, Y=8 (one vowel group per word)
    //   flesch_e3 = 206835 - (1015*8) div 3 - (84600*8) div 8
    //             = 206835 - 2706 - 84600 = 119529  (~119.5, "very easy")
    //   grade_e3  = (390*8) div 3 + (11800*8) div 8 - 15590
    //             = 1040 + 11800 - 15590 = -2750    (sub-first-grade)
    assert(got(1L) == (8L, 3L, 8L, 119529L, -2750L), s"got ${got(1L)}")
    // empty/null: all counts 0, guards make the score the pure constants
    val degenerate = (0L, 0L, 0L, 206835L, -15590L)
    assert(got(2L) == degenerate && got(3L) == degenerate)
  }

  test("c4Gate: line rules and doc rules apply independently") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "This is a fine first sentence.\nAnd a good second one follows here!\nA third sentence closes the document."),
      (2L, "no terminal punctuation here\nalso not this line"),
      (3L, "Only one good sentence lives here.\nshort.\nthe javascript line is removed entirely today."),
      (4L, "This document would pass every single line rule easily.\nIt has three sentences in well formed shape.\nBut it contains a { brace so it dies.")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.c4Gate(docs, "doc_id", "text")
      .select(col("doc_id"), col("n_kept"), col("kept"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    assert(got(1L) == ((3, true)))
    assert(got(2L) == ((0, false)))
    // doc 3: the short line and the javascript line are dropped at line
    // level; one surviving sentence < 3 terminators -> doc dropped
    assert(got(3L) == ((1, false)))
    // doc 4: lines all pass but the doc-level brace rule kills it
    assert(got(4L)._2 == false && got(4L)._1 == 3)
  }

  test("tagDocs ≡ the component operators row-for-row (tags and gates can never disagree)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, goodProse + ".\nAnd we have that second sentence right here today!\nA third one closes it."),
      (2L, "la le les et est courte"),          // French markers, too short
      (3L, "slow dup slow lorem and the { brace"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val block = Seq("slow", "dup", "lorem")
    val tags = TextAnalysis.tagDocs(docs, "doc_id", "text", block,
      minWords = 20).collect()
      .map(r => r.getLong(0) -> r).toMap
    val gopher = TextAnalysis.gopherGate(docs, "doc_id", "text", minWords = 20)
      .select(col("doc_id"), col("passed")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val c4 = TextAnalysis.c4Gate(docs, "doc_id", "text")
      .select(col("doc_id"), col("kept")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val bw = TextAnalysis.wordlistGate(docs, "doc_id", "text", block)
      .select(col("doc_id"), col("n_hits")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    docs.collect().map(_.getLong(0)).foreach { id =>
      val r = tags(id)
      assert(r.getBoolean(4) == gopher(id), s"doc $id gopher_passed")
      assert(r.getBoolean(5) == c4(id), s"doc $id c4_kept")
      assert(r.getInt(6) == bw(id), s"doc $id badword_hits")
    }
    assert(tags(2L).getString(3) == "fr" && tags(4L).getString(3) == "und")
    assert(tags(3L).getInt(6) == 4)
    assert(tags(4L).getInt(1) == 0, "null text tags as empty, not crash")
  }
}
