package graft

import org.apache.spark.sql.functions._

import graft.operators.Pipelines
import graft.operators.TextAnalysis
import graft.sources.Tables

/** Training-data prep operators: concat-and-chunk sequence packing, hash-based
  * mixture sampling, PII scrubbing. The DuckDB oracle proves engine parity;
  * these tests pin the semantic invariants on crafted inputs.
  */
class PipelinesSpec extends SparkSpec {

  test("packSequences: offsets stay under maxTokens and shard streams are gapless") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, Seq.fill(7 + (i % 5).toInt)("tok").mkString(" ")))
      .toDF("doc_id", "text")
    val packed = Pipelines.packSequences(docs, "doc_id", "text", maxTokens = 16, shards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(packed.length == 40)
    packed.foreach { case (id, shard, n, pack, off) =>
      assert(shard == (id % 4).toInt)
      assert(off >= 0 && off < 16, s"doc $id: offset $off out of range")
      assert(pack >= 0)
    }
    // within a shard, each doc starts exactly where the previous one ended:
    // global token position = pack_id * maxTokens + offset
    packed.groupBy(_._2).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      sorted.zip(sorted.tail).foreach { case ((_, _, n1, p1, o1), (id2, _, _, p2, o2)) =>
        val endOfPrev = p1 * 16 + o1 + n1
        assert(p2 * 16 + o2 == endOfPrev,
          s"doc $id2 does not start at the previous doc's end ($endOfPrev)")
      }
    }
    // docs longer than the remaining pack space must straddle the boundary,
    // i.e. some doc has offset + n_tokens > maxTokens
    assert(packed.exists { case (_, _, n, _, off) => off + n > 16 },
      "fixture must exercise boundary straddling")
  }

  test("hashSample: rate 1 keeps all, rate 0 keeps none, sampling is deterministic") {
    val docs = Tables(spark, sfDir, "documents")
    val total = docs.count()
    val all = Pipelines.hashSample(docs, "doc_id", "source", Map.empty, defaultRate = 1.0)
    assert(all.count() == total)
    val none = Pipelines.hashSample(docs, "doc_id", "source", Map.empty, defaultRate = 0.0)
    assert(none.count() == 0)
    val half1 = Pipelines.hashSample(docs, "doc_id", "source", Map.empty, defaultRate = 0.5)
      .collect().map(_.getLong(0)).sorted.toSeq
    val half2 = Pipelines.hashSample(docs, "doc_id", "source", Map.empty, defaultRate = 0.5)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(half1 == half2, "hash sampling must be exactly reproducible")
    // md5 is uniform: expect ~half within a loose tolerance on a small corpus
    assert(math.abs(half1.length - total / 2.0) < total * 0.25,
      s"kept ${half1.length} of $total at rate 0.5")
  }

  test("hashSample: per-source rates apply to the right sources") {
    val docs = Tables(spark, sfDir, "documents")
    val kept = Pipelines.hashSample(docs, "doc_id", "source",
      rates = Map("src0" -> 1.0, "src1" -> 0.0), defaultRate = 0.0)
    val bySrc = kept.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val src0Total = docs.filter(col("source") === "src0").count()
    assert(bySrc.getOrElse("src0", 0L) == src0Total, "rate 1.0 must keep every src0 doc")
    assert(!bySrc.contains("src1"), "rate 0.0 must drop every src1 doc")
    assert(bySrc.keySet.subsetOf(Set("src0")), "defaultRate 0.0 must drop other sources")
  }

  test("upsampleMixture: integer epochs repeat exactly, fractional epochs are a stable subset") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, if (i < 100) "hi" else "lo"))
      .toDF("doc_id", "source")
    val up = Pipelines.upsampleMixture(docs, "doc_id", "source",
      factors = Map("hi" -> 2.5, "lo" -> 0.0))
    val byDoc = up.groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // factor 0 drops the domain entirely
    assert(byDoc.keys.forall(_ < 100L), "factor 0.0 must drop every lo doc")
    // 2.5 epochs: every hi doc appears 2 or 3 times, ~half get the third copy
    assert(byDoc.size == 100 && byDoc.values.forall(n => n == 2L || n == 3L))
    val thirds = byDoc.values.count(_ == 3L)
    assert(thirds > 25 && thirds < 75, s"~half of 100 docs should get the .5 copy, got $thirds")
    // copies are numbered 0..n-1 (downstream can address epochs individually)
    val copies = up.filter(col("doc_id") === byDoc.find(_._2 == 3L).get._1)
      .select("copy").collect().map(_.getLong(0)).sorted
    assert(copies.sameElements(Array(0L, 1L, 2L)))
    // determinism + monotonicity: same factors -> same rows; a factor bump
    // keeps every previously-chosen fractional doc (md5 draw is fixed)
    val again = Pipelines.upsampleMixture(docs, "doc_id", "source",
      factors = Map("hi" -> 2.5, "lo" -> 0.0))
    assert(up.collect().map(_.toString).sorted.sameElements(
      again.collect().map(_.toString).sorted))
    val bumped = Pipelines.upsampleMixture(docs, "doc_id", "source",
      factors = Map("hi" -> 2.8, "lo" -> 0.0))
      .groupBy("doc_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.filter(_._2 == 3L).keys.foreach { id =>
      assert(bumped(id) == 3L, s"doc $id lost its fractional copy on a factor bump")
    }
  }

  test("tokenBudgetSample: hits the budget, includes the straddler, top-ups extend the prefix") {
    import spark.implicits._
    // 30 docs in one domain, 10 tokens each → 300 tokens of supply
    val docs = (0L until 30L).map(i => (i, Seq.fill(10)("tok").mkString(" "), "web"))
      .toDF("doc_id", "text", "source")
    val kept = Pipelines.tokenBudgetSample(docs, "doc_id", "text", "source",
      budgets = Map("web" -> 95L)).collect()
    // every kept doc started under the budget; the straddler is included,
    // so total kept tokens reaches (and here exceeds) the budget
    assert(kept.forall(_.getLong(3) < 95L))
    val keptTokens = kept.map(_.getLong(2)).sum
    assert(keptTokens >= 95L, s"kept only $keptTokens of a 95-token budget")
    assert(kept.length == 10, s"95-token budget over 10-token docs must keep 10 docs")
    // raising the budget extends the same md5 prefix — a strict superset
    val more = Pipelines.tokenBudgetSample(docs, "doc_id", "text", "source",
      budgets = Map("web" -> 200L)).collect().map(_.getLong(0)).toSet
    assert(kept.map(_.getLong(0)).toSet.subsetOf(more), "budget bump must be a top-up")
    // zero budget keeps nothing; unlisted domains get the default
    assert(Pipelines.tokenBudgetSample(docs, "doc_id", "text", "source",
      budgets = Map("web" -> 0L)).count() == 0)
    assert(Pipelines.tokenBudgetSample(docs, "doc_id", "text", "source",
      budgets = Map.empty, defaultBudget = 1L).count() == 1,
      "any positive budget keeps at least the first doc")
    // NULL-domain rows draw the default budget as one group — not a silent
    // drop through the internal offsets equi-join
    val nullDom = (100L until 110L).map(i =>
      (i, Seq.fill(10)("tok").mkString(" "), null.asInstanceOf[String]))
      .toDF("doc_id", "text", "source")
    val keptNull = Pipelines.tokenBudgetSample(docs.union(nullDom), "doc_id",
      "text", "source", budgets = Map("web" -> 0L), defaultBudget = 35L)
      .collect()
    assert(keptNull.length == 4 && keptNull.forall(_.isNullAt(1)),
      s"null domain must spend the default budget as one group")
  }

  test("dedupLines: drop-all vs keep-first semantics on planted duplicate lines") {
    import spark.implicits._
    // line "dup dup" appears in docs 1, 2, 3; every other line is unique
    val docs = Seq(
      (1L, "dup dup\nuniq one"),
      (2L, "uniq two\ndup dup"),
      (3L, "dup dup"),
      (4L, "all alone")
    ).toDF("doc_id", "text")

    val dropAll = Pipelines.dedupLines(docs, "doc_id", "text", minCount = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(dropAll(1L) == (("uniq one", 1L, 1L)))
    assert(dropAll(2L) == (("uniq two", 1L, 1L)))
    assert(dropAll(3L) == (("", 0L, 1L)), "doc with every line dropped survives with empty text")
    assert(dropAll(4L) == (("all alone", 1L, 0L)))

    val keepFirst = Pipelines.dedupLines(docs, "doc_id", "text", minCount = 2, keepFirst = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(keepFirst(1L) == "dup dup\nuniq one",
      "globally-first occurrence (smallest doc_id, pos) must survive")
    assert(keepFirst(2L) == "uniq two")
    assert(keepFirst(3L) == "")
  }

  test("dedupLines: null-text docs survive with empty text (totality)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "real line\nshared line"),
      (2L, "shared line\nother line"),
      (3L, null.asInstanceOf[String]), // split(NULL) yields no rows — must not vanish
      (4L, "")
    ).toDF("doc_id", "text")
    for (agg <- Seq(true, false)) {
      val out = Pipelines.dedupLines(docs, "doc_id", "text", minCount = 2,
        aggregateCounts = agg)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      assert(out.keySet == Set(1L, 2L, 3L, 4L),
        s"agg=$agg: output must be total over input doc_ids, got ${out.keySet}")
      assert(out(3L)._1 == "", s"agg=$agg: null-text doc must surface as empty text")
      // null and "" normalize to the same single empty line, so they dedup
      // against each other: both appear, both end up empty
      assert(out(4L)._1 == "")
      assert(out(1L)._1 == "real line" && out(2L)._1 == "other line")
    }
  }

  test("dedupNear: high-duplication corpus — no forced broadcast of the member set") {
    import spark.implicits._
    // 60 of 75 docs are one near-dup cluster (the corpus shape dedup exists
    // for): the cluster-member side is 80% of the corpus, exactly where a
    // forced broadcast() hint would stop scaling; AQE must choose the strategy
    val dupText = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = ((0L until 60L).map(i => (i, dupText)) ++
      (100L until 115L).map(i => (i, s"unique doc $i with words w${i}a w${i}b w${i}c w${i}d w${i}e")))
      .toDF("doc_id", "text")
    val out = Pipelines.dedupNear(docs, "doc_id", "text",
      n = 3, numPerm = 32, bands = 8, threshold = 0.8)
    assert(!out.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "member anti-join side must not carry a forced broadcast hint")
    val survivors = out.collect().map(_.getLong(0)).toSet
    assert(survivors == (Set(0L) ++ (100L until 115L)),
      s"expected cluster representative 0 + all uniques, got $survivors")
  }

  test("dedupLines: reassembly preserves original line order") {
    import spark.implicits._
    val docs = Seq((1L, (0 until 20).map(i => s"line $i").mkString("\n"))).toDF("doc_id", "text")
    val out = Pipelines.dedupLines(docs, "doc_id", "text", minCount = 2).collect()
    assert(out.head.getString(1) == (0 until 20).map(i => s"line $i").mkString("\n"))
  }

  test("decontaminate finds planted eval overlap and nothing else") {
    import spark.implicits._
    val eval = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "prefix words then the quick brown fox jumps over something"), // 4 shared 3-grams
      (2L, "quick brown dog sits still"), // 0 shared 3-grams
      (3L, "totally unrelated content here")
    ).toDF("doc_id", "text")
    val hits = Pipelines.decontaminate(docs, eval, "doc_id", "text", n = 3, minHits = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 shares: "the quick brown", "quick brown fox", "brown fox jumps", "fox jumps over"
    assert(hits == Map(1L -> 4L), s"got $hits")
    val strict = Pipelines.decontaminate(docs, eval, "doc_id", "text", n = 3, minHits = 5)
    assert(strict.count() == 0)
  }

  test("repetitionStats: ratios match hand-computed values") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b"), // 6 words, 2 distinct (dup frac 2/3 floors to .6666); top bigram 3/5
      (2L, "w x y z")      // no repetition: 4 distinct, top bigram 1/3
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(1L) == ((6, 2, 0.6666, 0.6)))
    assert(got(2L) == ((4, 4, 0.0, 0.3333)))
  }

  test("normalizeQuantize: unit-norm vector quantizes to exact int8 levels") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(3.0f, 4.0f)),          // norm 5, amax 4 -> q = floor(3/4*127+.5), 127
      (2L, Seq(-1.0f, 0.5f, 0.25f))   // amax 1 -> -127, floor(64)=64, floor(32.25)=32
    ).toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.normalizeQuantize(emb, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2)))).toMap
    assert(got(1L) == ((5.0, "95,127")))
    assert(got(2L)._2 == "-127,64,32")
    assert(math.abs(got(2L)._1 - 1.1456) < 1e-9)
  }

  test("unigramLogProb: hand-computed model probabilities, OOV floor, decimal-exact sums") {
    import spark.implicits._
    // freq: a=2, b=2, c=1, total=5; topV=2 keeps a,b (tie at c=2 broken by word
    // asc); c is OOV -> floor prob 1/5
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProb(docs, "doc_id", "text", topV = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // log10(0.4) -> -0.397940 (6dp), log10(0.2) -> -0.698970 (6dp);
    // 4dp by FLOOR of the exact decimal sum (cross-engine-safe, see operator)
    assert(got(1L)._1 == 3L && got(1L)._2 == -1.1939, s"got ${got(1L)}")
    assert(got(2L)._1 == 2L && got(2L)._2 == -1.0970, s"got ${got(2L)}")
    assert(math.abs(got(1L)._3 - (-0.3979)) < 1e-4)
    assert(math.abs(got(2L)._3 - (-0.5485)) < 1e-4)
  }

  test("selectCanonical: best score wins its cluster, ties and nulls resolve, singletons pass") {
    import spark.implicits._
    val dupA = "the quick brown fox jumps over the lazy dog again and again today"
    val dupB = "spark catalyst rewrites logical plans into physical plans with codegen stages"
    val docs = Seq(
      (1L, dupA, Some(10.0)), (2L, dupA, Some(30.0)), (3L, dupA, Some(20.0)),
      (6L, dupB, Some(7.0)), (7L, dupB, Some(7.0)), (8L, dupB, None),
      (4L, "completely different text about parquet row groups and column footers", Some(5.0)),
      (5L, "another unrelated document mentioning shuffle partitions and broadcast joins", None)
    ).toDF("doc_id", "text", "score")
    val got = Pipelines.selectCanonical(docs, "doc_id", "text", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // cluster {1,2,3}: doc 2 wins on score, labeled by min member id 1
    // cluster {6,7,8}: 6 and 7 tie at 7.0 -> smaller id; null-score 8 loses
    // 4, 5 are singletons (cluster_id = own id), null score notwithstanding
    assert(got == Map(2L -> 1L, 6L -> 6L, 4L -> 4L, 5L -> 5L), s"got $got")
  }

  test("bigramLogProb: hand-computed conditional probabilities, OOV floor, short docs dropped") {
    import spark.implicits._
    // corpus bigrams: (a,b)=2, (b,a)=2, (a,c)=1; contexts c1(a)=3, c1(b)=2;
    // total t=5. topV=2 keeps (a,b), (b,a) (tie at c=2 broken by (w1, w2));
    // (a,c) is OOV -> floor prob 1/5
    val docs = Seq((1L, "a b a b"), (2L, "b a c"), (3L, "solo")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLogProb(docs, "doc_id", "text", topV = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(!got.contains(3L), "docs with < 2 words have no bigrams")
    // lp(a,b)=log10(2/3)->-0.176091 (6dp), lp(b,a)=log10(2/2)=0,
    // oov=log10(1/5)->-0.698970; sums floored to 4dp
    assert(got(1L)._1 == 3L && got(1L)._2 == -0.3522, s"got ${got(1L)}")
    assert(got(2L)._1 == 2L && got(2L)._2 == -0.6990, s"got ${got(2L)}")
    assert(math.abs(got(1L)._3 - (-0.3522 / 3)) < 1e-9)
    assert(math.abs(got(2L)._3 - (-0.3495)) < 1e-9)
  }

  test("bigramLogProbAgainst: model trains on the reference slice only; target OOV floors to ref total") {
    import spark.implicits._
    // reference bigrams: (a,b)=2, (b,a)=1 → c1(a)=2, c1(b)=1, t=3
    val ref = Seq((100L, "a b a b")).toDF("doc_id", "text")
    // target doc 1 = pure reference language; doc 2 = fully OOV under ref
    val target = Seq((1L, "a b a"), (2L, "x y z")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLogProbAgainst(ref, target, "doc_id", "text", topV = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // doc 1: lp(a,b)=log10(2/2)=0, lp(b,a)=log10(1/1)=0 → sum 0
    assert(got(1L) == ((2L, 0.0)), s"got ${got(1L)}")
    // doc 2: both bigrams OOV → 2 · log10(1/3) = 2 · -0.477121 → floor 4dp
    assert(got(2L) == ((2L, -0.9543)), s"got ${got(2L)}")
    // the reference doc itself is NOT scored unless it is in the target
    assert(!got.contains(100L))
    // self-split equivalence: Against(docs, docs) == bigramLogProb(docs)
    val docs = Seq((1L, "a b a b"), (2L, "b a c")).toDF("doc_id", "text")
    val self = TextAnalysis.bigramLogProbAgainst(docs, docs, "doc_id", "text", topV = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = TextAnalysis.bigramLogProb(docs, "doc_id", "text", topV = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(self == plain)
  }

  test("chunkWindows: full coverage with overlap, partial tail, short-doc single chunk") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")),
      (2L, "x y z")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkWindows(docs, "doc_id", "text", width = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.filter(_._1 == 1L).map(_._4).toSeq == Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"),
      s"got ${got.toSeq}")
    assert(got.filter(_._1 == 2L).map(c => (c._2, c._3, c._4)).toSeq == Seq((0, 3, "x y z")))
    // every word index appears in at least one chunk (coverage invariant)
    val covered = got.filter(_._1 == 1L).flatMap(_._4.split(" ")).toSet
    assert(covered == (1 to 10).map(i => s"w$i").toSet)
  }

  test("stratifiedSample: exactly k per stratum, deterministic, small strata intact") {
    val docs = Tables(spark, sfDir, "documents")
    val sample = Pipelines.stratifiedSample(docs, "doc_id", "source", k = 20)
    val bySrc = sample.groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (src, n) =>
      assert(bySrc(src) == math.min(20L, n), s"$src: got ${bySrc(src)} of $n")
    }
    val again = Pipelines.stratifiedSample(docs, "doc_id", "source", k = 20)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(again == sample.collect().map(_.getLong(0)).sorted.toSeq,
      "stratified sample must be exactly reproducible")
  }

  test("mixtureApply: limiting domain sets the total, proportions exact, spec violations loud") {
    import spark.implicits._
    // a:4 b:2 c:6 docs at 50/25/25 bp → totals 8/8/24 → total 8 → keep 4/2/2
    val docs = ((0L until 4L).map((_, "a")) ++ (4L until 6L).map((_, "b")) ++
      (6L until 12L).map((_, "c")) :+ (99L, null.asInstanceOf[String]))
      .toDF("doc_id", "source")
    val shares = Map("a" -> 5000, "b" -> 2500, "c" -> 2500)
    val got = Pipelines.mixtureApply(docs, "doc_id", "source", shares)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.length == 8)
    val byDom = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byDom == Map("a" -> 4, "b" -> 2, "c" -> 2), s"got $byDom")
    // deterministic md5-prefix choice: re-run identical
    val again = Pipelines.mixtureApply(docs, "doc_id", "source", shares)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSet == again.toSet)
    // a share-listed domain with no corpus rows → unsatisfiable → empty
    assert(Pipelines.mixtureApply(docs, "doc_id", "source",
      Map("a" -> 5000, "zz" -> 5000)).count() == 0)
    // shares must sum to 10000
    intercept[IllegalArgumentException] {
      Pipelines.mixtureApply(docs, "doc_id", "source", Map("a" -> 9999))
    }
    graft.operators.Caches.release(spark)
  }

  test("tokenShareApply: limiting-domain token total, straddling doc kept, loud unsatisfiability") {
    import spark.implicits._
    // tokens: a = 10 docs x 4 tok = 40, b = 4 x 5 = 20 at 50/50 bp →
    // totals 80/40 → total 40 → budgets 20/20: a keeps 5 docs (20 tok
    // exactly), b keeps 4 (its whole 20)
    val docs = ((0L until 10L).map(i => (i, "w x y z", "a")) ++
      (10L until 14L).map(i => (i, "v w x y z", "b")))
      .toDF("doc_id", "text", "source")
    val got = Pipelines.tokenShareApply(docs, "doc_id", "text", "source",
      Map("a" -> 5000, "b" -> 5000))
      .collect().map(r => (r.getString(1), r.getLong(2)))
    val byDom = got.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(byDom == Map("a" -> 20L, "b" -> 20L), s"got $byDom")
    // straddling: 3-token docs against a non-multiple budget keep >= budget
    val odd = (0L until 10L).map(i => (i, "x y z", "a")) :+ (99L, "q r s t u", "b")
    val got2 = Pipelines.tokenShareApply(odd.toDF("doc_id", "text", "source"),
      "doc_id", "text", "source", Map("a" -> 7500, "b" -> 2500))
      .collect().map(r => (r.getString(1), r.getLong(2)))
    // totals: a 30·10⁴/7500 = 40, b 5·10⁴/2500 = 20 → total 20 → budgets 15/5
    val aTok = got2.filter(_._1 == "a").map(_._2).sum
    assert(aTok >= 15L && aTok < 18L, s"straddled a kept $aTok tokens")
    assert(got2.filter(_._1 == "b").map(_._2).sum == 5L)
    // empty share-listed domain → empty cut
    assert(Pipelines.tokenShareApply(docs, "doc_id", "text", "source",
      Map("a" -> 5000, "zz" -> 5000)).count() == 0)
    graft.operators.Caches.release(spark)
  }

  test("datasetDiff: added/removed/changed/unchanged classification, null text totality") {
    import spark.implicits._
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, null.asInstanceOf[String]), (4L, "d"))
      .toDF("doc_id", "text")
    val newSnap = Seq((2L, "b"), (3L, "now-set"), (5L, "e"))
      .toDF("doc_id", "text")
    val diff = Pipelines.datasetDiff(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(diff == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
    // null == null fingerprints as unchanged (coalesce to empty both sides)
    val oldN = Seq((7L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val newN = Seq((7L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(Pipelines.datasetDiff(oldN, newN, "doc_id", "text")
      .head().getString(1) == "unchanged")
  }

  test("applyDiff: merge(snapshot, diff(snapshot, next)) ≡ next — the refresh identity") {
    import spark.implicits._
    val oldSnap = Seq((1L, "a", "s1"), (2L, "b", "s1"), (3L, "c", "s2"),
      (4L, null.asInstanceOf[String], "s2")).toDF("doc_id", "text", "source")
    val next = Seq((2L, "b", "s1"), (3L, "c-CHANGED", "s2"),
      (4L, null.asInstanceOf[String], "s2"), (9L, "new", "s3"))
      .toDF("doc_id", "text", "source")
    val diff = Pipelines.datasetDiff(oldSnap, next, "doc_id", "text")
    val ups = next.join(diff.filter(col("status").isin("added", "changed"))
      .select("doc_id"), "doc_id")
    val del = diff.filter(col("status") === "removed").select("doc_id")
    val merged = Pipelines.applyDiff(oldSnap, ups, del, "doc_id")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(merged.columns.toSeq == oldSnap.columns.toSeq,
      "merged keeps the snapshot's column order")
    assert(rows(merged) == rows(next), "merge must reproduce the next snapshot")
    // empty delta → merge is the identity on the snapshot
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    assert(rows(Pipelines.applyDiff(oldSnap, empty,
      empty.select("doc_id"), "doc_id")) == rows(oldSnap))
    // delete-only delta drops exactly those ids
    assert(rows(Pipelines.applyDiff(oldSnap, empty,
      Seq(2L, 4L).toDF("doc_id"), "doc_id")).map(_._1) == Seq(1L, 3L))
    // upsert columns match by NAME: extra delta columns drop, order differs
    val shuffledUps = Seq(("s9", 1L, "a2")).toDF("source", "doc_id", "text")
      .withColumn("extra", lit(42))
    val up2 = rows(Pipelines.applyDiff(oldSnap, shuffledUps,
      empty.select("doc_id"), "doc_id"))
    assert(up2.find(_._1 == 1L).get == ((1L, Some("a2"), "s9")))
  }

  test("quantileFilter: exact per-domain rank cut, null scores dropped, edge quantiles") {
    import spark.implicits._
    // domain a: scores 10..1 (10 docs) → q=0.6 keeps the top 6 (ids 0..5)
    // domain b: 3 docs → ceil semantics: (rn-1)*10000 < 6000*3 keeps rn 1,2
    // domain c: all-null scores → dropped entirely
    val docs = ((0L until 10L).map(i => (i, "a", Some(10.0 - i))) ++
      Seq((20L, "b", Some(5.0)), (21L, "b", Some(4.0)), (22L, "b", Some(3.0))) ++
      Seq((30L, "c", None), (31L, "c", None)))
      .toDF("doc_id", "src", "sc")
    val kept = Pipelines.quantileFilter(docs, "doc_id", "sc", "src", q = 0.6)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(kept == ((0L until 6L).map(_ -> "a") ++ Seq(20L -> "b", 21L -> "b")).toSet)
    // ties resolve by doc_id: equal scores keep the SMALLEST ids
    val tied = Seq((1L, "t", 7.0), (2L, "t", 7.0), (3L, "t", 7.0), (4L, "t", 7.0))
      .toDF("doc_id", "src", "sc")
    val keptTied = Pipelines.quantileFilter(tied, "doc_id", "sc", "src", q = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(keptTied == Set(1L, 2L))
    // q = 0 keeps nothing; q = 1 keeps every non-null-score doc
    assert(Pipelines.quantileFilter(docs, "doc_id", "sc", "src", q = 0.0).count() == 0)
    assert(Pipelines.quantileFilter(docs, "doc_id", "sc", "src", q = 1.0).count() == 13)
    // every nonempty domain keeps at least one doc for any q > 0
    assert(Pipelines.quantileFilter(docs, "doc_id", "sc", "src", q = 0.0001)
      .select("domain").distinct().count() == 2)
    // NULL-domain rows form one group (Window semantics), not a silent drop
    // through the internal equi-joins (null != null)
    val withNull = docs.union(Seq(
      (40L, null.asInstanceOf[String], Some(9.0)),
      (41L, null.asInstanceOf[String], Some(8.0)),
      (42L, null.asInstanceOf[String], Some(7.0)),
      (43L, null.asInstanceOf[String], Some(6.0))).toDF("doc_id", "src", "sc"))
    val keptNull = Pipelines.quantileFilter(withNull, "doc_id", "sc", "src", q = 0.5)
      .filter(col("domain").isNull).collect().map(_.getLong(0)).toSet
    assert(keptNull == Set(40L, 41L), s"null domain must rank as one group, got $keptNull")
  }

  test("tfidfTopTerms: hand-computed scores, decimal-exact tie ordering") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "b c"), (3L, "c c d")).toDF("doc_id", "text")
    // idf: a,d -> log10(3)≈0.477121; b,c -> log10(1.5)≈0.176091
    val got = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> ((r.getString(2), r.getDouble(3)))).toMap
    // scores floored (not rounded) to 4dp — cross-engine-safe, see operator
    assert(got((1L, 1)) == (("a", 0.9542)))
    assert(got((1L, 2)) == (("b", 0.176)))
    // doc 2: b and c tie exactly (decimal equality) -> term asc breaks it
    assert(got((2L, 1)) == (("b", 0.176)))
    assert(got((2L, 2)) == (("c", 0.176)))
    assert(got((3L, 1)) == (("d", 0.4771)))
    assert(got((3L, 2)) == (("c", 0.3521)))
  }

  test("scrubPii replaces emails, IPs, and phones with typed placeholders") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail bob.smith+x@example.co.uk now"),
      (2L, "server at 10.0.255.3 responded"),
      (3L, "call +1 (415) 555-0199 today"),
      (4L, "clean text with no pii at all"),
      (5L, "two hits: a@b.io and 1.2.3.4")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.scrubPii(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4))))
      .toMap
    assert(got(1L) == (("mail [EMAIL] now", 1, 0, 0)))
    assert(got(2L) == (("server at [IP] responded", 0, 1, 0)))
    assert(got(3L)._1 == "call [PHONE] today")
    assert(got(3L)._4 == 1)
    assert(got(4L) == (("clean text with no pii at all", 0, 0, 0)))
    assert(got(5L) == (("two hits: [EMAIL] and [IP]", 1, 1, 0)))
  }

  test("backoffLogProb == independent plain-Scala stupid-backoff reference; all four levels hit") {
    import spark.implicits._
    val ref = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown cat sits on the lazy mat"))
      .toDF("doc_id", "text")
    val target = Seq(
      (10L, "the quick brown fox"),        // trigram hits
      (11L, "quick brown zebra runs fast") // bigram/uni/OOV backoffs
    ).toDF("doc_id", "text")
    val got = TextAnalysis.backoffLogProb(ref, target, "doc_id", "text",
      topV = 1000)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    // independent reference: plain-Scala counts + PortableLog refs
    val refToks = Seq(
      "the quick brown fox jumps over the lazy dog".split(" ").toSeq,
      "the quick brown cat sits on the lazy mat".split(" ").toSeq)
    def ngrams(n: Int) = refToks.flatMap(_.sliding(n)).map(_.toList)
    val c3 = ngrams(3).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c12 = c3.groupBy(_._1.take(2)).view.mapValues(_.values.sum).toMap
    val c23 = c3.groupBy(_._1.drop(1)).view.mapValues(_.values.sum).toMap
    val c2 = c23.groupBy(_._1.take(1)).view.mapValues(_.values.sum).toMap
    val c1 = c23.groupBy(_._1.drop(1)).view.mapValues(_.values.sum).toMap
    val t = c1.values.sum
    def lp6(a: Long, b: Long): Long =
      math.floor(graft.functions.PortableLog.log10RatioRef(a, b) * 1e6).toLong
    def score(ws: Seq[String]): (Long, Long) = {
      val tris = ws.sliding(3).map(_.toList).toSeq
      val s = tris.map { tri =>
        if (c3.contains(tri)) lp6(c3(tri), c12(tri.take(2)))
        else if (c23.contains(tri.drop(1))) lp6(2 * c23(tri.drop(1)), 5 * c2(tri.slice(1, 2)))
        else if (c1.contains(tri.drop(2))) lp6(4 * c1(tri.drop(2)), 25 * t)
        else lp6(4, 25 * t)
      }.sum
      (tris.size.toLong, s)
    }
    assert(got(10L) == score("the quick brown fox".split(" ").toSeq))
    assert(got(11L) == score("quick brown zebra runs fast".split(" ").toSeq))
    // the backoff ordering is sane: an in-model trigram outscores an OOV one
    assert(got(10L)._2.toDouble / got(10L)._1 > got(11L)._2.toDouble / got(11L)._1)
    graft.operators.Caches.release(spark)
  }

  test("kneserNeyLogProb == independent plain-Scala KN reference; all four branches hit") {
    import spark.implicits._
    val ref = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown cat sits on the lazy mat"))
      .toDF("doc_id", "text")
    val target = Seq(
      (10L, "the quick dog zebra unicorn"),  // seen bigram, seen ctx + seen
                                             // cont, OOV, OOV
      (11L, "quick zebra dog mat")           // pseudo-cont, cont-only ×2
    ).toDF("doc_id", "text")
    val got = TextAnalysis.kneserNeyLogProb(ref, target, "doc_id", "text",
      topV = 1000)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    // independent reference: plain-Scala continuation counts + PortableLog
    val refToks = Seq(
      "the quick brown fox jumps over the lazy dog".split(" ").toSeq,
      "the quick brown cat sits on the lazy mat".split(" ").toSeq)
    val bgs = refToks.flatMap(_.sliding(2)).map(_.toList).toSeq
    val c12 = bgs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1m = c12.groupBy(_._1.head).view
      .mapValues(m => (m.values.sum, m.size.toLong)).toMap // (c1, n1)
    val ncm = c12.keys.toSeq.groupBy(_.last).view
      .mapValues(_.size.toLong).toMap                      // N1+(·w2)
    val nb = c12.size.toLong                               // N1+(··)
    def lp6(a: Long, b: Long): Long =
      math.floor(graft.functions.PortableLog.log10RatioRef(a, b) * 1e6).toLong
    def score(ws: Seq[String]): (Long, Long) = {
      val pairs = ws.sliding(2).map(_.toList).toSeq
      val s = pairs.map { bg =>
        val (w1, w2) = (bg.head, bg.last)
        if (c12.contains(bg)) {
          val (c1, n1) = c1m(w1)
          lp6((4 * c12(bg) - 3) * nb + 3 * n1 * ncm(w2), 4 * c1 * nb)
        } else if (c1m.contains(w1)) {
          // branch 2 is BY SPEC the sum of its two separately-floored
          // factors (the precomputed-lookup factorization)
          val (c1, n1) = c1m(w1)
          lp6(3 * n1, 4 * c1) + lp6(ncm.getOrElse(w2, 1L), nb)
        } else if (ncm.contains(w2)) lp6(ncm(w2), nb)
        else lp6(1, 4 * nb)
      }.sum
      (pairs.size.toLong, s)
    }
    assert(got(10L) == score("the quick dog zebra unicorn".split(" ").toSeq))
    assert(got(11L) == score("quick zebra dog mat".split(" ").toSeq))
    // proper smoothing is sane: a doc of in-model bigrams outscores one
    // living off the continuation floor
    val inModel = TextAnalysis.kneserNeyLogProb(ref,
      Seq((20L, "the quick brown fox")).toDF("doc_id", "text"),
      "doc_id", "text", topV = 1000)
      .collect().head
    assert(inModel.getLong(2).toDouble / inModel.getLong(1) >
      got(10L)._2.toDouble / got(10L)._1)
    graft.operators.Caches.release(spark)
  }

  test("dsirScore == independent plain-Scala importance weights; target-like docs rank first") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma", "en"),
      (2L, "alpha beta beta", "en"),
      (3L, "delta epsilon zeta", "xx"),
      (4L, "alpha beta gamma gamma", "xx"), // raw doc that LOOKS like target
      (5L, "", "xx")                        // zero tokens → dropped
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.dsirScore(docs.filter($"lang" === "en"), docs,
      "doc_id", "text", nBuckets = 256)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    // independent reference: plain-Scala bucket counts + PortableLog refs
    def bucket(w: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % 256
    }
    val rawDocs = Map(1L -> "alpha beta gamma", 2L -> "alpha beta beta",
      3L -> "delta epsilon zeta", 4L -> "alpha beta gamma gamma", 5L -> "")
    def toksOf(t: String) = t.split("\\s+").toSeq.filter(_.nonEmpty)
    val tgtToks = Seq(1L, 2L).flatMap(id => toksOf(rawDocs(id)))
    val rawToks = rawDocs.values.toSeq.flatMap(toksOf)
    val ct = tgtToks.groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val cr = rawToks.groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val (tt, tr) = (tgtToks.size.toLong, rawToks.size.toLong)
    def lp6(a: Long, b: Long): Long =
      math.floor(graft.functions.PortableLog.log10RatioRef(a, b) * 1e6).toLong
    def w6(f: Long): Long =
      lp6(ct.getOrElse(f, 0L) + 1, tt + 256) - lp6(cr(f) + 1, tr + 256)
    def score(text: String): (Long, Long) = {
      val ts = toksOf(text)
      (ts.size.toLong, ts.map(w => w6(bucket(w))).sum)
    }
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    Seq(1L, 2L, 3L, 4L).foreach { id =>
      assert(got(id) == score(rawDocs(id)), s"doc $id: ${got(id)} vs ${score(rawDocs(id))}")
    }
    // per-token importance separates target-like from off-target raw docs
    def avg(id: Long) = got(id)._2.toDouble / got(id)._1
    assert(avg(4L) > avg(3L))

    // dsirSelect = exact rank selection (score desc, doc_id asc)
    val sel = TextAnalysis.dsirSelect(
      TextAnalysis.dsirScore(docs.filter($"lang" === "en"), docs,
        "doc_id", "text", nBuckets = 256), 2)
      .collect().map(_.getLong(0)).toSeq
    val expTop = Seq(1L, 2L, 3L, 4L).sortBy(id => (-got(id)._2, id)).take(2)
    assert(sel == expTop)
  }

  test("dsirScoreWith: frozen weights serve a new batch; unseen buckets take the OOV weight") {
    import spark.implicits._
    val target = Seq((1L, "alpha beta beta")).toDF("doc_id", "text")
    val rawSample = Seq((2L, "alpha gamma")).toDF("doc_id", "text")
    val batch = Seq((10L, "alpha zzz-unseen")).toDF("doc_id", "text")
    val w = TextAnalysis.dsirWeights(target, rawSample, "doc_id", "text",
      nBuckets = 256)
    val got = TextAnalysis.dsirScoreWith(w, batch, "doc_id", "text", 256)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    def bucket(word: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(word.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % 256
    }
    def lp6(a: Long, b: Long): Long =
      math.floor(graft.functions.PortableLog.log10RatioRef(a, b) * 1e6).toLong
    val ct = Seq("alpha", "beta", "beta").groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val cr = Seq("alpha", "gamma").groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val (tt, tr) = (3L, 2L)
    val w0 = lp6(1, tt + 256) - lp6(1, tr + 256)
    assert(w0 != 0L, "test needs distinct totals so the OOV weight is visible")
    def wOf(word: String): Long = {
      val f = bucket(word)
      if (cr.contains(f))
        lp6(ct.getOrElse(f, 0L) + 1, tt + 256) - lp6(cr(f) + 1, tr + 256)
      else w0
    }
    assert(!cr.contains(bucket("zzz-unseen")), "fixture must exercise the OOV branch")
    assert(got(10L) == ((2L, wOf("alpha") + wOf("zzz-unseen"))), s"got $got")
  }

  test("ngramNovelty: reference docs score zero; short docs drop; basis points exact") {
    import spark.implicits._
    val ref = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b c d e f"), // both 5-gram shingles in ref → 0 bp
      (2L, "a b c d e x"), // "a b c d e" seen, "b c d e x" novel → 5000 bp
      (3L, "z y x w v u"), // both novel → 10000 bp
      (4L, "a b c")        // < 5 words → no shingles → dropped
    ).toDF("doc_id", "text")
    val got = TextAnalysis.ngramNovelty(ref, docs, "doc_id", "text", n = 5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(1L -> ((2L, 0L, 0L)), 2L -> ((2L, 1L, 5000L)),
      3L -> ((2L, 2L, 10000L))), s"got $got")
  }

  test("perplexityBuckets assigns per-group terciles; ties share a bucket; floor-div exact on negatives") {
    import spark.implicits._
    val scored = Seq(
      (1L, "g1", -10L, 2L), (2L, "g1", -20L, 2L), (3L, "g1", -30L, 2L),
      (4L, "g1", -40L, 2L), (5L, "g1", -50L, 2L), (6L, "g1", -60L, 2L),
      (10L, "g2", -10L, 1L), (11L, "g2", -10L, 1L), (12L, "g2", -90L, 1L),
      (13L, "g2", -9L, 2L) // odd negative: floor(-4.5) = -5, not trunc -4
    ).toDF("doc_id", "grp", "s6", "n")
    val got = TextAnalysis.perplexityBuckets(scored, "doc_id", "grp", "s6", "n")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    // g1 descending avgs -5,-10,-15,-20,-25,-30 → cb 0..5 → (3cb) div 6
    assert(got(1L) == ((-5L, "head")) && got(2L) == ((-10L, "head")))
    assert(got(3L) == ((-15L, "middle")) && got(4L) == ((-20L, "middle")))
    assert(got(5L) == ((-25L, "tail")) && got(6L) == ((-30L, "tail")))
    // g2 (n_g = 4): -5 best (head); tie at -10 shares cb = 1 → bucket 0 →
    // head for BOTH; -90 cb = 3 → (9) div 4 = 2 → tail
    assert(got(13L) == ((-5L, "head")))
    assert(got(10L) == ((-10L, "head")) && got(11L) == ((-10L, "head")))
    assert(got(12L) == ((-90L, "tail")))
  }

  test("perplexityCuts/BucketsWith: frozen cuts reproduce in-sample buckets; unseen group defaults tail") {
    import spark.implicits._
    val scored = Seq(
      (1L, "g1", -10L, 2L), (2L, "g1", -20L, 2L), (3L, "g1", -30L, 2L),
      (4L, "g1", -40L, 2L), (5L, "g1", -50L, 2L), (6L, "g1", -60L, 2L)
    ).toDF("doc_id", "grp", "s6", "n")
    val cuts = TextAnalysis.perplexityCuts(scored, "doc_id", "grp", "s6", "n")
    // tercile assignment is monotone in avg, so serving the SAME data
    // against the frozen cuts reproduces the batch buckets exactly
    val batch = TextAnalysis.perplexityBuckets(scored, "doc_id", "grp", "s6", "n")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val served = TextAnalysis.perplexityBucketsWith(cuts, scored,
      "doc_id", "grp", "s6", "n")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(served == batch, s"$served vs $batch")
    // new batch: better-than-head-min → head; unseen group → tail
    val newBatch = Seq((100L, "g1", -2L, 2L), (101L, "g1", -44L, 2L),
      (102L, "gX", -2L, 2L)).toDF("doc_id", "grp", "s6", "n")
    val got = TextAnalysis.perplexityBucketsWith(cuts, newBatch,
      "doc_id", "grp", "s6", "n")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got == Map(100L -> "head", 101L -> "tail", 102L -> "tail"), s"got $got")
    graft.operators.Caches.release(spark)
  }

  test("bm25Score == independent plain-Scala reference; tf and rarity order correctly") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "apple banana cherry apple apple"),       // tf(apple)=3
      (2L, "apple banana banana date elder fig"),    // tf(apple)=1, longer doc
      (3L, "banana cherry date elder fig grape"),    // no apple
      (4L, "kiwi lime mango nectarine orange"),      // no query terms → absent
      (5L, null.asInstanceOf[String]))               // null text → absent, counts in N
      .toDF("doc_id", "text")
    val got = TextAnalysis.bm25Score(corpus, "doc_id", "text", "apple cherry")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // independent reference: same integer formula, idf via PortableLog.lnRef
    val texts = Map(1L -> "apple banana cherry apple apple",
      2L -> "apple banana banana date elder fig",
      3L -> "banana cherry date elder fig grape", 4L -> "kiwi lime mango nectarine orange")
    val toks = texts.view.mapValues(_.split("\\s+").toSeq).toMap
    val nd = 5L
    val ltot = toks.values.map(_.size.toLong).sum
    def score(id: Long): Long = {
      val ws = toks(id); val dl = ws.size.toLong
      val c6 = Seq("apple", "cherry").flatMap { t =>
        val tf = ws.count(_ == t).toLong
        if (tf == 0) None else {
          val df = toks.values.count(_.contains(t)).toLong
          val idf6 = math.floor((graft.functions.PortableLog.lnRef(2 * nd + 2) -
            graft.functions.PortableLog.lnRef(2 * df + 1)) * 1000000.0).toLong
          val tfq6 = (22L * tf * 1000000L) / (10L * tf + 3L + (9L * dl * nd) / ltot)
          Some(idf6 * tfq6 / 1000000L)
        }
      }.sum
      c6
    }
    assert(got.keySet == Set(1L, 2L, 3L), s"retrieval set wrong: ${got.keySet}")
    Seq(1L, 2L, 3L).foreach { id =>
      assert(got(id) == score(id), s"doc $id: ${got(id)} vs ${score(id)}")
    }
    // more occurrences of the same term in a same-length-class doc → higher
    assert(got(1L) > got(2L))
  }

  test("bm25ScoreBatch ≡ bm25Score per query — shared df/stats leak nothing across queries") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "apple banana cherry apple apple"),
      (2L, "apple banana banana date elder fig"),
      (3L, "banana cherry date elder fig grape"),
      (4L, "kiwi lime mango nectarine orange")).toDF("doc_id", "text")
    val queries = Seq(("a", "apple cherry"), ("b", "banana"), ("c", "absent"))
      .toDF("query_id", "qtext")
    val batch = TextAnalysis.bm25ScoreBatch(corpus, "doc_id", "text",
      queries, "query_id", "qtext", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    for ((qid, qtext) <- Seq("a" -> "apple cherry", "b" -> "banana")) {
      val single = TextAnalysis.bm25Score(corpus, "doc_id", "text", qtext)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val bq = batch.collect { case ((q, d), s) if q == qid => d -> s }.toMap
      assert(bq == single, s"query $qid: batch $bq vs single $single")
    }
    assert(!batch.keys.exists(_._1 == "c"), "no-hit queries return no rows")
  }

  test("hardNegatives: rank-1 is the positive, near-ties skipped, margins exact") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "apple banana cherry apple apple"),
      (2L, "apple banana banana date elder fig"),
      (3L, "banana cherry date elder fig grape"),
      (4L, "kiwi lime mango nectarine orange")).toDF("doc_id", "text")
    val queries = Seq(("a", "apple cherry")).toDF("query_id", "qtext")
    val ranked = TextAnalysis.bm25ScoreBatch(corpus, "doc_id", "text",
      queries, "query_id", "qtext", k = 10)
      .collect().sortBy(_.getInt(2)).map(r => r.getLong(1) -> r.getLong(3))
    val (posDoc, posE6) = ranked.head
    // margin 0: every lower rank is a negative with the exact score gap
    val all = TextAnalysis.hardNegatives(corpus, "doc_id", "text",
      queries, "query_id", "qtext", k = 10, marginE6 = 0L)
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(5)))
    assert(all.forall(_._1 == posDoc), "positive is always the rank-1 doc")
    assert(all.map(_._2).toSet == ranked.tail.map(_._1).toSet)
    all.foreach { case (_, neg, m) =>
      assert(m == posE6 - ranked.find(_._1 == neg).get._2) }
    assert(!all.exists(_._2 == posDoc), "the positive never appears as its own negative")
    // a margin above the widest gap yields no pairs (all near-ties skipped)
    val widest = ranked.tail.map(posE6 - _._2).max
    assert(TextAnalysis.hardNegatives(corpus, "doc_id", "text",
      queries, "query_id", "qtext", k = 10, marginE6 = widest + 1).count() == 0)
  }

  test("randomNegatives: md5-shuffle draws match plain Scala; positive skipped") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq(("qa", 7L), ("qb", 11L)).toDF("query_id", "pos_id")
    val got = TextAnalysis.randomNegatives(pairs, docs,
      "query_id", "pos_id", "doc_id", k = 5)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet

    // independent reference
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val order = (0L until 40L).sortBy(i => (md5hex(i.toString), i))
    val expect = Seq("qa" -> 7L, "qb" -> 11L).flatMap { case (q, pos) =>
      val off = java.lang.Long.parseLong(md5hex(q).substring(0, 8), 16) % 40
      (0 to 5).map(j => order(((off + j) % 40).toInt))
        .filter(_ != pos).take(5).zipWithIndex
        .map { case (neg, i) => (q, pos, neg, i + 1) }
    }.toSet
    assert(got == expect, s"got $got want $expect")
    assert(got.forall(_._3 != 7L) || got.exists(t => t._1 == "qb" && t._3 == 7L),
      "a positive is only excluded for ITS OWN query")
  }

  test("temperatureMixture: caps ∝ n^α exactly; α=1/4 flattens harder than α=1/2; md5 order kept") {
    import spark.implicits._
    val docs = (0L until 400L).map(i =>
      (i, if (i < 320) "big" else if (i < 380) "mid" else "small"))
      .toDF("doc_id", "lang")
    def capsOf(aq: Int): Map[String, Long] = {
      val got = Pipelines.temperatureMixture(docs, "doc_id", "lang",
        totalDocs = 100L, alphaQuarters = aq)
        .collect().map(r => r.getString(1)).groupBy(identity)
        .view.mapValues(_.length.toLong).toMap
      graft.operators.Caches.release(spark)
      got
    }
    def expected(aq: Int): Map[String, Long] = {
      val ns = Map("big" -> 320L, "mid" -> 60L, "small" -> 20L)
      def w6(n: Long) = {
        val a = math.sqrt(n.toDouble)
        math.floor((if (aq == 1) math.sqrt(a) else a) * 1e6).toLong
      }
      val sw = ns.values.map(w6).sum
      // a flattened cap can exceed a tail domain's actual size — the
      // operator then keeps everything available (no upsampling)
      ns.map { case (d, n) =>
        d -> math.min(n, (w6(n) * 10000L / sw) * 100L / 10000L) }
    }
    val half = capsOf(2)
    val quarter = capsOf(1)
    assert(half == expected(2).filter(_._2 > 0), s"α=1/2: $half vs ${expected(2)}")
    assert(quarter == expected(1).filter(_._2 > 0), s"α=1/4: $quarter vs ${expected(1)}")
    // flattening: the big/small kept ratio shrinks as α drops (16:1 raw)
    assert(half("big").toDouble / half("small") >
      quarter("big").toDouble / quarter("small"))
    // the kept subset per domain is the md5-order prefix (monotone contract)
    val keptHalf = Pipelines.temperatureMixture(docs, "doc_id", "lang", 100L, 2)
      .collect().map(_.getLong(0)).toSet
    val byOrder = docs.collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).toSeq.flatMap { case (d, rows) =>
        rows.map(_._1).sortBy(id => (java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes).map("%02x".format(_)).mkString, id))
          .take(half.getOrElse(d, 0L).toInt).toSeq
      }.toSet
    assert(keptHalf == byOrder, "kept set must be the per-domain md5 prefix")
    graft.operators.Caches.release(spark)
  }

  test("bm25 index probe ≡ in-plan scorer; the scan prunes to the query terms' buckets") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "apple banana cherry apple apple"),
      (2L, "apple banana banana date elder fig"),
      (3L, "banana cherry date elder fig grape"),
      (4L, "kiwi lime mango nectarine orange")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25").toString + "/idx"
    TextAnalysis.bm25IndexWrite(corpus, "doc_id", "text", dir)
    val probe = TextAnalysis.bm25Probe(spark, dir, "apple cherry")
    val direct = TextAnalysis.bm25Score(corpus, "doc_id", "text", "apple cherry")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(probe.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == direct)
    // directory-level pruning: the postings scan must carry a non-empty
    // partition filter on the bucket column
    val plan = probe.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("bucket") &&
      !scanLine.replaceAll("\\s", "").contains("PartitionFilters:[]"),
      s"probe must prune on bucket partitions:\n$scanLine")

    // incremental build: index(1,2) + append(3,4) must probe EXACTLY like
    // the one-shot index — df recomputation and the stats-sidecar merge
    // leave no seam
    val dir2 = java.nio.file.Files.createTempDirectory("graft_bm25a").toString + "/idx"
    TextAnalysis.bm25IndexWrite(corpus.filter($"doc_id" <= 2), "doc_id", "text", dir2)
    TextAnalysis.bm25IndexAppend(corpus.filter($"doc_id" >= 3), "doc_id", "text", dir2)
    val grown = TextAnalysis.bm25Probe(spark, dir2, "apple cherry")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(grown == direct, s"incrementally-grown probe diverged: $grown vs $direct")
  }

  test("bm25ProbeBatch ≡ bm25ScoreBatch per query; one pruned scan serves all queries") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "apple banana cherry apple apple"),
      (2L, "apple banana banana date elder fig"),
      (3L, "banana cherry date elder fig grape"),
      (4L, "kiwi lime mango nectarine orange")).toDF("doc_id", "text")
    val qs = Seq(("qa", "apple cherry"), ("qb", "banana fig"),
      ("qc", "grape")).toDF("query_id", "qtext")
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25b").toString + "/idx"
    TextAnalysis.bm25IndexWrite(corpus, "doc_id", "text", dir)
    val probed = TextAnalysis.bm25ProbeBatch(spark, dir, qs,
      "query_id", "qtext", k = 3)
    val want = TextAnalysis.bm25ScoreBatch(corpus, "doc_id", "text", qs,
      "query_id", "qtext", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> ((r.getInt(2), r.getLong(3)))).toMap
    val got = probed
      .collect().map(r => (r.getString(0), r.getLong(1)) -> ((r.getInt(2), r.getLong(3)))).toMap
    assert(got == want, s"$got vs $want")
    val plan = probed.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("bucket") &&
      !scanLine.replaceAll("\\s", "").contains("PartitionFilters:[]"),
      s"batch probe must prune on bucket partitions:\n$scanLine")
  }
}
