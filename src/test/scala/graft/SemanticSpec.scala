package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pipelines, Semantic}
import graft.sources.Tables

/** Semantic dedup (SemDeDup) + duplicate-span detection: the DuckDB oracle
  * proves engine parity on the fixture; these tests pin the semantic
  * invariants on crafted inputs.
  */
class SemanticSpec extends SparkSpec {

  test("assignCells: total over non-null rows, deterministic, cells are seed ids") {
    val emb = Tables(spark, sfDir, "embeddings")
    val a1 = Semantic.assignCells(emb, "vec_id", "embedding", k = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val a2 = Semantic.assignCells(emb, "vec_id", "embedding", k = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(a1 == a2, "assignment must be exactly reproducible")
    assert(a1.length == emb.filter(col("embedding").isNotNull).count())
    val cells = a1.map(_._2).distinct
    assert(cells.length <= 16)
    val ids = a1.map(_._1).toSet
    assert(cells.forall(ids.contains), "every cell label is a seed's vec_id")
    // a seed's own distance is 0 and its cell is itself
    val seedRows = a1.filter(r => cells.contains(r._1))
    assert(seedRows.forall(r => r._2 == r._1 && r._3 == 0L))
  }

  test("kmeansTrain matches an independent plain-Scala Lloyd, exactly") {
    val emb = Tables(spark, sfDir, "embeddings").filter(col("vec_id") < 120)
    val k = 8
    val iters = 2
    val out = Semantic.kmeansTrain(emb, "vec_id", "embedding", k, iters)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

    // independent reference: same spec, plain Scala end to end
    val rows = emb.filter(col("embedding").isNotNull)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x =>
          math.floor(x.toDouble * 1000000.0 + 0.5).toLong).toArray)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    var cents: Map[Long, Array[Long]] =
      rows.sortBy { case (id, _) => (md5hex(id.toString), id) }.take(k).toMap
    def assign(v: Array[Long]): Long =
      cents.toSeq.map { case (c, cv) =>
        (cv.iterator.zip(v.iterator).map { case (b, a) =>
          (a - b) * (a - b) }.sum, c)
      }.min._2
    for (_ <- 1 to iters) {
      val byCell = rows.groupBy { case (_, v) => assign(v) }
      cents = cents.map { case (c, cv) =>
        byCell.get(c) match {
          case Some(ms) => c -> Array.tabulate(cv.length) { i =>
            Math.floorDiv(ms.map(_._2(i)).sum, ms.length.toLong)
          }
          case None => c -> cv
        }
      }
    }
    val counts = rows.groupBy { case (_, v) => assign(v) }
      .map { case (c, ms) => c -> ms.length.toLong }
    val expect = (for ((c, cv) <- cents.toSeq; i <- cv.indices)
      yield (c, i) -> (cv(i), counts.getOrElse(c, 0L))).toMap

    assert(out.size == k * rows.head._2.length, "k x d centroid components")
    assert(out == expect, "trained centroids and member counts must match " +
      "the reference bit-for-bit")
    assert(counts.values.sum == rows.length.toLong)
  }

  test("kmeansUpdate: running means match plain Scala; empty batch is identity") {
    val emb = Tables(spark, sfDir, "embeddings")
    val state = Semantic.kmeansTrain(
      emb.filter(col("vec_id") < 100), "vec_id", "embedding", k = 4, iters = 1)
    val stateRows = state.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap

    // empty batch: every row passes through untouched
    val idRows = Semantic.kmeansUpdate(state,
      emb.filter(col("vec_id") < 0), "vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(idRows == stateRows)

    // plain-Scala reference for one mini-batch
    val batch = emb.filter(col("vec_id") >= 100 && col("vec_id") < 140)
    val out = Semantic.kmeansUpdate(state, batch, "vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val cents = stateRows.groupBy(_._1._1).map { case (cell, rows) =>
      cell -> rows.toSeq.sortBy(_._1._2).map(_._2._1).toArray
    }
    val bvecs = batch.filter(col("embedding").isNotNull)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x =>
        math.floor(x.toDouble * 1000000.0 + 0.5).toLong).toArray)
    def nearest(v: Array[Long]): Long = cents.toSeq.map { case (c, cv) =>
      (cv.iterator.zip(v.iterator).map { case (b, a) => (a - b) * (a - b) }.sum, c)
    }.min._2
    val byCell = bvecs.groupBy { case (_, v) => nearest(v) }
    val expect = stateRows.map { case ((cell, pos), (c, n)) =>
      byCell.get(cell) match {
        case Some(ms) =>
          val m = ms.length.toLong
          val t = c * n + ms.map(_._2(pos)).sum
          (cell, pos) -> (Math.floorDiv(t, n + m), n + m)
        case None => (cell, pos) -> (c, n)
      }
    }
    assert(out == expect)
    assert(out.filter(_._1._2 == 0).values.map(_._2).sum ==
      stateRows.filter(_._1._2 == 0).values.map(_._2).sum + bvecs.length)
  }

  test("semanticDedup: exact clones are pruned, originals survive") {
    val emb = Tables(spark, sfDir, "embeddings")
    val planted = emb.unionByName(
      emb.filter(col("vec_id") < 10).withColumn("vec_id", col("vec_id") + 10000))
    val kept = Semantic.semanticDedup(planted, "vec_id", "embedding",
      k = 16, threshold = 0.9)
      .collect().map(_.getLong(0)).toSet
    assert((0L until 10L).forall(kept.contains), "smaller-id originals must survive")
    assert((0L until 10L).forall(i => !kept.contains(i + 10000)),
      "every exact clone must be pruned")
    assert(kept.size == emb.filter(col("embedding").isNotNull).count(),
      "nothing but the clones may be dropped at threshold 0.9 on this fixture")
  }

  test("semanticDedup hot-cell fallback: tiny maxCell still prunes clone floods") {
    val emb = Tables(spark, sfDir, "embeddings").limit(40)
    // 60 clones of vec 0 flood its cell far past maxCell = 8; identical
    // vectors share every LSH band bucket, so the banded path keeps recall 1
    // on exact clones and all of them must still drop
    var planted = emb
    for (i <- 0 until 3)
      planted = planted.unionByName(
        emb.filter(col("vec_id") === 0)
          .withColumn("vec_id", lit(1000L + i))
          .unionByName(emb.filter(col("vec_id") === 0)
            .withColumn("vec_id", lit(2000L + i * 20)))
          .unionByName(emb.filter(col("vec_id") === 0)
            .withColumn("vec_id", lit(3000L + i * 7)))
    )
    val nClones = planted.count() - emb.count()
    val kept = Semantic.semanticDedup(planted, "vec_id", "embedding",
      k = 4, threshold = 0.9, maxCell = 8)
      .collect().map(_.getLong(0)).toSet
    assert(nClones >= 9)
    assert(kept.contains(0L), "the original survives")
    assert(kept.forall(_ < 1000L), "every clone must drop via the hot-cell path")
    assert(kept.size == emb.count(), "non-clones untouched")
  }

  test("dedup state tables round-trip through parquet (the real persistence shape)") {
    val emb = Tables(spark, sfDir, "embeddings")
    val docs = Tables(spark, sfDir, "documents")
    val dir = java.nio.file.Files.createTempDirectory("state_rt").toString

    val semState = Semantic.semanticState(
      emb.filter(col("vec_id") < 250), "vec_id", "embedding", k = 8)
    semState.write.parquet(s"$dir/sem")
    val batch = emb.filter(col("vec_id") >= 250)
    val direct = Semantic.semanticIncremental(batch, "vec_id", "embedding",
      semState, threshold = 0.9).collect().map(_.getLong(0)).toSet
    val viaParquet = Semantic.semanticIncremental(batch, "vec_id", "embedding",
      spark.read.parquet(s"$dir/sem"), threshold = 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(direct == viaParquet, "semantic state must survive a parquet round-trip")

    val lshState = graft.operators.Dedup.minHashState(
      docs.filter(col("doc_id") < 250), "doc_id", "text")
    lshState.write.parquet(s"$dir/lsh")
    val nb = docs.filter(col("doc_id") >= 250)
    val d2 = graft.operators.Dedup.nearIncremental(nb, "doc_id", "text", lshState)
      .collect().map(_.getLong(0)).toSet
    val p2 = graft.operators.Dedup.nearIncremental(nb, "doc_id", "text",
      spark.read.parquet(s"$dir/lsh")).collect().map(_.getLong(0)).toSet
    assert(d2 == p2, "LSH state must survive a parquet round-trip")
  }

  test("semanticDedup: null-embedding rows are excluded, not crashed on") {
    import spark.implicits._
    val emb = Tables(spark, sfDir, "embeddings").limit(50)
    val withNull = emb.unionByName(
      Seq((99999L, null.asInstanceOf[Array[Float]], 0))
        .toDF("vec_id", "embedding", "label"))
    val kept = Semantic.semanticDedup(withNull, "vec_id", "embedding",
      k = 4, threshold = 0.9).collect().map(_.getLong(0)).toSet
    assert(!kept.contains(99999L))
    assert(kept.nonEmpty)
  }

  test("duplicateSpans: planted shared span flagged on both docs, short docs total") {
    import spark.implicits._
    val shared = (1 to 10).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $shared gamma"),        // shares the 10-token run with doc 2
      (2L, s"$shared delta epsilon zeta eta theta iota kappa"),
      (3L, "unique words only here nothing repeats in this document at all now"),
      (4L, "tiny doc"),                          // < w tokens → zero windows
      (5L, null.asInstanceOf[String]))           // null text → zero windows
      .toDF("doc_id", "text")
    val out = Pipelines.duplicateSpans(docs, "doc_id", "text", w = 10, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L), "output is total")
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._3 >= 1, "doc 1 must flag the shared span")
    assert(byId(2L)._3 >= 1, "doc 2 must flag the shared span")
    assert(byId(3L)._3 == 0 && byId(3L)._4 == 0.0)
    assert(byId(4L)._2 == 0 && byId(4L)._4 == 0.0)
    assert(byId(5L)._2 == 0 && byId(5L)._4 == 0.0)
    // within-doc repetition alone also counts (Lee et al. semantics)
    val rep = (1 to 10).map(i => s"w$i").mkString(" ")
    val self = Seq((7L, s"$rep $rep")).toDF("doc_id", "text")
    val selfOut = Pipelines.duplicateSpans(self, "doc_id", "text", w = 10, minCount = 2)
      .collect().map(r => (r.getLong(2))).head
    assert(selfOut >= 2, "within-doc duplicated windows must be flagged")
  }

  test("semanticDedup postconditions hold on random vectors (property check)") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // clusters of correlated vectors: base directions plus small jitter so
    // the fixture has genuine high-cosine pairs without being all-clones
    val bases = Array.fill(6)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val rows = (0L until 150L).map { i =>
      val b = bases(rnd.nextInt(6))
      val jitter = rnd.nextDouble() * 0.6
      (i, b.map(x => (x + jitter * rnd.nextGaussian()).toFloat).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val tau = 0.9
    val kept = Semantic.semanticDedup(df, "vec_id", "embedding",
      k = 5, threshold = tau, maxCell = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cellOf = kept.toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
        math.sqrt(b.map(x => x.toDouble * x.toDouble).sum))
    }
    val vecOf = rows.toMap
    // P1: survivors in the same cell are pairwise below the threshold —
    // if two similar survivors shared a cell, the larger id would have
    // been dropped by the smaller
    for {
      (a, ca) <- kept; (b, cb) <- kept
      if a < b && ca == cb
    } assert(cos(vecOf(a), vecOf(b)) < tau,
      s"survivors $a,$b share cell $ca at cos >= $tau")
    // P2: non-trivial — the fixture must actually drop something
    assert(kept.length < rows.length, "fixture produced no drops")
    // P3: determinism across runs
    val kept2 = Semantic.semanticDedup(df, "vec_id", "embedding",
      k = 5, threshold = tau, maxCell = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept.toSet == kept2)
  }

  test("semanticIncremental: history clones fall to the state check, batch clones to keep-first") {
    val emb = Tables(spark, sfDir, "embeddings")
    val state = Semantic.semanticState(
      emb.filter(col("vec_id") < 250), "vec_id", "embedding", k = 16)
    val batch = emb.filter(col("vec_id") >= 250)
      .unionByName(emb.filter(col("vec_id") < 10)
        .withColumn("vec_id", col("vec_id") + 10000))
      .unionByName(emb.filter(col("vec_id") === 300)
        .withColumn("vec_id", col("vec_id") + 20000))
    val kept = Semantic.semanticIncremental(batch, "vec_id", "embedding",
      state, threshold = 0.9).collect().map(_.getLong(0)).toSet
    assert((0L until 10L).forall(i => !kept.contains(i + 10000)),
      "clones of history vectors must be dropped by the state check")
    assert(!kept.contains(20300L),
      "the larger-id clone of a batch vector must fall to keep-first")
    assert(kept.contains(300L), "the smaller-id batch original survives")
    assert(kept.size == emb.filter(col("vec_id") >= 250).count(),
      "nothing else may drop at threshold 0.9 on this fixture")
  }

  test("semanticIncremental: history-flooded hot cell still catches batch clones at tiny maxCell") {
    val emb = Tables(spark, sfDir, "embeddings").limit(40)
    // history floods vec 0's cell with 12 clones — past maxCell = 8 the
    // history check must go through the bipartite LSH path, where identical
    // vectors still always collide
    var hist = emb.filter(col("vec_id") < 30)
    for (i <- 0 until 12)
      hist = hist.unionByName(emb.filter(col("vec_id") === 0)
        .withColumn("vec_id", lit(500L + i * 13)))
    val state = Semantic.semanticState(hist, "vec_id", "embedding", k = 4)
    val batch = emb.filter(col("vec_id") >= 30)
      .unionByName(emb.filter(col("vec_id") === 0)
        .withColumn("vec_id", lit(9999L)))
    val kept = Semantic.semanticIncremental(batch, "vec_id", "embedding",
      state, threshold = 0.9, maxCell = 8)
      .collect().map(_.getLong(0)).toSet
    assert(!kept.contains(9999L),
      "the clone of a hot-cell history vector must still be caught")
    assert(kept == (30L until 40L).toSet, "non-clone batch rows survive")
  }

  test("pqEncode: deterministic, seeds self-code, clones share codes, alphabet bounded") {
    val emb = Tables(spark, sfDir, "embeddings")
    val c1 = Semantic.pqEncode(emb, "vec_id", "embedding", m = 8, ksub = 16)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val c2 = Semantic.pqEncode(emb, "vec_id", "embedding", m = 8, ksub = 16)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(c1 == c2, "codes must be exactly reproducible")
    assert(c1.length == emb.filter(col("embedding").isNotNull).count())
    val codes = c1.toMap
    codes.values.foreach { c =>
      val parts = c.split(",")
      assert(parts.length == 8)
      assert(parts.forall(p => p.toInt >= 0 && p.toInt < 16), s"code out of range: $c")
    }
    // a seed's nearest codebook entry in every subspace is itself, so its
    // code is its own rank repeated m times — and ranks 0..15 all occur
    val selfCodes = codes.values.filter(c => c.split(",").distinct.length == 1).toSeq
    val selfRanks = selfCodes.map(_.split(",").head.toInt).distinct
    assert((0 until 16).forall(selfRanks.contains),
      s"every seed must self-code (saw ranks $selfRanks)")
    // identical vectors encode identically
    import spark.implicits._
    val dup = emb.limit(20).unionByName(
      emb.limit(20).withColumn("vec_id", col("vec_id") + 50000))
    val dupCodes = Semantic.pqEncode(dup, "vec_id", "embedding", m = 8, ksub = 16)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    (0L until 20L).foreach { i =>
      assert(dupCodes(i) == dupCodes(i + 50000), s"clone of $i must share its code")
    }
  }

  test("pqTopK: ascending ADC distances; a clone of the query ties the minimum") {
    val emb = Tables(spark, sfDir, "embeddings")
    // a clone of the query shares its code, and the query's own code achieves
    // the per-subspace minimum LUT entry — so no vector can score below it
    val planted = emb.unionByName(
      emb.filter(col("vec_id") === 0).withColumn("vec_id", lit(77777L)))
    val out = Semantic.pqTopK(planted, "vec_id", "embedding",
      queryId = 0L, k = 10, m = 8, ksub = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == 10)
    assert(out.map(_._2).toSeq == out.map(_._2).sorted.toSeq, "adist must ascend")
    val cloneDist = out.find(_._1 == 77777L)
      .getOrElse(fail("query clone missing from top-k"))._2
    assert(cloneDist == out.head._2, "clone must tie the minimum ADC distance")
  }

  test("removeContaminatedSpans: eval spans scrubbed, clean docs untouched, eval self-scrubs") {
    import spark.implicits._
    val leak = (1 to 10).map(i => s"ev$i").mkString(" ")
    val docs = Seq(
      (1L, s"intro words $leak closing remark"),
      (2L, "completely clean document with no overlap whatsoever in its body text"))
      .toDF("doc_id", "text")
    val eval = Seq((100L, s"$leak tail tokens here")).toDF("doc_id", "text")
    val out = Pipelines.removeContaminatedSpans(docs, eval, "doc_id", "text", w = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._2 == "intro words closing remark", s"got '${byId(1L)._2}'")
    assert(byId(1L)._4 == 10L)
    assert(byId(2L)._4 == 0L, "clean doc must lose nothing")
    // eval docs fed back as the corpus scrub themselves fully (>= w tokens)
    val self = Pipelines.removeContaminatedSpans(eval, eval, "doc_id", "text", w = 10)
      .collect().head
    assert(self.getString(1) == "" && self.getLong(3) == 13L)
  }

  test("removeDuplicateSpans: covered tokens dropped, clean docs verbatim, totality") {
    import spark.implicits._
    val shared = (1 to 10).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $shared gamma"),
      (2L, s"$shared delta"),
      (3L, "unique words only here nothing repeats in this document at all now"),
      (4L, "tiny doc"),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Pipelines.removeDuplicateSpans(docs, "doc_id", "text", w = 10, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L), "output is total")
    val byId = out.map(r => r._1 -> r).toMap
    // doc 1: windows covering the shared run are duplicated (they appear in
    // doc 2's prefix window only when identical) — here only the exact
    // 10-token run [tok1..tok10] recurs, so alpha/beta/gamma must survive
    assert(byId(1L)._2 == "alpha beta gamma", s"got '${byId(1L)._2}'")
    assert(byId(1L)._4 == 10L)
    assert(byId(2L)._2 == "delta")
    assert(byId(3L)._2 == docs.filter(col("doc_id") === 3).head().getString(1).toLowerCase)
    assert(byId(3L)._4 == 0L)
    assert(byId(4L)._2 == "tiny doc" && byId(4L)._3 == 2L && byId(4L)._4 == 0L)
    assert(byId(5L)._2 == "" && byId(5L)._3 == 0L && byId(5L)._4 == 0L)
  }

  test("span ops: exact-copy collapse preserves per-copy semantics (multiplicity counts)") {
    import spark.implicits._
    // 3 verbatim copies of one >= w-token page: every window occurs 3 times
    // corpus-wide, so ALL copies must be fully scrubbed — the collapse must
    // weight window counts by stream multiplicity, not count the rep once
    val page = (1 to 12).map(i => s"pg$i").mkString(" ")
    val docs = Seq(
      (1L, page), (2L, page), (3L, page),
      (4L, "independent text with no shared ten token run anywhere in it today"))
      .toDF("doc_id", "text")
    val out = Pipelines.removeDuplicateSpans(docs, "doc_id", "text", w = 10, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L), "output is total")
    val byId = out.map(r => r._1 -> r).toMap
    for (id <- Seq(1L, 2L, 3L)) {
      assert(byId(id)._2 == "" && byId(id)._4 == 12L,
        s"copy $id must be fully scrubbed, got '${byId(id)._2}'")
    }
    assert(byId(4L)._4 == 0L, "unique doc must survive verbatim")
    // same corpus through the signal op: copies report dup_frac 1.0 and
    // identical rows — and a SINGLE occurrence below minCount stays clean
    val sig = Pipelines.duplicateSpans(docs, "doc_id", "text", w = 10, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    val sigById = sig.map(r => r._1 -> r).toMap
    for (id <- Seq(1L, 2L, 3L))
      assert(sigById(id)._3 == 3L && sigById(id)._4 == 1.0)
    assert(sigById(4L)._3 == 0L && sigById(4L)._4 == 0.0)
    // minCount above the copy count: 3 copies < minCount 4 → nothing flagged
    val strict = Pipelines.duplicateSpans(docs, "doc_id", "text", w = 10, minCount = 4)
      .collect().map(r => r.getLong(2)).sum
    assert(strict == 0L, "3 copies must not reach minCount 4")
  }

  test("exact-integer magnitude guard fails loudly on out-of-scale embeddings") {
    val emb = Tables(spark, sfDir, "embeddings").limit(20)
    // unit-scale inputs pass the guard untouched (the whole corpus is proof,
    // but pin it here so the guard can never false-positive on legit data)
    assert(Semantic.assignCells(emb, "vec_id", "embedding", k = 4).count() == 20)
    // blown-up inputs (|x| ~ 1e4 → |q| ~ 1e10 > the ~5.9e6 dim-64 bound) must
    // raise, not silently produce inexact — hence unportable — distances
    val big = emb.select(col("vec_id"),
      expr("transform(embedding, x -> x * 10000.0f)").as("embedding"))
    val e1 = intercept[Exception] {
      Semantic.assignCells(big, "vec_id", "embedding", k = 4).collect()
    }
    assert(e1.getMessage.contains("exact-integer"), s"got: ${e1.getMessage}")
    val e2 = intercept[Exception] {
      Semantic.pqEncode(big, "vec_id", "embedding", m = 8, ksub = 4).collect()
    }
    assert(e2.getMessage.contains("exact-integer"), s"got: ${e2.getMessage}")
  }

  test("semanticIncremental: a re-ingested id is not dropped against its own history copy") {
    import spark.implicits._
    // four near-orthogonal vectors; no cross pair reaches cos >= 0.9
    val rows = Seq(
      0L -> Seq(1f, 0f, 0f, 0f), 1L -> Seq(0f, 1f, 0f, 0f),
      2L -> Seq(0f, 0f, 1f, 0f), 3L -> Seq(0f, 0f, 0f, 1f))
    val emb = rows.toDF("vec_id", "embedding")
    val state = Semantic.semanticState(emb, "vec_id", "embedding", k = 2)
    // re-ingest id 1 verbatim: its history copy has cosine exactly 1, but an
    // equal id must not self-drop (cold path filters n.vec_id =!= hid; the
    // hot path cannot pair equal ids at all) — the row falls only to OTHER
    // neighbors, of which there are none here
    val out = Semantic.semanticIncremental(
      emb.filter(col("vec_id") === 1L), "vec_id", "embedding",
      state, threshold = 0.9)
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L), s"re-ingested row must survive its own copy: $out")
  }
}
