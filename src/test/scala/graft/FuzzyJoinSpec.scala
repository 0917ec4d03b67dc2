package graft

import org.apache.spark.sql.functions._

import graft.operators.FuzzyJoin

/** FastSS deletion-neighborhood fuzzy join: the pair set must EQUAL the
  * brute-force levenshtein<=1 pair set — the neighborhood trick is a blocking
  * optimization, never a semantics change.
  */
class FuzzyJoinSpec extends SparkSpec {

  private def brute(rows: Seq[(Long, String)]): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      dist = lev(sa, sb) if dist <= 1
    } yield (ia, ib, dist)).toSet
  }

  test("edit-distance-1 pairs: substitution, insertion, deletion, equality, no misses") {
    import spark.implicits._
    val rows = Seq(
      1L -> "kitten", 2L -> "mitten", // substitution
      3L -> "cart", 4L -> "carts", // insertion
      5L -> "house", 6L -> "huse", // deletion (dist 1)
      7L -> "same", 8L -> "same", // identical (dist 0)
      9L -> "unrelated", 10L -> "totally"
    )
    val got = FuzzyJoin.pairsWithin1(rows.toDF("id", "name"), "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute(rows), s"got $got\nexpected ${brute(rows)}")
  }

  test("random short strings: neighborhood join == brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    val rows = (0 until 120).map(i =>
      i.toLong -> (0 until (2 + rnd.nextInt(4))).map(_ => alphabet(rnd.nextInt(3))).mkString)
    val got = FuzzyJoin.pairsWithin1(rows.toDF("id", "name"), "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expect = brute(rows)
    assert(expect.size > 50, s"fixture too sparse (${expect.size} pairs) to be falsifiable")
    assert(got == expect, s"diff: missing ${expect.diff(got).take(5)}, extra ${got.diff(expect).take(5)}")
  }

  test("k=2: depth-2 neighborhoods == brute force at distance <= 2") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val alphabet = "abcd"
    val rows = (0 until 80).map(i =>
      i.toLong -> (0 until (3 + rnd.nextInt(4))).map(_ => alphabet(rnd.nextInt(4))).mkString)
    val got = FuzzyJoin.pairsWithin(rows.toDF("id", "name"), "id", "name", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expect = brute2(rows)
    assert(expect.exists(_._3 == 2), "fixture must contain distance-2 pairs")
    assert(got == expect, s"diff: missing ${expect.diff(got).take(5)}, extra ${got.diff(expect).take(5)}")
  }

  test("k=2 via forced PassJoin segments == brute force (the A/B alternative is exact too)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val alphabet = "abcd"
    val rows = (0 until 80).map(i =>
      i.toLong -> (0 until (3 + rnd.nextInt(4))).map(_ => alphabet(rnd.nextInt(4))).mkString)
    val got = FuzzyJoin.pairsWithinScheme(rows.toDF("id", "name"), "id", "name",
      k = 2, forceSegments = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute2(rows),
      s"diff: missing ${brute2(rows).diff(got).take(5)}, extra ${got.diff(brute2(rows)).take(5)}")
  }

  private def brute2(rows: Seq[(Long, String)]): Set[(Long, Long, Int)] = bruteK(rows, 2)

  private def bruteK(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      dist = lev(sa, sb) if dist <= k
    } yield (ia, ib, dist)).toSet
  }

  test("k=3 and k=4: segment blocking == brute force, incl. sub-k+1-length strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val alphabet = "abcd"
    // lengths 1..9: strings SHORTER than k+1 exercise the constant-key short
    // bucket and the asymmetric (short probe, long segment) discovery path
    val rows = (0 until 70).map(i =>
      i.toLong -> (0 until (1 + rnd.nextInt(9))).map(_ => alphabet(rnd.nextInt(4))).mkString)
    for (k <- Seq(3, 4, 6)) {
      val got = FuzzyJoin.pairsWithin(rows.toDF("id", "name"), "id", "name", k = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val expect = bruteK(rows, k)
      assert(expect.exists(_._3 == k), s"fixture must contain distance-$k pairs")
      assert(got == expect,
        s"k=$k diff: missing ${expect.diff(got).take(5)}, extra ${got.diff(expect).take(5)}")
    }
  }

  test("k=3 on realistic keys: shared-prefix identifiers, digit edits") {
    import spark.implicits._
    val rows = (1 to 120).map(i => i.toLong -> f"Customer#$i%09d")
    val got = FuzzyJoin.pairsWithin(rows.toDF("id", "name"), "id", "name", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expect = bruteK(rows, 3)
    assert(got == expect,
      s"diff: missing ${expect.diff(got).take(5)}, extra ${got.diff(expect).take(5)}")
  }

  test("pairsBetween: cross-table link == brute force at k=1,2,3, orientation kept") {
    import spark.implicits._
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(29)
    val alphabet = "abcd"
    // lengths 1..8 on both sides: short-short bucket and both segment
    // orientations (left longer / right longer) all get exercised at k=3
    val ls = (0 until 60).map(i =>
      i.toLong -> (0 until (1 + rnd.nextInt(8))).map(_ => alphabet(rnd.nextInt(4))).mkString)
    val rs = (0 until 60).map(i =>
      (1000 + i).toLong -> (0 until (1 + rnd.nextInt(8))).map(_ => alphabet(rnd.nextInt(4))).mkString)
    for (k <- Seq(1, 2, 3)) {
      val expect = (for {
        (il, sl) <- ls; (ir, sr) <- rs
        dist = lev(sl, sr) if dist <= k
      } yield (il, ir, dist)).toSet
      assert(expect.exists(_._3 == k), s"fixture must contain distance-$k links")
      val got = FuzzyJoin.pairsBetween(
        ls.toDF("id", "name"), "id", "name",
        rs.toDF("id", "name"), "id", "name", k = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == expect,
        s"k=$k diff: missing ${expect.diff(got).take(5)}, extra ${got.diff(expect).take(5)}")
    }
  }

  test("duplicate strings: pair set matches brute force; dist-0 groups fully expanded") {
    import spark.implicits._
    // 30 copies of one name + near variants: the collapse must re-expand every
    // within-group (dist 0) and cross-group pair a dup-oblivious join yields
    val rows = (0L until 30L).map(i => i -> "johnson") ++
      Seq(100L -> "jonson", 101L -> "johnsen", 102L -> "jhonson",
        103L -> "williams", 104L -> "willaims", 105L -> "williams")
    for (k <- Seq(1, 3)) {
      val got = FuzzyJoin.pairsWithin(rows.toDF("id", "name"), "id", "name", k = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val expect = bruteK(rows, k)
      assert(got == expect,
        s"k=$k diff: missing ${expect.diff(got).take(5)}, extra ${got.diff(expect).take(5)}")
      assert(got.count(_._3 == 0) >= 30 * 29 / 2, s"k=$k: within-group pairs missing")
    }
  }
}
