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

  private def brute2(rows: Seq[(Long, String)]): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      dist = lev(sa, sb) if dist <= 2
    } yield (ia, ib, dist)).toSet
  }
}
