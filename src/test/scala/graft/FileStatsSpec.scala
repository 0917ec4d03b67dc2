package graft

import org.apache.spark.sql.sources
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.FileStats
import graft.catalog.FileStats.ColStats

/** Unit grid for the footer-stats candidacy logic behind FILE-granularity
  * row-level DML (catalog/FileStats.scala). The safety direction is fixed:
  * `mightMatch` may only answer FALSE when the stats PROVE no row of the
  * file satisfies the filter — a wrong FALSE silently drops a file whose
  * rows had to be rewritten (the r13 wave-2 data-loss class), a wrong TRUE
  * merely rewrites an extra file. Every unknown therefore answers true.
  */
class FileStatsSpec extends AnyFunSuite {

  private def ints(mn: Int, mx: Int, nulls: Boolean = false) =
    Map("id" -> ColStats(Some(Int.box(mn)), Some(Int.box(mx)), nulls, false))
  private def strs(mn: String, mx: String) =
    Map("s" -> ColStats(Some(mn), Some(mx), false, false))
  private val allNull =
    Map("id" -> ColStats(None, None, true, true))
  private val unknown = Map.empty[String, ColStats]

  test("equality prunes outside [min,max], keeps inside, keeps unknowns") {
    assert(!FileStats.mightMatch(sources.EqualTo("id", 55), ints(0, 9)))
    assert(FileStats.mightMatch(sources.EqualTo("id", 5), ints(0, 9)))
    assert(FileStats.mightMatch(sources.EqualTo("id", 0), ints(0, 9)))
    assert(FileStats.mightMatch(sources.EqualTo("id", 9), ints(0, 9)))
    assert(FileStats.mightMatch(sources.EqualTo("id", 55), unknown))
    // numeric widening: a long literal against int stats still compares
    assert(!FileStats.mightMatch(sources.EqualTo("id", 55L), ints(0, 9)))
    // case-insensitive column binding
    assert(!FileStats.mightMatch(sources.EqualTo("ID", 55), ints(0, 9)))
  }

  test("null semantics: EqualTo(null) matches nothing; null-safe and IsNull track hasNulls") {
    assert(!FileStats.mightMatch(sources.EqualTo("id", null), ints(0, 9, nulls = true)))
    assert(FileStats.mightMatch(sources.EqualNullSafe("id", null), ints(0, 9, nulls = true)))
    assert(!FileStats.mightMatch(sources.EqualNullSafe("id", null), ints(0, 9)))
    assert(FileStats.mightMatch(sources.IsNull("id"), ints(0, 9, nulls = true)))
    assert(!FileStats.mightMatch(sources.IsNull("id"), ints(0, 9)))
    assert(!FileStats.mightMatch(sources.IsNotNull("id"), allNull))
    assert(FileStats.mightMatch(sources.IsNotNull("id"), ints(0, 9)))
    // an all-null column can't satisfy any value predicate
    assert(!FileStats.mightMatch(sources.EqualTo("id", 5), allNull))
    assert(!FileStats.mightMatch(sources.GreaterThan("id", 5), allNull))
  }

  test("ranges: strict/inclusive bounds against min/max") {
    assert(FileStats.mightMatch(sources.GreaterThan("id", 8), ints(0, 9)))
    assert(!FileStats.mightMatch(sources.GreaterThan("id", 9), ints(0, 9)))
    assert(FileStats.mightMatch(sources.GreaterThanOrEqual("id", 9), ints(0, 9)))
    assert(!FileStats.mightMatch(sources.GreaterThanOrEqual("id", 10), ints(0, 9)))
    assert(FileStats.mightMatch(sources.LessThan("id", 1), ints(0, 9)))
    assert(!FileStats.mightMatch(sources.LessThan("id", 0), ints(0, 9)))
    assert(FileStats.mightMatch(sources.LessThanOrEqual("id", 0), ints(0, 9)))
    assert(!FileStats.mightMatch(sources.LessThanOrEqual("id", -1), ints(0, 9)))
  }

  test("IN keeps the file iff any non-null value lands in range") {
    assert(FileStats.mightMatch(sources.In("id", Array[Any](55, 7)), ints(0, 9)))
    assert(!FileStats.mightMatch(sources.In("id", Array[Any](55, 77)), ints(0, 9)))
    assert(!FileStats.mightMatch(sources.In("id", Array[Any](null)), ints(0, 9, nulls = true)))
  }

  test("boolean composition: And prunes on either side, Or needs both, Not stays conservative") {
    val f = ints(0, 9)
    assert(!FileStats.mightMatch(
      sources.And(sources.EqualTo("id", 5), sources.EqualTo("id", 55)), f))
    assert(FileStats.mightMatch(
      sources.Or(sources.EqualTo("id", 5), sources.EqualTo("id", 55)), f))
    assert(!FileStats.mightMatch(
      sources.Or(sources.EqualTo("id", 50), sources.EqualTo("id", 55)), f))
    // general Not cannot use interval logic — must stay true
    assert(FileStats.mightMatch(sources.Not(sources.EqualTo("id", 5)), f))
    // except the null-test rewrites
    assert(!FileStats.mightMatch(sources.Not(sources.IsNotNull("id")), f))
  }

  test("string prefix: p <= s < successor(p)") {
    assert(FileStats.mightMatch(sources.StringStartsWith("s", "m"), strs("alpha", "zeta")))
    assert(!FileStats.mightMatch(sources.StringStartsWith("s", "z"), strs("alpha", "beta")))
    assert(!FileStats.mightMatch(sources.StringStartsWith("s", "a"), strs("beta", "zeta")))
    // boundary: min IS a p-prefixed string
    assert(FileStats.mightMatch(sources.StringStartsWith("s", "be"), strs("beta", "zeta")))
    // max < prefix is a legitimate proof even for unincrementable prefixes
    assert(!FileStats.mightMatch(sources.StringStartsWith("s", "\uffff"), strs("alpha", "beta")))
    // \u2026but when the range could reach it, no successor exists \u2192 conservative
    assert(FileStats.mightMatch(
      sources.StringStartsWith("s", "\uffff"), strs("alpha", "\uffff\uffff")))
  }

  test("unknown shapes and types never prune") {
    assert(FileStats.mightMatch(sources.StringContains("s", "x"), strs("a", "b")))
    assert(FileStats.mightMatch(sources.EqualTo("other", 5), ints(0, 9)))
  }
}
