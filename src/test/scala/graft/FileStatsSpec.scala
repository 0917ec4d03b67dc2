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
  test("string collation: UTF-8 byte order, not UTF-16 code units (r14 wrong-item #1)") {
    // parquet footer min/max order strings by unsigned UTF-8 bytes, which is
    // code-point order: a supplementary-plane char (U+10000) sorts ABOVE
    // U+E000..U+FFFF. UTF-16 code units order them the other way around —
    // the r14 shape would PROVE such a key out of range and a DELETE would
    // silently skip its file (the exact silent-miss class the file-group
    // firewall exists to prevent).
    val supp = new String(Character.toChars(0x10000))
    // real footer order: min = U+E000-string (EE 80 80), max = supp (F0 90..)
    val st = strs("\ue000a", supp + "z")
    assert(FileStats.mightMatch(sources.EqualTo("s", supp + "m"), st),
      "a supplementary-plane key inside [min,max] must keep the file")
    assert(FileStats.mightMatch(sources.GreaterThanOrEqual("s", supp), st))
    assert(!FileStats.mightMatch(sources.GreaterThan("s", supp + "z"), st))
    // U+D7FF sorts below U+E000 in BOTH orders: provably absent stays provable
    assert(!FileStats.mightMatch(sources.EqualTo("s", "\ud7ffq"), st))

    // prefix proof under byte order: max is a supplementary string, so the
    // file CAN hold U+E000-prefixed keys (UTF-16 said max < prefix: excluded)
    assert(FileStats.mightMatch(sources.StringStartsWith("s", "\ue000"), st))

    // the successor increments CODE POINTS and skips the surrogate gap: a
    // last-char-U+D7FF prefix must not produce a lone-surrogate bound
    // (which UTF-8-encodes as a replacement char and breaks the range)
    val st2 = strs("a\ud7ff0", "a\ud7ffz")
    assert(FileStats.mightMatch(sources.StringStartsWith("s", "a\ud7ff"), st2),
      "files of prefix-matching strings must stay candidates")
    // and a genuinely-out-of-range file is still provably excludable
    assert(!FileStats.mightMatch(sources.StringStartsWith("s", "a\ud7ff"),
      strs("a0", "az")))
  }
}
