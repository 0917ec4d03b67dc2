package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy string self-join (entity resolution over names/titles/keys): all
  * pairs within edit distance k, EXACTLY, with no quadratic comparison ever
  * forming.
  *
  * Two blocking schemes, both yielding a candidate superset that a final
  * `levenshtein <= k` filter makes exact:
  *
  *  - k <= 2: FastSS deletion neighborhoods (Bocek et al. 2007) — two strings
  *    are within one edit iff their deletion neighborhoods (the string plus
  *    every single-character deletion; depth 2 for k = 2) intersect, so an
  *    equality join on neighborhood hashes blocks candidates.
  *  - k >= 3: PassJoin-style segment blocking (Li, Deng, Feng 2011) — split
  *    each string into k+1 segments; if ed(s, t) <= k then (pigeonhole over an
  *    optimal alignment) at least one segment of s survives UNEDITED and
  *    appears verbatim in t, displaced by at most k positions. Candidates come
  *    from an equality join of per-string segments against per-string
  *    windowed substrings on (length, segment index, content). Deletion
  *    neighborhoods blow up combinatorially past k = 2 (O(len^k) variants);
  *    segments stay linear: k+1 segment rows and O(k^2) probe rows per string.
  *
  * EXACT-DUPLICATE COLLAPSE (both schemes): blocking runs over DISTINCT
  * strings only; pairs re-expand through equality joins on the string
  * afterwards (cross-group pairs inherit the representative distance,
  * within-group pairs are distance 0 by definition). On real corpora with
  * repeated names this bounds blocking-bucket width by the DISTINCT-string
  * count — m copies of one name cost m rows in one re-expansion join, never
  * m× wider candidate buckets.
  *
  * Scale shape: every stage is a narrow explode or a hash-partitioned
  * equality join (variant hash / segment key / exact string); the verify runs
  * only on candidates, before the pair-distinct so only surviving triples
  * shuffle wide. Strings shorter than k+1 chars cannot host k+1 non-empty
  * segments — but any two such strings are trivially within k edits, so they
  * meet in one constant-key bucket (tiny on real corpora: names shorter than
  * k+1 characters).
  */
object FuzzyJoin {

  def pairsWithin1(df: DataFrame, idCol: String, strCol: String): DataFrame =
    pairsWithin(df, idCol, strCol, k = 1)

  /** All pairs within edit distance `k`, exact. Output: (id_a, id_b, dist)
    * with id_a < id_b, each pair once.
    */
  def pairsWithin(df: DataFrame, idCol: String, strCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 8, "pairsWithin supports 1 <= k <= 8")
    val ids = df.select(Keys.id(df, idCol).as("id"), col(strCol).as("s"))
    // blocking over distinct strings only (see scaladoc); cached because the
    // candidate stage reads it from two join sides plus (k>=3) a short-string
    // bucket, and the distinct is an exchange worth paying once
    val reps = ids.select("s").distinct().cache()
    val repPairs = if (k <= 2) deletionPairs(reps, k) else segmentPairs(reps, k)
    // re-expand distinct-string pairs to id pairs: every id holding sa pairs
    // with every id holding sb (the pair set a dup-oblivious blocking would
    // have produced, at join cost proportional to the OUTPUT, not the blocks)
    val byStr = (a: String, i: String) =>
      ids.select(col("id").as(i), col("s").as(a))
    val cross = repPairs
      .join(byStr("sa", "ia"), "sa")
      .join(byStr("sb", "ib"), "sb")
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"), col("dist"))
    // ids sharing one exact string are distance 0 — a pair class the collapse
    // removed from the blocking and must restore explicitly
    val withinGroup = ids.as("x").join(ids.as("y"), "s")
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        lit(0).as("dist"))
    cross.unionByName(withinGroup)
  }

  /** FastSS deletion-neighborhood candidate pairs over distinct strings.
    * Completeness at k = 2: in an optimal alignment each side has at most k
    * positions where it differs; deleting exactly those positions from both
    * sides yields a common string in both depth-<=k neighborhoods.
    * Output: (sa, sb, dist), sa < sb, dist <= k, each string pair once.
    */
  private def deletionPairs(reps: DataFrame, k: Int): DataFrame = {
    val d1 = "transform(sequence(1, length(s)), " +
      "i -> concat(substring(s, 1, i - 1), substring(s, i + 1, length(s))))"
    val neighborhood =
      if (k == 1) s"array_distinct(concat(array(s), $d1))"
      else s"array_distinct(concat(array(s), $d1, " +
        s"flatten(transform($d1, v -> case when length(v) >= 1 then " +
        "transform(sequence(1, length(v)), " +
        "j -> concat(substring(v, 1, j - 1), substring(v, j + 1, length(v)))) " +
        "else cast(array() as array<string>) end))))"
    val variants = reps.select(col("s"), explode(expr(neighborhood)).as("v"))
      .select(col("s"), xxhash64(col("v")).as("vh"))
    // verify BEFORE deduplicating: levenshtein on short strings is cheap CPU,
    // so re-checking a pair once per shared variant costs less than shuffling
    // every candidate through a wide distinct — the final distinct carries
    // only surviving (sa, sb, dist) triples
    variants.as("x").join(variants.as("y"), "vh")
      .filter(col("x.s") < col("y.s"))
      .select(col("x.s").as("sa"), col("y.s").as("sb"),
        levenshtein(col("x.s"), col("y.s")).as("dist"))
      .filter(col("dist") <= k)
      .distinct()
  }

  /** PassJoin-style segment-blocking candidate pairs over distinct strings,
    * any k. Segment scheme for a string of length L: n = k+1 segments, the
    * first n - (L mod n) of length (L div n), the rest one longer — a pure
    * function of L both sides compute identically. One side explodes its own
    * segments keyed (L, i, content); the other generates, for every plausible
    * partner length L within +-k of its own and every i, its substrings of
    * the scheme's length at start positions within +-k of the scheme's start
    * (an unedited segment displaces by at most the k edits around it).
    * Both roles are complete supersets of the tight PassJoin windows; the
    * levenshtein verify makes the result exact.
    */
  private def segmentPairs(reps: DataFrame, k: Int): DataFrame = {
    val n = k + 1
    // segment geometry as SQL fragments of (L, i): all integer arithmetic
    def segLen(l: String, i: String) =
      s"(($l) div $n + (case when ($i) >= $n - (($l) % $n) then 1 else 0 end))"
    def segStart(l: String, i: String) =
      s"(($i) * (($l) div $n) + greatest(0, ($i) - ($n - (($l) % $n))))"
    // sequence(a, b) is DESCENDING when a > b (the Dedup.shingleArrayExpr
    // gotcha) — every range needs an emptiness guard
    def seqG(a: String, b: String) =
      s"(case when ($a) <= ($b) then sequence($a, $b) else array() end)"

    val segSide = reps.filter(length(col("s")) >= n)
      .select(col("s").as("sa"), explode(expr(
        s"transform(sequence(0, $k), i -> named_struct(" +
          s"'L', length(s), 'i', i, " +
          s"'seg', substring(s, ${segStart("length(s)", "i")} + 1, ${segLen("length(s)", "i")})))"))
        .as("b"))
      .select(col("sa"), col("b.L").as("L"), col("b.i").as("i"), col("b.seg").as("seg"))

    val probeSide = reps
      .select(col("s").as("sb"), explode(expr(
        s"flatten(transform(${seqG(s"greatest(length(s) - $k, $n)", s"length(s) + $k")}, L -> " +
          s"flatten(transform(sequence(0, $k), i -> " +
          s"transform(${seqG(s"greatest(0, ${segStart("L", "i")} - $k)",
            s"least(length(s) - ${segLen("L", "i")}, ${segStart("L", "i")} + $k)")}, " +
          s"p -> named_struct('L', L, 'i', i, " +
          s"'seg', substring(s, p + 1, ${segLen("L", "i")})))))))"))
        .as("b"))
      .select(col("sb"), col("b.L").as("L"), col("b.i").as("i"), col("b.seg").as("seg"))

    // normalize AFTER the join rather than filtering sa < sb: a pair with one
    // side shorter than k+1 is only ever discovered with the long string on
    // the segment side, so an orientation filter would drop half those pairs
    val segCand = segSide.join(probeSide, Seq("L", "i", "seg"))
      .filter(col("sa") =!= col("sb"))
      .select(least(col("sa"), col("sb")).as("sa"),
        greatest(col("sa"), col("sb")).as("sb"))

    // both strings shorter than k+1 ⇒ ed <= max length <= k always — block
    // them in one shared bucket. The key must be COLUMN-derived (always 0,
    // but not a literal): a lit(0) key constant-folds the equi-condition away
    // and the join degrades to BroadcastNestedLoopJoin
    val short = reps.filter(length(col("s")) < n)
      .withColumn("z", pmod(xxhash64(col("s")), lit(1)))
    val shortCand = short.as("x").join(short.as("y"), "z")
      .filter(col("x.s") < col("y.s"))
      .select(col("x.s").as("sa"), col("y.s").as("sb"))

    segCand.unionByName(shortCand)
      .select(col("sa"), col("sb"), levenshtein(col("sa"), col("sb")).as("dist"))
      .filter(col("dist") <= k)
      .distinct()
  }
}
