package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy string self-join (entity resolution over names/titles/keys): all
  * pairs within edit distance 1, EXACTLY, via the FastSS deletion-neighborhood
  * scheme (Bocek et al. 2007): two strings are within one edit iff their
  * deletion neighborhoods (the string itself plus every single-character
  * deletion) intersect — substitutions meet at the both-sides deletion,
  * insertions at the longer side's deletion — so an equality join on
  * neighborhood hashes yields a candidate superset, and a final
  * `levenshtein <= 1` filter makes it exact. No quadratic comparison ever
  * forms.
  *
  * Scale shape: the neighborhood explode is narrow ((len+1)× row inflation of
  * just (id, string)); candidates come from one hash-partitioned equality
  * self-join on the 8-byte variant hash plus a pair-distinct exchange; the
  * edit-distance verify runs only on candidates. A shared variant is ~always
  * rare (names are near-unique), so reducers stay bounded; pathological
  * all-equal corpora degrade to the same pair blowup any exact-duplicate set
  * implies.
  */
object FuzzyJoin {

  def pairsWithin1(df: DataFrame, idCol: String, strCol: String): DataFrame =
    pairsWithin(df, idCol, strCol, k = 1)

  /** All pairs within edit distance `k` (k = 1 or 2), exact. Completeness of
    * the deletion blocking at k = 2: in an optimal alignment each side has at
    * most k positions where it differs (substituted, inserted, or deleted);
    * deleting exactly those positions from both sides yields a common string
    * in both depth-≤k deletion neighborhoods. The final levenshtein filter
    * removes the false candidates the (distance-≤2k) blocking admits.
    */
  def pairsWithin(df: DataFrame, idCol: String, strCol: String, k: Int): DataFrame = {
    require(k == 1 || k == 2,
      "deletion-neighborhood blocking is implemented for k = 1 or 2")
    val base = df.select(Keys.id(df, idCol).as("id"), col(strCol).as("s"))
    // d1 = all single deletions of s; d2 = all single deletions of each d1
    // member (= all unordered position pairs, with duplicates collapsed)
    val d1 = "transform(sequence(1, length(s)), " +
      "i -> concat(substring(s, 1, i - 1), substring(s, i + 1, length(s))))"
    val neighborhood =
      if (k == 1) s"array_distinct(concat(array(s), $d1))"
      else s"array_distinct(concat(array(s), $d1, " +
        s"flatten(transform($d1, v -> case when length(v) >= 1 then " +
        "transform(sequence(1, length(v)), " +
        "j -> concat(substring(v, 1, j - 1), substring(v, j + 1, length(v)))) " +
        "else cast(array() as array<string>) end))))"
    val variants = base.select(col("id"), col("s"),
      explode(expr(neighborhood)).as("v"))
      .select(col("id"), col("s"), xxhash64(col("v")).as("vh"))
    // verify BEFORE deduplicating: levenshtein on short strings is cheap CPU,
    // so re-checking a pair once per shared variant costs less than shuffling
    // every candidate's strings through a wide distinct — the final distinct
    // carries only surviving (id, id, dist) triples
    variants.as("x").join(variants.as("y"), "vh")
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        levenshtein(col("x.s"), col("y.s")).as("dist"))
      .filter(col("dist") <= k)
      .distinct()
  }
}
