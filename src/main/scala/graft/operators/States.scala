package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.hadoop.fs.Path

/** Persisted-state lifecycle for the rolling-crawl operators — the ONE
  * convention every incremental dedup/budget/frontier state follows, so a
  * crawl can run forever instead of for one proven round (r10 VERDICT #1).
  *
  * Every state is a parquet directory that only ever changes by:
  *
  *  1. `write`   — initial materialization (rename-swap: a crash leaves
  *                 either the old or the new state intact, never a mix);
  *  2. `append`  — each round's ADDITIONS land as new files (committer-
  *                 protected, so a crashed append leaves the prior state
  *                 readable);
  *  3. `retract` — takedowns/forced-recrawls append their KEYS to a
  *                 `.retracted` sidecar; the live view anti-joins the
  *                 sidecar out, so retraction is O(|retracted|) regardless
  *                 of state size and never rewrites the state;
  *  4. `compact` — periodically, the accumulated appends and retractions
  *                 are applied physically: the live view is rewritten into
  *                 a sibling directory and rename-swapped in (the
  *                 [[Similarity.ivfPqCompact]] contract), and the sidecar
  *                 cleared. `read` before and after compaction is
  *                 IDENTICAL — compaction only reclaims space and resets
  *                 the file count an append-friendly layout accumulates.
  *
  * The sidecar's columns ARE the retraction key: a fingerprint state
  * retracts by `fp` (content-keyed, the [[Dedup.exactRetract]] semantics),
  * a postings state by `doc_id` ([[Dedup.containmentRetract]]), a URL state
  * by `url_canon` ([[graft.operators.Urls.urlStateRetract]]). States that
  * merge by SUM rather than membership (the
  * [[Pipelines.tokenBudgetState]] per-domain spend) retract by appending
  * NEGATED rows to the state itself and pass a summing `merge` — the
  * anti-join sidecar is for membership semantics.
  *
  * Crash windows: `compact` computes survivors from the live view, writes
  * them fully, then swaps and finally drops the sidecar — a crash between
  * swap and sidecar delete re-applies retraction keys that no longer match
  * any row (an anti-join no-op), so every step is idempotent. This is why
  * no `_COMMITTED` marker is needed here, unlike the BM25 payload+stats
  * sidecar pair whose two files must move together.
  *
  * Scale shape: `read` adds ONE anti-join of the state against a
  * takedown-sized sidecar (AQE broadcasts it); `compact` costs one full
  * state rewrite — amortized across the rounds between compactions, the
  * same LSM discipline as [[Similarity.ivfPqCompact]] and
  * [[TextAnalysis.bm25IndexDelete]].
  */
object States {

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def retractedPath(dir: String) = new Path(s"$dir.retracted")

  /** Initial state materialization — rename-swap so re-initializing over a
    * live state is all-or-nothing.
    */
  def write(df: DataFrame, dir: String): Unit = {
    val spark = df.sparkSession
    val tmp = s"$dir.writing"
    df.write.mode("overwrite").parquet(tmp)
    val p = new Path(dir)
    val fs = fsOf(spark, p)
    if (fs.exists(p)) {
      val aside = new Path(s"$dir.old")
      if (fs.exists(aside)) fs.delete(aside, true)
      if (!fs.rename(p, aside))
        throw new java.io.IOException(s"state write: cannot move $dir aside")
      if (!fs.rename(new Path(tmp), p)) {
        fs.rename(aside, p) // roll back — the old state lives
        throw new java.io.IOException(s"state write: cannot swap $tmp in")
      }
      fs.delete(aside, true)
    } else if (!fs.rename(new Path(tmp), p))
      throw new java.io.IOException(s"state write: cannot move $tmp into place")
    // a fresh state carries no retractions
    fs.delete(retractedPath(dir), true)
  }

  /** Append one round's additions (or, for sum-merged states, its deltas —
    * including negated retraction rows).
    */
  def append(df: DataFrame, dir: String): Unit =
    df.write.mode("append").parquet(dir)

  /** Record retractions: append the retraction KEYS (column names must
    * match state columns — they become the anti-join key) to the sidecar.
    */
  def retract(keys: DataFrame, dir: String): Unit =
    keys.write.mode("append").parquet(s"$dir.retracted")

  /** The LIVE view: appended state minus the retraction sidecar, `merge`d
    * (identity for membership states whose consumers tolerate duplicate
    * rows; pass the per-key summing merge for spend-style states).
    */
  def read(spark: SparkSession, dir: String,
      merge: DataFrame => DataFrame = identity): DataFrame = {
    val st = spark.read.parquet(dir)
    val rp = retractedPath(dir)
    val live = if (fsOf(spark, rp).exists(rp)) {
      val r = spark.read.parquet(rp.toString)
      // reselect: the using-column join hoists key columns to the front,
      // and compact() rewrites read's output — the state's column order
      // must be stable across compactions
      st.join(r.distinct(), r.columns.toIndexedSeq, "left_anti")
        .select(st.columns.map(col).toIndexedSeq: _*)
    } else st
    merge(live)
  }

  /** Apply accumulated appends and retractions physically: rewrite the
    * live view (rename-swap) and clear the sidecar. `read` is invariant
    * under compaction; only the layout changes. Default merge `distinct`
    * reclaims re-appended membership rows; sum-merged states pass their
    * per-key aggregation.
    */
  def compact(spark: SparkSession, dir: String,
      merge: DataFrame => DataFrame = _.distinct()): Unit = {
    val tmp = s"$dir.compacting"
    read(spark, dir, merge).write.mode("overwrite").parquet(tmp)
    val p = new Path(dir)
    val fs = fsOf(spark, p)
    val old = new Path(s"$dir.old")
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(p, old))
      throw new java.io.IOException(s"state compact: cannot move $dir aside")
    if (!fs.rename(new Path(tmp), p)) {
      fs.rename(old, p) // roll back — the live state stays valid
      throw new java.io.IOException(s"state compact: cannot swap $tmp in")
    }
    fs.delete(old, true)
    // idempotent tail: keys already applied no longer match any row
    fs.delete(retractedPath(dir), true)
  }
}
