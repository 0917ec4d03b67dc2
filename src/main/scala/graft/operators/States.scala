package graft.operators

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Persisted-state lifecycle for the rolling-crawl operators — the ONE
  * convention every incremental dedup/budget/frontier state follows, so a
  * crawl can run forever instead of for one proven round (r10 VERDICT #1).
  *
  * Every state is a parquet directory that only ever changes by:
  *
  *  1. `write`   — initial materialization (marker-commit: a crash leaves
  *                 either the old or the new state live, never a mix and
  *                 never an absent state);
  *  2. `append`  — each round's ADDITIONS land as new files in the live
  *                 generation (committer-protected, so a crashed append
  *                 leaves the prior state readable);
  *  3. `retract` — takedowns/forced-recrawls append their KEYS to the live
  *                 generation's retraction sidecar; the live view anti-joins
  *                 the sidecar out, so retraction is O(|retracted|)
  *                 regardless of state size and never rewrites the state;
  *  4. `compact` — periodically, the accumulated appends and retractions
  *                 are applied physically: the live view is rewritten into
  *                 a NEW generation and committed by one atomic marker
  *                 create. `read` before and after compaction is IDENTICAL
  *                 — compaction only reclaims space and resets the file
  *                 count an append-friendly layout accumulates.
  *
  * == On-disk layout (the atomic-commit contract) ==
  *
  * The r11 layout swapped the state directory itself with two renames,
  * leaving a crash window where the path was ABSENT (readers threw) and the
  * old data survived only under an invisible `.old` aside. This layout
  * closes that window (r11 VERDICT ask #5) with a pointer-style commit:
  *
  * {{{
  *   <dir>/gen-<seq>-<uuid>/           generation data (parquet part files)
  *   <dir>/_commit-<seq>-<uuid>        empty marker; its CREATE is the commit
  *   <dir>/_retracted-gen-<seq>-<uuid>/ that generation's retraction sidecar
  * }}}
  *
  * The LIVE generation is the highest-(seq, uuid) marker whose `gen-` dir
  * exists. `write`/`compact` fully materialize the new generation FIRST,
  * then commit it with one `FileSystem.create(marker, overwrite = false)` —
  * atomic on local FS and HDFS. A kill at ANY instant leaves either (a) no
  * new marker — the old generation is still live and a later write sweeps
  * the orphaned `gen-` debris — or (b) the new marker — the new generation
  * is live and stale generations are swept best-effort. A reader never sees
  * a missing or mixed state (RetirementSpec simulates both kill points).
  *
  * The sidecar is PER-GENERATION, so a fresh `write` starts retraction-free
  * by construction (no delete-ordering window), and `compact` snapshots the
  * sidecar file list it folds in: retraction files that appear AFTER the
  * snapshot (a concurrent `retract` violating the documented single-writer
  * lifecycle) are carried forward into the new generation's sidecar instead
  * of being silently dropped (r11 ADVICE).
  *
  * == Concurrency contract ==
  *
  * The lifecycle is SINGLE-WRITER, sequential (the crawl-loop driver):
  * `append`/`retract`/`compact` must not race each other. `read` is safe
  * against a concurrent commit (it resolves a marker whose data is already
  * fully written) — but a DataFrame held across a later `compact` must be
  * materialized (`localCheckpoint`) first, since compaction deletes the old
  * generation's files after committing the new one.
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
  * Scale shape: `read` adds ONE anti-join of the state against a
  * takedown-sized sidecar (AQE broadcasts it); `compact` costs one full
  * state rewrite — amortized across the rounds between compactions, the
  * same LSM discipline as [[Similarity.ivfPqCompact]] and
  * [[TextAnalysis.bm25IndexDelete]].
  */
object States {

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private val MarkerRe = "_commit-(\\d+)-([0-9a-f]+)".r

  /** One committed generation: ordering key + its paths inside `dir`. */
  private case class Gen(seq: Long, uuid: String, dir: Path) {
    def genPath: Path = new Path(dir, s"gen-$seq-$uuid")
    def markerPath: Path = new Path(dir, s"_commit-$seq-$uuid")
    def sidecarPath: Path = new Path(dir, s"_retracted-gen-$seq-$uuid")
  }

  /** All committed generations whose data dir exists, oldest → newest. */
  private def committed(spark: SparkSession, dir: String): Seq[Gen] = {
    val p = new Path(dir)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).toSeq.flatMap { st =>
      st.getPath.getName match {
        case MarkerRe(seq, uuid) =>
          val g = Gen(seq.toLong, uuid, p)
          if (fs.exists(g.genPath)) Some(g) else None
        case _ => None
      }
    }.sortBy(g => (g.seq, g.uuid))
  }

  private def live(spark: SparkSession, dir: String): Option[Gen] =
    committed(spark, dir).lastOption

  /** Live data path for WRITES (append target): committed generation, or the
    * directory itself for a pre-layout state (plain part files written before
    * this convention).
    */
  private def livePath(spark: SparkSession, dir: String): String =
    live(spark, dir).map(_.genPath.toString).getOrElse(dir)

  /** Live data paths for READS. With a committed generation this is that
    * generation's directory. Without one, the fallback must NOT be the state
    * directory itself: a crash after a first-generation write fully
    * materializes `gen-0-<uuid>` but before the marker create, and a
    * recursive directory read would surface that UNCOMMITTED generation
    * (violating the "no marker ⇒ invisible" contract). Instead, only the
    * pre-layout ROOT part files are live — listed explicitly, the same
    * discipline as [[sidecarFiles]]. A state with no marker and no root part
    * files has no committed content at all: refuse loudly rather than read
    * debris.
    */
  private def liveReadPaths(spark: SparkSession, dir: String): Seq[String] =
    live(spark, dir) match {
      case Some(g) => Seq(g.genPath.toString)
      case None =>
        val p = new Path(dir)
        val fs = fsOf(spark, p)
        // absent dir: defer to spark.read's own path-not-found error
        if (!fs.exists(p)) return Seq(dir)
        val rootFiles = fs.listStatus(p).toSeq
          .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
            !st.getPath.getName.startsWith("."))
          .map(_.getPath.toString)
        if (rootFiles.isEmpty)
          throw new IllegalStateException(
            s"state at $dir has no committed generation (a crashed first " +
              "write leaves only uncommitted gen-* debris — re-run write)")
        rootFiles
    }

  private def sidecarPathFor(spark: SparkSession, dir: String): Path =
    live(spark, dir).map(_.sidecarPath).getOrElse(new Path(s"$dir.retracted"))

  /** Commit a fully-written generation: one atomic marker create. */
  private def commitMarker(spark: SparkSession, g: Gen): Unit = {
    val fs = fsOf(spark, g.markerPath)
    fs.create(g.markerPath, false).close()
  }

  /** Best-effort sweep of everything that is not the live generation:
    * superseded generations (marker first, so a crash mid-sweep never
    * leaves a marker pointing at deleted data), orphaned uncommitted
    * `gen-` dirs, and pre-layout root part files. Never throws.
    */
  private def sweep(spark: SparkSession, dir: String, keep: Gen): Unit =
    try {
      val p = new Path(dir)
      val fs = fsOf(spark, p)
      val keepNames = Set(keep.genPath.getName, keep.markerPath.getName,
        keep.sidecarPath.getName)
      fs.listStatus(p).foreach { st: FileStatus =>
        val n = st.getPath.getName
        val stale =
          (n.startsWith("gen-") || n.startsWith("_commit-") ||
            n.startsWith("_retracted-gen-")) && !keepNames(n) ||
          // pre-layout debris: ONLY parquet-writer-shaped root files
          // (part-*.parquet). The dir is documented as States-owned, but a
          // mis-pointed `dir` must not silently lose arbitrary files
          // (r12 VERDICT residual #2) — anything unrecognized stays put.
          (st.isFile && n.startsWith("part-") && n.endsWith(".parquet"))
        if (stale) fs.delete(st.getPath, true)
      }
      // pre-layout sibling sidecar
      fs.delete(new Path(s"$dir.retracted"), true)
    } catch { case _: java.io.IOException => () }

  private def nextGen(spark: SparkSession, dir: String): Gen = {
    val seq = committed(spark, dir).lastOption.map(_.seq + 1).getOrElse(0L)
    Gen(seq, java.util.UUID.randomUUID().toString.replace("-", "").take(8),
      new Path(dir))
  }

  /** Initial state materialization — write the generation fully, then one
    * atomic marker create commits it; re-initializing over a live state is
    * all-or-nothing and the state path is never absent. The new generation
    * carries no retractions by construction (per-generation sidecar).
    */
  def write(df: DataFrame, dir: String): Unit = {
    val spark = df.sparkSession
    fsOf(spark, new Path(dir)).mkdirs(new Path(dir))
    val g = nextGen(spark, dir)
    df.write.mode("overwrite").parquet(g.genPath.toString)
    commitMarker(spark, g)
    sweep(spark, dir, g)
  }

  /** Append one round's additions (or, for sum-merged states, its deltas —
    * including negated retraction rows) to the live generation.
    */
  def append(df: DataFrame, dir: String): Unit =
    df.write.mode("append").parquet(livePath(df.sparkSession, dir))

  /** Record retractions: append the retraction KEYS (column names must
    * match state columns — they become the anti-join key) to the live
    * generation's sidecar.
    */
  def retract(keys: DataFrame, dir: String): Unit =
    keys.write.mode("append")
      .parquet(sidecarPathFor(keys.sparkSession, dir).toString)

  /** The live view over explicit data/sidecar paths. */
  private def readPaths(spark: SparkSession, dataPaths: Seq[String],
      sidecarFiles: Seq[String], merge: DataFrame => DataFrame): DataFrame = {
    val st = spark.read.parquet(dataPaths: _*)
    val liveView = if (sidecarFiles.nonEmpty) {
      val r = spark.read.parquet(sidecarFiles: _*)
      // reselect: the using-column join hoists key columns to the front,
      // and compact() rewrites read's output — the state's column order
      // must be stable across compactions
      st.join(r.distinct(), r.columns.toIndexedSeq, "left_anti")
        .select(st.columns.map(col).toIndexedSeq: _*)
    } else st
    merge(liveView)
  }

  private def sidecarFiles(spark: SparkSession, sidecar: Path): Seq[String] = {
    val fs = fsOf(spark, sidecar)
    if (!fs.exists(sidecar)) Nil
    else fs.listStatus(sidecar).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .map(_.getPath.toString)
  }

  /** The LIVE view: appended state minus the retraction sidecar, `merge`d
    * (identity for membership states whose consumers tolerate duplicate
    * rows; pass the per-key summing merge for spend-style states).
    */
  def read(spark: SparkSession, dir: String,
      merge: DataFrame => DataFrame = identity): DataFrame =
    readPaths(spark, liveReadPaths(spark, dir),
      sidecarFiles(spark, sidecarPathFor(spark, dir)), merge)

  /** Apply accumulated appends and retractions physically: rewrite the
    * live view into a NEW generation and commit it with one atomic marker
    * create. `read` is invariant under compaction; only the layout changes.
    * Default merge `distinct` reclaims re-appended membership rows;
    * sum-merged states pass their per-key aggregation.
    *
    * The sidecar file list is SNAPSHOTTED before the compaction read:
    * retraction files that land between the snapshot and the commit (a
    * concurrent `retract` outside the documented single-writer lifecycle)
    * are moved into the new generation's sidecar rather than dropped.
    */
  def compact(spark: SparkSession, dir: String,
      merge: DataFrame => DataFrame = _.distinct()): Unit = {
    val srcSidecar = sidecarPathFor(spark, dir)
    val snapshot = sidecarFiles(spark, srcSidecar)
    val g = nextGen(spark, dir)
    readPaths(spark, liveReadPaths(spark, dir), snapshot, merge)
      .write.mode("overwrite").parquet(g.genPath.toString)
    commitMarker(spark, g)
    // late retractions (post-snapshot) carry forward to the new generation
    val late = sidecarFiles(spark, srcSidecar).toSet -- snapshot
    if (late.nonEmpty) {
      val fs = fsOf(spark, g.sidecarPath)
      fs.mkdirs(g.sidecarPath)
      late.foreach { f =>
        val src = new Path(f)
        fs.rename(src, new Path(g.sidecarPath, src.getName))
      }
    }
    sweep(spark, dir, g)
  }
}
