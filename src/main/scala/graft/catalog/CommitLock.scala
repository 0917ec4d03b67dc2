package graft.catalog

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Concurrent-writer guard for REPLACING commits on plain (non-snapshot)
  * tables (r13 VERDICT ask #8): two simultaneous overwrites/merges into
  * one table used to race their aside renames — last rename wins and the
  * first writer's output is silently retired. A create-exclusive lock file
  * beside the table (`.commitlock-<table>`) turns the race into a loud
  * refusal.
  *
  * Stale-lock recovery: a crashed writer leaves its lock behind; a lock
  * older than `graft.commit_lock_ttl_ms` (default 10 min) is broken and
  * re-claimed — the breaker still goes through create-exclusive, so two
  * breakers cannot both win. Snapshot tables don't need this: their
  * manifest claim IS the commit point (optimistic concurrency,
  * [[Snapshots.commit]]). Same caveat as every file-based protocol:
  * create-exclusive is atomic on local/HDFS, best-effort on S3-class
  * stores.
  *
  * The lock covers only the COMMIT section (the renames), never the data
  * write — staging writes are uuid-isolated and safely concurrent, so a
  * long-running job holds the lock for milliseconds.
  */
object CommitLock {

  val TtlKey = "graft.commit_lock_ttl_ms"

  def withLock[T](fs: FileSystem, parent: Path, table: String)(body: => T): T = {
    val ttl = SparkSession.active.conf.getOption(TtlKey)
      .flatMap(_.toLongOption).getOrElse(600000L)
    val lock = new Path(parent, s".commitlock-$table")
    def tryAcquire(): Boolean =
      try {
        val out = fs.create(lock, false)
        try out.write(System.currentTimeMillis().toString.getBytes("UTF-8"))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    var acquired = tryAcquire()
    if (!acquired) {
      val stale =
        try System.currentTimeMillis() -
          fs.getFileStatus(lock).getModificationTime > ttl
        catch { case _: Exception => true } // lock vanished: just retry
      if (stale) {
        fs.delete(lock, false)
        acquired = tryAcquire()
      }
    }
    if (!acquired)
      throw new IllegalStateException(
        s"concurrent replacing commit on $table in progress ($lock held; " +
          s"breaks as stale after $ttl ms — $TtlKey)")
    try body finally fs.delete(lock, false)
  }
}
