package graft.observability

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Query audit log (SURVEY.md §2.12 X5). The reference logs one record per
  * completed query — queryId, user, create/start/end times, CPU time, success
  * flag, error summary, escaped query text (trino/OkeraEventListener.java:26-67,
  * fields assembled at :43-53). Spark's `QueryExecutionListener` is the near-1:1
  * extension point: register on the session and every action-terminated query
  * lands here with its QueryExecution and duration.
  *
  * Records go to the log (one line of key=value pairs, like the reference's
  * logger.info at OkeraEventListener.java:66) and to a bounded in-memory ring
  * for tests/inspection.
  */
final case class AuditRecord(
    queryId: Long,
    user: String,
    startMs: Long,
    durationNs: Long,
    success: Boolean,
    error: Option[String],
    sql: String)

class AuditListener extends QueryExecutionListener {

  private val nextId = new AtomicLong(0L)
  private val ring = new ConcurrentLinkedQueue[AuditRecord]()
  private val maxRing = 1000

  def records: Seq[AuditRecord] = ring.asScala.toSeq
  def clear(): Unit = ring.clear()

  private def record(qe: QueryExecution, durationNs: Long, error: Option[Throwable]): Unit = {
    // audit the effective (possibly delegated) user like the reference's
    // context.user; fall back to the authenticated principal on delegation errors
    val effectiveUser =
      try graft.plans.Users.current(qe.sparkSession)
      catch { case _: SecurityException => qe.sparkSession.sparkContext.sparkUser }
    val r = AuditRecord(
      queryId = nextId.getAndIncrement(),
      user = effectiveUser,
      startMs = System.currentTimeMillis() - durationNs / 1000000L,
      durationNs = durationNs,
      success = error.isEmpty,
      error = error.map(e => e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage)),
      // the analyzed plan is the faithful "query text" for DataFrame-built plans;
      // the reference escapes raw SQL (OkeraEventListener.java:58-64) — same
      // intent. Rendering is BOUNDED: a full toString of a large plan (e.g. an
      // iterative algorithm's unrolled lineage) costs seconds per action and
      // turned this listener into the slowest operator in the bench
      sql = boundedPlanString(qe))
    ring.add(r)
    while (ring.size() > maxRing) ring.poll()
    val status = if (r.success) "success" else "error"
    AuditListener.log.info(
      s"audit queryId=${r.queryId} user=${r.user} startMs=${r.startMs} " +
        s"durationNs=${r.durationNs} status=$status error=${r.error.getOrElse("-")}")
  }

  /** First ~2 KiB of the analyzed plan tree, aborting the tree walk once the
    * budget is hit — cost is O(budget), not O(plan size).
    */
  private def boundedPlanString(qe: QueryExecution): String = {
    val limit = 2048
    val sb = new java.lang.StringBuilder(limit + 64)
    object Full extends RuntimeException with scala.util.control.NoStackTrace
    try qe.analyzed.treeString(
      (s: String) => { if (sb.length < limit) sb.append(s) else throw Full },
      verbose = false, addSuffix = false, maxFields = 10, printOperatorId = false,
      printOutputColumns = false)
    catch { case Full => () }
    sb.toString.replaceAll("\\s+", " ").take(limit)
  }

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    record(qe, durationNs, None)

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = {
    // Spark passes no duration on the error path; recover the true start from
    // the planning tracker (earliest recorded phase) so failed queries carry a
    // real duration like the reference's create/start/end times for errors
    // (trino/OkeraEventListener.java:43-53)
    val now = System.currentTimeMillis()
    val startMs = qe.tracker.phases.values.map(_.startTimeMs)
      .minOption.getOrElse(now)
    record(qe, (now - startMs) * 1000000L, Some(exception))
  }
}

object AuditListener {
  private val log = org.slf4j.LoggerFactory.getLogger(classOf[AuditListener])

  /** Install a listener on the session and return it (for record inspection). */
  def install(spark: SparkSession): AuditListener = {
    val l = new AuditListener
    spark.listenerManager.register(l)
    l
  }
}
