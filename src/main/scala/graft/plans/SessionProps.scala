package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session properties (SURVEY.md §2.12 X1). The reference exposes per-session
  * knobs consumed at plan/scan time — `limit`, `sampling_value`, `stats_mode`,
  * `max_tasks` (trino/RecordServiceSessionProperties.java:25-64, consumed at
  * trino/RecordServiceSplitManagerImpl.java:270-281 and
  * trino/RecordServiceConfig.java:404-456). Spark-native equivalent: runtime
  * `spark.conf` keys applied to every governed scan via `apply`.
  *
  *   graft.limit          — per-scan row limit (reference: per-task limit L1;
  *                          Spark's LocalLimit is likewise applied per partition
  *                          before the global trim)
  *   graft.sampling_value — fraction in (0, 1]: row-sampling approximation of the
  *                          reference's byte-based sampled catalogs (S8)
  *   graft.stats_mode     — "none" suppresses footer row-count statistics
  *                          (consumed by GraftStatsScan.estimateStatistics;
  *                          reference stats_mode)
  */
object SessionProps {
  val LimitKey = "graft.limit"
  val SamplingKey = "graft.sampling_value"
  val SamplingBytesKey = "graft.sampling_bytes"
  val StatsModeKey = "graft.stats_mode"

  def limit(spark: SparkSession): Option[Int] =
    spark.conf.getOption(LimitKey).map(_.toInt).filter(_ >= 0)

  def samplingValue(spark: SparkSession): Option[Double] =
    spark.conf.getOption(SamplingKey).map(_.toDouble).filter(v => v > 0 && v <= 1)

  def samplingBytes(spark: SparkSession): Option[Long] =
    spark.conf.getOption(SamplingBytesKey).map(_.toLong).filter(_ > 0)

  def statsEnabled(spark: SparkSession): Boolean =
    !spark.conf.getOption(StatsModeKey).contains("none")

  /** Storage-partitioned joins are DOUBLE opt-in (the Iceberg
    * `preserve-data-grouping` pattern): Spark's own
    * `spark.sql.sources.v2.bucketing.enabled` defaults to true in 4.x, so
    * gating on it alone would silently switch EVERY partitioned scan to
    * one-task-per-partition-value — a parallelism cliff for ordinary
    * scans. `graft.spj` says "my partition values are sized for per-value
    * tasks; trade split balance for shuffle-free co-partitioned joins".
    */
  val SpjKey = "graft.spj"

  def spjEnabled(spark: SparkSession): Boolean =
    spark.conf.getOption(SpjKey).contains("true")

  /** Apply session-property scan transforms to a freshly-read table.
    * `tableBytes` (when known) enables byte-budget sampling: the reference's
    * sampled catalogs cap the bytes a scan may read
    * (okera_sampled_10mb/okera_sampled_100mb, trino/RecordServicePlugin.java:63-65,
    * trino/RecordServiceConfig.java:404-422); here the byte budget converts to
    * a row fraction via the table's on-disk size.
    */
  def apply(spark: SparkSession, df: DataFrame, tableBytes: => Option[Long] = None): DataFrame = {
    val byteFraction = samplingBytes(spark).flatMap { budget =>
      tableBytes.filter(_ > 0).map(total => math.min(1.0, budget.toDouble / total))
    }
    val fraction = (samplingValue(spark), byteFraction) match {
      case (Some(a), Some(b)) => Some(math.min(a, b))
      case (a, b) => a.orElse(b)
    }
    val sampled = fraction.filter(_ < 1.0)
      .map(f => df.sample(withReplacement = false, f, seed = 42L)).getOrElse(df)
    limit(spark).map(sampled.limit).getOrElse(sampled)
  }
}
