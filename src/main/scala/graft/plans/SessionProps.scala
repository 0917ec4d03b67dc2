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
  *                          (consumed by GraftCatalog; reference stats_mode)
  */
object SessionProps {
  val LimitKey = "graft.limit"
  val SamplingKey = "graft.sampling_value"
  val StatsModeKey = "graft.stats_mode"

  def limit(spark: SparkSession): Option[Int] =
    spark.conf.getOption(LimitKey).map(_.toInt).filter(_ >= 0)

  def samplingValue(spark: SparkSession): Option[Double] =
    spark.conf.getOption(SamplingKey).map(_.toDouble).filter(v => v > 0 && v <= 1)

  def statsEnabled(spark: SparkSession): Boolean =
    !spark.conf.getOption(StatsModeKey).contains("none")

  /** Apply session-property scan transforms to a freshly-read table. */
  def apply(spark: SparkSession, df: DataFrame): DataFrame = {
    val sampled = samplingValue(spark)
      .map(f => df.sample(withReplacement = false, f, seed = 42L)).getOrElse(df)
    limit(spark).map(sampled.limit).getOrElse(sampled)
  }
}
