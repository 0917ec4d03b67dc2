package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-profiling utilities for corpus curation: cheap distribution summaries
  * a pipeline runs before choosing thresholds (quality cutoffs, packing
  * lengths, sampling rates).
  */
object Profiling {

  /** Equi-width histogram with EXPLICIT bounds: bucket i covers
    * [lo + i·w, lo + (i+1)·w) for w = (hi - lo)/n, out-of-range values clamp
    * into the edge buckets, and null / NaN values surface as their own
    * buckets -1 / -2 so the profile is a total account of the column in
    * ONE scan. Explicit bounds rather than a data min/max pre-pass keep the
    * operator a single narrow pass + one tiny map-side-combined groupBy — at
    * 100 TB a min/max pre-pass would double the read, and profile bounds are
    * usually known (or taken from a previous profile).
    *
    * The bucket index is `floor((x - lo) · n / (hi - lo))` computed in that
    * exact operation order — single IEEE ops, so an external engine
    * reproduces the bucketing bit-for-bit (same reasoning as
    * [[Semantic.assignCells]]'s quantization).
    */
  def histogram(df: DataFrame, valueCol: String,
      lo: Double, hi: Double, n: Int): DataFrame = {
    require(n >= 1 && hi > lo, "need n >= 1 and hi > lo")
    val x = col(valueCol).cast("double")
    // NaN gets its own bucket like null: clamped into bucket 0 it would
    // inflate the lowest bin AND poison its min/max (engines also disagree
    // on NaN ordering inside min/max, breaking the oracle contract)
    val bucket = when(x.isNull, lit(-1)).when(isnan(x), lit(-2)).otherwise(
      least(lit(n - 1), greatest(lit(0),
        floor((x - lit(lo)) * lit(n.toDouble) / lit(hi - lo)).cast("int"))))
    df.select(bucket.as("bucket"), x.as("x"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        round(min(col("x")), 4).as("x_min"),
        round(max(col("x")), 4).as("x_max"))
  }
}
