package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY.md §2.4 note; AQE's skew-join split
  * handles sort-merge skew post-shuffle, this handles it at plan time when the
  * hot keys are known or the join is hash-partitioned by a pathological key).
  *
  * Salted join: the left (large, skewed) side gets a uniform random salt in
  * [0, buckets); the right side is replicated `buckets` times. The join key
  * becomes (key, salt), spreading each hot key over `buckets` reducers. Cost:
  * right side × buckets — use for dimension-sized right sides only; results are
  * identical to the unsalted join.
  */
object Skew {

  def saltedJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      buckets: Int = 8, seed: Long = 42L): DataFrame = {
    require(buckets >= 1)
    val salted = left.withColumn("__salt",
      floor(rand(seed) * buckets).cast("int"))
    val replicated = right
      .withColumn("__salt", explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated,
        salted(leftKey) === replicated(rightKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
