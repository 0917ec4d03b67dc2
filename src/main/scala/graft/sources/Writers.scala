package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Output layout helpers (sink side of SURVEY.md §2 S10).
  *
  * `sortedParquet` produces a globally-ordered file set without a global
  * sort: `repartitionByRange` samples range bounds (one pass over a sample,
  * one range exchange), each partition then sorts locally, and files come out
  * ordered by partition index — file N's max key <= file N+1's min key. This
  * is the standard 100 TB layout for downstream merge reads and min/max
  * zone-map pruning; a single-node `orderBy.write` would funnel everything
  * through one task.
  */
object Writers {

  def sortedParquet(df: DataFrame, outDir: String, numFiles: Int,
      sortCols: String*): Unit = {
    require(numFiles >= 1 && sortCols.nonEmpty, "need numFiles >= 1 and sort columns")
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(outDir)
  }
}
