package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{Tables, Writers}

/** Range-partitioned sorted output: the plan must use a range exchange (not a
  * single-partition global sort), and the files must come out globally
  * ordered — file N's max key <= file N+1's min key, each file internally
  * sorted. That property is what makes the layout merge-readable and zone-map
  * prunable at 100 TB.
  */
class WritersSpec extends SparkSpec {

  test("sortedParquet plans a range exchange and emits globally-ordered files") {
    val li = Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    val plan = li.repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Exchange rangepartitioning"),
      s"sorted write must range-partition, not globally sort:\n$plan")

    val out = Files.createTempDirectory("graft_sorted").toString
    Writers.sortedParquet(li, out, numFiles = 8, "l_orderkey")

    val parts = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    assert(parts.length > 1, "fixture must produce multiple files")
    val ranges = parts.map { f =>
      val r = spark.read.parquet(f.getPath)
        .agg(min("l_orderkey"), max("l_orderkey"), count(lit(1))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    ranges.sliding(2).foreach {
      case Array((_, max1, _), (min2, _, _)) =>
        assert(max1 <= min2, s"file ranges overlap: max $max1 > next min $min2")
      case _ =>
    }
    // each file internally sorted
    parts.take(2).foreach { f =>
      val keys = spark.read.parquet(f.getPath).select("l_orderkey")
        .collect().map(_.getLong(0))
      assert(keys.sameElements(keys.sorted), s"${f.getName} not internally sorted")
    }
  }
}
