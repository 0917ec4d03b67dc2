package graft

import org.apache.spark.sql.functions._

import graft.operators.{BloomState, Dedup, TextAnalysis}
import graft.sources.Tables

/** Bloom-sidecar incremental dedup: the DuckDB oracle proves the result
  * equals plain incremental dedup on the fixture; these tests pin the
  * sidecar contract — no false negatives ever, equivalence even under an
  * adversarially bad fpp, O(batch) append ≡ one-shot build, and the
  * rename-swap leaving no debris.
  */
class BloomStateSpec extends SparkSpec {

  private def fps(lo: Long, hi: Long) =
    TextAnalysis.fingerprint(
      Tables(spark, sfDir, "documents")
        .filter(col("doc_id") >= lo && col("doc_id") < hi),
      "doc_id", "text")

  test("write/read roundtrip never false-negatives a state fingerprint") {
    val state = fps(0, 250)
    val path = "target/bloomspec_rt"
    BloomState.write(state, "fp", path, expectedItems = 1000L, fpp = 0.001)
    val bf = BloomState.read(spark, path)
    val all = state.select("fp").collect().map(_.getString(0))
    assert(all.nonEmpty)
    assert(all.forall(bf.mightContainString),
      "every state fingerprint must be (at least) a maybe")
  }

  test("exactIncrementalBloom equals exactIncremental, even at fpp 0.5") {
    val docs = Tables(spark, sfDir, "documents")
    val state = fps(0, 250)
    val batch = docs.filter(col("doc_id") >= 250)
    val plain = Dedup.exactIncremental(batch, "doc_id", "text", state)
      .collect().map(_.getLong(0)).toSet
    for ((fpp, tag) <- Seq(0.001 -> "tight", 0.5 -> "saturated")) {
      val path = s"target/bloomspec_eq_$tag"
      BloomState.write(state, "fp", path, expectedItems = 1000L, fpp = fpp)
      val fast = Dedup.exactIncrementalBloom(batch, "doc_id", "text",
        state, path).collect().map(_.getLong(0)).toSet
      assert(fast == plain,
        s"fpp=$fpp must not change the answer — false positives only " +
          "route extra rows to the exact check")
    }
  }

  test("append-built sidecar behaves exactly like a one-shot build") {
    val pRoll = "target/bloomspec_roll"
    val pShot = "target/bloomspec_shot"
    BloomState.write(fps(0, 150), "fp", pRoll, expectedItems = 1000L)
    BloomState.append(spark, pRoll, fps(150, 250), "fp")
    BloomState.write(fps(0, 250), "fp", pShot, expectedItems = 1000L)
    val state = fps(0, 250)
    val all = state.select("fp").collect().map(_.getString(0))
    val rolled = BloomState.read(spark, pRoll)
    assert(all.forall(rolled.mightContainString),
      "the appended sidecar must cover the whole state")
    val batch = Tables(spark, sfDir, "documents").filter(col("doc_id") >= 250)
    val a = Dedup.exactIncrementalBloom(batch, "doc_id", "text", state, pRoll)
      .collect().map(_.getLong(0)).toSet
    val b = Dedup.exactIncrementalBloom(batch, "doc_id", "text", state, pShot)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("re-write swaps cleanly: no .next/.old debris, old filter replaced") {
    val path = "target/bloomspec_swap"
    BloomState.write(fps(0, 100), "fp", path, expectedItems = 1000L)
    BloomState.write(fps(0, 250), "fp", path, expectedItems = 1000L)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(path)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path.next")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path.old")))
    val bf = BloomState.read(spark, path)
    val all = fps(0, 250).select("fp").collect().map(_.getString(0))
    assert(all.forall(bf.mightContainString))
  }

  test("a missing sidecar fails loudly, naming the remedy") {
    val e = intercept[IllegalArgumentException] {
      BloomState.read(spark, "target/bloomspec_absent")
    }
    assert(e.getMessage.contains("BloomState.write"))
  }
}
