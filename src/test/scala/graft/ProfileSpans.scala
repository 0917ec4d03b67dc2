package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: span-op A/B on the two adversarial corpus shapes —
  *  §2 hot span (mostly-DISTINCT docs, one shared 10-token span in every
  *     20th doc): the shape the pre-collapse plan was tuned for; the
  *     narrow-row collapse must not tax it;
  *  §8 clone flood (90% of docs ONE verbatim page): the crawl shape the
  *     collapse exists for; must run ~flat vs the distinct tail.
  * sbt "Test/runMain graft.ProfileSpans [nDoc]"
  */
object ProfileSpans {
  /** The pre-collapse (round-8) shape, inlined for A/B on the same box. */
  private def removeDuplicateSpansOld(docs: org.apache.spark.sql.DataFrame,
      w: Int, minCount: Int): org.apache.spark.sql.DataFrame = {
    val words = docs.select(col("doc_id"),
      filter(split(lower(coalesce(col("text"), lit(""))), "\\s+"),
        x => length(x) > 0).as("ws"))
    val winExpr = expr(
      s"case when size(ws) >= $w then " +
        s"transform(sequence(1, size(ws) - ${w - 1}), " +
        s"i -> xxhash64(concat_ws(' ', slice(ws, i, $w)))) " +
        "else cast(array() as array<bigint>) end")
    val wins = words.select(col("doc_id"), posexplode(winExpr).as(Seq("p", "h")))
    val dupCounts = wins.groupBy("h").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    val flagged = wins.join(dupCounts, "h")
    val dropped = flagged
      .select(col("doc_id"), explode(expr(s"sequence(p, p + ${w - 1})")).as("idx"))
      .distinct()
    val toks = words.select(col("doc_id"), posexplode(col("ws")).as(Seq("idx", "tok")))
    val kept = toks.join(dropped, Seq("doc_id", "idx"), "left_anti")
    words.select("doc_id").join(
      kept.groupBy("doc_id").agg(
        array_join(transform(
          array_sort(collect_list(struct(col("idx"), col("tok")))),
          s => s.getField("tok")), " ").as("clean_text"),
        count(lit(1)).as("n_kept")),
      Seq("doc_id"), "left")
      .join(words.select(col("doc_id"), size(col("ws")).cast("long").as("n_total")), "doc_id")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_total") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val nDoc = args.headOption.map(_.toInt).getOrElse(2000000)

    val span = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    val hot = spark.range(nDoc).select(col("id").as("doc_id"),
      concat(
        when(col("id") % 20 === 0, lit(span + " ")).otherwise(lit("")),
        lit("payload token run number "),
        col("id").cast("string"), lit(" alpha beta gamma delta epsilon "),
        (col("id") * 7919).cast("string")).as("text"))
      .repartition(32).cache()
    println(s"[prof] hot-span docs: ${hot.count()}")
    for (i <- 1 to 2)
      time(s"removeDuplicateSpans hot-span #$i") {
        graft.operators.Pipelines.removeDuplicateSpans(
          hot, "doc_id", "text", w = 10, minCount = 2)
          .write.format("noop").mode("overwrite").save()
        graft.operators.Caches.release(spark)
      }
    for (i <- 1 to 2)
      time(s"OLD shape hot-span #$i") {
        removeDuplicateSpansOld(hot, w = 10, minCount = 2)
          .write.format("noop").mode("overwrite").save()
        graft.operators.Caches.release(spark)
      }
    hot.unpersist()

    val boilerPage = (1 to 40).map(i => s"boiler$i").mkString(" ")
    val floodDf = spark.range(nDoc).select(col("id").as("doc_id"),
      when(col("id") % 10 =!= 0, lit(boilerPage))
        .otherwise(concat(lit("unique payload run "),
          col("id").cast("string"), lit(" alpha beta gamma delta epsilon "),
          (col("id") * 7919).cast("string"))).as("text"))
      .repartition(32).cache()
    println(s"[prof] clone-flood docs: ${floodDf.count()}")
    for (i <- 1 to 2)
      time(s"removeDuplicateSpans clone-flood #$i") {
        graft.operators.Pipelines.removeDuplicateSpans(
          floodDf, "doc_id", "text", w = 10, minCount = 2)
          .write.format("noop").mode("overwrite").save()
        graft.operators.Caches.release(spark)
      }
    for (i <- 1 to 2)
      time(s"OLD shape clone-flood #$i") {
        removeDuplicateSpansOld(floodDf, w = 10, minCount = 2)
          .write.format("noop").mode("overwrite").save()
        graft.operators.Caches.release(spark)
      }
    floodDf.unpersist()
    spark.stop()
  }
}
