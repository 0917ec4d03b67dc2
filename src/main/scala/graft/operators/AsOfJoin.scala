package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, attach the most recent right row with
  * rightTime <= leftTime within the same key. Neither the reference's engine
  * (Trino 400) nor stock Spark SQL has this operator (SURVEY.md §2.4) — composed
  * here from a union + one window, the Spark-idiomatic pattern:
  *
  *   union(left tagged, right tagged)
  *     → single shuffle on key
  *     → in-partition sort by (time, side, tiebreak)
  *     → last(right payload, ignoreNulls) carried forward
  *     → keep left rows
  *
  * Exactly one shuffle + one sort regardless of table sizes; no row explosion —
  * this holds at 100 TB where a naive range-join would be quadratic.
  * Ties on time: the right row sorts before the left row at equal time (backward
  * semantics include t_right == t_left); among equal right times the largest
  * tiebreak value wins.
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightPayloadCols: Seq[String],
      rightTieBreak: String,
      leftPayloadCols: Seq[String] = Nil): DataFrame = {
    val payloadCols = (rightPayloadCols :+ rightTieBreak).distinct
    val payload = struct(payloadCols.map(col): _*)
    // carry only the requested left columns through the shuffle+window —
    // Catalyst cannot prune struct fields through last(..., ignoreNulls), so
    // narrowing here is what keeps the exchanged bytes proportional to what the
    // caller actually reads at 100 TB
    val lCols = if (leftPayloadCols.isEmpty) left.columns.toSeq
      else (leftPayloadCols ++ Seq(leftKey, leftTime)).distinct
    val lRow = struct(lCols.map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType
    val lRowType = left.select(lRow).schema.head.dataType
    // keys keep their own scalar type (string keys join as well as longs; a
    // blanket long cast silently nulled them out) — Keys.id only widens
    // integrals and rejects non-scalar keys loudly
    val tieType = right.select(col(rightTieBreak)).schema.head.dataType

    val l = left.select(
      Keys.id(left, leftKey).as("__k"),
      col(leftTime).as("__t"),
      lit(1).as("__side"),
      lit(null).cast(tieType).as("__tie"),
      lRow.as("__lrow"),
      lit(null).cast(payloadType).as("__rrow"))

    val r = right.select(
      Keys.id(right, rightKey).as("__k"),
      col(rightTime).as("__t"),
      lit(0).as("__side"),
      col(rightTieBreak).as("__tie"),
      lit(null).cast(lRowType).as("__lrow"),
      payload.as("__rrow"))

    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__match", last(col("__rrow"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__lrow.*"), col("__match").as("asof"))
  }
}
