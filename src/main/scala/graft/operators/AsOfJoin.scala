package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach one right row within the same key,
  * chosen by time direction. Neither the reference's engine (Trino 400) nor
  * stock Spark SQL has this operator (SURVEY.md §2.4) — composed here from a
  * union + one window, the Spark-idiomatic pattern:
  *
  *   union(left tagged, right tagged)
  *     → single shuffle on key
  *     → in-partition sort by (time, side, tiebreak)
  *     → last/first(right payload, ignoreNulls) carried across the frame
  *     → keep left rows
  *
  * Exactly one shuffle regardless of table sizes; no row explosion — this
  * holds at 100 TB where a naive range-join would be quadratic.
  *
  * Directions:
  *  - `backward` — most recent right row with rightTime <= leftTime; ties on
  *    time include the equal-time right row, and among equal right times the
  *    LARGEST tiebreak value wins.
  *  - `forward` — earliest right row with rightTime >= leftTime; equal-time
  *    right rows are included, and among equal right times the SMALLEST
  *    tiebreak value wins.
  *  - `nearest` — whichever of the backward/forward candidates is closer in
  *    absolute time (microsecond-exact integer compare); exact-distance ties
  *    resolve backward. Still one shuffle: both window frames share the same
  *    hash partitioning, so Spark re-sorts in place rather than re-exchanging.
  *
  * Null event times: a right row with null time is never a match in any
  * direction (it is filtered before the union); a left row with null time is
  * kept in the output — lefts are total — with a null `asof`.
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightPayloadCols: Seq[String],
      rightTieBreak: String,
      leftPayloadCols: Seq[String] = Nil,
      toleranceMicros: Option[Long] = None): DataFrame =
    run(left, right, leftKey, rightKey, leftTime, rightTime,
      rightPayloadCols, rightTieBreak, leftPayloadCols, "backward",
      toleranceMicros)

  def forward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightPayloadCols: Seq[String],
      rightTieBreak: String,
      leftPayloadCols: Seq[String] = Nil,
      toleranceMicros: Option[Long] = None): DataFrame =
    run(left, right, leftKey, rightKey, leftTime, rightTime,
      rightPayloadCols, rightTieBreak, leftPayloadCols, "forward",
      toleranceMicros)

  def nearest(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightPayloadCols: Seq[String],
      rightTieBreak: String,
      leftPayloadCols: Seq[String] = Nil,
      toleranceMicros: Option[Long] = None): DataFrame =
    run(left, right, leftKey, rightKey, leftTime, rightTime,
      rightPayloadCols, rightTieBreak, leftPayloadCols, "nearest",
      toleranceMicros)

  /** Resample an event stream onto a REGULAR time grid with
    * last-observation-carried-forward (the pandas `resample().ffill()` /
    * financial bar-building primitive): per key, one row per grid instant
    * in [start, end] stepping `step`, carrying the most recent event at or
    * before it ([[backward]] semantics, including `toleranceMicros` to
    * stop stale observations from propagating forever). Grid instants
    * before a key's first event carry null — lefts are total.
    *
    * Scale shape: the grid is |keys| × |steps| rows built by one distinct
    * + a `sequence` explode (never a range join), and the match is the
    * as-of union-window — still exactly ONE shuffle for any input sizes.
    */
  def resampleLocf(right: DataFrame, rightKey: String, rightTime: String,
      rightPayloadCols: Seq[String], rightTieBreak: String,
      start: String, end: String, step: String,
      toleranceMicros: Option[Long] = None): DataFrame = {
    val keys = right.select(col(rightKey).as("key")).na.drop().distinct()
    val grid = keys.select(col("key"), explode(expr(
      s"sequence(to_timestamp('$start'), to_timestamp('$end'), interval $step)"))
      .as("grid_ts"))
    run(grid, right, "key", rightKey, "grid_ts", rightTime,
      rightPayloadCols, rightTieBreak, Seq("key", "grid_ts"), "backward",
      toleranceMicros)
  }

  private def run(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightPayloadCols: Seq[String],
      rightTieBreak: String,
      leftPayloadCols: Seq[String],
      direction: String,
      toleranceMicros: Option[Long] = None): DataFrame = {
    toleranceMicros.foreach(t => require(t >= 0, "tolerance must be >= 0 micros"))
    val payloadCols = (rightPayloadCols :+ rightTieBreak).distinct
    // nearest (and any tolerance) needs the matched row's event time;
    // microsecond longs keep the compare integer-exact (double seconds
    // would round)
    val needRt = direction == "nearest" || toleranceMicros.isDefined
    val payloadFields = payloadCols.map(col) ++
      (if (needRt)
        Seq(unix_micros(col(rightTime).cast("timestamp")).as("__rt"))
      else Nil)
    val payload = struct(payloadFields: _*)
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

    // null-time right rows can never be a valid match in any direction, but
    // left in the union they sort nulls-first under the ascending time order,
    // where `backward`'s frame would pick them up as phantom "most recent"
    // matches (and `nearest`'s null-poisoned distance compare would fall
    // through to them) — filter them out before the union
    val r = right.select(
      Keys.id(right, rightKey).as("__k"),
      col(rightTime).as("__t"),
      lit(0).as("__side"),
      col(rightTieBreak).as("__tie"),
      lit(null).cast(lRowType).as("__lrow"),
      payload.as("__rrow"))
      .filter(col("__t").isNotNull)

    // backward: right(side 0) sorts BEFORE left at equal time so <= includes
    // it; largest tiebreak wins via last() over an ascending tie order.
    // forward: right sorts AFTER left at equal time (side desc) so >= includes
    // it; smallest tiebreak wins via first() over the ascending tie order.
    val wb = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__side").desc, col("__tie").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val unioned = l.unionByName(r)

    val lt = unix_micros(col("__t").cast("timestamp"))
    val cleanType = right.select(
      struct(payloadCols.map(col): _*)).schema.head.dataType
    // rebuild the payload struct without the internal __rt field so all
    // directions present the same `asof` shape to callers
    def strip(df: DataFrame, m: String): DataFrame =
      if (!needRt) df.withColumnRenamed(m, "__match")
      else df.withColumn("__match",
        when(col(m).isNull, lit(null).cast(cleanType))
          .otherwise(struct(payloadCols.map(c => col(s"$m.$c")): _*)))
    // tolerance: a match farther than toleranceMicros from the left time
    // becomes null (the pandas/polars merge_asof semantics); the compare is
    // null-safe — a null candidate stays null through `when`
    def withinB(m: Column): Column = toleranceMicros
      .map(t => when(lt - m.getField("__rt") <= t, m)).getOrElse(m)
    def withinF(m: Column): Column = toleranceMicros
      .map(t => when(m.getField("__rt") - lt <= t, m)).getOrElse(m)
    val matched = direction match {
      case "backward" =>
        strip(unioned.withColumn("__m0",
          withinB(last(col("__rrow"), ignoreNulls = true).over(wb))), "__m0")
      case "forward" =>
        strip(unioned.withColumn("__m0",
          withinF(first(col("__rrow"), ignoreNulls = true).over(wf))), "__m0")
      case "nearest" =>
        // tolerance gates each SIDE before the distance pick, so a
        // backward candidate within range beats an out-of-range forward
        val b = withinB(last(col("__rrow"), ignoreNulls = true).over(wb))
        val f = withinF(first(col("__rrow"), ignoreNulls = true).over(wf))
        val pick = unioned
          .withColumn("__b", b).withColumn("__f", f)
          .withColumn("__pick",
            when(col("__f").isNull, col("__b"))
              .when(col("__b").isNull, col("__f"))
              // strictly closer forward wins; equal distance → backward
              .when(abs(col("__f.__rt") - lt) < abs(lt - col("__b.__rt")), col("__f"))
              .otherwise(col("__b")))
        pick.withColumn("__match",
          when(col("__pick").isNull, lit(null).cast(cleanType))
            .otherwise(struct(payloadCols.map(c => col(s"__pick.$c")): _*)))
      case other => throw new IllegalArgumentException(
        s"unknown as-of direction '$other' (backward|forward|nearest)")
    }
    // a null-time LEFT row is before/after nothing — it stays in the output
    // (left totality) but matches nothing. Its own window result is garbage
    // (null sorts first, so `forward` would see the whole partition), so the
    // match is nulled explicitly rather than trusted.
    matched
      .filter(col("__side") === 1)
      .select(col("__lrow.*"),
        when(col("__t").isNotNull, col("__match")).as("asof"))
  }
}
