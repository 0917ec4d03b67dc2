package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** As-of join semantics: backward match, tie at equal timestamps included,
  * tie among right rows broken by largest tiebreak, unmatched left rows kept.
  */
class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of picks most recent right row at or before left time") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 10L, ts("2024-01-01 08:00:00")), // before any right row → null
      (4L, 99L, ts("2024-01-01 12:00:00"))  // key with no right rows → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 09:00:00"), 5.0),
      (101L, 10L, ts("2024-01-01 10:00:00"), 6.0), // equal ts: included (<=)
      (102L, 10L, ts("2024-01-01 10:00:00"), 7.0), // same ts, larger tiebreak wins
      (103L, 10L, ts("2024-01-01 11:00:00"), 8.0)
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")

    val out = AsOfJoin.backward(left, right,
      leftKey = "user_id", rightKey = "o_custkey",
      leftTime = "ts", rightTime = "o_orderdate",
      rightPayloadCols = Seq("o_orderkey", "o_totalprice"),
      rightTieBreak = "o_orderkey")
      .select(col("event_id"), col("asof.o_orderkey").as("ok"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    assert(out(1L) == 102L, "equal-time right row with max tiebreak must win")
    assert(out(2L) == 103L)
    assert(out(3L) == -1L, "left row before all right rows must be unmatched")
    assert(out(4L) == -1L, "unmatched key must be kept with null payload")
  }

  test("forward as-of picks earliest right row at or after left time") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // equal-ts rows included, min tiebreak
      (2L, 10L, ts("2024-01-01 10:30:00")),
      (3L, 10L, ts("2024-01-01 12:00:00")), // after all right rows → null
      (4L, 99L, ts("2024-01-01 10:00:00"))  // key with no right rows → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 09:00:00"), 5.0),
      (101L, 10L, ts("2024-01-01 10:00:00"), 6.0),
      (102L, 10L, ts("2024-01-01 10:00:00"), 7.0),
      (103L, 10L, ts("2024-01-01 11:00:00"), 8.0)
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")

    val out = AsOfJoin.forward(left, right,
      leftKey = "user_id", rightKey = "o_custkey",
      leftTime = "ts", rightTime = "o_orderdate",
      rightPayloadCols = Seq("o_orderkey", "o_totalprice"),
      rightTieBreak = "o_orderkey")
      .select(col("event_id"), col("asof.o_orderkey").as("ok"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    assert(out(1L) == 101L, "equal-time right row with min tiebreak must win")
    assert(out(2L) == 103L)
    assert(out(3L) == -1L, "left row after all right rows must be unmatched")
    assert(out(4L) == -1L, "unmatched key must be kept with null payload")
  }

  test("nearest as-of picks the closer side; exact ties resolve backward") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:10:00")), // 10 min after A, 50 min before B → A
      (2L, 10L, ts("2024-01-01 10:45:00")), // 45 after A, 15 before B → B
      (3L, 10L, ts("2024-01-01 10:30:00")), // exactly midway → backward (A)
      (4L, 10L, ts("2024-01-01 07:00:00")), // before all → forward only (A)
      (5L, 10L, ts("2024-01-01 23:00:00")), // after all → backward only (B)
      (6L, 99L, ts("2024-01-01 10:00:00"))  // no right rows → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 10:00:00"), 5.0), // A
      (101L, 10L, ts("2024-01-01 11:00:00"), 8.0)  // B
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")

    val out = AsOfJoin.nearest(left, right,
      leftKey = "user_id", rightKey = "o_custkey",
      leftTime = "ts", rightTime = "o_orderdate",
      rightPayloadCols = Seq("o_orderkey", "o_totalprice"),
      rightTieBreak = "o_orderkey")
      .select(col("event_id"), col("asof.o_orderkey").as("ok"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    assert(out(1L) == 100L)
    assert(out(2L) == 101L)
    assert(out(3L) == 100L, "exact-distance tie must resolve to the backward row")
    assert(out(4L) == 100L, "no backward candidate → forward row")
    assert(out(5L) == 101L, "no forward candidate → backward row")
    assert(out(6L) == -1L)
  }

  test("string keys join correctly (no silent long coercion)") {
    import spark.implicits._
    val left = Seq(
      ("e1", "alice", ts("2024-01-01 10:00:00")),
      ("e2", "bob", ts("2024-01-01 12:00:00")),
      ("e3", "carol", ts("2024-01-01 12:00:00")) // key with no right rows
    ).toDF("event_id", "user", "ts")
    val right = Seq(
      (100L, "alice", ts("2024-01-01 09:00:00")),
      (101L, "bob", ts("2024-01-01 11:00:00")),
      (102L, "bob", ts("2024-01-01 13:00:00")) // after left time → not matched
    ).toDF("o_orderkey", "o_user", "o_ts")
    val out = AsOfJoin.backward(left, right,
      leftKey = "user", rightKey = "o_user",
      leftTime = "ts", rightTime = "o_ts",
      rightPayloadCols = Seq("o_orderkey"), rightTieBreak = "o_orderkey")
      .select(col("event_id"), col("asof.o_orderkey").as("ok"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map("e1" -> 100L, "e2" -> 101L, "e3" -> -1L), s"got $out")
  }

  test("non-scalar keys are rejected loudly") {
    import spark.implicits._
    val left = Seq((Seq(1L), ts("2024-01-01 10:00:00"))).toDF("k", "ts")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(left, left.toDF("k", "o_ts"), "k", "k", "ts", "o_ts",
        Seq("o_ts"), "o_ts")
    }
    assert(e.getMessage.contains("non-scalar"))
  }

  test("null event times: null-time right rows never match; null-time lefts kept, asof null") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, null.asInstanceOf[Timestamp]), // null left time → kept, matches nothing
      (3L, 10L, ts("2024-01-01 08:00:00"))     // before all real right rows
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      // null right time: sorts nulls-first, where an unfiltered union would make
      // it a phantom "most recent" backward match for doc 3
      (100L, 10L, null.asInstanceOf[Timestamp], 5.0),
      (101L, 10L, ts("2024-01-01 09:00:00"), 6.0)
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val dirs = Map[String, (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        String, String, String, String, Seq[String], String, Seq[String]) => org.apache.spark.sql.DataFrame](
      "backward" -> (AsOfJoin.backward(_, _, _, _, _, _, _, _, _)),
      "forward" -> (AsOfJoin.forward(_, _, _, _, _, _, _, _, _)),
      "nearest" -> (AsOfJoin.nearest(_, _, _, _, _, _, _, _, _)))
    val expected = Map(
      "backward" -> Map(1L -> 101L, 2L -> -1L, 3L -> -1L),
      "forward" -> Map(1L -> -1L, 2L -> -1L, 3L -> 101L),
      "nearest" -> Map(1L -> 101L, 2L -> -1L, 3L -> 101L))
    dirs.foreach { case (name, join) =>
      val out = join(left, right, "user_id", "o_custkey", "ts", "o_orderdate",
        Seq("o_orderkey", "o_totalprice"), "o_orderkey", Nil)
        .select(col("event_id"), col("asof.o_orderkey").as("ok"))
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      assert(out == expected(name), s"$name: got $out")
    }
  }

  test("as-of join preserves every left row exactly once") {
    val events = graft.sources.Tables(spark, sfDir, "events")
    val orders = graft.sources.Tables(spark, sfDir, "orders")
    val out = AsOfJoin.backward(events, orders,
      "user_id", "o_custkey", "ts", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"), "o_orderkey")
    assert(out.count() == events.count())
    assert(out.select("event_id").distinct().count() == events.count())
  }

  test("resampleLocf: regular grid per key, forward-fill, tolerance stops stale carries") {
    import spark.implicits._
    val right = Seq(
      (1L, 10L, ts("2024-01-01 10:30:00"), 5.0),
      (2L, 10L, ts("2024-01-03 09:00:00"), 6.0)
    ).toDF("event_id", "user_id", "ts", "value")
    def run(tol: Option[Long]): Map[String, Long] =
      AsOfJoin.resampleLocf(right, "user_id", "ts", Seq("event_id"),
        "event_id", "2024-01-01 00:00:00", "2024-01-04 00:00:00", "1 day",
        toleranceMicros = tol)
        .select(col("grid_ts").cast("string"), col("asof.event_id").as("eid"))
        .collect()
        .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
    val locf = run(None)
    assert(locf == Map(
      "2024-01-01 00:00:00" -> -1L, // before the first event
      "2024-01-02 00:00:00" -> 1L,  // carried forward
      "2024-01-03 00:00:00" -> 1L,  // still carried
      "2024-01-04 00:00:00" -> 2L), s"got $locf")
    val fresh = run(Some(24L * 3600L * 1000000L))
    assert(fresh == Map(
      "2024-01-01 00:00:00" -> -1L,
      "2024-01-02 00:00:00" -> 1L,  // 13.5 h old: fresh enough
      "2024-01-03 00:00:00" -> -1L, // 37.5 h old: stale, cut
      "2024-01-04 00:00:00" -> 2L), s"got $fresh")
  }

  test("tolerance: matches beyond the window null; lefts stay total; nearest nulls when both sides out") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // backward 1h away: within 2h
      (2L, 10L, ts("2024-01-01 23:00:00")), // backward 14h away: out of 2h
      (3L, 20L, ts("2024-01-02 10:00:00"))  // bwd 40 min, fwd 50 min
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 09:00:00"), 5.0),
      (200L, 20L, ts("2024-01-02 09:20:00"), 6.0), // 40 min before event 3
      (201L, 20L, ts("2024-01-02 10:50:00"), 7.0)  // 50 min after event 3
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    def okOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = df
      .select(col("event_id"), col("asof.o_orderkey").as("ok"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap

    val bwd = okOf(AsOfJoin.backward(left, right, "user_id", "o_custkey",
      "ts", "o_orderdate", Seq("o_orderkey"), "o_orderkey",
      toleranceMicros = Some(2L * 3600L * 1000000L)))
    assert(bwd(1L) == 100L && bwd(2L) == -1L, s"backward tolerance: $bwd")
    assert(bwd.contains(2L), "out-of-tolerance left row must stay in the output")

    val near = okOf(AsOfJoin.nearest(left, right, "user_id", "o_custkey",
      "ts", "o_orderdate", Seq("o_orderkey"), "o_orderkey"))
    assert(near(3L) == 200L, s"untolerated nearest picks backward 40 < 50 min: $near")
    val near45 = okOf(AsOfJoin.nearest(left, right, "user_id", "o_custkey",
      "ts", "o_orderdate", Seq("o_orderkey"), "o_orderkey",
      toleranceMicros = Some(45L * 60L * 1000000L)))
    assert(near45(3L) == 200L, s"forward side gated out, backward still in: $near45")
    val near30 = okOf(AsOfJoin.nearest(left, right, "user_id", "o_custkey",
      "ts", "o_orderdate", Seq("o_orderkey"), "o_orderkey",
      toleranceMicros = Some(30L * 60L * 1000000L)))
    assert(near30(3L) == -1L, s"both sides beyond 30 min must null: $near30")
  }
}
