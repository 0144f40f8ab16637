package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of picks the latest right row at or before each left timestamp") {
    val left = Seq(
      (1L, 10L, ts("2024-01-05 00:00:00")),  // after both orders of key 10
      (2L, 10L, ts("2024-01-02 12:00:00")),  // between them
      (3L, 10L, ts("2023-12-01 00:00:00")),  // before all -> null
      (4L, 20L, ts("2024-01-02 00:00:00")))  // exactly at -> inclusive
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), 100L),
      (10L, ts("2024-01-03 00:00:00"), 101L),
      (20L, ts("2024-01-02 00:00:00"), 200L))
      .toDF("o_custkey", "o_orderdate", "o_orderkey")
    val got = AsOf.joinLatest(left, right, "user_id", "o_custkey",
        "ts", "o_orderdate", "o_orderkey", Seq("o_orderkey"))
      .select("event_id", "asof_o_orderkey")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(1L -> Some(101L), 2L -> Some(100L), 3L -> None,
                      4L -> Some(200L)))
  }

  test("no torn rows: null payload stays null; null-ts right rows ignored") {
    val left = Seq((1L, 10L, ts("2024-01-05 00:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, Option(ts("2024-01-01 00:00:00")), 100L, Option("old")),
      (10L, Option(ts("2024-01-03 00:00:00")), 101L, Option.empty[String]),
      (10L, Option.empty[Timestamp], 999L, Option("timeless")))
      .toDF("o_custkey", "o_orderdate", "o_orderkey", "note")
    val row = AsOf.joinLatest(left, right, "user_id", "o_custkey",
        "ts", "o_orderdate", "o_orderkey", Seq("o_orderkey", "note"))
      .select("asof_o_orderkey", "asof_note").head()
    // the matched row is orderkey 101, whose note is NULL — it must NOT
    // backfill from the older row, and the null-timestamp row (999) must
    // never participate
    assert(row.getLong(0) == 101L)
    assert(row.isNullAt(1))
  }

  test("ties on timestamp resolve to the largest tiebreak (pinned)") {
    val left = Seq((1L, 10L, ts("2024-01-02 00:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), 7L),
      (10L, ts("2024-01-01 00:00:00"), 9L))
      .toDF("o_custkey", "o_orderdate", "o_orderkey")
    val got = AsOf.joinLatest(left, right, "user_id", "o_custkey",
        "ts", "o_orderdate", "o_orderkey", Seq("o_orderkey"))
      .select("asof_o_orderkey").as[Long].head()
    assert(got == 9L)
  }
}
