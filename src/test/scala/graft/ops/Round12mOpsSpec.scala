package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-12m operators: token byte-length histogram, shard-size skew,
  * order backlog curve, price/qty moments, weekly event-value card. */
class Round12mOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("token len hist: byte lengths, totals and distinct words") {
    val wf = Seq("ab", "ab", "cd", "xyz").map((1L, _)).toDF("doc_id", "w")
    val r = Stats.tokenLenHistOf(wf)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(r.toSeq == Seq((2L, 3L, 2L), (3L, 1L, 1L)))
  }

  test("shard skew: max/mean ppm over shard sizes") {
    val sh = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L))
      .toDF("doc_id", "shard")
    val r = Stats.shardSkewOf(sh)
      .select("n_shards", "min_sz", "max_sz", "n_docs", "skew_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().head
    // shards {0:3, 1:1} → max 3, mean 2 → 1 500 000 ppm
    assert(r == ((2L, 1L, 3L, 4L, 1500000L)))
  }

  test("order backlog: cumulative open orders over months") {
    val o = Seq(
      (ts("1996-01-05 00:00:00"), "O"), (ts("1996-01-06 00:00:00"), "F"),
      (ts("1996-02-05 00:00:00"), "P"))
      .toDF("o_orderdate", "o_orderstatus")
    val r = Analytics.orderBacklogOf(o)
      .select("month", "n_orders", "n_open", "open_ppm", "backlog")
      .as[(java.sql.Timestamp, Long, Long, Long, Long)].collect()
      .sortBy(_._1.getTime)
    assert(r.toSeq == Seq(
      (ts("1996-01-01 00:00:00"), 2L, 1L, 500000L, 1L),
      (ts("1996-02-01 00:00:00"), 1L, 1L, 1000000L, 2L)))
  }

  test("price/qty moments: exact integer sums per product line") {
    val li = Seq((10L, 2.0, 100.99), (10L, 3.0, 50.50))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    val p = Seq((10L, "PROMO")).toDF("p_partkey", "p_type")
    val r = Analytics.priceQtyMomentsOf(li, p)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    // q=(2,3), p=(100,50): n=2 sx=5 sy=150 sxx=13 syy=12500 sxy=350
    assert(r == (("PROMO", 2L, 5L, 150L, 13L, 12500L, 350L)))
  }

  test("event value weekly: floor-integer profile per week") {
    val ev = Seq(
      (1L, 100L, "2024-01-01 10:00:00", 5.9),
      (2L, 100L, "2024-01-02 10:00:00", 1.2),
      (3L, 200L, "2024-01-10 10:00:00", 7.0))
      .map { case (e, u, t, v) => (e, u, ts(t), v) }
      .toDF("event_id", "user_id", "ts", "value")
    val r = Sessions.eventValueWeeklyOf(ev)
      .select("week", "n_events", "n_users", "v_sum", "v_min", "v_max")
      .as[(java.sql.Timestamp, Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1.getTime)
    assert(r.toSeq == Seq(
      (ts("2024-01-01 00:00:00"), 2L, 1L, 6L, 1L, 5L),
      (ts("2024-01-08 00:00:00"), 1L, 1L, 7L, 7L, 7L)))
  }
}
