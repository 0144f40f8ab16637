package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-12l operators: stopword profile, dup token inflation,
  * day-of-week seasonality, monthly customer-revenue Gini. */
class Round12lOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def dec(d: Double) = new java.math.BigDecimal(d).setScale(2)

  test("stopword profile: ppm of stop tokens per source") {
    val st = Seq((1L, 10L, 3L), (2L, 10L, 1L))
      .toDF("doc_id", "n_tokens", "stop_cnt")
    val docs = Seq((1L, "s"), (2L, "s")).toDF("doc_id", "source")
    val r = Stats.stopwordProfileOf(st, docs)
      .select("source", "n_docs", "sum_tokens", "sum_stop", "stop_ppm")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(r.toSeq == Seq(("s", 2L, 20L, 4L, 200000L)))
  }

  test("dup inflation: non-keeper tokens are the savings") {
    // docs 1,2 identical ("x y") → keeper 1; doc 3 unique
    val docs = Seq((1L, "a", "x y"), (2L, "a", "x y"), (3L, "b", "zz"))
      .toDF("doc_id", "source", "norm")
    val st = Seq((1L, 2L), (2L, 2L), (3L, 1L)).toDF("doc_id", "n_tokens")
    val r = Stats.dupInflationOf(docs, st)
      .select("source", "n_docs", "n_keep", "tokens_total", "tokens_keep",
              "savings_ppm")
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r.toSeq == Seq(("a", 2L, 1L, 4L, 2L, 500000L),
                          ("b", 1L, 1L, 1L, 1L, 0L)))
  }

  test("sales dow profile: ISO numbering, Monday=1") {
    val uol = Seq(
      (ts("2024-01-01 10:00:00"), 2L, 10.0),  // a Monday
      (ts("2024-01-07 10:00:00"), 3L, 5.0))   // a Sunday
      .map { case (t, q, p) => (t, q, dec(p)) }
      .toDF("date_time", "quantity", "payment_amount")
    val r = Analytics.salesDowProfileOf(uol)
      .select("dow", "n_sales", "qty", "revenue")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(r.toSeq == Seq((1L, 1L, 2L, 10.0), (7L, 1L, 3L, 5.0)))
  }

  test("customer gini: equal revenues → 0 ppm; concentration > 0") {
    val uol = Seq(
      (1L, "1996-01-05 00:00:00", 10.0), (2L, "1996-01-06 00:00:00", 10.0),
      (3L, "1996-02-05 00:00:00", 1.0), (4L, "1996-02-06 00:00:00", 99.0))
      .map { case (c, t, p) => (c, ts(t), dec(p)) }
      .toDF("customer_id", "date_time", "payment_amount")
    val r = Analytics.customerGiniMonthlyOf(uol)
      .select("month", "n_custs", "total_rev_i", "gini_ppm")
      .as[(java.sql.Timestamp, Long, Long, Long)].collect()
      .sortBy(_._1.getTime)
    // Jan: ranks 1,2 each rev 10 → 2·30·1e6/(2·20) − 3·1e6/2 = 0
    assert(r(0) == ((ts("1996-01-01 00:00:00"), 2L, 20L, 0L)))
    // Feb: revs 1,99 → rws = 1+198 → 2·199·1e6/(2·100) − 1 500 000
    assert(r(1) == ((ts("1996-02-01 00:00:00"), 2L, 100L, 490000L)))
  }
}
