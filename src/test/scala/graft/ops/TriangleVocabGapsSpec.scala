package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

/** Fixture specs for the round-11 second batch: triangle census, vocab
  * coverage curve, per-language quality percentile, order-gap histogram. */
class TriangleVocabGapsSpec extends SparkSpec {
  import spark.implicits._

  test("triangle census: square + one diagonal = 2 triangles, cc = 0.75") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L))
      .toDF("u", "v")
    val got = Basket.triangleStatsOf(edges)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // degrees 3,2,3,2 → wedges 3+1+3+1 = 8; cc = 3·2/8
    assert(got == Seq((4L, 5L, 2L, 8L, 0.75)))
  }

  test("triangle census: a star hub has wedges but zero triangles") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("u", "v")
    val got = Basket.triangleStatsOf(edges)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((4L, 3L, 0L, 3L, 0.0)))
  }

  test("vocab coverage accumulates the Zipf head over total tokens") {
    val docs = Seq((1L, Seq("a", "b", "a")), (2L, Seq("b", "a", "c")))
      .toDF("doc_id", "words")
    val got = TextOps.vocabCoverageOf(docs, k = 2)
      .as[(Long, String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "a", 3L, 3L, 3.0 / 6.0),
      (2L, "b", 2L, 5L, 5.0 / 6.0)))
  }

  test("quality pct_rank normalizes within language; singleton rank is 0") {
    // quality rises with n_tokens (punct/stop fixed at 0)
    val stats = Seq(
      (1L, "en", 10L, 0L, 50L, 0L),
      (2L, "en", 20L, 0L, 50L, 0L),
      (3L, "en", 30L, 0L, 50L, 0L),
      (4L, "de", 10L, 0L, 50L, 0L))
      .toDF("doc_id", "lang", "n_tokens", "punct_cnt", "n_chars_norm",
            "stop_cnt")
    val got = TextOps.qualityPctRankOf(stats)
      .select("doc_id", "lang", "rank", "pct_rank")
      .as[(Long, String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "en", 1L, 0.0), (2L, "en", 2L, 0.5), (3L, "en", 3L, 1.0),
      (4L, "de", 1L, 0.0)))
  }

  private def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  test("order gaps: consecutive per-customer gaps land in latency bands") {
    val orders = Seq(
      (1L, 101L, ts(1)), (1L, 102L, ts(3)), (1L, 103L, ts(20)),
      (1L, 104L, Timestamp.valueOf("2024-07-18 00:00:00")), // +180 days
      (2L, 201L, ts(5))) // single order → no gap
      .toDF("o_custkey", "o_orderkey", "o_orderdate")
    val got = Analytics.orderGapsOf(orders)
      .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("01_week", 1L, 2L, 2.0),
      ("02_month", 1L, 17L, 17.0),
      ("04_long", 1L, 180L, 180.0)))
  }

  test("order gaps: same-day double order is a 0-day week-band gap") {
    val orders = Seq((1L, 1L, ts(2)), (1L, 2L, ts(2))).toDF(
      "o_custkey", "o_orderkey", "o_orderdate")
    val got = Analytics.orderGapsOf(orders)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("01_week", 1L, 0L, 0.0)))
  }
}
