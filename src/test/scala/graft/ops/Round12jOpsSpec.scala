package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-12j operators: asymmetric grouping sets, SCD2 change rate,
  * session-duration and media-size histograms, principal-direction
  * dimension profile. */
class Round12jOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("grouping sets: (city,status) + (status) + () only — no (city)") {
    val uol = Seq(
      (1, "shipped", 10.0, 2L), (1, "refunded", 5.0, 1L),
      (2, "shipped", 7.0, 3L))
      .toDF("city_id", "status", "payment_amount", "quantity")
    val r = Analytics.salesGroupingSetsOf(uol)
      .orderBy("g_city", "g_status", "city_id", "status")
      .as[(Option[Int], Option[String], Double, Long, Long, Long, Long)]
      .collect()
    assert(r.toSeq == Seq(
      (Some(1), Some("refunded"), 5.0, 1L, 1L, 0L, 0L),
      (Some(1), Some("shipped"), 10.0, 2L, 1L, 0L, 0L),
      (Some(2), Some("shipped"), 7.0, 3L, 1L, 0L, 0L),
      (None, Some("refunded"), 5.0, 1L, 1L, 1L, 0L),
      (None, Some("shipped"), 17.0, 5L, 2L, 1L, 0L),
      (None, None, 22.0, 6L, 3L, 1L, 1L)))
  }

  test("scd change rate: versions and distinct customers per month") {
    val scd = Seq(
      (1L, 10, ts("1996-01-05 00:00:00")),
      (1L, 11, ts("1996-01-20 00:00:00")),
      (2L, 12, ts("1996-02-03 00:00:00")))
      .toDF("customer_id", "city_id", "valid_from")
    val r = Analytics.scdChangeRateOf(scd)
      .orderBy("month").as[(java.sql.Timestamp, Long, Long)].collect()
    assert(r.toSeq == Seq(
      (ts("1996-01-01 00:00:00"), 2L, 1L),
      (ts("1996-02-01 00:00:00"), 1L, 1L)))
  }

  test("session duration hist: zero-length sessions land in bucket 0") {
    val s = Seq(
      (ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00")), // 0 s
      (ts("2024-01-01 10:00:00"), ts("2024-01-01 10:01:40")), // 100 s
      (ts("2024-01-01 10:00:00"), ts("2024-01-01 10:02:00"))) // 120 s
      .toDF("session_start", "session_end")
    val r = Sessions.sessionDurationHistOf(s)
      .orderBy("bucket").as[(Long, Long, Long, Long)].collect()
    assert(r.toSeq == Seq((0L, 1L, 0L, 0L), (6L, 2L, 220L, 120L)))
  }

  test("media size hist: per-bucket doc/byte/frame totals") {
    val meta = Seq((1L, 5L, 1L), (2L, 7L, 2L), (3L, 100L, 3L))
      .toDF("doc_id", "byte_len", "n_frames")
    val r = Multimodal.sizeHistOf(meta)
      .orderBy("bucket").as[(Long, Long, Long, Long)].collect()
    assert(r.toSeq == Seq((2L, 2L, 12L, 3L), (6L, 1L, 100L, 3L)))
  }

  test("principal dims: exact integer power-step, |y| ranking") {
    val emb = Seq(
      (1L, Seq(1L, 0L)), (2L, Seq(1L, 2L)), (3L, Seq(-5L, 1L)))
      .toDF("vec_id", "qv")
    // s = [1, 3, -4]; y0 = 1 + 3 + 20 = 24; y1 = 0 + 6 - 4 = 2
    val r = Vectors.principalDimsOf(emb, k = 2)
      .orderBy("rank").as[(Long, Long, Long)].collect()
    assert(r.toSeq == Seq((0L, 24L, 1L), (1L, 2L, 2L)))
  }
}
