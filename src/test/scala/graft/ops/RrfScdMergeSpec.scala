package graft.ops

import graft.SparkSpec
import graft.etl.Dims
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Fixture specs for the round-11 third batch: RRF hybrid fusion,
  * incremental SCD2 merge, co-purchase components. */
class RrfScdMergeSpec extends SparkSpec {
  import spark.implicits._

  test("RRF fuses the two rankings; single-system docs keep a NULL rank") {
    // doc 1: 'spark' ×3 (high bm25 tf, 1 distinct term)
    // doc 2: all three terms once (coverage wins, bm25 sums 3 small terms)
    // doc 3: 'hash' once; doc 4: no query terms (absent everywhere)
    val docs = Seq(
      (1L, Seq("spark", "spark", "spark", "x")),
      (2L, Seq("spark", "hash", "join")),
      (3L, Seq("hash", "y", "z", "w", "v", "u")),
      (4L, Seq("nope")))
      .toDF("doc_id", "words")
    val got = TextOps.rrfFusionOf(docs, Seq("spark", "hash", "join"), k = 2)
      .as[(Long, Option[Long], Option[Long], Double, Long)]
      .collect().sortBy(_._5).toSeq
    // every ranked doc appears; doc 4 appears nowhere
    assert(got.map(_._1).toSet.subsetOf(Set(1L, 2L, 3L)))
    // doc 2 is ranked by BOTH systems → two RRF terms → top fused rank
    val d2 = got.find(_._1 == 2L).get
    assert(d2._2.nonEmpty && d2._3.nonEmpty && d2._5 == 1L)
    assert(math.abs(d2._4 - (1.0 / (d2._2.get + 60) + 1.0 / (d2._3.get + 60)))
      < 1e-15)
    // k=2 per system: doc 3 (bm25 rank 3, cov rank 3) is cut from both
    assert(!got.map(_._1).contains(3L))
    // a doc ranked by one system only carries exactly one term
    val single = got.filter(r => r._2.isEmpty ^ r._3.isEmpty)
    single.foreach { r =>
      val rk = r._2.orElse(r._3).get
      assert(math.abs(r._4 - 1.0 / (rk + 60)) < 1e-15)
    }
  }

  private def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  private def uolOf(rows: Seq[(Long, Timestamp, Int)]) =
    rows.toDF("customer_id", "date_time", "city_id")

  test("SCD2 merge equals the full rebuild; untouched customers pass through") {
    // history: cust 1 city 5→6; cust 2 city 9 (untouched by the increment)
    val hist = uolOf(Seq((1L, ts(1), 5), (1L, ts(3), 6), (2L, ts(2), 9)))
    // increment: cust 1 changes to 7 on day 10 (and a no-change day 11),
    // cust 3 is brand new
    val incRows = uolOf(Seq((1L, ts(10), 7), (1L, ts(11), 7), (3L, ts(10), 4)))
    val full = Dims.dCustomerScd(hist.unionByName(incRows))
    val incDaily = incRows.groupBy(col("customer_id"),
        col("date_time").as("day")).agg(max("city_id").as("city_id"))
    val merged = Dims.dCustomerScdMerge(Dims.dCustomerScd(hist), incDaily)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.as[(Long, Int, Timestamp, Option[Timestamp], Boolean)]
        .collect().sortBy(r => (r._1, r._3.getTime)).toSeq
    assert(key(merged) == key(full))
    // cust 2's row really is the untouched original (still current)
    assert(key(merged).filter(_._1 == 2L) ==
      Seq((2L, 9, ts(2), None, true)))
  }

  test("SCD2 merge rejects late-arriving increment days loudly") {
    val hist = uolOf(Seq((1L, ts(1), 5), (1L, ts(8), 6)))
    val late = uolOf(Seq((1L, ts(4), 7))) // before the last change (day 8)
      .groupBy(col("customer_id"), col("date_time").as("day"))
      .agg(max("city_id").as("city_id"))
    val ex = intercept[Exception] {
      Dims.dCustomerScdMerge(Dims.dCustomerScd(hist), late).collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("late-arriving"))
  }

  test("co-purchase components: two separate chains roll up by min id") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("u", "v")
    val got = Basket.coPurchaseComponentsOf(edges)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 3L), (10L, 2L)))
  }
}
