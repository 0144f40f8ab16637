package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-12i operators: TPC-H Q6 forecast fold, Q15 scalar-max top
  * supplier, Q17 cross-multiplied small-quantity revenue, the curation
  * funnel, the dedup length-shift card and the kNN mutuality monitor. */
class Round12iOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  test("q6: discount band, quantity cap and year window all prune") {
    val li = Seq(
      (ts("1996-05-01"), 0.06, 10.0, 100.0), // kept: lost 6.00
      (ts("1996-05-01"), 0.04, 10.0, 100.0), // discount below band
      (ts("1996-05-01"), 0.06, 30.0, 100.0), // quantity cap
      (ts("1997-05-01"), 0.06, 10.0, 100.0)) // outside year
      .toDF("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")
    val r = Analytics.forecastRevenueOf(li).as[(Long, Double)].head()
    assert(r == ((1L, 6.0)))
  }

  test("q15: exact decimal max keeps ties; window prunes") {
    val li = Seq(
      (1L, ts("1996-02-01"), 100.0, 0.0),
      (2L, ts("1996-02-02"), 60.0, 0.0), (2L, ts("1996-03-01"), 40.0, 0.0),
      (3L, ts("1996-02-03"), 50.0, 0.0),
      (3L, ts("1996-06-01"), 1000.0, 0.0)) // outside quarter
      .toDF("l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    val sup = Seq((1L, "s1"), (2L, "s2"), (3L, "s3"))
      .toDF("s_suppkey", "s_name")
    val r = Analytics.topSupplierOf(li, sup)
      .orderBy("s_suppkey").as[(Long, String, Double)].collect()
    assert(r.toSeq == Seq((1L, "s1", 100.0), (2L, "s2", 100.0)))
  }

  test("q17: 5*qty*n < sum_qty picks only the small-qty lines") {
    val part = Seq((1L, "Brand#7"), (2L, "Brand#8"))
      .toDF("p_partkey", "p_brand")
    val li = Seq(
      (1L, 1.0, 50.0),   // 5*1*4=20 < 31 -> kept
      (1L, 10.0, 100.0), // 200 >= 31
      (1L, 10.0, 100.0),
      (1L, 10.0, 100.0),
      (2L, 1.0, 999.0))  // other brand
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    val r = Analytics.smallQtyRevenueOf(li, part).as[(Long, Double)].head()
    assert(r == ((1L, 50.0)))
  }

  test("curation funnel: cumulative stage counts and retained ppm") {
    val docs = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 4L))
      .toDF("doc_id", "cluster")
    val quality = Seq((1L, 0.6), (2L, 0.9), (3L, 0.4), (4L, 0.8))
      .toDF("doc_id", "quality")
    val exact = Seq(("fa", 1L, 2L), ("fb", 4L, 1L))
      .toDF("fp", "keeper_doc_id", "n_dups")
    val contam = Seq((4L, 3L)).toDF("doc_id", "n_hits")
    val pii = Seq((1L, false), (2L, false), (3L, false), (4L, false))
      .toDF("doc_id", "has_pii")
    val rep = Seq((1L, 0.2), (2L, 0.2), (3L, 0.2), (4L, 0.2))
      .toDF("doc_id", "rep_ratio")
    val r = Corpus.curationFunnelOf(docs, clusters, quality, exact,
                                    contam, pii, rep)
      .orderBy("stage_id").as[(Long, String, Long, Long)].collect()
    assert(r.toSeq == Seq(
      (1L, "raw", 4L, 1000000L), (2L, "canonical", 3L, 750000L),
      (3L, "quality", 2L, 500000L), (4L, "exact_keeper", 2L, 500000L),
      (5L, "decontaminated", 1L, 250000L), (6L, "pii_clean", 1L, 250000L),
      (7L, "repetition", 1L, 250000L)))
  }

  test("length shift: per-bucket raw vs curated-survivor counts") {
    val stats = Seq((1L, 5L), (2L, 7L), (3L, 20L))
      .toDF("doc_id", "n_tokens")
    val curated = Seq(1L, 3L).toDF("doc_id")
    val r = Corpus.dedupLengthShiftOf(stats, curated)
      .orderBy("bucket").as[(Long, Long, Long, Long)].collect()
    assert(r.toSeq == Seq((2L, 2L, 1L, 500000L), (4L, 1L, 1L, 1000000L)))
  }

  test("knn mutual: reciprocated evaluable edges in ppm") {
    val topk = Seq(
      (0L, 50L), (0L, 7L), (0L, 100L), // (0,7) not evaluable
      (50L, 0L), (50L, 100L), (100L, 50L))
      .toDF("query_id", "cand_id")
    val r = Vectors.knnMutualOf(topk).as[(Long, Long, Long)].head()
    // evaluable: (0,50),(0,100),(50,0),(50,100),(100,50); only (0,100)
    // lacks its reverse
    assert(r == ((5L, 4L, 800000L)))
  }
}
