package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Round-14 additions: recommender top-partners, local clustering
  * coefficient, media dup ratio, quality/length correlation, order
  * seasonality/churn/priority-sequence/EWMA, per-type gap histogram,
  * ANN rank stability, LSH band entropy. Exact-value fixtures.
  */
class Round14bOpsSpec extends SparkSpec {
  import spark.implicits._

  test("top partners: rank by count, partner-id tiebreak, k cap") {
    // part 1 pairs with 2 (3 baskets), 3 (2), 4 (2), 5 (2) -> top-3 keeps
    // partners 2,3,4 (4 vs 5 tie on count broken by id)
    val li = (1L to 3L).flatMap(o => Seq((o, 1L), (o, 2L))) ++
      Seq((4L, 1L), (4L, 3L), (5L, 1L), (5L, 3L),
          (6L, 1L), (6L, 4L), (7L, 1L), (7L, 4L),
          (8L, 1L), (8L, 5L), (9L, 1L), (9L, 5L))
    val r = Basket.topPartnersOf(li.toDF("l_orderkey", "l_partkey"))
      .where(col("part") === 1L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(r == Set((1L, 2L, 3L, 1L), (1L, 3L, 2L, 2L), (1L, 4L, 2L, 3L)))
  }

  test("local cc histogram: triangle node vs chain node") {
    // triangle 1-2-3 (each cc=1, decile 10) + pendant path 3-4, 4-5:
    // node 3 has deg 3, 1 triangle -> cc = 1/3 -> decile 3;
    // node 4 deg 2, 0 triangles -> decile 0; nodes 1,2 decile 10
    val orders = Seq(
      (1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (3L, 1L), (3L, 3L),
      (4L, 3L), (4L, 4L), (5L, 4L), (5L, 5L))
    // co-purchase edges need support >= 2 -> duplicate every basket
    val li = orders.flatMap { case (o, p) => Seq((o, p), (o + 100L, p)) }
    val r = Basket.localCcHistOf(
        Basket.coPurchaseEdgesOf(li.toDF("l_orderkey", "l_partkey")))
      .as[(Long, Long)].collect().toMap
    assert(r == Map(10L -> 2L, 3L -> 1L, 0L -> 1L))
  }

  test("frame dup ratio: shared chunk counts, unique stays zero") {
    val payload = "x" * 300 // 2 chunks; chunk 2 ("x"*44) differs from chunk 1
    val docs = Seq((1L, payload), (2L, payload), (3L, "unique " * 10))
      .toDF("doc_id", "text")
    val r = Multimodal.frameDupRatioOf(Multimodal.chunkFramesOf(docs))
      .as[(Long, Long, Long, Long)].collect().toSet
    // docs 1+2 share both chunks -> 2/2 dup; doc 3 all unique
    assert(r == Set((1L, 2L, 2L, 1000000L), (2L, 2L, 2L, 1000000L),
                    (3L, 1L, 0L, 0L)))
  }

  test("seasonal index: ppm of month mean over overall mean") {
    val orders = Seq(
      ("1997-01-15", 10.00), ("1998-01-15", 30.00),  // jan mean 2000c
      ("1997-07-15", 10.00), ("1998-07-15", 10.00))  // jul mean 1000c
      .toDF("o_orderdate", "o_totalprice")
      .select(col("o_orderdate").cast("timestamp").as("o_orderdate"),
              col("o_totalprice"))
    val r = Analytics.seasonalIndexOf(orders)
      .as[(Long, Long, Long, Long)].collect().toSet
    // overall (y,m) mean = 6000/4 = 1500c
    assert(r == Set((1L, 2L, 2000L, 1333333L), (7L, 2L, 1000L, 666666L)))
  }

  test("churn by segment: only customers past the 90-day horizon") {
    val orders = Seq(
      (1L, "1998-01-01", 10.00), (1L, "1998-06-01", 20.00), // active
      (2L, "1998-01-01", 50.00),                            // churned
      (3L, "1998-04-01", 40.00))                            // inside 90d
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
      .select(col("o_custkey"),
              col("o_orderdate").cast("timestamp").as("o_orderdate"),
              col("o_totalprice"))
    val cust = Seq((1L, "AUTO"), (2L, "HOME"), (3L, "HOME"))
      .toDF("c_custkey", "c_mktsegment")
    val r = Analytics.churnBySegmentOf(orders, cust)
      .as[(String, Long, Long)].collect().toSet
    assert(r == Set(("HOME", 1L, 5000L)))
  }

  test("priority transitions: lagged per customer, date+key ordered") {
    val orders = Seq(
      (1L, 10L, "1997-01-01", "HIGH"), (1L, 11L, "1997-02-01", "LOW"),
      (1L, 12L, "1997-03-01", "LOW"), (2L, 13L, "1997-01-01", "HIGH"))
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
      .select(col("o_custkey"), col("o_orderkey"),
              col("o_orderdate").cast("timestamp").as("o_orderdate"),
              col("o_orderpriority"))
    val r = Analytics.priorityTransitionsOf(orders)
      .as[(String, String, Long)].collect().toSet
    assert(r == Set(("HIGH", "LOW", 1L), ("LOW", "LOW", 1L)))
  }

  test("ewma revenue: power-of-2 weights over trailing weeks") {
    val orders = Seq(("1997-01-06", 2.55), ("1997-01-13", 5.10))
      .toDF("o_orderdate", "o_totalprice")
      .select(col("o_orderdate").cast("timestamp").as("o_orderdate"),
              col("o_totalprice"))
    val r = Analytics.ewmaRevenueOf(orders)
      .select("cents", "ewma_c").as[(Long, Long)].collect().toSet
    // week1: 255*128/255 = 128; week2: (510*128 + 255*64)/255 = 320
    assert(r == Set((255L, 128L), (510L, 320L)))
  }

  test("gap histogram: per-type log2 buckets, first event skipped") {
    val ev = Seq(
      (1L, 1L, "c", "1997-01-01 00:00:00"),
      (2L, 1L, "c", "1997-01-01 00:00:05"),  // gap 5s -> bucket 2
      (3L, 1L, "c", "1997-01-01 00:01:05"),  // gap 60s -> bucket 5
      (4L, 2L, "c", "1997-01-01 00:00:00"))  // other user: no gap
      .toDF("event_id", "user_id", "event_type", "ts")
      .select(col("event_id"), col("user_id"), col("event_type"),
              col("ts").cast("timestamp").as("ts"))
    val r = Sessions.gapHistByTypeOf(ev)
      .as[(String, Long, Long)].collect().toSet
    assert(r == Set(("c", 2L, 1L), ("c", 5L, 1L)))
  }

  test("rank stability: inversions inside the common candidate set") {
    val exact = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("query_id", "cand_id", "rnk")
    val adc = Seq((1L, 10L, 2L), (1L, 11L, 1L), (1L, 13L, 3L))
      .toDF("query_id", "cand_id", "rnk")
    // common = {10, 11}: exact has 10<11, adc has 11<10 -> 1 discordant
    val r = Vectors.rankStabilityOf(exact, adc)
      .as[(Long, Long, Long)].collect().toSet
    assert(r == Set((1L, 1L, 1L)))
  }

  test("band entropy: collapsed band scores 0, spread band positive") {
    val bands = ((1L to 4L).map(d => (d, 0, "same")) ++
                 (1L to 4L).map(d => (d, 1, s"h$d")))
      .toDF("doc_id", "band", "band_hash")
    val r = Dedup.bandEntropyOf(bands)
      .as[(Int, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    // band 0: one 4-doc bucket -> 4*2 - 4*2 = 0
    // band 1: four singletons -> 4*2 - 0 = 8
    assert(r == Map(0 -> ((1L, 4L, 4L, 0L)), 1 -> ((4L, 4L, 1L, 8L))))
  }

  test("quality/length correlation: positively correlated fixture") {
    val q = Seq((1L, 0.2), (2L, 0.5), (3L, 0.9)).toDF("doc_id", "quality")
    val t = Seq((1L, 4L), (2L, 16L), (3L, 256L)).toDF("doc_id", "n_tokens")
    val r = Stats.qualityLenCorrOf(q, t)
      .as[(Long, Long, Long, Long, Option[Double])].collect().head
    assert(r._1 == 3L && r._2 == 1600000L && r._3 == 14L)
    assert(r._5.exists(c => c > 0.9 && c <= 1.0))
  }

  test("quality/length correlation: zero variance yields NULL not NaN") {
    val q = Seq((1L, 0.5), (2L, 0.5)).toDF("doc_id", "quality")
    val t = Seq((1L, 8L), (2L, 8L)).toDF("doc_id", "n_tokens")
    val r = Stats.qualityLenCorrOf(q, t)
      .as[(Long, Long, Long, Long, Option[Double])].collect().head
    assert(r._5.isEmpty)
  }
}
