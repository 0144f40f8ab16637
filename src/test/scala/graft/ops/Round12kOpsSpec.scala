package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-12k operators: Zipf fit, KS source drift, length/token moments,
  * SimHash bit balance, boilerplate shingles, user burstiness, event
  * sequence surprisal, cohort LTV, mutual-kNN components, Q9-shape
  * profit. */
class Round12kOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("zipf fit: moments over rank-block log2 surrogates are exact") {
    // vocab: a×4, b×2, c×1, d×1 → hist {4→1, 2→1, 1→2}
    // rank_lo: n=4→1, n=2→2, n=1→3
    // blocks: (x=ilog2(1)=0, y=2, w=1), (x=1, y=1, w=1), (x=1, y=0, w=2)
    val wf = Seq("a", "a", "a", "a", "b", "b", "c", "d")
      .map((1L, _)).toDF("doc_id", "w")
    val r = Stats.zipfFitOf(wf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    val (n, sx, sy, sxx, sxy, num, den) = r
    assert(n == 4L)                     // 4 vocab words
    assert(sx == 3L && sy == 3L)       // 0+1+1·2 / 2+1+0·2
    assert(sxx == 3L && sxy == 1L)     // 0+1+1·2 / 0+1+0
    assert(num == n * sxy - sx * sy)   // -5
    assert(den == n * sxx - sx * sx)   // 3
    assert(num == -5L && den == 3L)    // slope ≈ -1.67 (tiny fixture)
  }

  test("ks source drift: identical distribution → ks 0; disjoint → max") {
    // srcA and srcB identical lengths → KS 0 vs each other, but vs the
    // pooled corpus including srcC (disjoint lengths) they drift.
    val docs = (Seq.fill(2)(("a", 10)) ++ Seq.fill(2)(("b", 10)) ++
                Seq.fill(2)(("c", 99)))
      .zipWithIndex.map { case ((s, n), i) => (i.toLong, s, n) }
      .toDF("doc_id", "source", "n_chars")
    val r = Stats.ksSourceDriftOf(docs)
      .select("source", "n_source", "n_total", "ks_num")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    // at x=10: cum_a=2, cum_all=4 → |2·6 − 4·2| = 4; (a,b) symmetric
    assert(r.toSeq == Seq(("a", 2L, 6L, 4L), ("b", 2L, 6L, 4L),
                          ("c", 2L, 6L, 8L)))
    // c: at x=10 cum_c=0, cum_all=4 → 8 (max; at 99 it's 0)
  }

  test("length/token moments: exact integer sums per source") {
    val st = Seq((1L, 10L, 2L), (2L, 20L, 4L))
      .toDF("doc_id", "n_chars_norm", "n_tokens")
    val docs = Seq((1L, "s"), (2L, "s")).toDF("doc_id", "source")
    val r = Stats.lengthTokenMomentsOf(st, docs)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    assert(r == (("s", 2L, 30L, 6L, 500L, 20L, 100L)))
  }

  test("simhash bit balance: 64 rows, ones counted per bit") {
    val sh = Seq((1L, 1L), (2L, 3L), (3L, -1L))
      .toDF("doc_id", "simhash64") // bit0: 3 ones; bit1: 2; bit63: 1
    val r = Stats.simhashBitBalanceOf(sh)
      .select("bit", "n_ones", "n_docs", "ones_ppm")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r.length == 64)
    assert(r(0) == ((0L, 3L, 3L, 1000000L)))
    assert(r(1) == ((1L, 2L, 3L, 666666L)))
    assert(r(63) == ((63L, 1L, 3L, 333333L)))
  }

  test("boilerplate shingles: df over distinct docs, deterministic ties") {
    val sh = Seq((1L, "x y z"), (2L, "x y z"), (3L, "x y z"),
                 (1L, "p q r"), (2L, "p q r"), (3L, "a b c"))
      .toDF("doc_id", "shingle")
    val n = Seq(Tuple1(3L)).toDF("n_total")
    val r = Stats.boilerplateShinglesOf(sh, n, k = 2)
      .select("rank", "shingle", "n_docs", "df_ppm")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(r.toSeq == Seq((1L, "x y z", 3L, 1000000L),
                          (2L, "p q r", 2L, 666666L)))
  }

  test("user burstiness: mean-gap log2 buckets") {
    val ev = Seq(
      (1L, 100L, "2024-01-01 10:00:00"),
      (2L, 100L, "2024-01-01 10:00:10"), // gap 10 → mean 10 → bucket 3
      (3L, 200L, "2024-01-01 10:00:00"),
      (4L, 200L, "2024-01-01 10:16:40")) // gap 1000 → bucket 9
      .map { case (e, u, t) => (e, u, ts(t)) }
      .toDF("event_id", "user_id", "ts")
    val r = Sessions.userBurstinessOf(ev)
      .select("bucket", "n_users", "sum_gaps", "sum_gap_sec")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r.toSeq == Seq((3L, 1L, 1L, 10L), (9L, 1L, 1L, 1000L)))
  }

  test("event seq surprisal: rare transition → more bits") {
    // user 1: a→b ×3 (common); user 2: a→c ×1 (rare)
    val ev = Seq(
      (1L, 1L, "a", "2024-01-01 10:00:00"),
      (2L, 1L, "b", "2024-01-01 10:00:01"),
      (3L, 1L, "a", "2024-01-01 10:00:02"),
      (4L, 1L, "b", "2024-01-01 10:00:03"),
      (5L, 1L, "a", "2024-01-01 10:00:04"),
      (6L, 1L, "b", "2024-01-01 10:00:05"),
      (7L, 2L, "a", "2024-01-01 10:00:00"),
      (8L, 2L, "c", "2024-01-01 10:00:01"))
      .map { case (e, u, ty, t) => (e, u, ty, ts(t)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    // transitions: u1 has a→b(3), b→a(2); u2 has a→c(1)
    // c(a,*)=4, c(a,b)=3 → bits ilog2 diff = 3-2=1 per a→b
    // c(a,c)=1 → 3-1=2 per a→c; c(b,*)=2, c(b,a)=2 → 2-2=0
    // u1: bits=3·1+2·0=3, n=5 → 4·3/5 = 2; u2: bits=2, n=1 → 8
    val r = Sessions.eventSeqSurprisalOf(ev)
      .select("qbits_bucket", "n_users", "sum_trans")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(r.toSeq == Seq((2L, 1L, 5L), (8L, 1L, 1L)))
  }

  test("cohort ltv: cumulative revenue per cohort over month index") {
    val uol = Seq(
      (1L, "1996-01-05 00:00:00", 10.0),
      (1L, "1996-03-05 00:00:00", 5.0),  // month_index 2
      (2L, "1996-03-01 00:00:00", 7.0))  // its own cohort
      .map { case (c, t, p) =>
        (c, ts(t), new java.math.BigDecimal(p).setScale(2)) }
      .toDF("customer_id", "date_time", "payment_amount")
    val r = Analytics.cohortLtvOf(uol)
      .select("cohort_month", "month_index", "n_active", "revenue",
              "cum_revenue")
      .as[(java.sql.Timestamp, Long, Long, Double, Double)]
      .collect().sortBy(x => (x._1.getTime, x._2))
    assert(r.toSeq == Seq(
      (ts("1996-01-01 00:00:00"), 0L, 1L, 10.0, 10.0),
      (ts("1996-01-01 00:00:00"), 2L, 1L, 5.0, 15.0),
      (ts("1996-03-01 00:00:00"), 0L, 1L, 7.0, 7.0)))
  }

  test("knn components: mutual edges cluster, one-way edges don't") {
    // queries are vec_id % 50 == 0. 0↔50 mutual; 100→0 one-way.
    val topk = Seq(
      (0L, 50L), (50L, 0L),     // mutual pair → one component {0,50}
      (100L, 0L),               // one-way (0 doesn't retrieve 100)
      (0L, 7L), (50L, 9L), (100L, 11L)) // non-query cands ignored
      .toDF("query_id", "cand_id")
    val r = Vectors.knnComponentsOf(topk)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(r.toSeq == Seq((0L, 2L), (100L, 1L)))
  }

  test("q9 profit: discounted revenue by nation x type x year") {
    val li = Seq((1L, 10L, 100L, java.math.BigDecimal.valueOf(100.00),
                  java.math.BigDecimal.valueOf(0.10)))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
            "l_discount")
    val o = Seq((1L, ts("1996-06-01 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
    val p = Seq((10L, "PROMO")).toDF("p_partkey", "p_type")
    val s = Seq((100L, 5L)).toDF("s_suppkey", "s_nationkey")
    val n = Seq((5L, "NATION_5")).toDF("n_nationkey", "n_name")
    val r = Analytics.productTypeProfitOf(li, o, p, s, n)
      .as[(String, String, Long, Double)].collect()
    assert(r.toSeq == Seq(("NATION_5", "PROMO", 1996L, 90.0)))
  }
}
