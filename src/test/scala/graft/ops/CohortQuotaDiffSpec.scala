package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-11f operators: JSON property extraction, cohort retention,
  * domain quota, keep-best canonical selection, doc-length histogram,
  * snapshot diff, integer fixed-point PageRank. Fixtures exercise the
  * branches the generated testdata never fires (malformed JSON, the
  * removed/changed diff classes). */
class CohortQuotaDiffSpec extends SparkSpec {
  import spark.implicits._

  test("propsJsonStats surfaces parse failures as n_events > n_parsed") {
    val ev = Seq(
      ("click", """{"k": 3}"""),
      ("click", """{"k": 5}"""),
      ("click", "not json"),
      ("view", """{"other": 1}"""),
      ("view", null.asInstanceOf[String])
    ).toDF("event_type", "props")
    val r = Analytics.propsJsonStatsOf(ev)
      .orderBy("event_type")
      .as[(String, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    assert(r == Seq(
      ("click", 3L, 2L, Some(8L), Some(3L), Some(5L)),
      ("view", 2L, 0L, None, None, None)))
  }

  test("cohortRetention: week-0 covers the cohort; later weeks count returners") {
    // cohort of Mon 2025-01-06: customers 1,2; customer 1 returns 2 weeks on
    // cohort of Mon 2025-01-13: customer 3 only
    val uol = Seq(
      (1L, "2025-01-06 10:00:00"),
      (2L, "2025-01-08 10:00:00"),
      (1L, "2025-01-20 09:00:00"),
      (3L, "2025-01-15 12:00:00")
    ).toDF("customer_id", "dt")
      .select(col("customer_id"), to_timestamp(col("dt")).as("date_time"))
    val r = Analytics.cohortRetentionOf(uol)
      .as[(java.sql.Timestamp, Long, Long, Long, Double)]
      .collect().toSeq.sortBy(x => (x._1.getTime, x._2))
    assert(r.map(x => (x._2, x._3, x._4, x._5)) ==
      Seq((0L, 2L, 2L, 1.0), (2L, 1L, 2L, 0.5), (0L, 1L, 1L, 1.0)))
  }

  test("domainQuota caps every source; ranks are input-order independent") {
    val docs = (0L until 100L).map(i => (i, s"src${i % 3}"))
      .toDF("doc_id", "source")
    val r = Corpus.domainQuotaOf(docs, cap = 5)
    val bySrc = r.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc.size == 3 && bySrc.values.forall(_ == 5L), bySrc)
    val again = Corpus
      .domainQuotaOf(docs.repartition(7).orderBy(desc("doc_id")), cap = 5)
    assert(r.orderBy("source", "rk").collect().toSeq ==
           again.orderBy("source", "rk").collect().toSeq)
  }

  test("mixWeights: α=1/2 flattens the head, ppm arithmetic is exact") {
    // A: 9 docs (isqrt 3), B: 1 doc (isqrt 1) -> tot_docs 10, tot_w 4
    val docs = ((0L until 9L).map(i => (i, "A")) :+ (9L, "B"))
      .toDF("doc_id", "source")
    val r = Corpus.mixWeightsOf(docs)
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r("A") == ((9L, 900000L, 750000L)))
    assert(r("B") == ((1L, 100000L, 250000L)))
  }

  test("keepBest keeps the highest-quality member, ties to min doc_id") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 6L)).toDF("doc_id", "cluster")
    val quality = Seq((1L, 0.2), (2L, 0.9), (3L, 0.9), (4L, 0.5), (5L, 0.5),
      (6L, 0.1)).toDF("doc_id", "quality")
    val r = Corpus.keepBestOf(clusters, quality)
      .as[(Long, Long, Double, Long)].collect().toSeq.sortBy(_._1)
    // cluster 1: docs 2,3 tie at 0.9 -> 2 wins; cluster 4: 4,5 tie -> 4
    assert(r == Seq((1L, 2L, 0.9, 3L), (4L, 4L, 0.5, 2L),
                    (6L, 6L, 0.1, 1L)))
  }

  test("docLenHist buckets at floor(log2) and partitions the corpus") {
    val stats = Seq((1L, 1L), (2L, 3L), (3L, 4L), (4L, 7L), (5L, 64L))
      .toDF("doc_id", "n_tokens")
    val r = TextOps.docLenHistOf(stats)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // 1 -> b0; 3 -> b1; 4,7 -> b2; 64 -> b6
    assert(r == Seq((0L, 1L, 1L, 1L, 1L), (1L, 1L, 3L, 3L, 3L),
                    (2L, 2L, 11L, 4L, 7L), (6L, 1L, 64L, 64L, 64L)))
    assert(r.map(_._2).sum == 5L)
  }

  test("snapshotDiff classifies added/removed/changed, drops unchanged") {
    val old = Seq((1, "a", 10), (2, "b", 20), (3, "c", 30))
      .toDF("k", "name", "city")
    val nw = Seq((2, "b", 20), (3, "x", 30), (4, "d", 40))
      .toDF("k", "name", "city")
    val r = Audit.snapshotDiffOf(old, nw, "k", Seq("name", "city"))
      .orderBy("k").collect().toSeq
    assert(r.map(row => (row.getInt(0), row.getString(1))) ==
      Seq((1, "removed"), (3, "changed"), (4, "added")))
    // changed row carries both versions of the differing column
    val ch = r(1)
    assert(ch.getString(2) == "c" && ch.getString(3) == "x")
  }

  test("pageRank on a 5-leaf star matches the hand-unrolled recurrence") {
    val edges = (1L to 5L).map(l => (0L, l)).toDF("u", "v")
    val r = Basket.pageRankOf(edges).as[(Long, Long)].collect().toMap
    // r0=1e6 everywhere; hub deg 5, leaves deg 1:
    //   i1: hub 150k+17/20*5e6=4,400,000   leaf 150k+17/20*(1e6 div 5)=320,000
    //   i2: hub 1,510,000                  leaf 898,000
    //   i3: hub 3,966,500                  leaf 406,700
    assert(r(0L) == 3966500L)
    assert((1L to 5L).forall(l => r(l) == 406700L), r)
    assert(r.values.sum == 6000000L) // exact mass conservation on this graph
  }

  test("pageRank is partitioning-independent (exact integer arithmetic)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("u", "v")
    val a = Basket.pageRankOf(edges).as[(Long, Long)].collect().toSeq.sorted
    val b = Basket.pageRankOf(edges.repartition(7)).as[(Long, Long)]
      .collect().toSeq.sorted
    assert(a == b)
  }

  test("minhashEstError reports matching-signature fraction vs exact") {
    val pairs = Seq((1L, 2L, 0.5), (3L, 4L, 0.3))
      .toDF("doc_a", "doc_b", "jaccard")
    // docs 1,2 agree on seeds 0-3 (4/8); docs 3,4 agree on seeds 0-3 too
    val sigs = (0L to 7L).flatMap { s =>
      Seq((1L, s, if (s < 4) "m" else "a"), (2L, s, if (s < 4) "m" else "b"),
          (3L, s, if (s < 4) "n" else "c"), (4L, s, if (s < 4) "n" else "d"))
    }.toDF("doc_id", "seed", "sig")
    val r = Dedup.minhashEstErrorOf(pairs, sigs)
      .as[(Long, Long, Long, Double, Double, Double)]
      .collect().toSeq.sortBy(_._1)
    assert(r == Seq((1L, 2L, 4L, 0.5, 0.5, 0.0),
                    (3L, 4L, 4L, 0.5, 0.3, 0.5 - 0.3)))
  }

  test("degreeDist rolls node degrees into a histogram") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("u", "v") // path: degs 1,2,1
    val r = Basket.degreeDistOf(edges)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(r == Seq((1L, 2L), (2L, 1L)))
  }

  test("revenueHhi is exact-integer share concentration per week") {
    val uol = Seq(
      (10, "2025-01-06 00:00:00", 300.0),
      (11, "2025-01-07 00:00:00", 100.0),
      (10, "2025-01-14 00:00:00", 50.0)
    ).toDF("item_id", "dt", "payment_amount")
      .select(col("item_id"), to_timestamp(col("dt")).as("date_time"),
              col("payment_amount"))
    val r = Analytics.revenueHhiOf(uol)
      .as[(java.sql.Timestamp, Long, Long, Double)]
      .collect().toSeq.sortBy(_._1.getTime)
    // week 1: items 300,100 -> (300^2+100^2)/400^2 = 0.625; week 2: single
    assert(r.map(x => (x._2, x._3, x._4)) ==
      Seq((2L, 400L, 0.625), (1L, 50L, 1.0)))
  }

  test("dqProfile counts rows, nulls and distincts per column in one scan") {
    val df = Seq((Some(1), "x"), (Some(1), "y"), (None, "z"))
      .toDF("a", "b")
    val r = Audit.dqProfileOf(df, Seq("a", "b"))
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(r == Seq(("a", 3L, 1L, 1L), ("b", 3L, 0L, 3L)))
  }

  test("langConfusion rolls per-doc predictions into a (lang, pred) matrix") {
    val preds = Seq((1L, "en", "en"), (2L, "en", "de"), (3L, "en", "en"),
      (4L, "fr", "fr")).toDF("doc_id", "lang", "pred_lang")
    val r = TextOps.langConfusionOf(preds)
      .as[(String, String, Long)].collect().toSeq.sorted
    assert(r == Seq(("en", "de", 1L), ("en", "en", 2L), ("fr", "fr", 1L)))
  }

  test("skewReport computes max/avg key skew from exact counts") {
    val df = Seq(1, 1, 1, 2).toDF("k")
    val r = Audit.skewReportOf(df, "k", "t.k")
      .as[(String, Long, Long, Long, Double)].collect().head
    assert(r == (("t.k", 2L, 4L, 3L, 1.5)))
  }

  test("clustersIncremental: pass-through untouched, merge affected") {
    // old world: {1,2} together, {3} alone, {4,5} together
    val oldLabels = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 4L), (5L, 4L))
      .toDF("doc_id", "cluster")
    // increment: docs 6,7; pairs bridge 5-6 and 6-7 -> {4,5,6,7} merges;
    // {1,2} and {3} must pass through untouched
    val newDocs = Seq(6L, 7L).toDF("doc_id")
    val incPairs = Seq((5L, 6L), (6L, 7L)).toDF("doc_a", "doc_b")
    val r = Dedup.clustersIncrementalOf(oldLabels, newDocs, incPairs)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(r == Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 4L), (5L, 4L),
                    (6L, 4L), (7L, 4L)))
  }

  test("clustersIncremental equals the full rebuild on the docs corpus") {
    val dir = "/root/testdata/sf0.001"
    val merged = Dedup.clustersIncremental(spark, dir)
      .as[(Long, Long)].collect().toSeq.sorted
    val rebuilt = Dedup.clusters(spark, dir)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(merged == rebuilt)
  }

  test("attribution credits the latest in-window touch, else 'none'") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: view then a later click (same ts as view -> id breaks tie),
      // purchase 1 day after -> click (higher event_id at equal ts) wins
      (1L, 1L, "2024-01-01 10:00:00", "view"),
      (2L, 1L, "2024-01-01 10:00:00", "click"),
      (3L, 1L, "2024-01-02 10:00:00", "purchase"),
      // user 2: touch 10 days before the purchase -> outside window
      (4L, 2L, "2024-01-01 00:00:00", "click"),
      (5L, 2L, "2024-01-11 00:00:00", "purchase"),
      // user 3: purchase with no touches at all
      (6L, 3L, "2024-01-05 00:00:00", "purchase")
    ).toDF("event_id", "user_id", "t", "event_type")
      .select(col("event_id"), col("user_id"),
        to_timestamp(col("t")).as("ts"), col("event_type"))
    val r = AsOf.lastTouchAttributionOf(ev)
      .as[(String, Long)].collect().toSeq.sorted
    assert(r == Seq(("click", 1L), ("none", 2L)))
  }

  test("source vocab overlap: exact intersection sizes and ppm Jaccard") {
    // A vocab {x,y,z}, B vocab {y,z,w}, C vocab {q}
    // A∩B = {y,z} -> J = 2/4 = 500000 ppm; A∩C = B∩C = ∅ (no row: inner)
    val dw = TextOps.withWords(TextOps.normalize(Seq(
      (0L, "A", "x y z y"), (1L, "B", "y z w"), (2L, "C", "q q q"))
      .toDF("doc_id", "source", "text")))
    val r = Corpus.sourceVocabOverlapOf(dw)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(("B", "A", 3L, 3L, 2L, 500000L)) ||
           r == Seq(("A", "B", 3L, 3L, 2L, 500000L)), r.toString)
  }

  test("nearDupRateBySource: cluster membership attribution, ppm-exact") {
    // source A: docs 0,1 in a 2-cluster, doc 2 singleton -> 2/3
    // source B: doc 3 singleton -> 0
    val docs = Seq((0L, "A"), (1L, "A"), (2L, "A"), (3L, "B"))
      .toDF("doc_id", "source")
    val clusters = Seq((0L, 0L), (1L, 0L), (2L, 2L), (3L, 3L))
      .toDF("doc_id", "cluster")
    val r = Corpus.nearDupRateBySourceOf(docs, clusters)
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r("A") == ((3L, 2L, 666666L)))
    assert(r("B") == ((1L, 0L, 0L)))
  }

  test("contamRateBySource: left join keeps clean sources at zero") {
    val docs = Seq((0L, "A"), (1L, "A"), (2L, "B"))
      .toDF("doc_id", "source")
    val contam = Seq((0L, 3L)).toDF("doc_id", "n_hits")
    val r = Corpus.contamRateBySourceOf(docs, contam)
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r("A") == ((2L, 1L, 500000L)))
    assert(r("B") == ((1L, 0L, 0L)))
  }

  test("topDocsPerSource: per-source top-k by quality, ties to min doc_id") {
    val docs = Seq((0L, "A"), (1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"))
      .toDF("doc_id", "source")
    val quality = Seq((0L, 0.5), (1L, 0.9), (2L, 0.9), (3L, 0.1), (4L, 0.7))
      .toDF("doc_id", "quality")
    val r = Corpus.topDocsPerSourceOf(docs, quality, k = 2)
      .select("source", "doc_id", "rnk")
      .as[(String, Long, Long)].collect().toSeq.sorted
    // A: 0.9-tie broken by doc_id (1 before 2); 0.5 and 0.1 cut by k=2
    assert(r == Seq(("A", 1L, 1L), ("A", 2L, 2L), ("B", 4L, 1L)))
  }

  test("crossSourceDupPairs: same-source pairs drop, key order canonical") {
    val docs = Seq((0L, "A"), (1L, "B"), (2L, "A"), (3L, "C"))
      .toDF("doc_id", "source")
    val pairs = Seq((0L, 1L), (1L, 2L), (0L, 2L), (0L, 3L))
      .toDF("doc_a", "doc_b")
    val r = Corpus.crossSourceDupPairsOf(docs, pairs)
      .as[(String, String, Long)].collect().toSeq.sorted
    // (0,1) A-B; (1,2) B-A -> canonical A-B again; (0,2) A-A dropped
    assert(r == Seq(("A", "B", 2L), ("A", "C", 1L)))
  }

  test("dupRateBySource: per-source exact-dup ppm from fingerprints") {
    // A: 4 docs, 2 unique -> 500000 ppm; B: 1 doc, clean -> 0
    val docs = TextOps.normalize(Seq(
      (0L, "A", "x x"), (1L, "A", "x x"), (2L, "A", "y"), (3L, "A", "y"),
      (4L, "B", "z")).toDF("doc_id", "source", "text"))
    val r = Corpus.dupRateBySourceOf(docs)
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r("A") == ((4L, 2L, 500000L)))
    assert(r("B") == ((1L, 1L, 0L)))
  }
}
