package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClustersSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: chains and singletons resolve to min label") {
    val ids = (0L to 6L).toDF("doc_id")
    // components: {0,1,2} via chain, {3,4}, {5}, {6}
    val pairs = Seq((0L, 1L), (1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    val got = Dedup.clustersOf(ids, pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L,
                      5L -> 5L, 6L -> 6L))
  }

  test("cluster keeper equals the exact-dup keeper for identical docs") {
    val docs = TextOps.normalize(Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "alpha beta gamma delta epsilon zeta"),
      (12L, "unrelated content words here entirely different"))
      .toDF("doc_id", "text"))
    val pairs = Dedup.minhashPairsOf(Dedup.minhashBandsOf(
      Dedup.minhashOf(TextOps.shinglesOf(TextOps.withWords(docs)))))
    val clusters = Dedup.clustersOf(docs.select("doc_id"), pairs)
      .as[(Long, Long)].collect().toMap
    assert(clusters(10L) == 10L && clusters(11L) == 10L && clusters(12L) == 12L)
  }

  test("star-contraction CC equals label propagation on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 40
      val ids = (0L until n.toLong).toDF("doc_id")
      val pairs = Seq.fill(30)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2).toDF("doc_a", "doc_b")
      val slow = Dedup.clustersOf(ids, pairs, maxIters = 100)
        .as[(Long, Long)].collect().toSet
      val fast = Dedup.clustersFastOf(ids, pairs)
        .as[(Long, Long)].collect().toSet
      assert(fast == slow, s"trial $trial")
    }
  }

  test("star contraction handles diameter > label-propagation budget") {
    // a 120-node chain: label propagation at maxIters=20 must fail loudly,
    // star contraction converges in O(log n) rounds
    val ids = (0L until 120L).toDF("doc_id")
    val chain = (0L until 119L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    assertThrows[IllegalStateException] {
      Dedup.clustersOf(ids, chain, maxIters = 20).count()
    }
    val fast = Dedup.clustersFastOf(ids, chain).as[(Long, Long)].collect()
    assert(fast.length == 120 && fast.forall(_._2 == 0L))
  }

  test("cluster labels are memoized: curation reuses the computed frame") {
    val d = "/root/testdata/sf0.001"
    // same instance ⇒ the driver-side CC loop ran once; Corpus.curated's
    // keeper join consumes the identical frame instead of recomputing
    assert(Dedup.clusters(spark, d) eq Dedup.clusters(spark, d))
    val curated = Corpus.curated(spark, d)
    val keepers = Dedup.clusters(spark, d)
      .where(col("doc_id") === col("cluster")).count()
    assert(curated.count() <= keepers && curated.count() > 0)
  }

  test("hash sampling is deterministic and rate-accurate") {
    val df = (0L until 4096L).toDF("doc_id")
    val once = Sampling.hashSample(df, "doc_id", "4").count()
    val twice = Sampling.hashSample(df, "doc_id", "4").count()
    assert(once == twice)
    // expect ~4/16 = 1024 ± generous tolerance
    assert(once > 800 && once < 1250, s"got $once")
  }

  test("train/val/test split partitions every doc exactly once") {
    val d = "/root/testdata/sf0.001"
    val split = Sampling.trainValTestSplit(spark, d)
    val total = TextOps.docs(spark, d).count()
    assert(split.count() == total)
    val byBucket = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(byBucket.keySet == Set("train", "val", "test"))
    assert(byBucket.values.sum == total)
    assert(byBucket("train") > byBucket("val"))
  }

  test("top-k customers plans as TakeOrdered (no global sort of all rows)") {
    val plan = Analytics.topCustomers(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
  }

  test("curated v2 is the filtered subset of curated v1") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val v1 = Corpus.curated(spark, d).select("doc_id").as[Long].collect().toSet
    val v2 = Corpus.curatedV2(spark, d)
    val v2ids = v2.select("doc_id").as[Long].collect().toSet
    assert(v2ids.subsetOf(v1) && v2ids.nonEmpty && v2ids != v1)
    // every admitted doc passes all three new gates
    val bad = v2.join(TextOps.piiScan(spark, d).where($"has_pii"), "doc_id")
      .count() +
      v2.where($"rep_ratio" > Corpus.repetitionCeiling).count() +
      v2.join(TextOps.contamination(spark, d), "doc_id").count()
    assert(bad == 0L)
  }

  test("shuffle shards: dense per-shard ranks, deterministic, full cover") {
    import org.apache.spark.sql.functions.{col, desc}
    val docs = (0L until 200L).map(i => Tuple1(i)).toDF("doc_id")
    val r = Sampling.shuffleShardsOf(docs)
    val rows = r.as[(Long, Long, Long)].collect().toSeq
    assert(rows.size == 200 && rows.map(_._1).distinct.size == 200)
    assert(rows.forall(t => t._2 >= 0 && t._2 < 8))
    // ranks are 1..n dense within each shard (a true permutation address)
    for ((_, members) <- rows.groupBy(_._2))
      assert(members.map(_._3).sorted == (1L to members.size).toSeq)
    // input order / partitioning does not change the assignment
    val again = Sampling
      .shuffleShardsOf(docs.repartition(7).orderBy(desc("doc_id")))
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.sortBy(_._1) == again.sortBy(_._1))
    // ...and the order is not the input order (it did shuffle): the
    // doc_ids in rank order within shard 0 are not monotone
    val s0 = rows.filter(_._2 == 0L).sortBy(_._3).map(_._1)
    assert(s0 != s0.sorted)
  }
}
