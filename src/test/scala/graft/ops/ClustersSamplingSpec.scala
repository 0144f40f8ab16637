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
}
