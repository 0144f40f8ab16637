package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, lit}

/** Round-14 hardening: the hamming-LSH giant-bucket guard (maxBucket star
  * degradation + in-plan denseGate — the treatment minhashPairsOf got in
  * r13), the guarded frame-near-dup clustered sibling, and Basket/CC
  * persist hygiene (tracked frames reclaimed by Caches.invalidateAll).
  */
class Round14OpsSpec extends SparkSpec {
  import spark.implicits._

  // six 32-bit hash values sharing their low byte (band-0 chunk 0) AND
  // their bytes 2/3 (band-2/3 chunks 0) — a degenerate boilerplate-ish
  // bucket; all pairwise hamming ≤ 3 (i ^ j ≤ 7 on the second byte)
  private def degenerateHashes: DataFrame =
    (1L to 6L).map(i => (i, i * 256L)).toDF("doc_id", "simhash")

  test("hamming guard: oversized bucket degrades to a star, not a clique") {
    val guarded = Dedup.simhashPairsOf(degenerateHashes, maxBucket = 4)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // star pairs: min value (doc 1) against each other member — linear
    assert(guarded == (2L to 6L).map(i => (1L, i)).toSet)
    val exact = Dedup.simhashPairsOf(degenerateHashes)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.size == 15) // C(6,2): every pair is within hamming 3
  }

  test("hamming guard: dense form raises loudly over the gate") {
    val ex = intercept[Exception] {
      Dedup.simhashPairsOf(degenerateHashes, maxBucket = Int.MaxValue,
                           denseGate = 4).count()
    }
    def messages(t: Throwable): List[String] =
      if (t == null) Nil
      else Option(t.getMessage).toList ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("denseGate")),
      s"expected the denseGate raise, got: $ex")
  }

  test("hamming guard: compliant corpus output unchanged at any level") {
    // two clone groups (hash A: docs 1-3, hash B: docs 4-5, hamming(A,B)=1)
    // plus a far value (doc 6) — no bucket over 4 distinct values
    val hashes = Seq((1L, 1024L), (2L, 1024L), (3L, 1024L),
                     (4L, 1025L), (5L, 1025L), (6L, -1L))
      .toDF("doc_id", "simhash")
    val exact = Dedup.simhashPairsOf(hashes)
      .as[(Long, Long, Long)].collect().toSet
    val guarded = Dedup.simhashPairsOf(hashes, maxBucket = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(guarded == exact)
    assert(exact.map(p => (p._1, p._2)) ==
      Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L),
          (1L, 4L), (1L, 5L), (2L, 4L), (2L, 5L), (3L, 4L), (3L, 5L)))
  }

  private def componentsOf(edges: DataFrame): Set[(Long, Long)] = {
    val nodes = edges.select(col("doc_a").as("doc_id"))
      .unionAll(edges.select(col("doc_b").as("doc_id"))).distinct()
    Dedup.clustersFastOf(nodes, edges).as[(Long, Long)].collect().toSet
  }

  test("spanning edges: components equal the exact pair graph's") {
    val hashes = Seq((1L, 1024L), (2L, 1024L), (3L, 1024L),
                     (4L, 1025L), (5L, 1025L), (6L, -1L))
      .toDF("doc_id", "simhash")
    val exactComp = componentsOf(
      Dedup.simhashPairsOf(hashes).select("doc_a", "doc_b"))
    val spanComp = componentsOf(
      Dedup.hammingSpanningEdgesOf(hashes, "simhash", chunkBits = 8))
    assert(spanComp == exactComp)
    assert(spanComp == (1L to 5L).map(i => (i, 1L)).toSet)
    // and the spanning set is LINEAR: 2 within-group stars + 1 rep edge
    val span = Dedup.hammingSpanningEdgesOf(hashes, "simhash", 8)
      .as[(Long, Long)].collect().toSeq
    assert(span.size == 4, s"expected 4 spanning edges, got $span")
  }

  test("frame near-dup clusters ≡ components of the exact pair list") {
    val payload = ("lorem ipsum dolor sit amet consectetur " * 8).take(300)
    val docs = Seq((1L, payload), (2L, payload),
                   (3L, "zq" * 150)).toDF("doc_id", "text")
    val clusters = Multimodal.frameNearDupClustersOf(docs)
      .as[(Long, Long)].collect().toSet
    assert(clusters == Set((1L, 2L))) // docs 1+2 one family; doc 3 no pairs
    // cross-check: components over the exact pair list agree
    val exactComp = componentsOf(
      Multimodal.frameNearDupOf(docs).select("doc_a", "doc_b"))
      .groupBy(_._2).map { case (c, ms) => (c, ms.size.toLong) }.toSet
    assert(exactComp == clusters)
  }

  test("basket + CC ops: tracked persists reclaimed by invalidateAll") {
    val li = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L),
                 (3L, 11L), (3L, 12L), (4L, 11L), (4L, 12L))
      .toDF("l_orderkey", "l_partkey")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // every hygiene-class op the r13 verdict flagged, materialized
    Basket.partPairsOf(li).count()
    Basket.triangleStatsOf(edges).count()
    Basket.pageRankOf(edges).count()
    Basket.neighborJaccardOf(edges).count()
    Basket.coPurchaseComponentsOf(edges).count()
    // + the r14-advice path: the spanning-edge clustered rollup must not
    // leave its input hash persist behind (hammingSpanningEdgesOf now
    // releases it after the tracked eager checkpoint)
    val payload = ("lorem ipsum dolor sit amet consectetur " * 8).take(300)
    Multimodal.frameNearDupClustersOf(
      Seq((1L, payload), (2L, payload)).toDF("doc_id", "text")).count()
    assert(graft.Caches.size(spark) > 0, "ops should register tracked frames")
    graft.Caches.invalidateAll(spark)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"orphaned cached RDDs after invalidateAll: ${after -- before}")
  }

  test("CC loops release superseded per-round checkpoints eagerly") {
    // a 40-node chain forces clustersFastOf through several rounds; the
    // live checkpoint count during the call must stay O(1), not O(rounds)
    val pairs = (1L until 40L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val nodes = (1L to 40L).toDF("doc_id")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val labels = Dedup.clustersFastOf(nodes, pairs)
    assert(labels.select("cluster").distinct().count() == 1)
    val during = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(during.size <= 2, // final checkpoint (+ its in-flight sibling)
      s"superseded round checkpoints not released: ${during.size} live")
    graft.Caches.invalidateAll(spark)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"orphaned checkpoints after invalidateAll: ${after -- before}")
  }
}
