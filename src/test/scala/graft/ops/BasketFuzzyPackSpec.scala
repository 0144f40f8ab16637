package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixture specs for the round-11 batch: market-basket pairs, blocked fuzzy
  * match, and sequence packing. */
class BasketFuzzyPackSpec extends SparkSpec {
  import spark.implicits._

  // orders: 1 = {10, 20, 30}; 2 = {10, 20}; 3 = {10, 20}; 4 = {30}
  // part 10 appears twice in order 1 (two lines) — set semantics keep one
  private lazy val lineitem = Seq(
    (1L, 10L), (1L, 10L), (1L, 20L), (1L, 30L),
    (2L, 10L), (2L, 20L),
    (3L, 10L), (3L, 20L),
    (4L, 30L))
    .toDF("l_orderkey", "l_partkey")

  test("basket pairs count set-based co-occurrence with exact lift") {
    val got = Basket.partPairsOf(lineitem, minSupport = 2)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    // only (10,20) reaches support 2 (orders 1,2,3); n_10=3, n_20=3, N=4
    assert(got == Seq((10L, 20L, 3L, 3L, 3L, 3.0 * 4 / (3 * 3))))
  }

  test("minSupport=1 keeps the single-order pairs too") {
    val pairs = Basket.partPairsOf(lineitem, minSupport = 1)
      .select("part_a", "part_b", "n_both")
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((10L, 20L, 3L), (10L, 30L, 1L), (20L, 30L, 1L)))
  }

  test("fuzzy pairs: same-block names within edit distance, once per pair") {
    val part = Seq(
      "red widget", "red widget", "wed widget", // dup name collapses; dist 1
      "wet widget",                             // dist 1 from "wed widget"
      "blue widget",                            // dist 4 from "wed widget"
      "red gizmo")                              // different block
      .toDF("p_name")
    val got = Fuzzy.fuzzyPartPairsOf(part, maxDist = 2)
      .as[(String, String, Int, Long, Long)].collect().toSet
    assert(got == Set(
      ("red widget", "wed widget", 1, 2L, 1L),
      ("red widget", "wet widget", 2, 2L, 1L),
      ("wed widget", "wet widget", 1, 1L, 1L)))
    // "blue widget" is ≥3 edits from every block-mate — filtered; "red
    // gizmo" never pairs (block mismatch) even though "red widget" is close
  }

  test("packing assigns each doc to the chunk its first token lands in") {
    // one shard (ids ≡ 0 mod 8), capacity 10: cum 4,12,18 → starts 0,4,12
    // → chunks 0,0,1
    val docs = Seq((0L, Seq.fill(4)("w")), (8L, Seq.fill(8)("w")),
                   (16L, Seq.fill(6)("w")))
      .toDF("doc_id", "words")
    val got = Pack.packSequencesOf(docs, nShards = 8, capacity = 10)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(got == Seq(
      (0L, 0L, 2L, 12L, 0L, 8L),   // docs 0+8: 12 tokens (one-doc overhang)
      (0L, 1L, 1L, 6L, 16L, 16L)))
  }

  test("packing shards are independent: doc order crosses shard boundaries") {
    val docs = Seq((0L, Seq.fill(5)("w")), (1L, Seq.fill(5)("w")),
                   (2L, Seq.fill(5)("w")))
      .toDF("doc_id", "words")
    val got = Pack.packSequencesOf(docs, nShards = 2, capacity = 4)
      .select("shard", "chunk", "n_docs")
      .as[(Long, Long, Long)].collect().toSet
    // shard 0 holds docs 0,2 (cum 5,10 → chunks 0,1); shard 1 holds doc 1
    assert(got == Set((0L, 0L, 1L), (0L, 1L, 1L), (1L, 0L, 1L)))
  }

  test("neighborJaccard: triangle edges share one neighbor, tail edge zero") {
    // graph: triangle {1,2,3} plus pendant edge (3,4)
    // deg: 1->2, 2->2, 3->3, 4->1
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val r = Basket.neighborJaccardOf(edges)
      .select("u", "v", "n_common", "jaccard_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(r == Seq(
      (1L, 2L, 1L, 333333L),  // 1/(2+2-1)
      (1L, 3L, 1L, 250000L),  // 1/(2+3-1)
      (2L, 3L, 1L, 250000L),
      (3L, 4L, 0L, 0L)))      // no common neighbor
  }

  test("packEfficiency: ppm fill factor per shard against the capacity") {
    // one shard, two chunks of 300 and 212 tokens at capacity 512:
    // fill = 512_tokens*1e6 / (2*512) = 500000
    val packed = Seq((0L, 0L, 300L), (0L, 1L, 212L), (1L, 0L, 512L))
      .toDF("shard", "chunk", "chunk_tokens")
    val r = Pack.packEfficiencyOf(packed)
      .select("shard", "n_chunks", "shard_tokens", "fill_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(r == Seq((0L, 2L, 512L, 500000L), (1L, 1L, 512L, 1000000L)))
  }
}
