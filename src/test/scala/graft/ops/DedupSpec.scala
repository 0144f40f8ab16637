package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = TextOps.normalize(Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "The quick  brown fox jumps over the lazy dog"), // dup modulo norm
    (2L, "completely different words entirely here now then"),
    (3L, "tiny doc"))
    .toDF("doc_id", "text"))
  private lazy val words = TextOps.withWords(docs)
  private lazy val shingles = TextOps.shinglesOf(words)

  test("exact dedup groups normalized duplicates; keeper = min doc_id") {
    val g = Dedup.exactOf(docs).orderBy("keeper_doc_id")
      .select("keeper_doc_id", "n_dups").as[(Long, Long)].collect()
    assert(g.toSeq == Seq((0L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("short docs fall back to whole-doc shingle") {
    val s = shingles.where($"doc_id" === 3L).select("shingle").as[String].collect()
    assert(s.toSeq == Seq("tiny doc"))
  }

  test("identical docs share all minhash signatures and collide in LSH") {
    val sigs = Dedup.minhashOf(shingles)
    val s0 = sigs.where($"doc_id" === 0L).orderBy("seed").select("sig").as[String].collect()
    val s1 = sigs.where($"doc_id" === 1L).orderBy("seed").select("sig").as[String].collect()
    assert(s0.toSeq == s1.toSeq && s0.length == 8)
    val pairs = Dedup.minhashPairsOf(Dedup.minhashBandsOf(sigs))
      .as[(Long, Long)].collect()
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("simhash: identical docs equal; disjoint docs differ") {
    val sh = Dedup.simhashOf(words)
    val m = sh.as[(Long, Long)].collect().toMap
    assert(m(0L) == m(1L))
    assert(m(0L) != m(2L))
  }

  test("ngram jaccard: identical = 1.0, disjoint = 0.0") {
    val pairs = Seq((0L, 1L), (0L, 2L)).toDF("doc_a", "doc_b")
    val j = Dedup.ngramJaccardFor(pairs, shingles)
      .select("doc_b", "jaccard").as[(Long, Double)].collect().toMap
    assert(j(1L) == 1.0)
    assert(j(2L) == 0.0)
  }
}
