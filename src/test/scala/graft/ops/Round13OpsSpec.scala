package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-13 hardening: graphHops persist hygiene (no orphaned cached RDDs
  * after a call in a long-lived session) and the dense-pair bucket gate
  * (loud raise on a degenerate bucket instead of a silent quadratic run).
  */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  test("graph hops: no orphaned cached RDDs after the call") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // session-reuse shape: repeated invocations must not accrete frames
    val r1 = Basket.graphHopsOf(edges).as[(Long, Long)].collect().toMap
    val r2 = Basket.graphHopsOf(edges).as[(Long, Long)].collect().toMap
    assert(r1 == Map(0L -> 1L, 1L -> 2L, 2L -> 1L, 3L -> 1L))
    assert(r1 == r2)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"graphHopsOf leaked cached RDDs: ${after -- before}")
  }

  private def bandsOf(rows: Seq[(Long, Int, String)]) =
    rows.toDF("doc_id", "band", "band_hash")

  test("dense-pair gate: degenerate bucket raises loudly") {
    // one 5-doc bucket, gate 3 -> the exact dense form must fail, not
    // run C(5,2) silently
    val bands = bandsOf((1L to 5L).map(i => (i, 0, "h0")))
    val ex = intercept[Exception] {
      Dedup.minhashPairsOf(bands, Int.MaxValue, denseGate = 3).count()
    }
    def messages(t: Throwable): List[String] =
      if (t == null) Nil
      else Option(t.getMessage).toList ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("denseGate")),
      s"expected the denseGate raise, got: $ex")
  }

  test("dense-pair gate: compliant corpus output is unchanged") {
    val bands = bandsOf(
      (1L to 5L).map(i => (i, 0, "h0")) ++ Seq((6L, 1, "h1"), (7L, 1, "h1")))
    val gated = Dedup.minhashPairsOf(bands, Int.MaxValue, denseGate = 5)
      .as[(Long, Long)].collect().toSet
    val exact = Dedup.minhashPairsOf(bands, Int.MaxValue, Int.MaxValue)
      .as[(Long, Long)].collect().toSet
    assert(gated == exact)
    assert(gated.size == 11) // C(5,2) + 1
  }
}
