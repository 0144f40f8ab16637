package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-17 additions: the substring-ingest storage-debt ledger — checked
  * against a hand-computed fixture AND against the actual streamed
  * ingest's physical appends (the ledger is the pure relational form of
  * [[graft.streaming.SubstringIngest]]'s batch math, so the two must
  * agree row for row).
  */
class Round17OpsSpec extends SparkSpec {
  import spark.implicits._

  // one shingle per doc (3-word texts): "a b c" repeats in docs 1/3/5
  // (one occurrence per batch), the rest are unique
  private def fixture = Seq(
    (1L, "a b c"), (2L, "u1 u2 u3"),
    (3L, "a b c"), (4L, "u4 u5 u6"),
    (5L, "a b c"), (6L, "u7 u8 u9")).toDF("doc_id", "text")

  test("ingest-debt ledger: hand-computed cumulative-cap math, cap 2") {
    // mx=6 -> batches {1,2},{3,4},{5,6}; shared shingle S: cum 1/2/3,
    // total 3 (over cap 2 -> never live); uniques: cum=total=1
    val got = Dedup.substringIngestDebtOf(
        TextOps.posShinglesOf(TextOps.withWords(TextOps.normalize(fixture))),
        maxOcc = 2)
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(got == Seq(
      (0L, 2L, 2L, 1L, 1L), // S admitted (cum 1) but dead; unique lives
      (1L, 2L, 2L, 1L, 1L), // S admitted (cum 2) but dead; unique lives
      (2L, 2L, 1L, 1L, 0L)  // S over cap (cum 3): not admitted
    ))
  }

  test("ingest-debt ledger equals the streamed ingest's physical appends " +
       "and compaction reclaims exactly n_dead") {
    val wh = new graft.catalog.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("graft_r17").toString)
    val ledger = Dedup.substringIngestDebtOf(
        TextOps.posShinglesOf(TextOps.withWords(TextOps.normalize(fixture))),
        maxOcc = 2)
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    for (b <- 0 to 2)
      graft.streaming.SubstringIngest.ingestBatch(wh,
        fixture.where($"doc_id" > b * 2 && $"doc_id" <= b * 2 + 2),
        batchId = b.toLong, maxOcc = 2)
    val physByBatch = wh.readTable(graft.streaming.SubstringIngest.Db,
        "ss_index")
      .groupBy("batch_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    for ((batch, _, nAppended, _, _) <- ledger)
      assert(physByBatch.getOrElse(batch, 0L) == nAppended,
        s"batch $batch: ledger says $nAppended appended")
    // compaction leaves exactly the live rows
    graft.streaming.SubstringIngest.compactState(wh, maxOcc = 2)
    val liveTotal = ledger.map(_._4).sum
    assert(graft.streaming.SubstringIngest.committedIndex(wh).count()
      == liveTotal)
  }

  test("debt ledger on real docs: invariants hold at sf0.001") {
    val rows = Dedup.substringIngestDebt(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(rows.map(_._1) == Seq(0L, 1L, 2L))
    for ((_, nPos, nApp, nLive, nDead) <- rows) {
      assert(nApp <= nPos && nLive <= nApp && nDead == nApp - nLive)
      assert(nPos > 0)
    }
  }
}
