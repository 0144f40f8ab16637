package graft.streaming

import graft.SparkSpec
import graft.ops.{Dedup, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The substring-tier ingest as a stream: per-batch span checks against
  * the growing bucketed index equal the batch rebuild's restriction, and
  * a foreachBatch replay cannot double the index state.
  */
class SubstringIngestSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def ps(docs: DataFrame): DataFrame =
    TextOps.posShinglesOf(TextOps.withWords(TextOps.normalize(docs)))

  test("streamed ingest: each batch's spans equal a fresh-index batch " +
       "check, which equals the rebuild restricted to the batch") {
    val watch = java.nio.file.Files.createTempDirectory("graft_ssw").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ssc").toString
    val results = java.nio.file.Files.createTempDirectory("graft_ssr").toString
    val whRoot = java.nio.file.Files.createTempDirectory("graft_ssh").toString
    val wh = new graft.catalog.Warehouse(spark, whRoot)
    val docs = graft.etl.Feeds.table(spark, dir, "documents")
    val n = docs.agg(max("doc_id")).as[Long].head()
    val cuts = Seq(n / 3, 2 * n / 3) // 3 id-ranged batches, ascending
    def batch(i: Int): DataFrame = i match {
      case 0 => docs.where($"doc_id" <= cuts(0))
      case 1 => docs.where($"doc_id" > cuts(0) && $"doc_id" <= cuts(1))
      case 2 => docs.where($"doc_id" > cuts(1))
    }
    // drop one file per drain: three daily crawler deliveries
    def deliver(i: Int): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_ssd").toString
      batch(i).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(watch, s"crawl_$i.parquet"))
    }
    for (i <- 0 to 2) {
      deliver(i)
      SubstringIngest.runIngestAvailableNow(spark, dir, watch, ckpt, wh,
                                            results)
    }
    assert(SubstringIngest.highWaterMark(spark, wh) == 2L)
    // batch 2's streamed result vs a fresh batch-built index of docs 0-1
    val streamed = spark.read.parquet(s"$results/batch_id=2")
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    val idxPs = ps(batch(0).unionAll(batch(1)))
    val census = Dedup.substringCensusOf(idxPs)
    val fresh = Dedup.substringSpansIncOf(
        Dedup.substringIndexOf(idxPs, census), census, ps(batch(2)))
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(streamed == fresh && streamed.nonEmpty)
    // and the rebuild restriction: pairs of the full corpus whose high id
    // is in batch 2 (batches are ascending id ranges)
    val rebuild = Dedup.substringSpansOf(ps(docs))
      .where($"doc_b" > cuts(1))
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(streamed == rebuild)
    // batch 1 the same way (guards the middle state, not just the last)
    val streamed1 = spark.read.parquet(s"$results/batch_id=1")
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    val rebuild01 = Dedup.substringSpansOf(ps(batch(0).unionAll(batch(1))))
      .where($"doc_b" > cuts(0))
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(streamed1 == rebuild01)
  }

  test("foreachBatch replay: a batch id at/under the high-water mark " +
       "re-checks but cannot double the census or index") {
    val whRoot = java.nio.file.Files.createTempDirectory("graft_ssr2").toString
    val wh = new graft.catalog.Warehouse(spark, whRoot)
    val docs = graft.etl.Feeds.table(spark, dir, "documents")
    val b0 = docs.where($"doc_id" % 2 === 0)
    val b1 = docs.where($"doc_id" % 2 === 1)
    SubstringIngest.ingestBatch(wh, b0, batchId = 0L)
    val r1 = SubstringIngest.ingestBatch(wh, b1, batchId = 1L)
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    def state(): (Long, Long) = (
      wh.readTable(SubstringIngest.Db, "ss_census")
        .agg(sum("occ_i")).as[Long].head(),
      wh.readTable(SubstringIngest.Db, "ss_index").count())
    val before = state()
    // crash-replay of batch 1: same docs, same id
    val replayed = SubstringIngest.ingestBatch(wh, b1, batchId = 1L)
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(state() == before, "replay mutated the index state")
    // the replay re-runs the check against the POST-append state, so its
    // rows are a superset shape — but the committed results sink is keyed
    // by batch id (overwrite), so what persists is deterministic; here we
    // only require the replay not to crash and the state to hold
    assert(replayed.nonEmpty || r1.isEmpty)
  }
}
