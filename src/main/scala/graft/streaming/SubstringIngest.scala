package graft.streaming

import graft.catalog.Warehouse
import graft.ops.{Dedup, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured-Streaming form of the substring-tier ingest — the crawler
  * re-run as a stream: document files land in a watched directory, each
  * micro-batch is checked for duplicated spans against the
  * occurrence-capped positional shingle index
  * ([[graft.ops.Dedup.substringSpansIncOf]]), and the batch's shingles
  * are folded into the index for the NEXT batch (same batch ≡ stream
  * stance as [[IncrementStream]] — the check is a pure function of
  * (index state, batch), so the streamed cycle equals the batch one).
  *
  * Index maintenance is APPEND-ONLY on both artifacts (the
  * `Warehouse.bucketedAppend` treatment, bucket layout on `sh`
  * preserved so every cycle's joins stay co-located):
  *  - `ss_census` accrues (sh, occ_i) DELTAS — one row per (batch,
  *    shingle) — summed at read (a groupBy on the bucketed key, no
  *    Exchange). A shingle crossing the cap as batches accrue needs NO
  *    rewrite: the read-side combined sum excludes it from that point
  *    on.
  *  - `ss_index` accrues the batch's position rows, pre-filtered to
  *    shingles whose POST-batch combined count is still under the cap —
  *    an over-cap shingle can never come back under as the corpus
  *    grows, so the drop is lossless (the same argument as the batch
  *    [[graft.ops.Dedup.substringIndexOf]]); rows of a shingle that
  *    goes over cap in a LATER batch stay as dead weight until
  *    compaction but are never matched (admissibility re-checks the
  *    summed census every batch) — storage debt, never wrong results.
  *
  * Replay safety: `foreachBatch` re-delivers a batch after a crash, and
  * a blind re-run would double the census counts. [[ingestBatch]] is
  * guarded by a committed high-water mark (`ss_hwm`, the standard
  * foreachBatch idempotence pattern): a batch id at or below the mark
  * re-runs the (pure) check but skips the append, so the index state a
  * replay produces is the state the first run left.
  */
object SubstringIngest {

  val Db = "dedup_stream"

  private def hwmPath(wh: Warehouse): String = s"${wh.rootDir}/$Db/ss_hwm"

  /** Last APPENDED batch id, -1 before the first. */
  def highWaterMark(spark: SparkSession, wh: Warehouse): Long = {
    val p = new java.io.File(hwmPath(wh))
    if (p.exists) java.nio.file.Files.readString(p.toPath).trim.toLong
    else -1L
  }

  private def commitHwm(wh: Warehouse, id: Long): Unit = {
    val p = new java.io.File(hwmPath(wh))
    p.getParentFile.mkdirs()
    java.nio.file.Files.writeString(p.toPath, id.toString)
  }

  /** Check `docs` against the current index and fold their shingles in
    * (unless `batchId` is at/under the high-water mark — a replay, whose
    * append already happened). Returns the batch's span rollup: every
    * (doc_a, doc_b, n_spans, max/sum_span_words) pair touching the
    * batch, equal to a batch rebuild over (indexed ∪ batch) docs
    * restricted to pairs with a batch side (spec-asserted). */
  def ingestBatch(wh: Warehouse, docs: DataFrame, batchId: Long,
                  maxOcc: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    val newPs = TextOps.posShinglesOf(
        TextOps.withWords(TextOps.normalize(docs)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val newCensus = newPs.groupBy("sh").agg(count(lit(1)).as("occ_i"))
    val bootstrap = !wh.exists(Db, "ss_index")
    // empty-but-typed stand-ins keep the first batch on the same plan
    val index =
      if (bootstrap) newPs.where(lit(false)) else wh.readTable(Db, "ss_index")
    val censusRead =
      if (bootstrap) newCensus.where(lit(false))
      else wh.readTable(Db, "ss_census")
        .groupBy("sh").agg(sum("occ_i").as("occ_i"))
    // eager localCheckpoint: the rollup must MATERIALIZE before the
    // appends mutate the tables it reads — a lazily-cached plan could be
    // evicted and recomputed against the post-append state
    val spans = Dedup.substringSpansIncOf(index, censusRead, newPs,
                                          maxOcc = maxOcc)
      .localCheckpoint(true)
    if (batchId > highWaterMark(spark, wh)) {
      // post-batch combined count per batch shingle: prior sum + delta
      val keep = newCensus.select(col("sh"), col("occ_i").as("occ_n"))
        .join(censusRead, Seq("sh"), "left")
        .where(col("occ_n") + coalesce(col("occ_i"), lit(0L))
                 <= lit(maxOcc.toLong))
        .select("sh")
      if (bootstrap) {
        wh.bucketedOverwrite(Db, "ss_census", newCensus, "sh", 16)
        wh.bucketedOverwrite(Db, "ss_index", newPs.join(keep, Seq("sh")),
                             "sh", 16)
      } else {
        wh.bucketedAppend(Db, "ss_census", newCensus, "sh", 16)
        wh.bucketedAppend(Db, "ss_index", newPs.join(keep, Seq("sh")),
                          "sh", 16)
      }
      commitHwm(wh, batchId)
    }
    newPs.unpersist(false)
    spans
  }

  /** Drain every document file currently in `watchDir` through the
    * ingest cycle and stop (the [[IncrementStream]] AvailableNow shape:
    * re-invoking with the same checkpoint picks up only new files). Each
    * batch's span rollup lands under `resultsDir` keyed by batch id —
    * idempotent on replay (overwrite of the same batch path). */
  def runIngestAvailableNow(spark: SparkSession, dir: String,
                            watchDir: String, checkpointDir: String,
                            wh: Warehouse, resultsDir: String): Unit = {
    val schema = graft.etl.Feeds.table(spark, dir, "documents").schema
    val q = spark.readStream.schema(schema).parquet(watchDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        ingestBatch(wh, batch, id)
          .write.mode("overwrite").parquet(s"$resultsDir/batch_id=$id")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
