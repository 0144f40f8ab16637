package graft.streaming

import graft.ops.{Dedup, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STREAMING near-dup admission check — the online half of the round-4
  * incremental ingest story ([[graft.ops.Dedup.incrementalPairsOf]]): as
  * new documents arrive, compute their MinHash band hashes map-side (the
  * native [[graft.expr.MinHashBands]] kernel — stateless projection, fully
  * streamable) and equi-join against the STATIC persisted band index — a
  * stream-static join, no streaming state at all.
  *
  * Scope: the stream answers "does this new doc collide with the indexed
  * corpus" (the admission/dedup gate). New×new pairs WITHIN the stream are
  * deliberately left to the nightly batch pass (a stream-stream self-join
  * over all history would need unbounded state); the batch
  * `incrementalPairsOf` covers both halves and the spec proves the
  * stream's half agrees with it exactly.
  *
  * At scale the static side is the bucketed `(band, band_hash)` warehouse
  * table, re-read per micro-batch — Spark re-plans the static side each
  * batch, so an index append between batches is picked up automatically.
  */
object DedupStream {

  /** Candidate (new_doc ↔ indexed_doc) collisions; works on a streaming OR
    * batch `newDocs` (doc_id, text) — the spec runs both and compares.
    * Emits one row per shared bucket; distinct is per-consumer (in a
    * stream, apply it per micro-batch via foreachBatch if needed). */
  def candidatesVsIndex(newDocs: DataFrame, indexBands: DataFrame): DataFrame = {
    val bands = Dedup.minhashBandsFastOf(
      TextOps.withWords(TextOps.normalize(newDocs)))
    bands.select(col("doc_id").as("doc_n"), col("band"), col("band_hash"))
      .join(indexBands.select(col("doc_id").as("doc_o"),
                              col("band"), col("band_hash")),
            Seq("band", "band_hash"))
      .select(least(col("doc_n"), col("doc_o")).as("doc_a"),
              greatest(col("doc_n"), col("doc_o")).as("doc_b"))
  }
}
