package graft

import org.apache.spark.sql.SparkSession

/** One teardown hook over every (session, dir)-keyed memo map in the
  * library. Six objects memoize persisted frames per session —
  * [[graft.etl.Pipeline]] (staging subplans), [[graft.ops.Dedup]]
  * (bands/pairs/cluster labels), [[graft.ops.TextOps]] (shingles),
  * [[graft.ops.Vectors]] (quantized/IVF/LSH/PQ frames), [[graft.ops.Basket]]
  * (graph edges/degrees + memoized graph-query results), [[graft.Ids]]
  * (dense-sort frames) — and none can
  * know when a session is done with ALL of them, so a long-lived
  * multi-session JVM (a shared driver serving per-tenant sessions) must
  * call this when it retires a session, or the retired session's frames
  * stay pinned in the maps (and their cached partitions in the block
  * manager) for the JVM lifetime.
  *
  * Per-dir surgical invalidation — after rewriting one dir's files within
  * a live session — stays with each object's `invalidate(spark, dir)`;
  * this hook is the whatever-dirs-it-ever-touched teardown.
  */
object Caches {

  /** Drop and unpersist every memoized frame `spark` holds across all
    * four memo registries. Idempotent; other sessions' entries are
    * untouched. Callers: Bench (before `spark.stop()`), CachesSpec. */
  def invalidateAll(spark: SparkSession): Unit = {
    etl.Pipeline.invalidateAll(spark)
    ops.Dedup.invalidateAll(spark)
    ops.TextOps.invalidateAll(spark)
    ops.Vectors.invalidateAll(spark)
    ops.Basket.invalidateAll(spark)
    ops.Corpus.invalidateAll(spark)
    Ids.invalidateAll(spark)
  }

  /** Total memo entries held for `spark` (spec hook). */
  private[graft] def size(spark: SparkSession): Int =
    etl.Pipeline.cacheSize(spark) + ops.Dedup.cacheSize(spark) +
      ops.TextOps.cacheSize(spark) + ops.Vectors.cacheSize(spark) +
      ops.Basket.cacheSize(spark) + ops.Corpus.cacheSize(spark)
}
