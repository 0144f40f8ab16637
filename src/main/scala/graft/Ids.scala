package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Dense surrogate-id assignment — the Spark-native replacement for the
  * reference's PostgreSQL sequences (`nextval('date_id_seq')` etc.,
  * /root/reference/src/dags/sql/update_mart_d_tables.sql:1-2,20-21,26-27 and
  * update_mart_f_table.sql:2-3). See SURVEY.md §2.1 S15 and §7.4 H1.
  *
  * PG sequences hand out dense monotone ids in an unspecified order; we pin a
  * documented deterministic order (the caller's `sortCols`) so output is
  * hash-stable, and continue across incremental batches with `offset`
  * (= previous `max(id)`), exactly as the live sequences do in the reference.
  *
  * Scale design: a `row_number()` over a global `Window.orderBy` collapses to
  * a single partition — fine for a dimension, fatal for a 100 TB fact. This
  * implementation is the two-phase variant: range-repartition on the sort key
  * (sampled range boundaries → globally ordered partitions), sort within each
  * partition, then `zipWithIndex` (one lightweight count job to compute
  * per-partition offsets, no data movement). Cost: one extra pass; no
  * single-node bottleneck at any scale.
  */
object Ids {

  /** Every `sorted` frame [[dense]] persists, so session teardown can
    * unpersist them ([[graft.Caches.invalidateAll]]). Without the
    * registry each dense call leaked one persisted FACT-SIZED frame for
    * the JVM lifetime (exactly the unregistered-persist leak
    * `Pipeline.registerCached`'s scaladoc warns about) — at the 8× scale
    * probe several multi-GB sorted fact frames of the PREVIOUS pass
    * stayed pinned in the block manager and evicted the current pass's
    * staging cache. */
  private val persisted =
    scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Unpersist and forget every dense-sort frame `spark` holds. */
  def invalidateAll(spark: org.apache.spark.sql.SparkSession): Unit =
    persisted.synchronized {
      persisted.filter(_.sparkSession eq spark).foreach(_.unpersist(false))
      persisted.filterInPlace(df => !(df.sparkSession eq spark))
    }

  /** Registered dense-sort frames for `spark` (spec hook). */
  private[graft] def persistedCount(
      spark: org.apache.spark.sql.SparkSession): Int =
    persisted.synchronized { persisted.count(_.sparkSession eq spark) }

  /** Prepend a dense 1-based id column assigned in `sortCols` order.
    * `sortCols` must form a unique key for the assignment to be
    * deterministic. */
  def dense(df: DataFrame, sortCols: Seq[String], idCol: String,
            offset: Long = 0L): DataFrame = {
    val cols = sortCols.map(df.col)
    // Persisted: zipWithIndex runs a light counting job before the main
    // pass — without the cache the whole upstream plan would execute twice.
    val sorted = df.repartitionByRange(cols: _*).sortWithinPartitions(cols: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    persisted.synchronized { persisted += sorted }
    val schema = StructType(
      StructField(idCol, LongType, nullable = false) +: sorted.schema.fields)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq((i + 1L + offset) +: r.toSeq)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
