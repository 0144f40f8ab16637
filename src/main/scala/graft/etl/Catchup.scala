package graft.etl

import graft.Memo.TruncateOps
import graft.Ids
import org.apache.spark.sql.DataFrame

/** Multi-day increment catchup — the reference DAG runs daily with
  * `catchup=True` (/root/reference/src/dags/ETL_logs_inc.py:287-289), i.e.
  * N dated increments applied IN ORDER, with the live PG sequences handing
  * out ids that continue across every batch.
  *
  * Spark model: a fold over batches. Each step assigns dense ids to the
  * batch's NEW rows (two-phase [[graft.Ids.dense]], offset = accumulated
  * row count — valid because ids stay dense 1..n) and appends. Re-applying
  * a batch is a no-op: rows already present (by `uniq_id`) are dropped with
  * an anti-join before id assignment — the reference's one stated
  * correctness property ("re-run must not duplicate",
  * /root/reference/README.md:20-22) holds per step, not just per run.
  */
object Catchup {

  /** Id-assignment sort key within a batch (same pin as f_sales). */
  private val sortCols = Seq("date_time", "uniq_id")

  /** Assign ids to `history` and fold the dated `increments` over it in
    * order. All inputs carry `uniq_id` + `date_time` and identical schemas.
    *
    * `materialize` truncates the accumulator's lineage once per step —
    * without it every fold step re-executes the whole accumulated plan
    * (the offset count AND the anti-join probe), O(batches²) work with
    * ever-deepening plans. Default: eager localCheckpoint (fine
    * single-JVM). For long cluster catchups use [[warehouseMaterializer]]
    * (durable parquet, constant-depth per-step plans, survives executor
    * loss).
    *
    * `release` frees the PREVIOUS step's materialization once the next one
    * exists — the default pairs with the default materializer and
    * unpersists the superseded checkpoint's blocks, so a long catchup
    * holds O(1) executor storage, not O(#increments). */
  def applyAll(history: DataFrame, increments: Seq[DataFrame],
               materialize: DataFrame => DataFrame = _.truncated,
               release: DataFrame => Unit = releaseLocalCheckpoint)
      : DataFrame = {
    var acc = materialize(Ids.dense(history, sortCols, "id"))
    increments.foreach { inc =>
      val next = materialize(applyOne(acc, inc))
      release(acc) // next is fully materialized; acc's blocks are dead
      acc = next
    }
    acc
  }

  /** Unpersist the RDD blocks behind an eager localCheckpoint result.
    * (Dataset.unpersist only covers CacheManager entries; a checkpoint's
    * blocks sit behind the returned frame's LogicalRDD leaf.) Safe no-op
    * on frames that aren't checkpoint-backed. */
  def releaseLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false)
      case _ => ()
    }

  /** Durable per-step materializer: atomically overwrite a warehouse table
    * with the accumulator and read it back. Each fold step's plan is then a
    * constant-depth parquet scan (no lineage growth, nothing pinned in
    * executor storage, survives executor loss — the long-catchup shape on a
    * real cluster). [[graft.catalog.Warehouse.overwriteAtomic]] writes the
    * new copy to a temp path BEFORE swapping, so the write that reads the
    * current table never clears files out from under its own scan. Pair
    * with `release = _ => ()` (nothing to unpersist). */
  def warehouseMaterializer(wh: graft.catalog.Warehouse, db: String,
                            table: String): DataFrame => DataFrame =
    df => { wh.overwriteAtomic(db, table, df); wh.read(db, table) }

  /** One catchup step: drop rows the accumulated log already has (re-run
    * idempotency), id the rest from the accumulated count, append. The
    * caller materializes `acc` between steps ([[applyAll]]); the count here
    * then reads the materialized blocks, not the whole re-derived plan. */
  def applyOne(acc: DataFrame, inc: DataFrame): DataFrame = {
    val nextOffset = acc.count() // ids are dense, so count == max id
    val fresh = inc.join(acc.select("uniq_id"), Seq("uniq_id"), "left_anti")
      .select(inc.columns.map(inc.col): _*)
    acc.unionByName(Ids.dense(fresh, sortCols, "id", nextOffset))
  }
}
