package graft.catalog

import graft.etl.Pipeline
import org.apache.spark.sql.SparkSession

/** End-to-end materializing run of the reference DAG (§3): staging feeds →
  * dims → facts → retention marts, each layer persisted to the warehouse
  * exactly where the reference materializes a table. Running it twice is a
  * no-op on the mart contents (reference README.md:20-22 idempotency
  * property — every table is an overwrite of a deterministic input).
  */
object PipelineRunner {

  val stagingTables: Seq[String] = Seq(
    "user_order_log", "user_order_log_temp", "user_order_log_v2",
    "user_activity_log", "user_activity_log_temp",
    "customer_research", "customer_research_temp", "price_log")

  val martTables: Seq[String] = Seq(
    "d_calendar", "d_calendar_temp", "d_customer", "d_item",
    "f_sales", "f_sales_temp", "f_sales_v2", "d_calendar_weeks",
    "new_cust", "new_cust_compact", "returned_cust", "returned_cust_compact",
    "refunded_cust", "refunded_cust_compact",
    "retention_compact", "f_customer_retention",
    // beyond-reference marts (round 4)
    "d_customer_scd", "sales_rolling_7d", "top_items_city",
    "sales_pivot", "sales_rollup")

  /** Run `tasks` concurrently on a bounded pool and propagate the first
    * failure. Spark job submission is thread-safe; the writes in one batch
    * target DISTINCT tables whose plans share only already-persisted
    * frames, so concurrency changes wall-clock, not results. Bounded at 8:
    * enough to hide per-job scheduling gaps on local[32] (and small enough
    * that a real cluster's driver isn't juggling dozens of concurrent
    * stages). */
  private def inParallel(tasks: Seq[(String, () => Unit)]): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    import scala.util.{Failure, Try}
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, tasks.size))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val trace = sys.env.contains("SPARK_GRAFT_MAT_TRACE")
    // Each task is Try-wrapped so the Await drains the WHOLE wave even
    // when one write fails: a fail-fast Future.sequence would rethrow
    // while sibling overwrite jobs keep mutating the warehouse in the
    // background — a caller that catches and retries would race those
    // zombie writes. The first failure is rethrown only after every
    // submitted task has completed (pool.shutdown() alone neither cancels
    // nor waits).
    try {
      val results = Await.result(Future.sequence(tasks.map { case (name, t) =>
        Future(Try {
          val t0 = System.nanoTime()
          t()
          if (trace) println(
            f"[mat] $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        })
      }), Duration.Inf)
      results.collectFirst { case Failure(e) => e }.foreach(throw _)
    } finally pool.shutdown()
  }

  def run(spark: SparkSession, sfDir: String, warehouseRoot: String): Warehouse = {
    val wh = new Warehouse(spark, warehouseRoot)
    // The SHARED memoized instance, not a private `new Pipeline`: the
    // Ids.dense plans are RDD-backed, so a second instance's id frames never
    // canonicalize equal to the first's and CacheManager would cache every
    // staging/dim/fact subplan twice — measurable memory pressure when a
    // bench run materializes the warehouse after the query series has
    // already populated the shared instance (the r4 w_* read-back drag).
    val p = Pipeline.of(spark, sfDir)

    import org.apache.spark.sql.functions.{broadcast, col, date_format}
    // month layout column for the big time-keyed tables: one directory per
    // month so the daily-increment merge and time-range scans prune at the
    // file-listing level (Warehouse.read strips it back off)
    def byMonth(df: org.apache.spark.sql.DataFrame) =
      df.withColumn(Warehouse.PartCol,
                    date_format(col("date_time"), "yyyy-MM"))
    // f_sales carries only the date surrogate; recover the month from the
    // calendar dimension (broadcast-sized join, no extra shuffle)
    def byCalMonth(df: org.apache.spark.sql.DataFrame,
                   cal: org.apache.spark.sql.DataFrame) =
      df.join(broadcast(cal.select(col("date_id"),
        date_format(col("fact_date"), "yyyy-MM").as(Warehouse.PartCol))),
        "date_id")
        .select((df.columns :+ Warehouse.PartCol).map(col).toIndexedSeq: _*)

    // Three dependency waves, each wave's DISTINCT-table writes submitted
    // concurrently (r12 verdict task 6: the 21-mart series was fully
    // sequential and paid ~21 job-scheduling gaps end-to-end; local[32] —
    // and any real cluster — overlaps them fine). The waves keep the
    // shared-lineage frames warm in order: wave 1 materializes the staging
    // frames the dims read, wave 2 the dims the facts read. Plan
    // construction (the lazy vals, incl. the Ids.dense two-phase actions)
    // is forced on THIS thread first so the per-instance lazy-val monitor
    // never serializes the pool.
    p.uol; p.uolTemp; p.uolV2; p.ual; p.ualTemp; p.research; p.researchTemp
    p.priceLog; p.dCalendar; p.dCalendarTemp; p.dCustomer; p.dItem
    p.fSales; p.fSalesTemp; p.weeks

    inParallel(Seq(
      ("user_order_log", () => wh.overwrite("staging", "user_order_log", p.uol)),
      ("user_order_log_temp", () => wh.overwrite("staging", "user_order_log_temp", p.uolTemp)),
      ("user_order_log_v2", () => wh.overwritePartitioned("staging",
              "user_order_log_v2", byMonth(p.uolV2), Warehouse.PartCol)),
      ("user_activity_log", () => wh.overwrite("staging", "user_activity_log", p.ual)),
      ("user_activity_log_temp", () => wh.overwrite("staging", "user_activity_log_temp", p.ualTemp)),
      ("customer_research", () => wh.overwrite("staging", "customer_research", p.research)),
      ("customer_research_temp", () => wh.overwrite("staging", "customer_research_temp", p.researchTemp)),
      ("price_log", () => wh.overwrite("staging", "price_log", p.priceLog))))

    inParallel(Seq(
      ("d_calendar", () => wh.overwrite("mart", "d_calendar", p.dCalendar)),
      ("d_calendar_temp", () => wh.overwrite("mart", "d_calendar_temp", p.dCalendarTemp)),
      ("d_customer", () => wh.overwrite("mart", "d_customer", p.dCustomer)),
      ("d_item", () => wh.overwrite("mart", "d_item", p.dItem)),
      ("d_calendar_weeks", () => wh.overwrite("mart", "d_calendar_weeks", p.weeks))))

    inParallel(Seq(
      ("f_sales", () => wh.overwritePartitioned("mart", "f_sales",
              byCalMonth(p.fSales, p.dCalendar), Warehouse.PartCol)),
      ("f_sales_temp", () => wh.overwrite("mart", "f_sales_temp", p.fSalesTemp)),
      // f_sales_v2 exercises the incremental path the reference's daily
      // DAG implies: the (partitioned) history base is laid down once,
      // then the day's increment merges in, rewriting ONLY the month
      // partitions the increment touches (mergePartitioned's dynamic
      // overwrite). Contents are identical to the full p.fSalesV2
      // overwrite — ids are disjoint, so kept ∪ updates = history ∪
      // increment. Overwrite→merge is a same-table dependency: one task.
      ("f_sales_v2", () => {
        wh.overwritePartitioned("mart", "f_sales_v2",
          byCalMonth(p.fSales.withColumn("status",
            org.apache.spark.sql.functions.lit("shipped")), p.dCalendar),
          Warehouse.PartCol)
        wh.mergePartitioned("mart", "f_sales_v2",
          byCalMonth(p.fSalesTemp, p.dCalendarTemp), Seq("id"),
          Warehouse.PartCol)
      }),
      ("new_cust", () => wh.overwrite("mart", "new_cust", p.newCust(true))),
      ("new_cust_compact", () => wh.overwrite("mart", "new_cust_compact", p.newCust(false))),
      ("returned_cust", () => wh.overwrite("mart", "returned_cust", p.returnedCust(true))),
      ("returned_cust_compact", () => wh.overwrite("mart", "returned_cust_compact", p.returnedCust(false))),
      ("refunded_cust", () => wh.overwrite("mart", "refunded_cust", p.refundedCust(true))),
      ("refunded_cust_compact", () => wh.overwrite("mart", "refunded_cust_compact", p.refundedCust(false))),
      ("retention_compact", () => wh.overwrite("mart", "retention_compact", p.retentionCompact)),
      ("f_customer_retention", () => wh.overwrite("mart", "f_customer_retention", p.fCustomerRetention)),
      // beyond-reference marts: SCD2 history, rolling revenue, top-k,
      // pivot and rollup — the round-4 analytics layer, materialized in
      // the same overwrite-idempotent style
      ("d_customer_scd", () => wh.overwrite("mart", "d_customer_scd",
              graft.etl.Dims.dCustomerScd(p.uolV2))),
      ("sales_rolling_7d", () => wh.overwrite("mart", "sales_rolling_7d",
              graft.ops.Analytics.rollingSales7dOf(p.uol))),
      ("top_items_city", () => wh.overwrite("mart", "top_items_city",
              graft.ops.Analytics.topItemsPerCityOf(p.uol))),
      ("sales_pivot", () => wh.overwrite("mart", "sales_pivot",
              graft.ops.Analytics.salesStatusPivotOf(p.uolV2))),
      ("sales_rollup", () => wh.overwrite("mart", "sales_rollup",
              graft.ops.Analytics.salesRollupOf(p.uol, p.registerCached)))))
    wh
  }
}
