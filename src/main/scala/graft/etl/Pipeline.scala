package graft.etl

import graft.Memo.TruncateOps
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Wires the §3 DAG as plain function composition: feeds → dims → facts →
  * retention. Each step is a lazy DataFrame; actions happen only at the
  * caller's sink (Verify writes parquet, Bench counts).
  *
  * Incremental id continuation (PG sequences living across statements)
  * requires the previous table's cardinality; those are the only driver-side
  * scalars (`count()` of a dimension-sized plan).
  */
object Pipeline {
  private val instances =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Pipeline]

  /** One shared Pipeline per (session, sf-dir): its lazy DataFrames (and
    * their persisted shared subplans) are the in-session materialized
    * staging layer. Sharing the INSTANCE matters since Ids.dense — the
    * two-phase id assignment is RDD-backed, so two instances' id plans
    * never canonicalize equal and would each re-cache their own copy.
    *
    * STALE-READ CONTRACT: instances are never invalidated automatically.
    * If the parquet under `dir` is rewritten within a session, call
    * [[invalidate]] first — otherwise callers keep getting results
    * computed over the OLD files' persisted partitions. */
  def of(spark: SparkSession, dir: String): Pipeline =
    instances.computeIfAbsent((spark, dir), { case (s, d) => new Pipeline(s, d) })

  /** Drop the memoized instance for (session, dir) and unpersist every
    * shared subplan it cached — REQUIRED before re-reading a dir whose
    * files changed. */
  def invalidate(spark: SparkSession, dir: String): Unit =
    Option(instances.remove((spark, dir))).foreach(_.unpersistAll())

  /** Drop EVERY memoized instance of `spark` (all dirs) and unpersist
    * their shared subplans — same session-teardown hook as
    * [[graft.ops.Vectors.invalidateAll]]. */
  def invalidateAll(spark: SparkSession): Unit =
    instances.entrySet.removeIf { e =>
      val hit = e.getKey._1 eq spark
      if (hit) e.getValue.unpersistAll()
      hit
    }

  /** Entry count of this session in the instance map (spec hook). */
  private[graft] def cacheSize(spark: SparkSession): Int = {
    import scala.jdk.CollectionConverters._
    instances.keySet.asScala.count(_._1 eq spark)
  }
}

class Pipeline(spark: SparkSession, dir: String) {

  import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

  private val persistedFrames =
    scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private def cached(df: DataFrame): DataFrame = persistedFrames.synchronized {
    val p = df.persist(MEMORY_AND_DISK); persistedFrames += p; p
  }

  // r18: the STAGING frames are eager localCheckpoints, not persists — a
  // persisted frame keeps its full logical lineage inside every consumer's
  // plan, and with ~80 ETL queries re-analyzing the synthesized-feed tree
  // per action, Catalyst planning (not execution) dominated their warm
  // cost (guide §3.3/§7.3). A checkpoint truncates each consumer's plan to
  // a LogicalRDD leaf — the in-session equivalent of the materialized
  // staging table these frames model anyway. registerCached keeps persist
  // semantics: its callers rely on CacheManager canonical-dedup of
  // repeated registrations, which checkpoints (distinct RDDs per call)
  // would break.
  // Composite: eager localCheckpoint truncates every consumer's LOGICAL
  // plan to a LogicalRDD leaf (planning over the nested staging lineage —
  // not execution — dominated the ETL tail's warm cost, guide §3.3/§7.3),
  // and the persist on top serves consumers a COLUMNAR in-memory scan
  // (measured: warehouse materialize reads row-RDD checkpoints ~1.7×
  // slower than the columnar cache; with persist alone the planning cost
  // returns). unpersistAll releases both layers.
  // The checkpoint JOB runs outside the registry lock (r18 ADVICE: a
  // concurrent registerCached/unpersistAll caller blocked for the full
  // materialization otherwise); only the registry append is locked.
  private def materialized(df: DataFrame): DataFrame = {
    val cp = df.truncated
    cp.persist(MEMORY_AND_DISK)
    persistedFrames.synchronized { persistedFrames += cp }
    cp
  }

  /** Register an externally-built shared subplan in this pipeline's persist
    * registry, so [[Pipeline.invalidate]]/unpersistAll cover it (operators
    * like Analytics.salesCubeOf take this as their `share` hook instead of
    * persisting unilaterally — an unregistered persist leaks across bench
    * invocations). CacheManager dedupes by canonicalized plan, so repeated
    * registration of the same derived frame caches its data only once. */
  def registerCached(df: DataFrame): DataFrame = cached(df)
  private[etl] def unpersistAll(): Unit = persistedFrames.synchronized {
    persistedFrames.foreach { df =>
      df.unpersist(false) // CacheManager entries (persisted frames)
      graft.etl.Catchup.releaseLocalCheckpoint(df) // checkpoint blocks
    }
    persistedFrames.clear()
  }

  /** Shared subplans consumed more than once within a single query are
    * persisted (spill-safe MEMORY_AND_DISK): the synthesized order feed
    * (scanned by history + increment + v2 branches) and the period-tagged
    * v2 log (scanned by all three retention classes). At cluster scale
    * these correspond to materialized staging tables; in-memory caching is
    * the single-job equivalent. */
  private lazy val feedCached: DataFrame =
    materialized(Feeds.orderFeed(spark, dir))
  private lazy val ordCut: DataFrame = Feeds.ordersCutoff(spark, dir)

  lazy val uol: DataFrame = Feeds.splitLe(feedCached, ordCut, "date_time")
    .drop("status")
  lazy val uolTemp: DataFrame = Feeds.splitGt(feedCached, ordCut, "date_time")
  lazy val uolV2: DataFrame =
    uol.withColumn("status", org.apache.spark.sql.functions.lit("shipped"))
      .unionByName(uolTemp)
  lazy val ual: DataFrame = Feeds.ual(spark, dir)
  lazy val ualTemp: DataFrame = Feeds.ualTemp(spark, dir)
  lazy val research: DataFrame = Feeds.research(spark, dir)
  lazy val researchTemp: DataFrame = Feeds.researchTemp(spark, dir)
  lazy val priceLog: DataFrame = Feeds.priceLog(spark, dir)

  lazy val calDates: DataFrame =
    materialized(Calendar.dates(research, ual, uol))
  lazy val dCalendar: DataFrame = Calendar.attrs(calDates)
  /** |d_calendar| — offset for the incremental calendar ids. */
  lazy val calCount: Long = calDates.count()
  lazy val dCalendarTemp: DataFrame =
    Calendar.attrs(Calendar.dates(researchTemp, ualTemp, uolTemp), calCount)
  lazy val dCalendarFull: DataFrame = dCalendar.unionAll(dCalendarTemp)

  lazy val dCustomer: DataFrame = Dims.dCustomer(uol)
  lazy val dItem: DataFrame = Dims.dItem(uol)

  lazy val fSales: DataFrame = Sales.fSales(uol, dCalendar)
  /** |f_sales| = |uol| (every order date is a calendar date) — cheaper count. */
  lazy val fSalesCount: Long = uol.count()
  lazy val fSalesTemp: DataFrame =
    Sales.fSalesTemp(uolTemp, dCalendarTemp, fSalesCount)
  lazy val fSalesV2: DataFrame = Sales.fSalesV2(fSales, fSalesTemp)

  lazy val weeks: DataFrame = Retention.weeks(dCalendarFull)
  lazy val uolvPeriod: DataFrame =
    materialized(Retention.withPeriod(uolV2, weeks))

  /** Level-1 retention aggregates, shared across the whole family: 8 of the
    * SparkEntry queries (3 classes × 2 grains + compact mart + 2 full marts)
    * re-derive these same per-(customer, date, period[, item]) rollups; the
    * `shipped` one even feeds two classes (HAVING =1 vs >1) inside a single
    * query. One persisted copy per (status, grain) — each is a small
    * aggregate, far below the staging frames it derives from. */
  private val l1cache =
    scala.collection.mutable.Map.empty[(String, Boolean), DataFrame]
  private def level1(status: String, includeItem: Boolean): DataFrame =
    l1cache.synchronized {
      l1cache.getOrElseUpdate((status, includeItem),
        materialized(Retention.level1(uolvPeriod, status, includeItem)))
    }

  def newCust(includeItem: Boolean): DataFrame =
    Retention.newCustFromL1(level1("shipped", includeItem), includeItem)
  def returnedCust(includeItem: Boolean): DataFrame =
    Retention.returnedCustFromL1(level1("shipped", includeItem), includeItem)
  def refundedCust(includeItem: Boolean): DataFrame =
    Retention.refundedCustFromL1(level1("refunded", includeItem), includeItem)

  /** r18: the SCD2 dimension builds, memoized per source feed — four
    * query forms (the SCD itself, its incremental merge's base, the
    * point-in-time join, the change-rate monitor) each re-ran the
    * repartition + double-window compress per call; production
    * materializes the dimension once per load. */
  lazy val dCustomerScdV2: DataFrame = materialized(Dims.dCustomerScd(uolV2))
  lazy val dCustomerScdHist: DataFrame = materialized(Dims.dCustomerScd(uol))

  lazy val retentionCompact: DataFrame =
    Retention.retentionCompact(newCust(false), returnedCust(false),
                               refundedCust(false))
  lazy val fCustomerRetention: DataFrame =
    Retention.fCustomerRetention(newCust(true), returnedCust(true),
                                 refundedCust(true))
  lazy val fCustomerRetentionGrain: DataFrame =
    Retention.fCustomerRetentionGrain(newCust(true), returnedCust(true),
                                      refundedCust(true))
}
