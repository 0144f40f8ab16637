package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weekly customer-retention analytics — the richest query in the reference.
  *
  * Reference: /root/reference/src/dags/sql/date_periods.sql:4-15 (weekly
  * periods), new_customers.sql / returned_customers.sql /
  * refunded_customers.sql (two-level aggregates with a correlated
  * range-subquery period lookup), loading_retention_mart.sql (chained FULL
  * JOIN ... USING(period) merges).
  */
object Retention {

  /** `mart.d_calendar_weeks`: P5 week bucketing + A8 min/max + W1 global
    * row_number (≈ one row per week — window on a tiny aggregate is fine). */
  def weeks(dCalendarFull: DataFrame): DataFrame =
    dCalendarFull
      .groupBy(date_trunc("week", col("fact_date")).as("wk"))
      .agg(min("fact_date").as("start_date"), max("fact_date").as("end_date"))
      .withColumn("period",
        row_number().over(Window.orderBy("start_date")).cast("long"))
      .select("start_date", "end_date", "period")

  /** J3: the reference's correlated scalar subquery
    * `(SELECT period FROM d_calendar_weeks WHERE uolv.date_time BETWEEN
    * start_date AND end_date)` (new_customers.sql:5) rewritten as a
    * broadcast left-outer join.
    *
    * Fast path: because weeks ARE `date_trunc('week')` buckets of the
    * calendar and every order date_time is a calendar date, the range
    * predicate is equivalent to equality on the week bucket — a broadcast
    * HASH join (O(n), codegen) instead of a nested-loop range probe
    * (O(n·|weeks|)). `withPeriodRange` keeps the literal range-join form; a
    * test asserts both produce identical results and that weeks are disjoint
    * (SURVEY §7.4 H4). */
  def withPeriod(uolV2: DataFrame, weeks: DataFrame): DataFrame = {
    val w = broadcast(weeks.select(
      date_trunc("week", col("start_date")).as("wk"), col("period")))
    uolV2.join(w, date_trunc("week", col("date_time")) === col("wk"),
               "left_outer")
      .drop("wk")
  }

  /** Literal rewrite of J3 as a range join (BroadcastNestedLoopJoin). */
  def withPeriodRange(uolV2: DataFrame, weeks: DataFrame): DataFrame =
    uolV2.join(broadcast(weeks),
        col("date_time").between(col("start_date"), col("end_date")),
        "left_outer")
      .drop("start_date", "end_date")

  /** Level-1 aggregate: per (customer, date_time, period[, item]) with
    * count + revenue (A4-A6 inner queries). Partial (map-side) aggregation
    * is automatic via HashAggregateExec. Public so Pipeline can compute it
    * once and share it between the new/returned classes (same input frame,
    * same keys — only the HAVING predicate differs). */
  def level1(uolvP: DataFrame, status: String,
             includeItem: Boolean): DataFrame = {
    val keys = Seq(col("customer_id"), col("date_time"), col("period")) ++
      (if (includeItem) Seq(col("item_id")) else Nil)
    uolvP.where(col("status") === status)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("cnt"), sum("payment_amount").as("revenue"))
  }

  private def level2Keys(includeItem: Boolean, itemAlias: String): Seq[Column] =
    Seq(col("period")) ++
      (if (includeItem) Seq(col("item_id").as(itemAlias)) else Nil)

  /** A4+A7: "new" = exactly one shipped order per (cust, date, period[,item]). */
  def newCust(uolvP: DataFrame, includeItem: Boolean): DataFrame =
    newCustFromL1(level1(uolvP, "shipped", includeItem), includeItem)

  /** Level-2 of A4 over a (possibly shared/persisted) level-1 frame. */
  def newCustFromL1(l1Shipped: DataFrame, includeItem: Boolean): DataFrame =
    l1Shipped
      .where(col("cnt") === 1)
      .groupBy(level2Keys(includeItem, "item_new"): _*)
      .agg(count("customer_id").as("new_cust_count"),
           sum("revenue").as("new_cust_revenue"))

  /** A5+A7: "returning" = more than one shipped order in the group. */
  def returnedCust(uolvP: DataFrame, includeItem: Boolean): DataFrame =
    returnedCustFromL1(level1(uolvP, "shipped", includeItem), includeItem)

  /** Level-2 of A5 over a (possibly shared/persisted) level-1 frame. */
  def returnedCustFromL1(l1Shipped: DataFrame,
                         includeItem: Boolean): DataFrame =
    l1Shipped
      .where(col("cnt") > 1)
      .groupBy(level2Keys(includeItem, "item_ret"): _*)
      .agg(count("customer_id").as("returned_cust_count"),
           sum("revenue").as("returned_revenue"))

  /** A6+A7: refunds per group; note `count(*)` (not count(col)) semantics. */
  def refundedCust(uolvP: DataFrame, includeItem: Boolean): DataFrame =
    refundedCustFromL1(level1(uolvP, "refunded", includeItem), includeItem)

  /** Level-2 of A6 over a (possibly shared/persisted) level-1 frame. */
  def refundedCustFromL1(l1Refunded: DataFrame,
                         includeItem: Boolean): DataFrame =
    l1Refunded
      .withColumnRenamed("cnt", "refunds")
      .groupBy(level2Keys(includeItem, "item_ref"): _*)
      .agg(count(lit(1)).as("cust_with_refunds"),
           sum("refunds").as("total_refunds"))

  /** J2: `mart.retention_compact` — chained full-outer USING(period) joins
    * (Spark's using-column join coalesces the key like PG USING). */
  def retentionCompact(n: DataFrame, r: DataFrame, f: DataFrame): DataFrame =
    n.join(r, Seq("period"), "full_outer")
      .join(f, Seq("period"), "full_outer")
      .select("period", "new_cust_count", "new_cust_revenue",
              "returned_cust_count", "returned_revenue", "cust_with_refunds",
              "total_refunds")

  /** `mart.f_customer_retention` — full variant. Faithful reference quirks
    * (SURVEY §2.4 N5/N6): the join key is period ONLY while sides are at
    * (period, item) grain → intentional row multiplication per period; the
    * DECIMAL revenues are coerced to BIGINT (PG numeric→bigint rounds; Spark
    * decimal→long truncates, so the round() is explicit). */
  def fCustomerRetention(n: DataFrame, r: DataFrame, f: DataFrame): DataFrame =
    n.join(r, Seq("period"), "full_outer")
      .join(f, Seq("period"), "full_outer")
      .select(
        col("new_cust_count").as("new_customers_count"),
        col("returned_cust_count").as("returning_customers_count"),
        col("cust_with_refunds").as("refunded_customer_count"),
        lit("weekly").as("period_name"),
        col("period").cast("int").as("period_id"),
        col("item_new").as("item_id_new_cust"),
        col("item_ret").as("item_id_returned_cust"),
        col("item_ref").as("item_id_refunded_cust"),
        round(col("new_cust_revenue")).cast("long").as("new_customers_revenue"),
        round(col("returned_revenue")).cast("long")
          .as("returning_customers_revenue"),
        col("total_refunds").cast("int").as("customers_refunded"))

  /** `f_customer_retention` at its natural (period, item) grain — the
    * scale-sane default. The faithful N6 variant above joins on period only,
    * so its row count grows with the PRODUCT of the three sides'
    * items-per-period (quadratic in catalog size); this variant joins on
    * (period, item_id), keeping output linear in |periods|·|items| and the
    * join a plain hash equi-join. Use this at scale; keep [[fCustomerRetention]]
    * for reference parity (quirk at loading_retention_mart.sql:8). */
  def fCustomerRetentionGrain(n: DataFrame, r: DataFrame,
                              f: DataFrame): DataFrame =
    n.withColumnRenamed("item_new", "item_id")
      .join(r.withColumnRenamed("item_ret", "item_id"),
            Seq("period", "item_id"), "full_outer")
      .join(f.withColumnRenamed("item_ref", "item_id"),
            Seq("period", "item_id"), "full_outer")
      .select(
        col("period").cast("int").as("period_id"),
        col("item_id"),
        col("new_cust_count").as("new_customers_count"),
        col("returned_cust_count").as("returning_customers_count"),
        col("cust_with_refunds").as("refunded_customer_count"),
        lit("weekly").as("period_name"),
        round(col("new_cust_revenue")).cast("long").as("new_customers_revenue"),
        round(col("returned_revenue")).cast("long")
          .as("returning_customers_revenue"),
        col("total_refunds").cast("int").as("customers_refunded"))
}
