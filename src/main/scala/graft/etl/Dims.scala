package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `mart.d_customer` / `mart.d_item` — the small dimensions.
  *
  * Reference: /root/reference/src/dags/sql/update_mart_d_tables.sql:19-29
  * (full load), load_inc_d_tables.sql:16-24 (incremental temps continuing the
  * sequences).
  *
  * Determinism pinning (SURVEY §7.4 H3): the reference's `DISTINCT ON (key)`
  * without ORDER BY picks an arbitrary row per key, and `nextval()` assigns
  * ids in an unspecified order. We pin: winner row = first by
  * (first_name, last_name) / (item_name); ids dense in key order. Both
  * orderings are documented here and mirrored in the DuckDB oracle.
  */
object Dims {

  /** A2: one row per customer (pinned winner among name variants),
    * city_id = max within the winning (customer, name) group. */
  def dCustomer(uol: DataFrame, offset: Long = 0L): DataFrame = {
    val grouped = uol
      .groupBy(col("customer_id").cast("int").as("customer_id"),
               col("first_name"), col("last_name"))
      .agg(max("city_id").as("city_id"))
    val pick = Window.partitionBy("customer_id")
      .orderBy("first_name", "last_name")
    val winners = grouped
      .withColumn("rn", row_number().over(pick)).where(col("rn") === 1)
      .drop("rn")
    graft.Ids.dense(winners, Seq("customer_id"), "id", offset)
      .select("id", "customer_id", "first_name", "last_name", "city_id")
  }

  /** A3: one row per item (pinned winner by item_name). */
  def dItem(uol: DataFrame, offset: Long = 0L): DataFrame = {
    val pick = Window.partitionBy("item_id").orderBy("item_name")
    val winners = uol
      .select(col("item_id").cast("int").as("item_id"), col("item_name"))
      .distinct()
      .withColumn("rn", row_number().over(pick)).where(col("rn") === 1)
      .drop("rn")
    graft.Ids.dense(winners, Seq("item_id"), "id", offset)
      .select("id", "item_id", "item_name")
  }

  /** SCD Type 2 customer-city history — the slowly-changing-dimension build
    * the reference's overwrite dimension discards (beyond-reference
    * warehouse op): one validity interval per (customer, city) run, closed
    * by the next change.
    *
    * Construction: collapse to (customer, day) grain with a pinned
    * deterministic city (max city_id within the day), keep rows where the
    * city differs from the previous day's (lag), then close each interval
    * with the NEXT change's date minus one day (lead); the open interval is
    * `is_current`. All three steps are windows over the same
    * (customer_id)-partitioned order — ONE shuffle after the per-day
    * collapse, no global window. Mirrored lag/lead semantics in the DuckDB
    * oracle. */
  def dCustomerScd(uolV2: DataFrame): DataFrame = {
    val byCust = Window.partitionBy("customer_id").orderBy("day")
    // partition by customer alone: satisfies the per-day groupBy's
    // clustering AND both windows' requirement — one exchange end to end
    val perDay = uolV2.repartition(col("customer_id"))
      .groupBy(col("customer_id"), col("date_time").as("day"))
      .agg(max("city_id").as("city_id"))
    val changes = perDay
      .withColumn("prev_city", lag(col("city_id"), 1).over(byCust))
      .where(col("prev_city").isNull || col("prev_city") =!= col("city_id"))
    changes
      .select(col("customer_id"), col("city_id"), col("day").as("valid_from"))
      .withColumn("next_from",
        lead(col("valid_from"), 1).over(
          Window.partitionBy("customer_id").orderBy("valid_from")))
      .select(col("customer_id"), col("city_id"), col("valid_from"),
              (col("next_from") - expr("INTERVAL 1 DAY")).as("valid_to"),
              col("next_from").isNull.as("is_current"))
  }

  /** INCREMENTAL SCD2 maintenance — merge a batch of per-day city
    * observations into an existing SCD2 history without rebuilding it:
    * the daily-load shape every warehouse SCD2 dimension actually runs.
    *
    * Only AFFECTED customers (those present in the increment) are
    * recomputed: their existing intervals collapse back to change points
    * (each SCD row IS one — consecutive rows differ by construction),
    * union with the increment's observations, and the same
    * lag-compress + lead-close pipeline as [[dCustomerScd]] re-derives
    * their intervals. Unaffected customers' rows pass through UNTOUCHED
    * via an anti-join — at scale this is the partition-pruned merge: work
    * is O(|affected history| + |increment|), independent of the dimension
    * size. The result is provably identical to a full rebuild (checked
    * in-fixture AND by pointing the oracle at the full-rebuild SQL).
    *
    * PRECONDITION (the increment contract): observations arrive strictly
    * AFTER each customer's last recorded change — late-arriving days would
    * silently rewrite closed history, so they fail loud in-plan
    * (raise_error, same stance as the events nanos guard).
    *
    * `incDaily` needs (customer_id, day, city_id) at (customer, day) grain. */
  def dCustomerScdMerge(scdBase: DataFrame, incDaily: DataFrame): DataFrame = {
    val affected = incDaily.select("customer_id").distinct()
    val histPts = scdBase.join(affected, Seq("customer_id"), "left_semi")
      .select(col("customer_id"), col("city_id"),
              col("valid_from").as("day"), lit("hist").as("src"))
    val incPts = incDaily
      .select(col("customer_id"), col("city_id"), col("day"),
              lit("inc").as("src"))
    val byCust = Window.partitionBy("customer_id")
    val ordered = byCust.orderBy("day")
    val pts = histPts.unionByName(incPts)
      .withColumn("max_hist",
        max(when(col("src") === "hist", col("day"))).over(byCust))
      .withColumn("day", expr(
        """CASE WHEN src = 'inc' AND max_hist IS NOT NULL
          |       AND day <= max_hist
          |     THEN raise_error(concat('scd merge: late-arriving increment',
          |       ' day for customer ', customer_id,
          |       ' rewrites closed history — run a full rebuild'))
          |     ELSE day END""".stripMargin))
    val changes = pts
      .withColumn("prev_city", lag(col("city_id"), 1).over(ordered))
      .where(col("prev_city").isNull || col("prev_city") =!= col("city_id"))
      .select(col("customer_id"), col("city_id"), col("day").as("valid_from"))
    val rebuilt = changes
      .withColumn("next_from", lead(col("valid_from"), 1).over(
        Window.partitionBy("customer_id").orderBy("valid_from")))
      .select(col("customer_id"), col("city_id"), col("valid_from"),
              (col("next_from") - expr("INTERVAL 1 DAY")).as("valid_to"),
              col("next_from").isNull.as("is_current"))
    scdBase.join(affected, Seq("customer_id"), "left_anti")
      .unionByName(rebuilt)
  }
}
