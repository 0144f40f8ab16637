package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `mart.d_calendar` — the date dimension.
  *
  * Reference: /root/reference/src/dags/sql/update_mart_d_tables.sql:4-15
  * (full load) and load_inc_d_tables.sql:2-14 (incremental `_temp` extension
  * that continues the live `date_id_seq`). Faithful detail: the reference
  * unions RAW `date_time` values (not day-truncated), so second-grain
  * activity timestamps each become a calendar row; we reproduce that.
  *
  * Scale note: because the reference unions RAW second-grain timestamps, the
  * calendar grows with |distinct event timestamps| — NOT |distinct dates| —
  * so id assignment must not funnel through one partition. Ids use the
  * two-phase `Ids.dense` (range-repartition + zipWithIndex), same as facts
  * (SURVEY §7.4 H1).
  */
object Calendar {

  /** A1: UNION ALL of the three feeds' date columns + DISTINCT. */
  def dates(research: DataFrame, ual: DataFrame, uol: DataFrame): DataFrame =
    research.select(col("date_id").as("fact_date"))
      .unionAll(ual.select(col("date_time")))
      .unionAll(uol.select(col("date_time")))
      .distinct()

  /** P3/P4 calendar attributes + dense `date_id` starting at offset+1.
    * `lower(date_format('MMM'))` == PG `to_char(ts,'mon')` ('jan'). */
  def attrs(dates: DataFrame, offset: Long = 0L): DataFrame =
    graft.Ids.dense(dates, Seq("fact_date"), "date_id", offset)
      .select(
        col("date_id"),
        col("fact_date"),
        dayofmonth(col("fact_date")).as("day_num"),
        month(col("fact_date")).as("month_num"),
        lower(date_format(col("fact_date"), "MMM")).as("month_name"),
        year(col("fact_date")).as("year_num"))
}
