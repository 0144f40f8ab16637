package graft

/** DuckDB oracle SQL for every SparkEntry query (SURVEY §5.3, BASELINE.md).
  *
  * The shared WITH-prelude re-derives the whole reference data model
  * (staging feeds → dims → facts → retention marts) in portable SQL over the
  * driver's bare parquet table names. Each oracle entry = prelude + a final
  * SELECT from one CTE. Aliases here are kept byte-identical to the Spark
  * side's column names (the driver's comparator sorts columns by name).
  *
  * Determinism pins mirrored from the Scala builders (SURVEY §7.4 H3):
  * surrogate ids ordered by the documented sort keys; DISTINCT ON winners by
  * (first_name,last_name)/(item_name); timestamps truncated to microseconds
  * (events) / seconds (activity feed).
  */
object Oracle {

  val prelude: String = """WITH
li AS (
  SELECT *, row_number() OVER (PARTITION BY l_orderkey, l_linenumber
             ORDER BY l_partkey, l_suppkey, l_extendedprice, l_quantity,
                      l_discount) AS line_seq
  FROM lineitem),
feed AS (
  SELECT CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)
           || '-' || CAST(line_seq AS VARCHAR) AS uniq_id,
         o_orderdate AS date_time,
         CAST(c_nationkey AS INTEGER) AS city_id,
         n_name AS city_name,
         CAST(o_custkey AS BIGINT) AS customer_id,
         substring(c_name, 1, 8) AS first_name,
         substring(c_name, 10) AS last_name,
         CAST(l_partkey AS INTEGER) AS item_id,
         p_name AS item_name,
         CAST(floor(l_quantity) AS BIGINT) AS quantity,
         CAST(l_extendedprice AS DECIMAL(14,2)) AS payment_amount,
         CASE WHEN l_returnflag = 'R' THEN 'refunded' ELSE 'shipped' END AS status
  FROM li
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN part ON l_partkey = p_partkey),
ord_cut AS (SELECT max(o_orderdate) - INTERVAL 60 DAY AS cutoff FROM orders),
ev_cut AS (SELECT max(CAST(ts AS TIMESTAMP)) - INTERVAL 7 DAY AS cutoff FROM events),
uol AS (SELECT uniq_id, date_time, city_id, city_name, customer_id, first_name,
               last_name, item_id, item_name, quantity, payment_amount
        FROM feed, ord_cut WHERE date_time <= cutoff),
uol_temp AS (SELECT uniq_id, date_time, city_id, city_name, customer_id, first_name,
                    last_name, item_id, item_name, quantity, payment_amount, status
             FROM feed, ord_cut WHERE date_time > cutoff),
uol_v2 AS (
  SELECT uniq_id, date_time, city_id, city_name, customer_id, first_name, last_name,
         item_id, item_name, quantity, payment_amount, 'shipped' AS status FROM uol
  UNION ALL
  SELECT uniq_id, date_time, city_id, city_name, customer_id, first_name, last_name,
         item_id, item_name, quantity, payment_amount, status FROM uol_temp),
ual_all AS (
  SELECT CAST(event_id AS VARCHAR) AS uniq_id,
         date_trunc('second', CAST(ts AS TIMESTAMP)) AS date_time,
         CAST(CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
              WHEN 'purchase' THEN 3 WHEN 'signup' THEN 4 ELSE 5 END AS BIGINT) AS action_id,
         CAST(user_id AS BIGINT) AS customer_id,
         CAST(floor(value) AS BIGINT) AS quantity
  FROM events),
ual AS (SELECT uniq_id, date_time, action_id, customer_id, quantity
        FROM ual_all, ev_cut WHERE date_time <= cutoff),
ual_temp AS (SELECT uniq_id, date_time, action_id, customer_id, quantity
             FROM ual_all, ev_cut WHERE date_time > cutoff),
research_all AS (
  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS date_id,
         CAST(CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
              WHEN 'purchase' THEN 3 WHEN 'signup' THEN 4 ELSE 5 END AS INTEGER) AS category_id,
         CAST(min(user_id % 25) AS INTEGER) AS geo_id,
         CAST(count(*) AS INTEGER) AS sales_qty,
         CAST(sum(CAST(floor(value) AS BIGINT)) AS DECIMAL(14,2)) AS sales_amt,
         max(CAST(ts AS TIMESTAMP)) AS max_ts
  FROM events GROUP BY 1, 2),
research AS (SELECT date_id, category_id, geo_id, sales_qty, sales_amt
             FROM research_all, ev_cut WHERE max_ts <= cutoff),
research_temp AS (SELECT date_id, category_id, geo_id, sales_qty, sales_amt
                  FROM research_all, ev_cut WHERE max_ts > cutoff),
price_log AS (SELECT p_name AS prod_name,
                     CAST(round(p_retailprice) AS INTEGER) AS price FROM part),
cal_dates AS (SELECT DISTINCT date_time AS fact_date FROM (
    SELECT date_id AS date_time FROM research
    UNION ALL SELECT date_time FROM ual
    UNION ALL SELECT date_time FROM uol) dates),
d_calendar AS (
  SELECT CAST(row_number() OVER (ORDER BY fact_date) AS BIGINT) AS date_id,
         fact_date,
         CAST(extract(day FROM fact_date) AS INTEGER) AS day_num,
         CAST(extract(month FROM fact_date) AS INTEGER) AS month_num,
         lower(strftime(fact_date, '%b')) AS month_name,
         CAST(extract(year FROM fact_date) AS INTEGER) AS year_num
  FROM cal_dates),
cal_temp_dates AS (SELECT DISTINCT date_time AS fact_date FROM (
    SELECT date_id AS date_time FROM research_temp
    UNION ALL SELECT date_time FROM ual_temp
    UNION ALL SELECT date_time FROM uol_temp) dates),
d_calendar_temp AS (
  SELECT CAST((SELECT count(*) FROM cal_dates) + row_number() OVER (ORDER BY fact_date) AS BIGINT) AS date_id,
         fact_date,
         CAST(extract(day FROM fact_date) AS INTEGER) AS day_num,
         CAST(extract(month FROM fact_date) AS INTEGER) AS month_num,
         lower(strftime(fact_date, '%b')) AS month_name,
         CAST(extract(year FROM fact_date) AS INTEGER) AS year_num
  FROM cal_temp_dates),
d_calendar_full AS (
  SELECT * FROM d_calendar UNION ALL SELECT * FROM d_calendar_temp),
d_customer AS (
  SELECT CAST(row_number() OVER (ORDER BY customer_id) AS BIGINT) AS id,
         customer_id, first_name, last_name, city_id
  FROM (SELECT *, row_number() OVER (PARTITION BY customer_id
                                     ORDER BY first_name, last_name) AS rn
        FROM (SELECT CAST(customer_id AS INTEGER) AS customer_id, first_name,
                     last_name, max(city_id) AS city_id
              FROM uol GROUP BY 1, 2, 3) g0) g WHERE rn = 1),
d_item AS (
  SELECT CAST(row_number() OVER (ORDER BY item_id) AS BIGINT) AS id,
         item_id, item_name
  FROM (SELECT *, row_number() OVER (PARTITION BY item_id ORDER BY item_name) AS rn
        FROM (SELECT DISTINCT CAST(item_id AS INTEGER) AS item_id, item_name
              FROM uol) g0) g WHERE rn = 1),
f_sales AS (
  SELECT CAST(row_number() OVER (ORDER BY uol.date_time, uol.uniq_id) AS BIGINT) AS id,
         dc.date_id AS date_id, uol.item_id AS item_id, uol.customer_id AS customer_id,
         uol.city_id AS city_id, uol.quantity AS quantity, uol.payment_amount AS payment_amount
  FROM uol JOIN d_calendar dc ON dc.fact_date = uol.date_time),
f_sales_temp AS (
  SELECT CAST((SELECT count(*) FROM uol) + row_number() OVER (ORDER BY uol.date_time, uol.uniq_id) AS BIGINT) AS id,
         dc.date_id AS date_id, uol.item_id AS item_id, uol.customer_id AS customer_id,
         uol.city_id AS city_id, uol.quantity AS quantity, uol.payment_amount AS payment_amount,
         uol.status AS status
  FROM uol_temp uol JOIN d_calendar_temp dc ON dc.fact_date = uol.date_time),
f_sales_v2 AS (
  SELECT id, date_id, item_id, customer_id, city_id, quantity, payment_amount,
         'shipped' AS status FROM f_sales
  UNION ALL SELECT * FROM f_sales_temp),
d_calendar_weeks AS (
  SELECT start_date, end_date,
         CAST(row_number() OVER (ORDER BY start_date) AS BIGINT) AS period
  FROM (SELECT min(fact_date) AS start_date, max(fact_date) AS end_date
        FROM d_calendar_full GROUP BY date_trunc('week', fact_date)) w),
uolv_period AS (
  SELECT v.*, w.period
  FROM uol_v2 v LEFT JOIN d_calendar_weeks w
    ON v.date_time BETWEEN w.start_date AND w.end_date),
new_cust AS (
  SELECT period, item_id AS item_new,
         CAST(count(customer_id) AS BIGINT) AS new_cust_count,
         sum(revenue) AS new_cust_revenue
  FROM (SELECT customer_id, date_time, period, item_id, count(*) AS cnt,
               sum(payment_amount) AS revenue
        FROM uolv_period WHERE status = 'shipped'
        GROUP BY 1, 2, 3, 4 HAVING count(*) = 1) nc
  GROUP BY 1, 2),
new_cust_compact AS (
  SELECT period, CAST(count(customer_id) AS BIGINT) AS new_cust_count,
         sum(revenue) AS new_cust_revenue
  FROM (SELECT customer_id, date_time, period, count(*) AS cnt,
               sum(payment_amount) AS revenue
        FROM uolv_period WHERE status = 'shipped'
        GROUP BY 1, 2, 3 HAVING count(*) = 1) nc
  GROUP BY 1),
returned_cust AS (
  SELECT period, item_id AS item_ret,
         CAST(count(customer_id) AS BIGINT) AS returned_cust_count,
         sum(revenue) AS returned_revenue
  FROM (SELECT customer_id, date_time, period, item_id, count(*) AS cnt,
               sum(payment_amount) AS revenue
        FROM uolv_period WHERE status = 'shipped'
        GROUP BY 1, 2, 3, 4 HAVING count(*) > 1) rc
  GROUP BY 1, 2),
returned_cust_compact AS (
  SELECT period, CAST(count(customer_id) AS BIGINT) AS returned_cust_count,
         sum(revenue) AS returned_revenue
  FROM (SELECT customer_id, date_time, period, count(*) AS cnt,
               sum(payment_amount) AS revenue
        FROM uolv_period WHERE status = 'shipped'
        GROUP BY 1, 2, 3 HAVING count(*) > 1) rc
  GROUP BY 1),
refunded_cust AS (
  SELECT period, item_id AS item_ref,
         CAST(count(*) AS BIGINT) AS cust_with_refunds,
         CAST(sum(refunds) AS BIGINT) AS total_refunds
  FROM (SELECT customer_id, date_time, period, item_id, count(*) AS refunds
        FROM uolv_period WHERE status = 'refunded'
        GROUP BY 1, 2, 3, 4) rf
  GROUP BY 1, 2),
refunded_cust_compact AS (
  SELECT period, CAST(count(*) AS BIGINT) AS cust_with_refunds,
         CAST(sum(refunds) AS BIGINT) AS total_refunds
  FROM (SELECT customer_id, date_time, period, count(*) AS refunds
        FROM uolv_period WHERE status = 'refunded'
        GROUP BY 1, 2, 3) rf
  GROUP BY 1),
retention_compact AS (
  SELECT COALESCE(n.period, r.period, f.period) AS period,
         n.new_cust_count, n.new_cust_revenue,
         r.returned_cust_count, r.returned_revenue,
         f.cust_with_refunds, f.total_refunds
  FROM new_cust_compact n
  FULL JOIN returned_cust_compact r ON n.period = r.period
  FULL JOIN refunded_cust_compact f ON COALESCE(n.period, r.period) = f.period),
f_customer_retention AS (
  SELECT n.new_cust_count AS new_customers_count,
         r.returned_cust_count AS returning_customers_count,
         f.cust_with_refunds AS refunded_customer_count,
         'weekly' AS period_name,
         CAST(COALESCE(n.period, r.period, f.period) AS INTEGER) AS period_id,
         n.item_new AS item_id_new_cust,
         r.item_ret AS item_id_returned_cust,
         f.item_ref AS item_id_refunded_cust,
         CAST(round(n.new_cust_revenue) AS BIGINT) AS new_customers_revenue,
         CAST(round(r.returned_revenue) AS BIGINT) AS returning_customers_revenue,
         CAST(f.total_refunds AS INTEGER) AS customers_refunded
  FROM new_cust n
  FULL JOIN returned_cust r ON n.period = r.period
  FULL JOIN refunded_cust f ON COALESCE(n.period, r.period) = f.period),
f_customer_retention_grain AS (
  SELECT CAST(COALESCE(n.period, r.period, f.period) AS INTEGER) AS period_id,
         COALESCE(n.item_new, r.item_ret, f.item_ref) AS item_id,
         n.new_cust_count AS new_customers_count,
         r.returned_cust_count AS returning_customers_count,
         f.cust_with_refunds AS refunded_customer_count,
         'weekly' AS period_name,
         CAST(round(n.new_cust_revenue) AS BIGINT) AS new_customers_revenue,
         CAST(round(r.returned_revenue) AS BIGINT) AS returning_customers_revenue,
         CAST(f.total_refunds AS INTEGER) AS customers_refunded
  FROM new_cust n
  FULL JOIN returned_cust r
    ON n.period = r.period AND n.item_new = r.item_ret
  FULL JOIN refunded_cust f
    ON COALESCE(n.period, r.period) = f.period
   AND COALESCE(n.item_new, r.item_ret) = f.item_ref),
sales_daily AS (
  SELECT item_id, date_time AS sale_date,
         sum(payment_amount) AS day_revenue,
         CAST(sum(quantity) AS BIGINT) AS day_qty
  FROM uol GROUP BY 1, 2),
sales_rolling AS (
  SELECT item_id, sale_date, day_revenue,
         sum(day_revenue) OVER w7 AS rev_7d,
         CAST(sum(day_qty) OVER w7 AS BIGINT) AS qty_7d,
         CAST(count(*) OVER w7 AS BIGINT) AS n_days_7d
  FROM sales_daily
  WINDOW w7 AS (PARTITION BY item_id ORDER BY sale_date
                RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)),
top_items_city AS (
  SELECT city_id, item_id, revenue, qty, rnk FROM (
    SELECT city_id, item_id, revenue, qty,
           CAST(row_number() OVER (PARTITION BY city_id
                  ORDER BY revenue DESC, item_id) AS BIGINT) AS rnk
    FROM (SELECT city_id, item_id, sum(payment_amount) AS revenue,
                 CAST(sum(quantity) AS BIGINT) AS qty
          FROM uol GROUP BY 1, 2) r) t
  WHERE rnk <= 3),
sales_pivot AS (
  SELECT date_trunc('month', date_time) AS month,
         sum(CASE WHEN status = 'shipped' THEN payment_amount END) AS shipped_amount,
         CAST(sum(CASE WHEN status = 'shipped' THEN quantity END) AS BIGINT) AS shipped_qty,
         sum(CASE WHEN status = 'refunded' THEN payment_amount END) AS refunded_amount,
         CAST(sum(CASE WHEN status = 'refunded' THEN quantity END) AS BIGINT) AS refunded_qty
  FROM uol_v2 GROUP BY 1),
sales_rollup AS (
  SELECT y AS year_num, m AS month_num,
         sum(payment_amount) AS revenue,
         CAST(sum(quantity) AS BIGINT) AS qty,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(GROUPING(y) AS BIGINT) AS g_year,
         CAST(GROUPING(m) AS BIGINT) AS g_month
  FROM (SELECT CAST(extract(year FROM date_time) AS INTEGER) AS y,
               CAST(extract(month FROM date_time) AS INTEGER) AS m,
               payment_amount, quantity FROM uol) s
  GROUP BY ROLLUP(y, m)),
scd_day AS (
  SELECT customer_id, date_time AS day, max(city_id) AS city_id
  FROM uol_v2 GROUP BY 1, 2),
scd_changes AS (
  SELECT customer_id, city_id, day AS valid_from
  FROM (SELECT *, lag(city_id) OVER (PARTITION BY customer_id ORDER BY day)
                    AS prev_city
        FROM scd_day) c
  WHERE prev_city IS NULL OR prev_city <> city_id),
d_customer_scd AS (
  SELECT customer_id, city_id, valid_from,
         lead(valid_from) OVER w - INTERVAL 1 DAY AS valid_to,
         lead(valid_from) OVER w IS NULL AS is_current
  FROM scd_changes
  WINDOW w AS (PARTITION BY customer_id ORDER BY valid_from)),
customer_cumrev AS (
  SELECT customer_id, day, day_rev,
         sum(day_rev) OVER (PARTITION BY customer_id ORDER BY day
                            ROWS UNBOUNDED PRECEDING) AS cum_rev,
         CAST(row_number() OVER (PARTITION BY customer_id ORDER BY day)
              AS BIGINT) AS day_seq
  FROM (SELECT customer_id, date_time AS day,
               sum(payment_amount) AS day_rev
        FROM uol GROUP BY 1, 2) d),
cohort_weeks AS (
  SELECT DISTINCT customer_id,
         CAST(date_trunc('week', date_time) AS TIMESTAMP) AS week
  FROM uol),
cohort_first AS (
  SELECT customer_id, min(week) AS cohort_week FROM cohort_weeks GROUP BY 1),
cohort_retention AS (
  SELECT a.cohort_week, a.weeks_since, a.n_active, s.cohort_size,
         CAST(a.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
           AS retention
  FROM (SELECT f.cohort_week,
               CAST(datediff('day', f.cohort_week, w.week) // 7 AS BIGINT)
                 AS weeks_since,
               CAST(count(*) AS BIGINT) AS n_active
        FROM cohort_weeks w
        JOIN cohort_first f ON f.customer_id = w.customer_id
        GROUP BY 1, 2) a
  JOIN (SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
        FROM cohort_first GROUP BY 1) s
    ON s.cohort_week = a.cohort_week),
d_customer_new AS (
  SELECT customer_id, first_name, last_name, city_id FROM (
    SELECT *, row_number() OVER (PARTITION BY customer_id
                                 ORDER BY first_name, last_name) AS rn
    FROM (SELECT CAST(customer_id AS INTEGER) AS customer_id, first_name,
                 last_name, max(city_id) AS city_id
          FROM uol_v2 GROUP BY 1, 2, 3) g0) g WHERE rn = 1),
snapshot_diff AS (
  SELECT COALESCE(o.customer_id, n.customer_id) AS customer_id,
         CASE WHEN o.customer_id IS NULL THEN 'added'
              WHEN n.customer_id IS NULL THEN 'removed'
              ELSE 'changed' END AS change_type,
         o.first_name AS old_first_name, n.first_name AS new_first_name,
         o.last_name AS old_last_name, n.last_name AS new_last_name,
         o.city_id AS old_city_id, n.city_id AS new_city_id
  FROM (SELECT customer_id, first_name, last_name, city_id
        FROM d_customer) o
  FULL JOIN d_customer_new n ON o.customer_id = n.customer_id
  WHERE o.customer_id IS NULL OR n.customer_id IS NULL
     OR o.first_name <> n.first_name OR o.last_name <> n.last_name
     OR o.city_id <> n.city_id),
revenue_hhi AS (
  SELECT week, CAST(count(*) AS BIGINT) AS n_items,
         CAST(sum(rev_i) AS BIGINT) AS total_rev,
         CAST(sum(rev_i * rev_i) AS DOUBLE)
           / (CAST(sum(rev_i) AS DOUBLE) * CAST(sum(rev_i) AS DOUBLE))
           AS hhi
  FROM (SELECT CAST(date_trunc('week', date_time) AS TIMESTAMP) AS week,
               item_id,
               CAST(floor(sum(payment_amount)) AS BIGINT) AS rev_i
        FROM uol GROUP BY 1, 2) iw
  GROUP BY 1),
sales_mom AS (
  SELECT month, rev, n_sales, rev_i,
         prev_rev_i,
         CAST(CASE
           WHEN prev_rev_i IS NULL THEN NULL
           WHEN rev_i >= prev_rev_i
           THEN ((rev_i - prev_rev_i) * 1000000) // NULLIF(prev_rev_i, 0)
           ELSE -(((prev_rev_i - rev_i) * 1000000) // NULLIF(prev_rev_i, 0))
         END AS BIGINT) AS growth_ppm
  FROM (SELECT month, rev, n_sales, rev_i,
               lag(rev_i) OVER (ORDER BY month) AS prev_rev_i
        FROM (SELECT CAST(date_trunc('month', date_time) AS TIMESTAMP)
                       AS month,
                     sum(payment_amount) AS rev,
                     CAST(count(*) AS BIGINT) AS n_sales,
                     CAST(floor(sum(payment_amount)) AS BIGINT) AS rev_i
              FROM uol GROUP BY 1) m) l),
cohort_ltv AS (
  SELECT cohort_month, month_index, n_active,
         CAST(rev_dec AS DOUBLE) AS revenue,
         CAST(sum(rev_dec) OVER (PARTITION BY cohort_month
                ORDER BY month_index ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS DOUBLE) AS cum_revenue
  FROM (
    SELECT cm.cohort_month,
           CAST((year(m.month) - year(cm.cohort_month)) * 12
                + (month(m.month) - month(cm.cohort_month)) AS BIGINT)
             AS month_index,
           CAST(count(DISTINCT m.customer_id) AS BIGINT) AS n_active,
           sum(m.rev_m) AS rev_dec
    FROM (SELECT customer_id,
                 CAST(date_trunc('month', date_time) AS TIMESTAMP) AS month,
                 sum(payment_amount) AS rev_m
          FROM uol GROUP BY 1, 2) m
    JOIN (SELECT customer_id, min(month) AS cohort_month
          FROM (SELECT customer_id,
                       CAST(date_trunc('month', date_time) AS TIMESTAMP)
                         AS month FROM uol) x
          GROUP BY 1) cm ON cm.customer_id = m.customer_id
    GROUP BY 1, 2) cells),
sales_dow AS (
  SELECT CAST(isodow(date_time) AS BIGINT) AS dow,
         CAST(count(*) AS BIGINT) AS n_sales,
         CAST(sum(quantity) AS BIGINT) AS qty,
         CAST(sum(payment_amount) AS DOUBLE) AS revenue
  FROM uol GROUP BY 1),
cust_gini AS (
  SELECT month, CAST(count(*) AS BIGINT) AS n_custs,
         CAST(sum(rev_i) AS BIGINT) AS total_rev_i,
         CAST((2 * CAST(sum(rank * rev_i) AS BIGINT) * 1000000)
                // (count(*) * CAST(sum(rev_i) AS BIGINT))
              - ((count(*) + 1) * 1000000) // count(*) AS BIGINT) AS gini_ppm
  FROM (SELECT month, customer_id, rev_i,
               CAST(row_number() OVER (PARTITION BY month
                 ORDER BY rev_i, customer_id) AS BIGINT) AS rank
        FROM (SELECT CAST(date_trunc('month', date_time) AS TIMESTAMP)
                       AS month,
                     customer_id,
                     CAST(floor(sum(payment_amount)) AS BIGINT) AS rev_i
              FROM uol GROUP BY 1, 2) pc) r
  GROUP BY 1)
"""

  /** Docs/vectors prelude for the training-data-pipeline operators
    * (dedup / similarity / text analysis / multimodal). Kept separate from
    * the ETL prelude — different base tables, smaller SQL per query. */
  val docsPrelude: String = DocsOracleSql.text

  private def from(cte: String): String = prelude + s"SELECT * FROM $cte"
  private def fromDocs(cte: String): String =
    docsPrelude + s"SELECT * FROM $cte"

  /** Money columns are computed as exact DECIMAL(14,2) inside the engine
    * (reference `numeric(14,2)`) but canonicalized to DOUBLE at each query's
    * output so the two engines' client layers render identical values
    * (DuckDB's pandas bridge turns DECIMAL into float64). The decimal→double
    * conversion of the same exact value is bit-identical on both sides. */
  private def fromD(cte: String, moneyCols: String*): String = {
    val repl = moneyCols
      .map(c => s"CAST($c AS DOUBLE) AS $c").mkString(", ")
    prelude + s"SELECT * REPLACE ($repl) FROM $cte"
  }

  /** ETL-parity oracle set; keys match SparkEntry.queries. */
  val sql: Map[String, String] = Map(
    "q_user_order_log"     -> fromD("uol", "payment_amount"),
    "q_user_order_log_inc" -> fromD("uol_temp", "payment_amount"),
    "q_user_order_log_v2"  -> fromD("uol_v2", "payment_amount"),
    "q_user_activity_log"  -> from("ual"),
    "q_customer_research"  -> fromD("research", "sales_amt"),
    "q_price_log"          -> from("price_log"),
    "q_d_calendar"         -> from("d_calendar"),
    "q_d_calendar_inc"     -> from("d_calendar_temp"),
    "q_d_customer"         -> from("d_customer"),
    "q_d_item"             -> from("d_item"),
    "q_f_sales"            -> fromD("f_sales", "payment_amount"),
    "q_f_sales_inc"        -> fromD("f_sales_temp", "payment_amount"),
    "q_f_sales_v2"         -> fromD("f_sales_v2", "payment_amount"),
    "q_d_calendar_weeks"   -> from("d_calendar_weeks"),
    "q_new_customers"      -> fromD("new_cust", "new_cust_revenue"),
    "q_new_customers_compact" -> fromD("new_cust_compact", "new_cust_revenue"),
    "q_returned_customers" -> fromD("returned_cust", "returned_revenue"),
    "q_returned_customers_compact" ->
      fromD("returned_cust_compact", "returned_revenue"),
    "q_refunded_customers" -> from("refunded_cust"),
    "q_refunded_customers_compact" -> from("refunded_cust_compact"),
    "q_retention_compact" ->
      fromD("retention_compact", "new_cust_revenue", "returned_revenue"),
    "q_f_customer_retention" -> from("f_customer_retention"),
    "q_f_customer_retention_grain" -> from("f_customer_retention_grain"),
    // --- training-data-pipeline operators (docs/embeddings tables) ---
    "q_dedup_exact"         -> fromDocs("dedup_exact"),
    "q_dedup_minhash_lsh"   -> fromDocs("minhash_bands"),
    "q_dedup_minhash_pairs" -> fromDocs("minhash_pairs"),
    "q_dedup_simhash"       -> fromDocs("simhash"),
    "q_dedup_simhash_pairs" -> fromDocs("simhash_pairs"),
    "q_dedup_simhash64"       -> fromDocs("simhash64"),
    "q_dedup_simhash64_pairs" -> fromDocs("simhash64_pairs"),
    "q_dedup_consensus"     -> fromDocs("dedup_consensus"),
    "q_dedup_ngram_jaccard" -> fromDocs("ngram_jaccard"),
    "q_dedup_embedding"     -> fromDocs("dedup_embedding"),
    "q_dedup_embedding_ivf" -> fromDocs("dedup_embedding_ivf"),
    "q_dedup_embedding_lsh" -> fromDocs("dedup_embedding_lsh"),
    "q_text_stats"          -> fromDocs("text_stats"),
    "q_quality_score"       -> fromDocs("quality_score"),
    "q_lang_id"             -> fromDocs("lang_id"),
    "q_lang_id_ngram"       -> fromDocs("lang_id_ngram"),
    "q_doc_fingerprint"     -> fromDocs("doc_fingerprint"),
    "q_word_freq"           -> fromDocs("word_freq"),
    "q_multimodal_meta"     -> fromDocs("mm_meta"),
    "q_multimodal_frames"   -> fromDocs("mm_frames"),
    "q_ann_cosine_topk"     -> fromDocs("ann_cosine_topk"),
    // fast path checks the rank SET against the quantized exact top-k
    // (float scores excluded — accumulation order is engine-specific)
    "q_ann_cosine_topk_fast" ->
      (docsPrelude + "SELECT query_id, cand_id, rnk FROM ann_cosine_topk"),
    "q_ann_ivf_assign"      -> fromDocs("ivf_assign"),
    "q_ann_ivf_topk"        -> fromDocs("ivf_topk"),
    "q_ann_ivf_topk_probe2" -> fromDocs("ivf_topk_probe2"),
    "q_ann_kmeans_assign"   -> fromDocs("ann_kmeans_assign"),
    // fixed-budget (md5-ranked 4096) sampled Lloyd trainer, 1 full assign
    "q_ann_kmeans_assign_sampled" -> fromDocs("ann_kmeans_assign_sampled"),
    // sampled-vs-full trainer cell-agreement monitor (ppm)
    "q_kmeans_sample_drift" -> fromDocs("kmeans_sample_drift"),
    "q_dedup_clusters"      -> fromDocs("dedup_clusters"),
    "q_dedup_clusters_fast" -> fromDocs("dedup_clusters"),
    // guard degradation is deterministic (bucket > cap ⇒ member↔bucket-min
    // star), so the guarded pair list is fully oracle-checkable too
    "q_dedup_minhash_pairs_guarded" -> fromDocs("minhash_pairs_guarded"),
    "q_sample_stratified"   -> fromDocs("sample_stratified"),
    "q_split_train_val_test" -> fromDocs("split_tvt"),
    "q_corpus_curated"      -> fromDocs("corpus_curated"),
    "q_tfidf_top"           -> fromDocs("tfidf_top"),
    "q_bm25_top"            -> fromDocs("bm25_top"),
    "q_contamination"       -> fromDocs("contamination"),
    "q_pii_scan"            -> fromDocs("pii_scan"),
    "q_repetition"          -> fromDocs("repetition"),
    "q_bigram_freq"         -> fromDocs("bigram_freq"),
    "q_colloc_pmi"          -> fromDocs("colloc_pmi"),
    "q_corpus_curated_v2"   -> fromDocs("corpus_curated_v2"),
    // ordered funnel: equal-second ties count as converted (pinned)
    "q_funnel" -> """
      WITH f AS (
        SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
               min(date_trunc('second', CAST(ts AS TIMESTAMP))) AS first_ts
        FROM events WHERE event_type IN ('signup', 'view', 'purchase')
        GROUP BY 1, 2),
      u AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN first_ts END) AS s0,
               min(CASE WHEN event_type = 'view' THEN first_ts END) AS s1,
               min(CASE WHEN event_type = 'purchase' THEN first_ts END) AS s2
        FROM f GROUP BY 1)
      SELECT CAST(sum(CASE WHEN s0 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_stage_0,
             CAST(sum(CASE WHEN s0 IS NOT NULL AND s1 IS NOT NULL AND s1 >= s0
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_stage_1,
             CAST(sum(CASE WHEN s0 IS NOT NULL AND s1 IS NOT NULL AND s1 >= s0
                            AND s2 IS NOT NULL AND s2 >= s1
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_stage_2
      FROM u""",
    // incremental ingest = full pair list restricted to pairs touching the
    // new decile (new docs hold the max ids, so doc_b > cutoff ⇔ touching)
    "q_dedup_pairs_inc"     -> fromDocs("dedup_pairs_inc"),
    "q_sales_rolling_7d"    -> fromD("sales_rolling", "day_revenue", "rev_7d"),
    "q_top_items_per_city"  -> fromD("top_items_city", "revenue"),
    "q_sales_pivot"         -> fromD("sales_pivot",
                                     "shipped_amount", "refunded_amount"),
    "q_sales_rollup"        -> fromD("sales_rollup", "revenue"),
    "q_d_customer_scd"      -> from("d_customer_scd"),
    "q_customer_cumrev"     -> fromD("customer_cumrev", "day_rev", "cum_rev"),
    // gap sessionization over events (30-min gap, second-truncated ts,
    // per-user order (ts, event_id) — total because event_id is unique)
    "q_sessionize" -> """
      WITH ev AS (
        SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
               date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts2,
               CAST(floor(value) AS BIGINT) AS qty
        FROM events),
      flags AS (
        SELECT *, CASE WHEN lag(ts2) OVER w IS NULL
                         OR ts2 - lag(ts2) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts2, event_id)),
      sess AS (
        SELECT user_id, qty, ts2,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts2, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flags)
      SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
             min(ts2) AS session_start, max(ts2) AS session_end,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(qty) AS BIGINT) AS quantity
      FROM sess GROUP BY 1, 2""",
    "q_event_type_stats" -> """
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT CAST(user_id AS BIGINT)) AS BIGINT) AS n_users,
             CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS quantity
      FROM events GROUP BY 1""",
    // deterministic KMV sketch: same md5-prefix integers, same distinct-
    // hash set, same floor division — the estimate is bit-identical
    "q_kmv_users" -> """
      WITH dh AS (
        SELECT DISTINCT event_type,
               ('0x' || substr(md5(CAST(CAST(user_id AS BIGINT) AS VARCHAR)),
                               1, 8))::BIGINT AS h
        FROM events),
      rk AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rnk,
               count(*) OVER (PARTITION BY event_type) AS nd
        FROM dh)
      SELECT event_type, CAST(max(nd) AS BIGINT) AS n_hashes,
             CAST(count(*) AS BIGINT) AS k_used,
             max(h) AS kth_hash,
             CAST(CASE WHEN max(nd) <= 64 THEN max(nd)
                  ELSE (63 * 4294967296) // max(h) END AS BIGINT) AS est_users
      FROM rk WHERE rnk <= 64 GROUP BY 1""",
    "q_event_transitions" -> """
      WITH ev AS (
        SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
               date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts2, event_type
        FROM events),
      tr AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts2, event_id) AS from_type
        FROM ev)
      SELECT from_type, event_type AS to_type, CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM tr WHERE from_type IS NOT NULL GROUP BY 1, 2""",
    "q_fk_audit" -> Seq(
      ("lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("orders", "o_custkey", "customer", "c_custkey")).map {
        case (c, k, p, pk) =>
          s"""SELECT '$c.$k->$p.$pk' AS relation,
                CAST(sum(cnt) AS BIGINT) AS n_child_rows,
                CAST(count(*) AS BIGINT) AS n_child_keys,
                CAST(count(CASE WHEN pk IS NULL THEN 1 END) AS BIGINT) AS n_orphan_keys,
                CAST(COALESCE(sum(CASE WHEN pk IS NULL THEN cnt END), 0) AS BIGINT) AS n_orphan_rows
              FROM (SELECT ck.ck, ck.cnt, pp.pk
                    FROM (SELECT $k AS ck, count(*) AS cnt FROM $c GROUP BY 1) ck
                    LEFT JOIN (SELECT DISTINCT $pk AS pk FROM $p) pp
                      ON pp.pk = ck.ck) j"""
      }.mkString(" UNION ALL "),
    // classic analytics anchors over the raw tables (standalone SQL)
    "q_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_base_price,
             CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2))
                           * (CAST(1 AS DECIMAL(14,2)) - CAST(l_discount AS DECIMAL(14,2)))
                           AS DECIMAL(24,4))) AS DOUBLE) AS sum_disc_price,
             CAST(count(*) AS BIGINT) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY 1, 2""",
    "q_shipping_priority" -> """
      SELECT l_orderkey, o_orderdate, o_orderpriority,
             CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2))
                           * (CAST(1 AS DECIMAL(14,2)) - CAST(l_discount AS DECIMAL(14,2)))
                           AS DECIMAL(24,4))) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderdate < TIMESTAMP '1996-01-01'
        AND l_shipdate > TIMESTAMP '1996-01-01'
      GROUP BY 1, 2, 3""",
    "q_top_customers" -> """
      WITH rev AS (
        SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(14,2))) AS revenue
        FROM orders GROUP BY 1),
      top AS (
        SELECT o_custkey, revenue,
               row_number() OVER (ORDER BY revenue DESC, o_custkey) AS rnk
        FROM rev)
      SELECT t.o_custkey AS custkey, c.c_name,
             CAST(t.revenue AS DOUBLE) AS revenue, CAST(t.rnk AS BIGINT) AS rnk
      FROM top t JOIN customer c ON c.c_custkey = t.o_custkey
      WHERE t.rnk <= 10""",
    "q_asof_latest_order" -> """
      SELECT e.event_id, CAST(e.user_id AS BIGINT) AS user_id,
             date_trunc('second', CAST(e.ts AS TIMESTAMP)) AS ts,
             o.o_orderkey AS asof_o_orderkey,
             o.o_orderdate AS asof_o_orderdate
      FROM events e LEFT JOIN LATERAL (
        SELECT o_orderkey, o_orderdate FROM orders o
        WHERE o.o_custkey = e.user_id
          AND o.o_orderdate <= date_trunc('second', CAST(e.ts AS TIMESTAMP))
        ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1) o ON true""",
    // banded interval self-join — the oracle states the RANGE predicate
    // directly; the engine's 3-band equi-join must reproduce it exactly
    "q_event_pairs" -> """
      WITH ev AS (
        SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
               CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
                    AS BIGINT) // 3600 AS ev_hour
        FROM events)
      SELECT a.user_id, a.event_id AS event_a, b.event_id AS event_b,
             b.ev_hour - a.ev_hour AS hour_diff
      FROM ev a JOIN ev b
        ON a.user_id = b.user_id AND a.event_id < b.event_id
      WHERE abs(a.ev_hour - b.ev_hour) <= 6""",
    "q_profile_orders" -> Seq("o_orderkey", "o_custkey", "o_totalprice").map { c =>
      s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count($c) AS BIGINT) AS n_nonnull,
             CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
             CAST(min($c) AS DOUBLE) AS min_val,
             CAST(max($c) AS DOUBLE) AS max_val
          FROM orders"""
    }.mkString(" UNION ALL "),
    // exact interpolated quantiles: DuckDB quantile_cont == Spark percentile
    "q_profile_quantiles" -> """
      SELECT 'o_totalprice' AS "column",
             unnest([0.25, 0.5, 0.75, 0.95]) AS p,
             unnest(quantile_cont(o_totalprice, [0.25, 0.5, 0.75, 0.95])) AS q_value
      FROM orders""",
    "q_quantiles_by_flag" -> """
      SELECT l_returnflag, 'l_extendedprice' AS "column",
             unnest([0.25, 0.5, 0.75, 0.95]) AS p,
             unnest(quantile_cont(l_extendedprice, [0.25, 0.5, 0.75, 0.95])) AS q_value
      FROM lineitem GROUP BY 1""",
    // sketch-quantile tolerance contract: the sketch VALUE is
    // partitioning-dependent (no cross-engine hash), but its rank error vs
    // the exact data is bounded by the GK guarantee — the Spark side
    // MEASURES the bracket (count(<q), count(<=q)) against the table and
    // reports the verdict; the oracle states the contract it must meet
    "q_profile_quantiles_sketch" -> """
      SELECT 'o_totalprice' AS "column", CAST(p AS DOUBLE) AS p,
             true AS rank_ok
      FROM (VALUES (0.25), (0.5), (0.75), (0.95)) t(p)""",
    // bucket arithmetic mirrored exactly: (x - mn) * n / (mx - mn), floor,
    // clamp into the last bucket
    "q_histogram_totalprice" -> """
      WITH mm AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx
                  FROM orders)
      SELECT CAST(least(floor(((o_totalprice - mn) * 10) / (mx - mn)), 9)
                  AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM orders, mm GROUP BY 1""",
    // sketches only prune on the Spark side; the oracles are sketch-free
    "q_bloom_join" -> """
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)
               AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT'
      GROUP BY 1""",
    "q_heavy_hitters" -> """
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY 1 HAVING count(*) >= 40""",
    "q_sales_cube" -> (prelude + """
      SELECT city_id, status, CAST(sum(payment_amount) AS DOUBLE) AS revenue,
             CAST(sum(quantity) AS BIGINT) AS qty,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(GROUPING(city_id) AS BIGINT) AS g_city,
             CAST(GROUPING(status) AS BIGINT) AS g_status
      FROM uol_v2 GROUP BY CUBE(city_id, status)"""),
    "q_customer_deciles" -> (prelude + """
      SELECT customer_id, CAST(revenue AS DOUBLE) AS revenue, n_orders,
             CAST(ntile(10) OVER (ORDER BY revenue DESC, customer_id)
                  AS BIGINT) AS decile
      FROM (SELECT customer_id, sum(payment_amount) AS revenue,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM uol GROUP BY 1) r"""),
    "q_ann_recall" -> (docsPrelude + """
      SELECT q.query_id, CAST(count(h.cand_id) AS BIGINT) AS n_hits,
             CAST(count(h.cand_id) AS DOUBLE) / 3 AS recall
      FROM (SELECT DISTINCT query_id FROM ann_cosine_topk) q
      LEFT JOIN (SELECT e.query_id, e.cand_id FROM ann_cosine_topk e
                 JOIN ivf_topk a ON a.query_id = e.query_id
                                AND a.cand_id = e.cand_id
                 WHERE e.rnk <= 3) h ON h.query_id = q.query_id
      GROUP BY 1"""),
    // the same magic-number bit cascade as graft.expr.ZOrder2, in SQL
    "q_zorder_key" -> """
      WITH b AS (
        SELECT o_orderkey, o_custkey % 65536 AS xk,
               CAST(date_diff('day', DATE '1992-01-01',
                              CAST(o_orderdate AS DATE)) % 65536 AS BIGINT)
                 AS yk
        FROM orders),
      s1 AS (SELECT *, (xk & 65535) AS x0, (yk & 65535) AS y0 FROM b),
      s2 AS (SELECT *, ((x0 | (x0 << 8)) & 16711935) AS x1,
                       ((y0 | (y0 << 8)) & 16711935) AS y1 FROM s1),
      s3 AS (SELECT *, ((x1 | (x1 << 4)) & 252645135) AS x2,
                       ((y1 | (y1 << 4)) & 252645135) AS y2 FROM s2),
      s4 AS (SELECT *, ((x2 | (x2 << 2)) & 858993459) AS x3,
                       ((y2 | (y2 << 2)) & 858993459) AS y3 FROM s3),
      s5 AS (SELECT *, ((x3 | (x3 << 1)) & 1431655765) AS x4,
                       ((y3 | (y3 << 1)) & 1431655765) AS y4 FROM s4)
      SELECT o_orderkey, xk, yk, CAST(x4 | (y4 << 1) AS BIGINT) AS zval
      FROM s5""",
    // salted two-phase agg / salted replicated join are pure execution
    // strategies: the oracles state the PLAIN aggregation / join they
    // must be indistinguishable from
    "q_priority_sales_salted" -> """
      SELECT o_orderpriority,
             CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_rev
      FROM orders GROUP BY 1""",
    "q_brand_qty_salted" -> """
      SELECT p_brand, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1""",
    "q_dedup_passages"    -> fromDocs("dedup_passages"),
    // substring tier: maximal duplicated word spans at arbitrary offsets
    "q_dedup_substring_spans" -> fromDocs("dedup_substring_spans"),
    // corpus-level span-length histogram (power-of-2 word buckets)
    "q_substring_span_hist" -> fromDocs("substring_span_hist"),
    // per-doc duplicated-span words vs token count (quote-heavy filter)
    "q_quote_heavy_docs" -> fromDocs("quote_heavy_docs"),
    // cross-source quote-flow matrix over the substring-span grain
    "q_span_source_matrix" -> fromDocs("span_source_matrix"),
    // incremental substring check: the oracle IS the restricted rebuild
    // (full span table filtered to pairs with a new-batch side), so the
    // compare PROVES the engine's index-vs-increment plan equals it
    "q_dedup_substring_inc" -> fromDocs("dedup_substring_inc"),
    // substring index-build audit: what the occurrence cap removed
    "q_substring_index_stats" -> fromDocs("substring_index_stats"),
    // cross-tier pair overlap census (guarded minhash vs substring spans)
    "q_dedup_tier_overlap" -> fromDocs("tier_overlap"),
    "q_substring_ingest_debt" -> fromDocs("substring_ingest_debt"),
    "q_span_mask_ranges" -> fromDocs("span_mask_ranges"),
    "q_mask_savings_by_source" -> fromDocs("mask_savings_by_source"),
    "q_span_mask_ranges_inc" -> fromDocs("span_mask_ranges_inc"),
    "q_dup_rate_by_batch" -> fromDocs("dup_rate_by_batch"),
    // v3 admission: v2 plus the substring-tier quote-heavy gate
    "q_corpus_curated_v3" -> fromDocs("corpus_curated_v3"),
    // v4 admission: mask instead of drop (quote-heavy docs kept, span
    // ranges excised from the token count)
    "q_corpus_curated_v4" -> fromDocs("corpus_curated_v4"),
    // per-source v4-vs-v3 token yield (the apply step's justification)
    "q_mask_vs_drop_yield" -> fromDocs("mask_vs_drop_yield"),
    // incremental curation capstone: the v4 rebuild restricted to the
    // decile batch IS the oracle (inc admission ≡ restricted rebuild)
    "q_corpus_curated_v4_inc" -> fromDocs("corpus_curated_v4_inc"),
    // batch-funnel readout: the 7-stage funnel restricted to the batch
    "q_curation_funnel_inc" -> fromDocs("curation_funnel_inc"),
    // incremental quote gate: quote_heavy_docs restricted to the batch
    "q_quote_heavy_docs_inc" -> fromDocs("quote_heavy_docs_inc"),
    // v4 release card: per-(lang, source) post-mask token accounting
    "q_corpus_stats_v4" -> fromDocs("corpus_stats_v4"),
    "q_passage_dup_ratio" -> fromDocs("passage_dup_ratio"),
    "q_pq_codes"          -> fromDocs("pq_codes"),
    "q_pq_adc_topk"       -> fromDocs("pq_adc_topk"),
    "q_ivfpq_topk"        -> fromDocs("ivfpq_topk"),
    "q_ivfpq_rerank"      -> fromDocs("ivfpq_rerank"),
    // recall of the IVF-PQ composition: truth = exact top-3 prefix, hits =
    // ivfpq_topk rows; left join keeps 0-recall queries visible
    "q_ivfpq_recall" -> (docsPrelude + """
      SELECT q.query_id, CAST(count(h.cand_id) AS BIGINT) AS n_hits,
             CAST(count(h.cand_id) AS DOUBLE) / 3 AS recall
      FROM (SELECT DISTINCT query_id FROM ann_cosine_topk) q
      LEFT JOIN (SELECT e.query_id, e.cand_id FROM ann_cosine_topk e
                 JOIN ivfpq_topk a ON a.query_id = e.query_id
                                  AND a.cand_id = e.cand_id
                 WHERE e.rnk <= 3) h ON h.query_id = q.query_id
      GROUP BY 1"""),
    // ingest-drift monitor: the mixed-version CTE chain lives in the
    // prelude (ing_inc … ivf_ingest_recall)
    "q_ivf_ingest_recall" -> fromDocs("ivf_ingest_recall"),
    // multi-probe payoff WITH its cost: hit totals of the SAME exact truth
    // (top-3 prefix of ann_cosine_topk) at nprobe=1 (ivf_topk) vs nprobe=2
    // (ivf_topk_probe2), plus the exact candidate-pair count each setting
    // scores (probed cells rn<=p joined to rn=1 members, self excluded);
    // recall is one double division on exact integers
    "q_ivf_probe_recall" -> (docsPrelude + """
      SELECT nprobe, n_queries, total_hits, n_candidates,
             CAST(total_hits AS DOUBLE) / CAST(n_queries * 3 AS DOUBLE)
               AS recall
      FROM (
        SELECT CAST(1 AS BIGINT) AS nprobe,
               (SELECT CAST(count(DISTINCT query_id) AS BIGINT)
                FROM ann_cosine_topk) AS n_queries,
               (SELECT CAST(count(*) AS BIGINT)
                FROM ann_cosine_topk e JOIN ivf_topk a
                  ON a.query_id = e.query_id AND a.cand_id = e.cand_id
                WHERE e.rnk <= 3) AS total_hits,
               (SELECT CAST(count(*) AS BIGINT)
                FROM (SELECT vec_id, centroid_id FROM ivf_cells
                      WHERE rn <= 1 AND vec_id % 50 = 0) q
                JOIN (SELECT vec_id, centroid_id FROM ivf_cells
                      WHERE rn = 1) c
                  ON c.centroid_id = q.centroid_id
                 AND c.vec_id != q.vec_id) AS n_candidates
        UNION ALL
        SELECT CAST(2 AS BIGINT),
               (SELECT CAST(count(DISTINCT query_id) AS BIGINT)
                FROM ann_cosine_topk),
               (SELECT CAST(count(*) AS BIGINT)
                FROM ann_cosine_topk e JOIN ivf_topk_probe2 a
                  ON a.query_id = e.query_id AND a.cand_id = e.cand_id
                WHERE e.rnk <= 3),
               (SELECT CAST(count(*) AS BIGINT)
                FROM (SELECT vec_id, centroid_id FROM ivf_cells
                      WHERE rn <= 2 AND vec_id % 50 = 0) q
                JOIN (SELECT vec_id, centroid_id FROM ivf_cells
                      WHERE rn = 1) c
                  ON c.centroid_id = q.centroid_id
                 AND c.vec_id != q.vec_id)) t"""),
    "q_dedup_pairs_verified" -> fromDocs("dedup_pairs_verified"),
    "q_corpus_stats"         -> fromDocs("corpus_stats"),
    "q_dedup_clusters_verified" -> fromDocs("dedup_clusters_verified"),
    // market-basket pair mining: set-based baskets (DISTINCT order×part),
    // support ≥ 2; lift = exact integer counts, ONE double division
    "q_basket_pairs" -> """
      WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      n_ord AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
                FROM items),
      freq AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n
               FROM items GROUP BY 1),
      pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(count(*) AS BIGINT) AS n_both
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2)
      SELECT part_a, part_b, n_both, fa.n AS n_a, fb.n AS n_b,
             CAST(n_both * n_orders AS DOUBLE)
               / CAST(fa.n * fb.n AS DOUBLE) AS lift
      FROM pairs
      JOIN freq fa ON part_a = fa.l_partkey
      JOIN freq fb ON part_b = fb.l_partkey, n_ord""",
    // DAU + trailing-7d WAU per activity day via the bounded ×7 window
    // expansion (range(0,7) here ≡ sequence(day, day+6) on the Spark side)
    "q_rolling_active_users" -> """
      WITH ud AS (SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                         CAST(user_id AS BIGINT) AS user_id FROM events),
      wau AS (SELECT day + CAST(x AS INTEGER) AS day,
                     CAST(count(DISTINCT user_id) AS BIGINT) AS wau_users
              FROM ud, range(0, 7) t(x) GROUP BY 1),
      dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau_users
              FROM ud GROUP BY 1)
      SELECT CAST(dau.day AS TIMESTAMP) AS day, dau_users, wau_users,
             CAST(dau_users AS DOUBLE) / CAST(wau_users AS DOUBLE)
               AS stickiness
      FROM dau JOIN wau ON dau.day = wau.day""",
    // blocked fuzzy match over distinct part names: block = head noun
    // (last whitespace token), verify by Levenshtein ≤ 3
    "q_fuzzy_part_pairs" -> """
      WITH names AS (
        SELECT p_name AS name, CAST(count(*) AS BIGINT) AS n_parts,
               string_split(p_name, ' ')[-1] AS block
        FROM part GROUP BY 1)
      SELECT a.name AS name_a, b.name AS name_b,
             CAST(levenshtein(a.name, b.name) AS INTEGER) AS dist,
             a.n_parts AS n_a, b.n_parts AS n_b
      FROM names a JOIN names b ON a.block = b.block AND a.name < b.name
      WHERE levenshtein(a.name, b.name) <= 3""",
    // concat-then-chunk sequence packing: shard = doc_id % 8, chunk = the
    // 512-token window the doc STARTS in (integer // ≡ Spark div).
    // DuckDB window sum(BIGINT) returns HUGEINT (INT128), and `// 512`
    // inherits it — the CAST pins chunk back to BIGINT so the driver's
    // hasher sees the same type as Spark (values were already identical).
    "q_pack_sequences" -> (docsPrelude + """
      SELECT shard, chunk, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens,
             min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM (
        SELECT doc_id, shard, n_tokens,
               CAST((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
                 - n_tokens) // 512 AS BIGINT) AS chunk
        FROM (SELECT doc_id, doc_id % 8 AS shard,
                     CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens
              FROM docs) t) p
      GROUP BY 1, 2"""),
    // rolling z-score anomaly over daily revenue: exact whole-dollar
    // integers through the window sums (floor, not cast — DuckDB's
    // decimal→int cast rounds; cents overflowed int64 sumsq at sf0.1);
    // the double expression tree is parenthesis-identical to
    // Analytics.revenueAnomalyOf
    "q_revenue_anomaly" -> """
      WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS day,
               sum(CAST(o_totalprice AS DECIMAL(14,2))) AS rev,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1),
      d2 AS (
        SELECT day, rev, n_orders, CAST(floor(rev) AS BIGINT) AS rev_i,
               CAST(date_diff('day', DATE '1992-01-01', day) AS BIGINT)
                 AS day_num
        FROM daily),
      win AS (
        SELECT day, rev, n_orders, rev_i,
               CAST(sum(rev_i) OVER w AS BIGINT) AS w_sum,
               CAST(sum(rev_i * rev_i) OVER w AS BIGINT) AS w_sumsq,
               CAST(count(*) OVER w AS BIGINT) AS w_n
        FROM d2
        WINDOW w AS (ORDER BY day_num
                     RANGE BETWEEN 27 PRECEDING AND CURRENT ROW)),
      sc AS (
        SELECT *, CAST(w_sum AS DOUBLE) / CAST(w_n AS DOUBLE) AS mu,
               greatest((CAST(w_sumsq AS DOUBLE)
                         - CAST(w_sum AS DOUBLE) * CAST(w_sum AS DOUBLE)
                           / CAST(w_n AS DOUBLE))
                        / CAST(w_n - 1 AS DOUBLE), 0.0) AS variance
        FROM win WHERE w_n >= 8),
      z AS (
        SELECT day, rev, n_orders,
               CASE WHEN sqrt(variance) > 0
                    THEN (CAST(rev_i AS DOUBLE) - mu) / sqrt(variance)
               END AS z
        FROM sc)
      SELECT CAST(day AS TIMESTAMP) AS day, CAST(rev AS DOUBLE) AS rev,
             n_orders, z, (z IS NOT NULL AND abs(z) > 2.5) AS is_anomaly
      FROM z""",
    // SCD2 point-in-time attribution: revenue by the city each customer
    // was in 30 days before the sale; pre-history sales keep NULL city
    "q_scd_pit" -> (prelude + """
      SELECT asof_city_id, CAST(count(*) AS BIGINT) AS n_sales,
             CAST(sum(payment_amount) AS DOUBLE) AS revenue
      FROM (
        SELECT h.city_id AS asof_city_id, s.payment_amount
        FROM uol_v2 s LEFT JOIN d_customer_scd h
          ON s.customer_id = h.customer_id
         AND s.date_time - INTERVAL 30 DAY >= h.valid_from
         AND (h.valid_to IS NULL
              OR s.date_time - INTERVAL 30 DAY <= h.valid_to)) t
      GROUP BY 1"""),
    // triangle census of the co-purchase graph. INDEPENDENT formulation:
    // the engine uses degree-ordered orientation; the oracle counts
    // triangles directly as ordered edge triples (u<v<w over u<v edges) —
    // a stronger check than re-implementing the same algorithm
    "q_triangle_stats" -> """
      WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      edges AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v FROM edges) n
        GROUP BY 1),
      tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
              FROM edges e1 JOIN edges e2 ON e2.u = e1.v
                   JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v),
      da AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                    CAST(sum((deg * (deg - 1)) // 2) AS BIGINT) AS n_wedges
             FROM deg),
      ea AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM edges)
      SELECT n_nodes, n_edges, n_triangles, n_wedges,
             CASE WHEN n_wedges > 0
                  THEN CAST(n_triangles * 3 AS DOUBLE)
                       / CAST(n_wedges AS DOUBLE) END AS global_cc
      FROM da, ea, tri""",
    // Zipf head-mass curve over the word_freq top-100 CTE
    "q_vocab_coverage" -> (docsPrelude + """
      SELECT rank, w, n,
             CAST(sum(n) OVER (ORDER BY rank
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
             CAST(sum(n) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING)
                  AS DOUBLE) / CAST(n_total AS DOUBLE) AS coverage
      FROM word_freq,
           (SELECT CAST(count(*) AS BIGINT) AS n_total FROM words_flat) t"""),
    // per-language percentile rank of the quality score, ties on doc_id
    "q_quality_pct_rank" -> (docsPrelude + """
      SELECT q.doc_id, d.lang, q.quality,
             CAST(row_number() OVER (PARTITION BY d.lang
                    ORDER BY q.quality, q.doc_id) AS BIGINT) AS rank,
             CAST(row_number() OVER (PARTITION BY d.lang
                    ORDER BY q.quality, q.doc_id) - 1 AS DOUBLE)
               / CAST(greatest(count(*) OVER (PARTITION BY d.lang) - 1, 1)
                      AS DOUBLE) AS pct_rank
      FROM quality_score q JOIN docs d ON d.doc_id = q.doc_id"""),
    // per-customer inter-order gap histogram (order pinned on date, key)
    "q_order_gaps" -> """
      WITH g AS (
        SELECT CAST(date_diff('day', prev_date, o_orderdate) AS BIGINT)
                 AS gap_days
        FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                     lag(o_orderdate) OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS prev_date
              FROM orders) t
        WHERE prev_date IS NOT NULL),
      b AS (SELECT gap_days,
                   CASE WHEN gap_days <= 7 THEN '01_week'
                        WHEN gap_days <= 30 THEN '02_month'
                        WHEN gap_days <= 90 THEN '03_quarter'
                        ELSE '04_long' END AS bucket
            FROM g)
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_gaps,
             CAST(sum(gap_days) AS BIGINT) AS sum_days,
             CAST(CAST(sum(gap_days) AS BIGINT) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS mean_gap
      FROM b GROUP BY 1""",
    // RRF hybrid fusion of the bm25_top CTE and a coverage-first ranking;
    // each RRF term is one division of exact integers, fixed two-term sum
    "q_rrf_fusion" -> (docsPrelude + """
      SELECT doc_id, rank_bm25, rank_cov, rrf_score,
             CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id)
                  AS BIGINT) AS rank
      FROM (
        SELECT coalesce(b.doc_id, c.doc_id) AS doc_id,
               b.rank AS rank_bm25, c.rank_cov,
               coalesce(CAST(1 AS DOUBLE) / CAST(b.rank + 60 AS DOUBLE), 0.0)
               + coalesce(CAST(1 AS DOUBLE) / CAST(c.rank_cov + 60 AS DOUBLE),
                          0.0) AS rrf_score
        FROM bm25_top b
        FULL OUTER JOIN (
          SELECT doc_id, n_hit, tot_tf,
                 CAST(row_number() OVER (ORDER BY n_hit DESC, tot_tf DESC,
                                         doc_id) AS BIGINT) AS rank_cov
          FROM (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit,
                       CAST(sum(tf) AS BIGINT) AS tot_tf
                FROM words_tf WHERE w IN ('spark', 'hash', 'join')
                GROUP BY 1) s
          QUALIFY rank_cov <= 10) c
          ON c.doc_id = b.doc_id) f"""),
    // incremental SCD2 merge must equal the FULL REBUILD — the oracle IS
    // the rebuild SQL (the strongest possible check for a merge)
    "q_d_customer_scd_inc" -> (prelude + "SELECT * FROM d_customer_scd"),
    // components of the co-purchase graph: recursive min-label reachability
    // (independent of the engine's star-contraction algorithm)
    "q_basket_components" -> """
      WITH RECURSIVE items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      edges AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      nodes AS (SELECT u AS node FROM edges
                UNION SELECT v FROM edges),
      sym AS (SELECT u AS src, v AS dst FROM edges
              UNION ALL SELECT v, u FROM edges),
      reach AS (
        SELECT node, node AS label FROM nodes
        UNION
        SELECT e.dst AS node, r.label FROM reach r
        JOIN sym e ON e.src = r.node),
      comp AS (SELECT node, min(label) AS component FROM reach GROUP BY 1)
      SELECT component, CAST(count(*) AS BIGINT) AS n_parts
      FROM comp GROUP BY 1""",
    // typed JSON extraction from the event property bag; NULL-on-parse-
    // failure surfaced via the n_events/n_parsed pair (exact integer sums)
    "q_props_json" -> """
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(k) AS BIGINT) AS n_parsed,
             CAST(sum(k) AS BIGINT) AS sum_k,
             CAST(min(k) AS BIGINT) AS min_k,
             CAST(max(k) AS BIGINT) AS max_k
      FROM (SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events) t
      GROUP BY 1""",
    "q_cohort_retention" -> from("cohort_retention"),
    "q_snapshot_diff"    -> from("snapshot_diff"),
    "q_domain_quota"     -> fromDocs("domain_quota"),
    "q_mix_weights"      -> fromDocs("mix_weights"),
    "q_dedup_keep_best"  -> fromDocs("dedup_keep_best"),
    "q_doclen_hist"      -> fromDocs("doclen_hist"),
    "q_dedup_bag"            -> fromDocs("dedup_bag"),
    "q_shuffle_shards"       -> fromDocs("shuffle_shards"),
    "q_token_fertility"      -> fromDocs("token_fertility"),
    "q_unigram_logprob"      -> fromDocs("unigram_surprisal"),
    "q_source_vocab_overlap" -> fromDocs("source_vocab_overlap"),
    // same-(user,type) debounce: each event vs its immediate same-key
    // predecessor; strict >300 s keeps, else drops (lag-based — identical
    // window expression in the engine)
    "q_event_debounce" -> """
      WITH ev AS (
        SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
               date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts2, event_type
        FROM events),
      deb AS (
        SELECT *, lag(ts2) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts2, event_id) AS prev
        FROM ev)
      SELECT event_id, user_id, ts2, event_type
      FROM deb WHERE prev IS NULL OR ts2 - prev > INTERVAL 300 SECOND""",
    "q_sales_mom"       -> fromD("sales_mom", "rev"),
    "q_emb_norm_hist"   -> fromDocs("emb_norm_hist"),
    "q_char_entropy"    -> fromDocs("char_entropy"),
    "q_dedup_pairs_editdist" -> fromDocs("dedup_pairs_editdist"),
    "q_dup_rate_by_source"   -> fromDocs("dup_rate_by_source"),
    "q_ann_filtered_topk"    -> fromDocs("ann_filtered_topk"),
    "q_ivf_cell_balance"     -> fromDocs("ivf_cell_balance"),
    "q_minhash_band_stats"   -> fromDocs("minhash_band_stats"),
    "q_token_freq_drift"     -> fromDocs("token_freq_drift"),
    "q_dedup_prefix"            -> fromDocs("dedup_prefix"),
    "q_near_dup_rate_by_source" -> fromDocs("near_dup_rate_by_source"),
    "q_contam_rate_by_source"   -> fromDocs("contam_rate_by_source"),
    "q_top_docs_per_source"     -> fromDocs("top_docs_per_source"),
    "q_cross_source_dup_pairs"  -> fromDocs("cross_source_dup_pairs"),
    "q_ann_label_agreement"     -> fromDocs("ann_label_agreement"),
    "q_minhash_containment"     -> fromDocs("minhash_containment"),
    "q_ngram_novelty"           -> fromDocs("ngram_novelty"),
    "q_token_budget_select"     -> fromDocs("token_budget_select"),
    "q_curriculum_order"        -> fromDocs("curriculum_order"),
    "q_weighted_sample"         -> fromDocs("weighted_sample"),
    "q_pack_buckets"            -> fromDocs("pack_buckets"),
    "q_emb_dim_profile"         -> fromDocs("emb_dim_profile"),
    "q_emb_anisotropy"          -> fromDocs("emb_anisotropy"),
    "q_quality_dup_calibration" -> fromDocs("quality_dup_calibration"),
    "q_jaccard_hist"            -> fromDocs("jaccard_hist"),
    "q_ngram_novelty_inc"       -> fromDocs("ngram_novelty_inc"),
    "q_charset_profile"         -> fromDocs("charset_profile"),
    "q_emb_label_cohesion"      -> fromDocs("emb_label_cohesion"),
    "q_pq_distortion"           -> fromDocs("pq_distortion"),
    "q_dedup_cluster_sizes"     -> fromDocs("dedup_cluster_sizes"),
    "q_pair_degree_dist"        -> fromDocs("pair_degree_dist"),
    "q_mix_epochs"              -> fromDocs("mix_epochs"),
    "q_bigram_surprisal"        -> fromDocs("bigram_surprisal"),
    "q_lexical_diversity"       -> fromDocs("lexical_diversity"),
    "q_token_gini"              -> fromDocs("token_gini"),
    "q_cluster_purity"          -> fromDocs("cluster_purity"),
    "q_multimodal_frame_dedup"  -> fromDocs("mm_frame_dedup"),
    "q_split_leakage"           -> fromDocs("split_leakage"),
    "q_dedup_threshold_sweep"   -> fromDocs("dedup_threshold_sweep"),
    "q_length_trim"             -> fromDocs("length_trim"),
    "q_source_bigram_diversity" -> fromDocs("source_bigram_diversity"),
    "q_contrastive_terms"       -> fromDocs("contrastive_terms"),
    "q_ann_mrr"                 -> fromDocs("ann_mrr"),
    // stage-to-stage funnel latency: discrete median/p90 picks over the
    // ordered-converter durations (same first-touch + in-order condition
    // as q_funnel)
    "q_funnel_time" -> """
      WITH f AS (
        SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
               min(date_trunc('second', CAST(ts AS TIMESTAMP))) AS first_ts
        FROM events WHERE event_type IN ('signup', 'view', 'purchase')
        GROUP BY 1, 2),
      p AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'signup' THEN first_ts END) AS s,
               max(CASE WHEN event_type = 'view' THEN first_ts END) AS v,
               max(CASE WHEN event_type = 'purchase' THEN first_ts END) AS pu
        FROM f GROUP BY 1),
      d AS (
        SELECT '01_signup_to_view' AS stage_pair, user_id,
               CAST(date_diff('second', s, v) AS BIGINT) AS dur_sec
        FROM p WHERE s IS NOT NULL AND v IS NOT NULL AND v >= s
        UNION ALL
        SELECT '02_view_to_purchase', user_id,
               CAST(date_diff('second', v, pu) AS BIGINT)
        FROM p WHERE s IS NOT NULL AND v IS NOT NULL AND v >= s
                 AND pu IS NOT NULL AND pu >= v),
      r AS (
        SELECT stage_pair, dur_sec,
               row_number() OVER (PARTITION BY stage_pair
                 ORDER BY dur_sec, user_id) AS rn,
               count(*) OVER (PARTITION BY stage_pair) AS n
        FROM d)
      SELECT stage_pair, CAST(max(n) AS BIGINT) AS n_users,
             CAST(max(CASE WHEN rn = (n + 1) // 2 THEN dur_sec END)
               AS BIGINT) AS median_sec,
             CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN dur_sec END)
               AS BIGINT) AS p90_sec
      FROM r GROUP BY 1""",
    // sweep-line concurrency over the gap-sessions: boundary order is
    // total — (ts, delta −1<+1, user, seq): a session ending the second
    // another starts closes FIRST (back-to-back ≠ concurrent); the
    // running window sum is INT128 in DuckDB — BIGINT-pinned (HUGEINT rule)
    "q_session_concurrency" -> """
      WITH ev AS (
        SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
               date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts2
        FROM events),
      flags AS (
        SELECT *, CASE WHEN lag(ts2) OVER w IS NULL
                         OR ts2 - lag(ts2) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts2, event_id)),
      sess AS (
        SELECT user_id, ts2,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts2, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flags),
      sgrp AS (
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
               min(ts2) AS session_start, max(ts2) AS session_end
        FROM sess GROUP BY 1, 2),
      bounds AS (
        SELECT date_trunc('day', session_start) AS day,
               session_start AS ts, 1 AS delta, user_id, session_seq
        FROM sgrp
        UNION ALL
        SELECT date_trunc('day', session_start) AS day,
               session_end AS ts, -1 AS delta, user_id, session_seq
        FROM sgrp),
      sweep AS (
        SELECT day, sum(delta) OVER (PARTITION BY day
                 ORDER BY ts, delta, user_id, session_seq
                 ROWS UNBOUNDED PRECEDING) AS conc
        FROM bounds)
      SELECT day, CAST(count(*) // 2 AS BIGINT) AS n_sessions,
             CAST(max(conc) AS BIGINT) AS max_concurrent
      FROM sweep GROUP BY 1""",
    // Benford first-digit profile; the expected-share expression is the
    // same log10 literal tree on both engines (values sit ~0.3 bp from
    // any floor boundary — a 1-ulp libm skew cannot flip the floor)
    "q_benford_totalprice" -> """
      WITH d AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INTEGER) AS digit
        FROM orders),
      c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_orders
            FROM d WHERE digit >= 1 GROUP BY 1),
      t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS total FROM c)
      SELECT digit, n_orders,
             CAST(n_orders * 10000 // total AS BIGINT) AS share_bp,
             CAST(floor(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) * 10000)
                  AS BIGINT) AS benford_bp
      FROM c, t""",
    // discrete-rank quartiles (order-statistic picks — no interpolation,
    // exact on both engines) + Tukey 1.5·IQR fence counts per priority
    "q_price_outliers_iqr" -> """
      WITH ranked AS (
        SELECT o_orderpriority, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey) AS rn,
               count(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders),
      quart AS (
        SELECT o_orderpriority, CAST(max(n) AS BIGINT) AS n_orders,
               max(CASE WHEN rn = (n + 3) // 4 THEN o_totalprice END) AS q1,
               max(CASE WHEN rn = (3 * n + 3) // 4 THEN o_totalprice END)
                 AS q3
        FROM ranked GROUP BY 1),
      fences AS (
        SELECT *, q1 - (q3 - q1) * 1.5 AS lo_fence,
               q3 + (q3 - q1) * 1.5 AS hi_fence
        FROM quart)
      SELECT o.o_orderpriority, max(f.n_orders) AS n_orders,
             max(f.q1) AS q1, max(f.q3) AS q3,
             CAST(sum(CASE WHEN o.o_totalprice < f.lo_fence
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
             CAST(sum(CASE WHEN o.o_totalprice > f.hi_fence
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_high
      FROM orders o JOIN fences f ON f.o_orderpriority = o.o_orderpriority
      GROUP BY 1""",
    // TPC-H Q4 shape: EXISTS dedups by construction (an order with five
    // late lines counts once)
    "q_late_orders" -> """
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
      FROM orders o
      WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
        AND o.o_orderdate < TIMESTAMP '1996-10-01'
        AND EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND CAST(l.l_shipdate AS TIMESTAMP)
                          > CAST(o.o_orderdate AS TIMESTAMP)
                            + INTERVAL 90 DAY)
      GROUP BY 1""",
    // TPC-H Q13 shape: LEFT OUTER + count(col) NULL semantics put the
    // zero-order customers in the k=0 bucket
    "q_cust_order_dist" -> """
      SELECT c_count, CAST(count(*) AS BIGINT) AS n_custs
      FROM (SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT)
              AS c_count
            FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY 1) t
      GROUP BY 1""",
    // RFM quintiles: dense 1..n ranks + the SQL-standard integer-div
    // ntile CASE (identical text to the engine's ntileExpr); monetary
    // sums in DECIMAL so the floor is exact
    "q_customer_rfm" -> """
      WITH base AS (
        SELECT o_custkey,
               CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
                    (SELECT CAST(max(o_orderdate) AS DATE) FROM orders))
                 AS BIGINT) AS recency_days,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(floor(sum(CAST(o_totalprice AS DECIMAL(14,2))))
                 AS BIGINT) AS monetary
        FROM orders GROUP BY 1),
      n AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM base),
      rk AS (
        SELECT o_custkey, monetary,
               CAST(row_number() OVER (ORDER BY recency_days, o_custkey)
                 AS BIGINT) AS r_rn,
               CAST(row_number() OVER (ORDER BY -n_orders, o_custkey)
                 AS BIGINT) AS f_rn,
               CAST(row_number() OVER (ORDER BY -monetary, o_custkey)
                 AS BIGINT) AS m_rn
        FROM base),
      q AS (
        SELECT o_custkey, monetary,
          CAST(CASE WHEN nt // 5 = 0 THEN r_rn
               WHEN r_rn <= (nt % 5) * (nt // 5 + 1)
                 THEN (r_rn + nt // 5) // (nt // 5 + 1)
               ELSE nt % 5 + (r_rn - (nt % 5) * (nt // 5 + 1)
                              + nt // 5 - 1) // (nt // 5) END AS BIGINT)
            AS r_q,
          CAST(CASE WHEN nt // 5 = 0 THEN f_rn
               WHEN f_rn <= (nt % 5) * (nt // 5 + 1)
                 THEN (f_rn + nt // 5) // (nt // 5 + 1)
               ELSE nt % 5 + (f_rn - (nt % 5) * (nt // 5 + 1)
                              + nt // 5 - 1) // (nt // 5) END AS BIGINT)
            AS f_q,
          CAST(CASE WHEN nt // 5 = 0 THEN m_rn
               WHEN m_rn <= (nt % 5) * (nt // 5 + 1)
                 THEN (m_rn + nt // 5) // (nt // 5 + 1)
               ELSE nt % 5 + (m_rn - (nt % 5) * (nt // 5 + 1)
                              + nt // 5 - 1) // (nt // 5) END AS BIGINT)
            AS m_q
        FROM rk, n)
      SELECT r_q, f_q, m_q, CAST(count(*) AS BIGINT) AS n_custs,
             CAST(sum(monetary) AS BIGINT) AS sum_monetary
      FROM q GROUP BY 1, 2, 3""",
    // fixed-round BFS from the co-purchase hub: min-hop per node over the
    // unioned frontiers (re-reached nodes collapse via min), ≤3 hops
    "q_graph_hops" -> """
      WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      edges AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      sym AS (SELECT u AS src, v AS dst FROM edges
              UNION ALL SELECT v, u FROM edges),
      seed AS (SELECT src AS node FROM sym
               GROUP BY 1 ORDER BY count(*) DESC, src LIMIT 1),
      h1 AS (SELECT DISTINCT e.dst AS node
             FROM sym e JOIN seed s ON e.src = s.node),
      h2 AS (SELECT DISTINCT e.dst AS node
             FROM sym e JOIN h1 ON e.src = h1.node),
      h3 AS (SELECT DISTINCT e.dst AS node
             FROM sym e JOIN h2 ON e.src = h2.node),
      reach AS (
        SELECT node, 0 AS hops FROM seed
        UNION ALL SELECT node, 1 FROM h1
        UNION ALL SELECT node, 2 FROM h2
        UNION ALL SELECT node, 3 FROM h3)
      SELECT CAST(min_hops AS BIGINT) AS hops,
             CAST(count(*) AS BIGINT) AS n_items
      FROM (SELECT node, min(hops) AS min_hops FROM reach GROUP BY 1) m
      GROUP BY 1""",
    "q_user_lifecycle" -> """
      SELECT CAST(user_id AS BIGINT) AS user_id,
             min(ts2) AS first_ts, max(ts2) AS last_ts,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT CAST(ts2 AS DATE)) AS BIGINT)
               AS n_active_days,
             CAST(date_diff('day', CAST(min(ts2) AS DATE),
                            CAST(max(ts2) AS DATE)) AS BIGINT) AS span_days
      FROM (SELECT user_id,
                   date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts2
            FROM events) e
      GROUP BY 1""",
    "q_events_hour_profile" -> """
      SELECT CAST(hour(date_trunc('second', CAST(ts AS TIMESTAMP)))
                  AS BIGINT) AS hour,
             event_type,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT CAST(user_id AS BIGINT)) AS BIGINT)
               AS n_users,
             CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS quantity
      FROM events GROUP BY 1, 2""",
    // packing fill factor over the pack_sequences chunking (chunk counts
    // and token mass per shard against the 512-token capacity)
    "q_pack_efficiency" -> (docsPrelude + """
      SELECT shard, CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(sum(chunk_tokens) AS BIGINT) AS shard_tokens,
             max(chunk_tokens) AS max_chunk_tokens,
             CAST(CAST(sum(chunk_tokens) AS BIGINT) * 1000000
                  // (count(*) * 512) AS BIGINT) AS fill_ppm
      FROM (
        SELECT shard, chunk, CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens
        FROM (
          SELECT doc_id, shard, n_tokens,
                 CAST((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
                   - n_tokens) // 512 AS BIGINT) AS chunk
          FROM (SELECT doc_id, doc_id % 8 AS shard,
                       CAST(len(string_split(norm, ' ')) AS BIGINT)
                         AS n_tokens
                FROM docs) t) p
        GROUP BY 1, 2) c
      GROUP BY 1"""),
    // TPC-H Q5 shape: ASIA-region 1996 order-year revenue per nation where
    // customer and supplier nations match; the decimal tree matches the
    // engine's discPrice exactly
    "q_local_supplier_volume" -> """
      SELECT n_name,
             CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2))
                           * (CAST(1 AS DECIMAL(14,2))
                              - CAST(l_discount AS DECIMAL(14,2)))
                           AS DECIMAL(24,4))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
      JOIN nation   ON n_nationkey = s_nationkey
      JOIN region   ON r_regionkey = n_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY 1""",
    "q_event_rate_hist" -> """
      SELECT CAST(length(bin(n_events)) - 1 AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(n_events) AS BIGINT) AS sum_events,
             min(n_events) AS min_events, max(n_events) AS max_events
      FROM (SELECT CAST(user_id AS BIGINT) AS user_id,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1) u
      GROUP BY 1""",
    // per-edge common-neighbor (= per-edge triangle) counts via the same
    // canonical u<v edge closure as q_triangle_stats, fanned back to the
    // triangle's 3 edges; J = common / (deg_u + deg_v - common)
    "q_copurchase_jaccard" -> """
      WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      edges AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v FROM edges) n
        GROUP BY 1),
      tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
              FROM edges e1 JOIN edges e2 ON e2.u = e1.v
                   JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v),
      tri_edges AS (
        SELECT u, v, CAST(count(*) AS BIGINT) AS n_common FROM (
          SELECT a AS u, b AS v FROM tri
          UNION ALL SELECT a AS u, c AS v FROM tri
          UNION ALL SELECT b AS u, c AS v FROM tri) te
        GROUP BY 1, 2)
      SELECT e.u, e.v, du.deg AS deg_u, dv.deg AS deg_v,
             COALESCE(t.n_common, 0) AS n_common,
             CAST(COALESCE(t.n_common, 0) * 1000000
                  // (du.deg + dv.deg - COALESCE(t.n_common, 0))
                  AS BIGINT) AS jaccard_ppm
      FROM edges e
      JOIN deg du ON du.node = e.u
      JOIN deg dv ON dv.node = e.v
      LEFT JOIN tri_edges t ON t.u = e.u AND t.v = e.v""",
    // integer fixed-point PageRank, 3 unrolled power iterations — the
    // ppm/17-div-20 arithmetic is bit-identical to the engine's (double
    // sums would be addition-order-dependent and could never hash-match)
    "q_pagerank" -> """
      WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      edges AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      sym AS (SELECT u AS src, v AS dst FROM edges
              UNION ALL SELECT v, u FROM edges),
      deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
              FROM sym GROUP BY 1),
      r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS rank_ppm
             FROM deg),
      r1 AS (SELECT s.dst AS node,
                    CAST(150000 + (CAST(sum(r.rank_ppm // d.deg) AS BIGINT)
                                   * 17) // 20 AS BIGINT) AS rank_ppm
             FROM r0 r JOIN deg d ON d.src = r.node
             JOIN sym s ON s.src = r.node GROUP BY 1),
      r2 AS (SELECT s.dst AS node,
                    CAST(150000 + (CAST(sum(r.rank_ppm // d.deg) AS BIGINT)
                                   * 17) // 20 AS BIGINT) AS rank_ppm
             FROM r1 r JOIN deg d ON d.src = r.node
             JOIN sym s ON s.src = r.node GROUP BY 1),
      r3 AS (SELECT s.dst AS node,
                    CAST(150000 + (CAST(sum(r.rank_ppm // d.deg) AS BIGINT)
                                   * 17) // 20 AS BIGINT) AS rank_ppm
             FROM r2 r JOIN deg d ON d.src = r.node
             JOIN sym s ON s.src = r.node GROUP BY 1)
      SELECT node AS part, rank_ppm FROM r3""",
    "q_minhash_est_err" -> fromDocs("minhash_est_err"),
    "q_revenue_hhi"     -> from("revenue_hhi"),
    // degree distribution of the co-purchase graph
    "q_degree_dist" -> """
      WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      edges AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v FROM edges) n
        GROUP BY 1)
      SELECT deg, CAST(count(*) AS BIGINT) AS n_nodes
      FROM deg GROUP BY 1""",
    // per-column row/null/distinct profile of orders (count(DISTINCT c)
    // ignores NULLs on both engines — the countDistinct contract)
    "q_dq_profile" -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      .map(c =>
        s"""SELECT '$c' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
            CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
              AS n_null,
            CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct FROM orders""")
      .mkString("", " UNION ALL ", ""),
    "q_lang_confusion" -> fromDocs("lang_confusion"),
    // incremental CC merge must equal the FULL REBUILD — the oracle IS
    // the rebuild clustering (same stance as q_d_customer_scd_inc)
    "q_dedup_clusters_inc" -> fromDocs("dedup_clusters"),
    // per-join-key skew: n_keys, n_rows, heaviest key, max/avg ratio
    "q_skew_report" -> Seq(
        ("lineitem", "l_partkey"), ("lineitem", "l_suppkey"),
        ("lineitem", "l_orderkey"), ("orders", "o_custkey"))
      .map { case (t, c) =>
        s"""SELECT '$t.$c' AS relation,
            CAST(count(*) AS BIGINT) AS n_keys,
            CAST(sum(n) AS BIGINT) AS n_rows,
            CAST(max(n) AS BIGINT) AS max_rows,
            CAST(max(n) AS DOUBLE) * CAST(count(*) AS DOUBLE)
              / CAST(sum(n) AS DOUBLE) AS skew_ratio
            FROM (SELECT count(*) AS n FROM $t GROUP BY $c) g"""
      }.mkString("", " UNION ALL ", ""),
    // last-touch attribution: latest prior non-purchase event per
    // purchase, credited only within the 7-day window ('none' otherwise).
    // Picking the latest touch EVER then age-gating equals "latest within
    // window" — mirrored from the engine's one-pass as-of formulation.
    "q_attribution" -> """
      WITH ev AS (SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
                         date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts,
                         event_type FROM events),
      att AS (
        SELECT p.event_id,
               CASE WHEN t.ts >= p.ts - INTERVAL 7 DAY THEN t.event_type
                    ELSE 'none' END AS touch_type
        FROM ev p LEFT JOIN LATERAL (
          SELECT event_type, ts FROM ev t
          WHERE t.user_id = p.user_id AND t.event_type <> 'purchase'
            AND t.ts <= p.ts
          ORDER BY t.ts DESC, t.event_id DESC LIMIT 1) t ON true
        WHERE p.event_type = 'purchase')
      SELECT COALESCE(touch_type, 'none') AS touch_type,
             CAST(count(*) AS BIGINT) AS n_purchases
      FROM att GROUP BY 1""",
    // TPC-H Q7 shape: bilateral nation-pair revenue per ship year
    "q_q7_volume" -> """
      SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS ship_year,
             CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2))
                           * (CAST(1 AS DECIMAL(14,2))
                              - CAST(l_discount AS DECIMAL(14,2)))
                           AS DECIMAL(24,4))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
        AND sn.n_name <> cn.n_name
      GROUP BY 1, 2, 3""",
    // TPC-H Q8 shape: national ppm market share per order year
    // (whole-currency integer revenue; floor of the exact DECIMAL sum)
    "q_q8_market_share" -> """
      WITH f AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               sn.n_name AS supp_nation,
               CAST(CAST(l_extendedprice AS DECIMAL(14,2))
                    * (CAST(1 AS DECIMAL(14,2))
                       - CAST(l_discount AS DECIMAL(14,2)))
                    AS DECIMAL(24,4)) AS rev
        FROM lineitem
        JOIN part ON p_partkey = l_partkey AND p_type = 'PROMO'
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation cn ON cn.n_nationkey = c_nationkey
        JOIN region   ON r_regionkey = cn.n_regionkey AND r_name = 'ASIA'
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation sn ON sn.n_nationkey = s_nationkey),
      g AS (
        SELECT o_year,
               CAST(floor(sum(rev)) AS BIGINT) AS total_rev_i,
               CAST(floor(COALESCE(
                 sum(rev) FILTER (WHERE supp_nation = 'NATION_2'), 0))
                 AS BIGINT) AS nation_rev_i
        FROM f GROUP BY 1)
      SELECT o_year, total_rev_i, nation_rev_i,
             CAST(nation_rev_i * 1000000 // total_rev_i AS BIGINT)
               AS share_ppm
      FROM g""",
    // TPC-H Q10 shape: top-20 customers by refunded revenue in a quarter
    "q_q10_returned_top" -> """
      WITH rev AS (
        SELECT o_custkey,
               sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2))
                        * (CAST(1 AS DECIMAL(14,2))
                           - CAST(l_discount AS DECIMAL(14,2)))
                        AS DECIMAL(24,4))) AS revenue
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
        GROUP BY 1),
      top AS (
        SELECT o_custkey, revenue,
               row_number() OVER (ORDER BY revenue DESC, o_custkey) AS rnk
        FROM rev)
      SELECT t.o_custkey AS custkey, c.c_name, n.n_name,
             CAST(t.revenue AS DOUBLE) AS revenue, CAST(t.rnk AS BIGINT) AS rnk
      FROM top t
      JOIN customer c ON c.c_custkey = t.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE t.rnk <= 20""",
    // TPC-H Q14 shape: monthly promo-revenue ppm share
    "q_q14_promo_share" -> """
      WITH f AS (
        SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
               p_type = 'PROMO' AS is_promo,
               CAST(CAST(l_extendedprice AS DECIMAL(14,2))
                    * (CAST(1 AS DECIMAL(14,2))
                       - CAST(l_discount AS DECIMAL(14,2)))
                    AS DECIMAL(24,4)) AS rev
        FROM lineitem JOIN part ON p_partkey = l_partkey),
      g AS (
        SELECT month,
               CAST(floor(COALESCE(sum(rev) FILTER (WHERE is_promo), 0))
                 AS BIGINT) AS promo_rev_i,
               CAST(floor(sum(rev)) AS BIGINT) AS total_rev_i
        FROM f GROUP BY 1)
      SELECT month, promo_rev_i, total_rev_i,
             CAST(promo_rev_i * 1000000 // total_rev_i AS BIGINT)
               AS promo_ppm
      FROM g""",
    // TPC-H Q18 shape: bulk orders over the line-quantity threshold
    "q_q18_bulk_orders" -> """
      WITH q AS (
        SELECT l_orderkey,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem GROUP BY 1
        HAVING sum(CAST(l_quantity AS BIGINT)) >= 200)
      SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS custkey, c_name,
             o_orderdate,
             CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS DOUBLE)
               AS o_totalprice,
             sum_qty
      FROM q
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey""",
    // TPC-H Q22 shape: idle above-average positive balances per nation
    // (cross-multiplied threshold — no division; DECIMAL(18,6) balances)
    "q_q22_idle_balance" -> """
      WITH bal AS (
        SELECT c_custkey, c_nationkey,
               CAST(c_acctbal AS DECIMAL(18,6)) AS bal
        FROM customer),
      t AS (SELECT sum(bal) AS sum_pos, CAST(count(*) AS BIGINT) AS n_pos
            FROM bal WHERE bal > 0),
      recent AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '2000-01-01')
      SELECT n_name, CAST(count(*) AS BIGINT) AS n_custs,
             CAST(sum(bal) AS DOUBLE) AS sum_acctbal
      FROM bal
      CROSS JOIN t
      JOIN nation ON n_nationkey = c_nationkey
      WHERE bal * n_pos > sum_pos
        AND NOT EXISTS (SELECT 1 FROM recent r
                        WHERE r.o_custkey = bal.c_custkey)
      GROUP BY 1""",
    // round-13 TPC-H classics (adapted: supply facts from lineitem,
    // lateness from the orderdate->shipdate lag; see ops/TpchShapes)
    "q_q2_min_cost_supp" -> """
      WITH supply AS (
        SELECT l_partkey, l_suppkey,
               min(CAST(floor(l_extendedprice * 100 / l_quantity) AS BIGINT))
                 AS unit_cost_c
        FROM lineitem GROUP BY 1, 2),
      eligible AS (
        SELECT supply.l_partkey, supply.l_suppkey, unit_cost_c, s_name, n_name
        FROM supply
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey AND r_name = 'EUROPE'),
      best AS (SELECT l_partkey, min(unit_cost_c) AS best_cost
               FROM eligible GROUP BY 1)
      SELECT p_partkey, p_brand, p_size, s_name, n_name, e.unit_cost_c
      FROM eligible e
      JOIN best b ON b.l_partkey = e.l_partkey
                 AND e.unit_cost_c = b.best_cost
      JOIN part ON p_partkey = e.l_partkey AND p_size <= 15""",
    "q_q11_important_share" -> """
      WITH val AS (
        SELECT n_name, l_partkey AS p_key,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) * 100
                    AS BIGINT) AS value_c
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        GROUP BY 1, 2),
      tot AS (SELECT n_name, CAST(sum(value_c) AS BIGINT) AS total_c,
                     CAST(count(*) AS BIGINT) AS n_parts
              FROM val GROUP BY 1)
      SELECT v.n_name, p_key, value_c
      FROM val v JOIN tot t ON t.n_name = v.n_name
      WHERE value_c * n_parts > 4 * total_c""",
    "q_q12_priority_ship" -> """
      SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE datediff('day', CAST(o_orderdate AS DATE),
                     CAST(l_shipdate AS DATE)) > 90
      GROUP BY 1""",
    "q_q16_part_supplier_cnt" -> """
      SELECT p_brand, p_type, p_size,
             CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#1'
        AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0
                                AND s_suppkey IS NOT NULL)
      GROUP BY 1, 2, 3""",
    "q_q19_disc_revenue" -> """
      SELECT CAST(count(*) AS BIGINT) AS n_lines,
             CAST(COALESCE(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) *
                  (CAST(1 AS DECIMAL(14,2)) - CAST(l_discount AS DECIMAL(14,2)))
                  AS DECIMAL(24,4))), 0) AS DOUBLE) AS revenue
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 5
             AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#9' AND p_size BETWEEN 1 AND 10
             AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 20 AND 30)""",
    "q_q20_dominant_supplier" -> """
      WITH sp AS (
        SELECT l_partkey, l_suppkey,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem GROUP BY 1, 2),
      pt AS (SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS total_qty,
                    CAST(count(*) AS BIGINT) AS n_supp
             FROM sp GROUP BY 1)
      SELECT s_name, n_name, CAST(count(*) AS BIGINT) AS n_dominant_parts
      FROM sp JOIN pt USING (l_partkey)
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE qty * n_supp > 2 * total_qty AND n_supp >= 2
      GROUP BY 1, 2""",
    "q_q21_late_only_supplier" -> """
      WITH ord AS (
        SELECT l_orderkey, l_suppkey,
               max(CASE WHEN datediff('day', CAST(o_orderdate AS DATE),
                                      CAST(l_shipdate AS DATE)) > 365
                   THEN 1 ELSE 0 END) AS is_late
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        GROUP BY 1, 2),
      agg AS (
        SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_supp,
               CAST(sum(is_late) AS BIGINT) AS n_late
        FROM ord GROUP BY 1)
      SELECT s_name, n_name, CAST(count(*) AS BIGINT) AS numwait
      FROM ord JOIN agg USING (l_orderkey)
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE is_late = 1 AND n_supp >= 2 AND n_late = 1
      GROUP BY 1, 2""",
    // round-13 training-data ops (see ops/Vectors, TextOps, Stats, Dedup,
    // Corpus, Analytics scaladocs)
    "q_ann_range_count" -> (docsPrelude + """
      SELECT query_id, CAST(count(*) AS BIGINT) AS n_in_range
      FROM (SELECT query_id,
                   CAST(dot AS DOUBLE)
                     / sqrt(CAST(qa2 AS DOUBLE) * CAST(ca2 AS DOUBLE))
                     AS score
            FROM ann_scores) s
      WHERE score >= 0.25 GROUP BY 1"""),
    "q_readability" -> (docsPrelude + """
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars_n) * 100 // sum(n_tok) AS BIGINT)
               AS chars_per_word_c,
             CAST(sum(n_tok) * 100 // sum(n_sent) AS BIGINT)
               AS words_per_sent_c
      FROM (SELECT lang, CAST(length(norm) AS BIGINT) AS n_chars_n,
                   CAST(len(words) AS BIGINT) AS n_tok,
                   CAST(length(norm) - length(replace(norm, '.', '')) + 1
                        AS BIGINT) AS n_sent
            FROM docs_words) t
      GROUP BY 1"""),
    "q_token_doc_freq" -> (docsPrelude + """
      SELECT CAST(length(bin(greatest(df, 1))) - 1 AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(df) AS BIGINT) AS sum_df
      FROM (SELECT w, CAST(count(*) AS BIGINT) AS df
            FROM words_dist GROUP BY 1) t
      GROUP BY 1"""),
    "q_heaps_law" -> (docsPrelude + """
      SELECT bucket, new_words,
             CAST(sum(new_words) OVER (ORDER BY bucket
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
      FROM (SELECT CAST(length(bin(greatest(min_doc, 1))) - 1 AS BIGINT)
                     AS bucket,
                   CAST(count(*) AS BIGINT) AS new_words
            FROM (SELECT w, min(doc_id) AS min_doc
                  FROM words_dist GROUP BY 1) f
            GROUP BY 1) b"""),
    "q_simhash_precision_curve" -> (docsPrelude + """
      SELECT hamming, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN md5(da.norm) = md5(db.norm)
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_exact
      FROM simhash_pairs p
      JOIN docs da ON da.doc_id = p.doc_a
      JOIN docs db ON db.doc_id = p.doc_b
      GROUP BY 1"""),
    "q_dup_lang_pairs" -> (docsPrelude + """
      SELECT least(la.lang, lb.lang) AS lang_a,
             greatest(la.lang, lb.lang) AS lang_b,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM minhash_pairs_guarded p
      JOIN docs la ON la.doc_id = p.doc_a
      JOIN docs lb ON lb.doc_id = p.doc_b
      GROUP BY 1, 2"""),
    "q_source_quality_matrix" -> (docsPrelude + """
      SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(qppm) // count(*) AS BIGINT) AS mean_quality_ppm,
             CAST(sum(is_dup) AS BIGINT) AS n_dup_docs,
             CAST(sum(is_dup) * 1000000 // count(*) AS BIGINT) AS dup_ppm
      FROM (SELECT d.source, d.lang,
                   CAST(floor(q.quality * 1000000) AS BIGINT) AS qppm,
                   CASE WHEN e.n_dups > 1 THEN 1 ELSE 0 END AS is_dup
            FROM docs d
            JOIN quality_score q ON q.doc_id = d.doc_id
            JOIN dedup_exact e ON e.fp = md5(d.norm)) t
      GROUP BY 1, 2"""),
    "q_supplier_leadtime" -> """
      SELECT s_name, n_name, CAST(count(*) AS BIGINT) AS n_lines,
             CAST(min(lag_days) AS BIGINT) AS min_days,
             CAST(max(lag_days) AS BIGINT) AS max_days,
             CAST(sum(lag_days) AS BIGINT) AS sum_days,
             CAST(sum(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_30d,
             CAST(sum(CASE WHEN lag_days > 365 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_over_1y
      FROM (SELECT l_suppkey,
                   CAST(datediff('day', CAST(o_orderdate AS DATE),
                                 CAST(l_shipdate AS DATE)) AS BIGINT)
                     AS lag_days
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey) t
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      GROUP BY 1, 2""",
    "q_brand_price_drift" -> """
      WITH m AS (
        SELECT p_brand, date_trunc('month', l_shipdate) AS month,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) * 100
                    AS BIGINT) AS cents,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem JOIN part ON p_partkey = l_partkey
        GROUP BY 1, 2)
      SELECT p_brand, month, CAST(cents // qty AS BIGINT) AS unit_c,
             CAST(cents // qty - lag(cents // qty)
                  OVER (PARTITION BY p_brand ORDER BY month) AS BIGINT)
               AS delta_c
      FROM m""",
    // round-13 batch 3
    "q_degree_assortativity" -> """
      WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      pairs AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      sym AS (SELECT u AS a, v AS b FROM pairs
              UNION ALL SELECT v, u FROM pairs),
      deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS deg
              FROM sym GROUP BY 1),
      s AS (SELECT CAST(count(*) AS BIGINT) AS n_endpoints,
                   CAST(sum(da.deg) AS BIGINT) AS s_deg,
                   CAST(sum(da.deg * da.deg) AS BIGINT) AS s_deg2,
                   CAST(sum(da.deg * db.deg) AS BIGINT) AS s_prod
            FROM sym JOIN deg da ON da.node = sym.a
            JOIN deg db ON db.node = sym.b)
      SELECT n_endpoints, s_deg, s_deg2, s_prod,
             (CAST(n_endpoints AS DOUBLE) * CAST(s_prod AS DOUBLE)
              - CAST(s_deg AS DOUBLE) * CAST(s_deg AS DOUBLE))
             / nullif(CAST(n_endpoints AS DOUBLE) * CAST(s_deg2 AS DOUBLE)
              - CAST(s_deg AS DOUBLE) * CAST(s_deg AS DOUBLE), 0.0)
               AS assortativity
      FROM s""",
    "q_cos_score_hist" -> (docsPrelude + """
      SELECT CAST(floor(CAST(dot AS DOUBLE)
               / sqrt(CAST(qa2 AS DOUBLE) * CAST(ca2 AS DOUBLE)) * 20)
               AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM ann_scores GROUP BY 1"""),
    "q_value_sigma_outliers" -> """
      WITH vals AS (SELECT event_type,
                           CAST(floor(value * 100) AS BIGINT) AS v_c
                    FROM events),
      m AS (SELECT event_type AS m_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(v_c) AS BIGINT) AS s1,
                   sum(CAST(v_c AS DECIMAL(19,0))
                       * CAST(v_c AS DECIMAL(19,0))) AS s2
            FROM vals GROUP BY 1)
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CASE WHEN
                    pow(CAST(n AS DOUBLE) * CAST(v_c AS DOUBLE)
                        - CAST(s1 AS DOUBLE), 2)
                    > 9.0 * (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
             CAST(CAST(sum(CASE WHEN
                    pow(CAST(n AS DOUBLE) * CAST(v_c AS DOUBLE)
                        - CAST(s1 AS DOUBLE), 2)
                    > 9.0 * (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                    THEN 1 ELSE 0 END) AS BIGINT)
                  * 1000000 // count(*) AS BIGINT) AS outlier_ppm
      FROM vals JOIN m ON m_type = event_type
      GROUP BY 1""",
    "q_partition_planner" -> """
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CAST(octet_length(encode(text)) AS BIGINT)) AS BIGINT)
               AS sum_bytes,
             CAST(sum(CAST(octet_length(encode(text)) AS BIGINT))
                  // count(*) AS BIGINT) AS avg_row_bytes,
             CAST((sum(CAST(octet_length(encode(text)) AS BIGINT))
                   + 134217727) // 134217728 AS BIGINT) AS n_files_128mb,
             CAST(134217728 // greatest(
                    sum(CAST(octet_length(encode(text)) AS BIGINT))
                    // count(*), 1) AS BIGINT) AS rows_per_file
      FROM documents GROUP BY 1""",
    "q_dedup_pairs_cosine" -> (docsPrelude + """
      , tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
               FROM words_flat GROUP BY 1, 2),
      nn AS (SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS n2
             FROM tf GROUP BY 1)
      SELECT p.doc_a, p.doc_b, CAST(sum(ta.tf * tb.tf) AS BIGINT) AS dot,
             na.n2 AS na2, nb.n2 AS nb2
      FROM minhash_pairs_guarded p
      JOIN tf ta ON ta.doc_id = p.doc_a
      JOIN tf tb ON tb.doc_id = p.doc_b AND tb.w = ta.w
      JOIN nn na ON na.doc_id = p.doc_a
      JOIN nn nb ON nb.doc_id = p.doc_b
      GROUP BY 1, 2, na.n2, nb.n2
      HAVING 25.0 * CAST(CAST(sum(ta.tf * tb.tf) AS BIGINT) AS DOUBLE)
                  * CAST(CAST(sum(ta.tf * tb.tf) AS BIGINT) AS DOUBLE)
             >= 16.0 * CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)"""),
    "q_lsh_recall_sampled" -> (docsPrelude + """
      SELECT CAST(count(*) AS BIGINT) AS n_truth,
             CAST(sum(CASE WHEN g.doc_a IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_captured,
             CAST(CAST(sum(CASE WHEN g.doc_a IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) * 1000000 // NULLIF(count(*), 0) AS BIGINT)
               AS recall_ppm
      FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS inter
        FROM docs_sh_d a JOIN docs_sh_d b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 0
        GROUP BY 1, 2) i
      JOIN sh_sizes sa ON sa.doc_id = i.doc_a
      JOIN sh_sizes sb ON sb.doc_id = i.doc_b
      LEFT JOIN minhash_pairs_guarded g
        ON g.doc_a = i.doc_a AND g.doc_b = i.doc_b
      WHERE 4 * inter >= sa.n_sh + sb.n_sh"""),
    "q_multimodal_near_dup" -> """
      WITH chunks AS (
        SELECT doc_id, ci AS chunk_idx,
               substr(text, CAST(ci * 256 + 1 AS INTEGER), 256) AS c
        FROM (SELECT doc_id, text, unnest(range(0,
                1 + (greatest(length(text), 1) - 1) // 256)) AS ci
              FROM documents)),
      grams AS (
        SELECT DISTINCT doc_id, chunk_idx,
               CASE WHEN length(c) >= 4
                    THEN substr(c, CAST(i + 1 AS INTEGER), 4) ELSE c END AS g
        FROM chunks, range(0, 1000) t(i)
        WHERE i < greatest(length(c) - 3, 1)),
      bits AS (
        SELECT doc_id, chunk_idx, bit,
               sum(CASE WHEN ((strpos('0123456789abcdef',
                          substr(md5(g), 1 + CAST(bit // 4 AS INTEGER), 1))
                          - 1) >> (bit % 4)) & 1 = 1
                   THEN 1 ELSE -1 END) AS s
        FROM grams, range(0, 32) b(bit) GROUP BY 1, 2, 3),
      fsh AS (
        SELECT doc_id * 100000 + chunk_idx AS fid, doc_id,
               CAST(sum(CASE WHEN s > 0
                        THEN CAST(1 AS BIGINT) << CAST(bit AS INTEGER)
                        ELSE 0 END) AS BIGINT) AS sh
        FROM bits GROUP BY 1, 2),
      banded AS (SELECT fid, doc_id, sh, band,
                        (sh >> CAST(band * 8 AS INTEGER)) & 255 AS chunk
                 FROM fsh, range(0, 4) t(band)),
      fpairs AS (
        SELECT DISTINCT a.fid AS fa, b.fid AS fb,
               a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.chunk = b.chunk AND a.fid < b.fid
        WHERE bit_count(xor(a.sh, b.sh)) <= 3 AND a.doc_id <> b.doc_id)
      SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS n_near_frames
      FROM fpairs GROUP BY 1, 2""",
    // guarded clustered sibling: spanning edges (within-hash-group stars +
    // one rep edge per near-hash value pair, maxBucket=256 value-space star
    // degradation) -> min-label CC -> (cluster, n_docs). Components equal
    // the exact pair list's whenever no bucket exceeds the guard (true at
    // every driver SF; the degradation is deterministic and mirrored).
    // MATERIALIZED on the shared CTEs is load-bearing: inside a WITH
    // RECURSIVE block DuckDB re-inlines multiply-referenced CTEs, so the
    // md5-gram SimHash pipeline would re-execute per reference chain
    // (measured: >90 min at sf0.1 inlined vs 9 s materialized).
    "q_multimodal_near_dup_clusters" -> """
      WITH RECURSIVE chunks AS (
        SELECT doc_id, ci AS chunk_idx,
               substr(text, CAST(ci * 256 + 1 AS INTEGER), 256) AS c
        FROM (SELECT doc_id, text, unnest(range(0,
                1 + (greatest(length(text), 1) - 1) // 256)) AS ci
              FROM documents)),
      grams AS (
        SELECT DISTINCT doc_id, chunk_idx,
               CASE WHEN length(c) >= 4
                    THEN substr(c, CAST(i + 1 AS INTEGER), 4) ELSE c END AS g
        FROM chunks, range(0, 1000) t(i)
        WHERE i < greatest(length(c) - 3, 1)),
      bits AS (
        SELECT doc_id, chunk_idx, bit,
               sum(CASE WHEN ((strpos('0123456789abcdef',
                          substr(md5(g), 1 + CAST(bit // 4 AS INTEGER), 1))
                          - 1) >> (bit % 4)) & 1 = 1
                   THEN 1 ELSE -1 END) AS s
        FROM grams, range(0, 32) b(bit) GROUP BY 1, 2, 3),
      fsh AS MATERIALIZED (
        SELECT doc_id * 100000 + chunk_idx AS fid, doc_id,
               CAST(sum(CASE WHEN s > 0
                        THEN CAST(1 AS BIGINT) << CAST(bit AS INTEGER)
                        ELSE 0 END) AS BIGINT) AS sh
        FROM bits GROUP BY 1, 2),
      vals AS MATERIALIZED (SELECT DISTINCT sh FROM fsh),
      vbanded AS MATERIALIZED (
        SELECT sh, band, (sh >> CAST(band * 8 AS INTEGER)) & 255 AS chunk
        FROM vals, range(0, 4) t(band)),
      bstat AS (
        SELECT band, chunk, CAST(count(*) AS BIGINT) AS bsz, min(sh) AS bmin
        FROM vbanded GROUP BY 1, 2),
      vpairs AS (
        SELECT DISTINCT sa, sb FROM (
          SELECT a.sh AS sa, b.sh AS sb
          FROM vbanded a
          JOIN vbanded b ON a.band = b.band AND a.chunk = b.chunk
                         AND a.sh < b.sh
          JOIN bstat s ON s.band = a.band AND s.chunk = a.chunk
          WHERE s.bsz <= 256
          UNION ALL
          SELECT least(s.bmin, v.sh), greatest(s.bmin, v.sh)
          FROM vbanded v
          JOIN bstat s ON s.band = v.band AND s.chunk = v.chunk
          WHERE s.bsz > 256 AND v.sh <> s.bmin) t
        WHERE bit_count(xor(sa, sb)) <= 3),
      reps AS MATERIALIZED (SELECT sh, min(fid) AS rep FROM fsh GROUP BY 1),
      span_f AS (
        SELECT r.rep AS fa, f.fid AS fb
        FROM fsh f JOIN reps r ON r.sh = f.sh
        WHERE f.fid <> r.rep
        UNION ALL
        SELECT ra.rep, rb.rep
        FROM vpairs JOIN reps ra ON ra.sh = sa JOIN reps rb ON rb.sh = sb),
      dedges AS (
        SELECT DISTINCT least(fa // 100000, fb // 100000) AS doc_a,
                        greatest(fa // 100000, fb // 100000) AS doc_b
        FROM span_f WHERE fa // 100000 <> fb // 100000),
      dnodes AS (
        SELECT doc_a AS doc_id FROM dedges
        UNION SELECT doc_b FROM dedges),
      sym_d AS (
        SELECT doc_a AS src, doc_b AS dst FROM dedges
        UNION ALL SELECT doc_b, doc_a FROM dedges),
      reach_d AS (
        SELECT doc_id AS node, doc_id AS label FROM dnodes
        UNION
        SELECT e.dst AS node, r.label FROM reach_d r
        JOIN sym_d e ON e.src = r.node),
      dclusters AS (
        SELECT node AS doc_id, min(label) AS cluster FROM reach_d
        GROUP BY node)
      SELECT cluster, CAST(count(*) AS BIGINT) AS n_docs
      FROM dclusters GROUP BY 1""",
    // --- round 14 ---
    "q_copurchase_partners" -> """
      WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(count(*) AS BIGINT) AS n_both
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      sym AS (SELECT part_a AS part, part_b AS partner, n_both FROM pairs
              UNION ALL SELECT part_b, part_a, n_both FROM pairs)
      SELECT part, partner, n_both, CAST(rn AS BIGINT) AS rn FROM (
        SELECT *, row_number() OVER (PARTITION BY part
                    ORDER BY n_both DESC, partner) AS rn FROM sym) t
      WHERE rn <= 3""",
    "q_local_cc_hist" -> """
      WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      pairs AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      sym AS (SELECT u AS a, v AS b FROM pairs
              UNION ALL SELECT v, u FROM pairs),
      deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS deg
              FROM sym GROUP BY 1),
      tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM pairs e1 JOIN pairs e2 ON e2.u = e1.v
        JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v),
      node_tri AS (
        SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
          SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri) t
        GROUP BY 1)
      SELECT CAST(least(coalesce(n_tri, 0) * 2 * 10
                   // (deg * (deg - 1)), 10) AS BIGINT) AS cc_decile,
             CAST(count(*) AS BIGINT) AS n_nodes
      FROM deg LEFT JOIN node_tri USING (node)
      WHERE deg >= 2
      GROUP BY 1""",
    "q_frame_dup_ratio" -> (docsPrelude + """
      , mm_fp_docs AS (
        SELECT chunk_fp, CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
        FROM mm_chunks GROUP BY 1)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
             CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_frames,
             CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) * 1000000
                  // count(*) AS BIGINT) AS dup_ppm
      FROM mm_chunks JOIN mm_fp_docs USING (chunk_fp)
      GROUP BY 1"""),
    "q_quality_len_corr" -> (docsPrelude + """
      , qlc AS (
        SELECT q.doc_id, CAST(floor(q.quality * 1000000) AS BIGINT) AS qppm,
               CAST(length(bin(greatest(t.n_tokens, 1))) - 1 AS BIGINT)
                 AS lbits
        FROM quality_score q JOIN text_stats t ON t.doc_id = q.doc_id),
      qlm AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(qppm) AS BIGINT) AS s_q,
               CAST(sum(lbits) AS BIGINT) AS s_l,
               sum(CAST(qppm AS DECIMAL(19,0))
                   * CAST(qppm AS DECIMAL(19,0))) AS s_qq,
               CAST(sum(lbits * lbits) AS BIGINT) AS s_ll,
               sum(CAST(qppm AS DECIMAL(19,0))
                   * CAST(lbits AS DECIMAL(19,0))) AS s_ql
        FROM qlc)
      SELECT n, s_q, s_l, s_ll,
             (CAST(n AS DOUBLE) * CAST(s_ql AS DOUBLE)
              - CAST(s_q AS DOUBLE) * CAST(s_l AS DOUBLE))
             / nullif(
                 sqrt(CAST(n AS DOUBLE) * CAST(s_qq AS DOUBLE)
                      - CAST(s_q AS DOUBLE) * CAST(s_q AS DOUBLE))
               * sqrt(CAST(n AS DOUBLE) * CAST(s_ll AS DOUBLE)
                      - CAST(s_l AS DOUBLE) * CAST(s_l AS DOUBLE)), 0.0)
               AS corr
      FROM qlm"""),
    "q_seasonal_index" -> """
      WITH ym AS (
        SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
               CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) * 100
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2),
      per_m AS (SELECT m, CAST(sum(cents) // count(*) AS BIGINT) AS mean_c,
                       CAST(count(*) AS BIGINT) AS n_years FROM ym
                GROUP BY 1),
      overall AS (SELECT CAST(sum(cents) // count(*) AS BIGINT) AS o_mean
                  FROM ym)
      SELECT CAST(m AS BIGINT) AS month_num, n_years, mean_c,
             CAST(mean_c * 1000000 // o_mean AS BIGINT) AS index_ppm
      FROM per_m, overall""",
    "q_churn_by_segment" -> """
      WITH cut AS (SELECT max(o_orderdate) - INTERVAL 90 DAY AS cutoff
                   FROM orders),
      last_o AS (
        SELECT o_custkey, max(o_orderdate) AS last_dt,
               CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) * 100
                    AS BIGINT) AS ltv_c
        FROM orders GROUP BY 1)
      SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_churned,
             CAST(sum(ltv_c) AS BIGINT) AS churned_ltv_c
      FROM last_o JOIN customer ON c_custkey = o_custkey, cut
      WHERE last_dt < cutoff
      GROUP BY 1""",
    "q_priority_transitions" -> """
      WITH tr AS (
        SELECT o_custkey,
               lag(o_orderpriority) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS prev_pr,
               o_orderpriority AS pr
        FROM orders)
      SELECT prev_pr, pr, CAST(count(*) AS BIGINT) AS n
      FROM tr WHERE prev_pr IS NOT NULL GROUP BY 1, 2""",
    "q_ewma_revenue" -> """
      WITH w AS (
        SELECT date_trunc('week', o_orderdate) AS week,
               CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) * 100
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1)
      SELECT CAST(week AS TIMESTAMP) AS week, cents,
             CAST((coalesce(lag(cents, 0) OVER wk, 0) * 128
                 + coalesce(lag(cents, 1) OVER wk, 0) * 64
                 + coalesce(lag(cents, 2) OVER wk, 0) * 32
                 + coalesce(lag(cents, 3) OVER wk, 0) * 16
                 + coalesce(lag(cents, 4) OVER wk, 0) * 8
                 + coalesce(lag(cents, 5) OVER wk, 0) * 4
                 + coalesce(lag(cents, 6) OVER wk, 0) * 2
                 + coalesce(lag(cents, 7) OVER wk, 0)) // 255 AS BIGINT)
               AS ewma_c
      FROM w WINDOW wk AS (ORDER BY week)""",
    "q_gap_hist_by_type" -> """
      WITH ev AS (
        SELECT CAST(user_id AS BIGINT) AS u, event_type,
               date_trunc('second', CAST(ts AS TIMESTAMP)) AS t,
               CAST(event_id AS BIGINT) AS eid
        FROM events),
      gaps AS (
        SELECT event_type,
               CAST(epoch(t) - epoch(lag(t) OVER (
                 PARTITION BY u, event_type ORDER BY t, eid)) AS BIGINT)
                 AS gap_s
        FROM ev)
      SELECT event_type,
             CAST(length(bin(greatest(gap_s, 1))) - 1 AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_gaps
      FROM gaps WHERE gap_s IS NOT NULL
      GROUP BY 1, 2""",
    "q_ann_rank_stability" -> (docsPrelude + """
      , rs_common AS (
        SELECT e.query_id, e.cand_id, e.rnk AS e_rnk, a.rnk AS a_rnk
        FROM ann_cosine_topk e
        JOIN pq_adc_topk a ON a.query_id = e.query_id
                          AND a.cand_id = e.cand_id)
      SELECT c1.query_id, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN (c1.e_rnk < c2.e_rnk)
                             <> (c1.a_rnk < c2.a_rnk)
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_discordant
      FROM rs_common c1 JOIN rs_common c2
        ON c2.query_id = c1.query_id AND c2.cand_id > c1.cand_id
      GROUP BY 1"""),
    // fixed-budget sampled sibling: per-query ranks are unchanged by the
    // query-set restriction, so the oracle IS the full monitor filtered
    // to the md5-ranked sample
    "q_ann_rank_stability_sampled" -> (docsPrelude + """
      , rss_q AS (
        SELECT vec_id FROM emb_n WHERE vec_id % 50 = 0
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 256),
      rss_common AS (
        SELECT e.query_id, e.cand_id, e.rnk AS e_rnk, a.rnk AS a_rnk
        FROM ann_cosine_topk e
        JOIN pq_adc_topk a ON a.query_id = e.query_id
                          AND a.cand_id = e.cand_id
        WHERE e.query_id IN (SELECT vec_id FROM rss_q))
      SELECT c1.query_id, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN (c1.e_rnk < c2.e_rnk)
                             <> (c1.a_rnk < c2.a_rnk)
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_discordant
      FROM rss_common c1 JOIN rss_common c2
        ON c2.query_id = c1.query_id AND c2.cand_id > c1.cand_id
      GROUP BY 1"""),
    "q_minhash_band_entropy" -> (docsPrelude + """
      , be_bsz AS (
        SELECT band, band_hash, CAST(count(*) AS BIGINT) AS s
        FROM minhash_bands GROUP BY 1, 2)
      SELECT band, CAST(count(*) AS BIGINT) AS n_buckets,
             CAST(sum(s) AS BIGINT) AS n_sigs,
             CAST(max(s) AS BIGINT) AS max_bucket,
             CAST(CAST(sum(s) AS BIGINT)
                    * (length(bin(CAST(sum(s) AS BIGINT))) - 1)
                  - sum(s * (length(bin(s)) - 1)) AS BIGINT)
               AS entropy_surr
      FROM be_bsz GROUP BY 1"""),
    // per-source hapax-legomena vocabulary-tail profile
    "q_hapax_rate" -> fromDocs("hapax_rate"),
    // per-user event-type diversity entropy (ilog2 integer surrogate —
    // the charEntropy formula over the (user, event_type) histogram)
    "q_event_entropy" -> """
      WITH t AS (
        SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
               CAST(count(*) AS BIGINT) AS n_t
        FROM events GROUP BY 1, 2),
      g AS (
        SELECT user_id, CAST(sum(n_t) AS BIGINT) AS n_events,
               CAST(count(*) AS BIGINT) AS n_types,
               CAST(sum(n_t * (length(bin(n_t)) - 1)) AS BIGINT)
                 AS sum_t_ilog2
        FROM t GROUP BY 1)
      SELECT user_id, n_events, n_types,
             CAST(n_events * (length(bin(n_events)) - 1) - sum_t_ilog2
                  AS BIGINT) AS entropy_surr
      FROM g""",
    // TPC-H Q6 shape: what-if discount revenue, pure filter-scan fold
    "q_q6_forecast" -> """
      SELECT CAST(count(*) AS BIGINT) AS n_lines,
             CAST(COALESCE(sum(CAST(l_extendedprice AS DECIMAL(14,2))
                               * CAST(l_discount AS DECIMAL(14,2))), 0)
                  AS DOUBLE) AS forecast_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND CAST(l_discount AS DECIMAL(14,2))
              BETWEEN CAST(0.05 AS DECIMAL(14,2))
                  AND CAST(0.07 AS DECIMAL(14,2))
        AND l_quantity < 24""",
    // TPC-H Q15 shape: supplier(s) at the exact quarter-revenue maximum
    "q_q15_top_supplier" -> """
      WITH rev AS (
        SELECT l_suppkey,
               sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2))
                        * (CAST(1 AS DECIMAL(14,2))
                           - CAST(l_discount AS DECIMAL(14,2)))
                        AS DECIMAL(24,4))) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY 1)
      SELECT s_suppkey, s_name, CAST(r.total_rev AS DOUBLE) AS total_rev
      FROM rev r JOIN supplier ON s_suppkey = r.l_suppkey
      WHERE r.total_rev = (SELECT max(total_rev) FROM rev)""",
    // TPC-H Q17 shape: below-20%-of-part-average quantity revenue
    // (integer cross-multiplication 5*qty*n < sum_qty — no division)
    "q_q17_small_qty" -> """
      WITH lines AS (
        SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
               CAST(l_extendedprice AS DECIMAL(14,2)) AS price
        FROM lineitem
        JOIN part ON p_partkey = l_partkey AND p_brand = 'Brand#7'),
      a AS (
        SELECT l_partkey AS p_key, CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(qty) AS BIGINT) AS sum_qty
        FROM lines GROUP BY 1)
      SELECT CAST(count(*) AS BIGINT) AS n_small_lines,
             CAST(COALESCE(sum(price), 0) AS DOUBLE) AS small_qty_revenue
      FROM lines l JOIN a ON a.p_key = l.l_partkey
      WHERE l.qty * 5 * a.n_lines < a.sum_qty""",
    // asymmetric GROUPING SETS report (the set list CUBE can't express)
    "q_sales_grouping_sets" -> (prelude + """
      SELECT city_id, status, CAST(sum(payment_amount) AS DOUBLE) AS revenue,
             CAST(sum(quantity) AS BIGINT) AS qty,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(GROUPING(city_id) AS BIGINT) AS g_city,
             CAST(GROUPING(status) AS BIGINT) AS g_status
      FROM uol_v2
      GROUP BY GROUPING SETS ((city_id, status), (status), ())"""),
    // SCD2 version-opening churn per month
    "q_scd_change_rate" -> (prelude + """
      SELECT CAST(date_trunc('month', valid_from) AS TIMESTAMP) AS month,
             CAST(count(*) AS BIGINT) AS n_versions,
             CAST(count(DISTINCT customer_id) AS BIGINT) AS n_custs
      FROM d_customer_scd GROUP BY 1"""),
    // power-of-2 session-duration histogram (composes the sessionizer)
    "q_session_duration_hist" -> """
      WITH ev AS (
        SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
               date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts2
        FROM events),
      flags AS (
        SELECT *, CASE WHEN lag(ts2) OVER w IS NULL
                         OR ts2 - lag(ts2) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts2, event_id)),
      sess AS (
        SELECT user_id, ts2,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts2, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flags),
      s AS (
        SELECT user_id, session_seq,
               CAST(date_diff('second', min(ts2), max(ts2)) AS BIGINT)
                 AS dur_sec
        FROM sess GROUP BY 1, 2)
      SELECT CAST(length(bin(greatest(dur_sec, 1))) - 1 AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_sessions,
             CAST(sum(dur_sec) AS BIGINT) AS sum_dur_sec,
             CAST(max(dur_sec) AS BIGINT) AS max_dur_sec
      FROM s GROUP BY 1""",
    // power-of-2 media payload-size histogram
    "q_multimodal_size_hist" -> fromDocs("mm_size_hist"),
    // top-|y| dims of one exact power-iteration step over quantized vecs
    "q_emb_principal_dims" -> fromDocs("emb_principal"),
    // stage-by-stage corpus admission funnel
    "q_curation_funnel" -> fromDocs("curation_funnel"),
    // raw vs curated per-length-bucket survivor shift
    "q_dedup_length_shift" -> fromDocs("dedup_length_shift"),
    // kNN-graph reciprocity over the exact top-k
    "q_knn_mutual" -> fromDocs("knn_mutual"),
    // Zipf-law fit as exact integer least-squares moments + rational slope
    "q_zipf_fit" -> fromDocs("zipf_fit"),
    // per-source KS drift of the doc-length distribution vs the corpus
    "q_ks_source_drift" -> fromDocs("ks_source_drift"),
    // per-source exact second-order (chars, tokens) moments
    "q_length_token_moments" -> fromDocs("length_token_moments"),
    // per-bit ones-rate of the 64-bit SimHash (sketch health)
    "q_simhash_bit_balance" -> fromDocs("simhash_bit_balance"),
    // top-k shingles by distinct-doc frequency (boilerplate detector)
    "q_boilerplate_shingles" -> fromDocs("boilerplate_shingles"),
    // connected components over the mutual-kNN reciprocity graph
    "q_knn_components" -> fromDocs("knn_components"),
    // fixed-budget (md5-ranked 1024) sampled sibling — exact in-sample
    "q_knn_components_sampled" -> fromDocs("knn_components_sampled"),
    // cohort lifetime value: cumulative revenue per signup-month cohort
    "q_cohort_ltv" -> from("cohort_ltv"),
    // TPC-H Q9 shape adapted (no partsupp): nation x product line x year
    "q_q9_profit" -> """
      SELECT n_name AS nation, p_type,
             CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2))
                           * (CAST(1 AS DECIMAL(14,2))
                              - CAST(l_discount AS DECIMAL(14,2)))
                           AS DECIMAL(24,4))) AS DOUBLE) AS profit
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      GROUP BY 1, 2, 3""",
    // users bucketed by floor-log2 of mean inter-event gap seconds
    "q_user_burstiness" -> """
      WITH ev AS (
        SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
               date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts2
        FROM events),
      g AS (
        SELECT user_id,
               date_diff('second', lag(ts2) OVER (PARTITION BY user_id
                 ORDER BY ts2, event_id), ts2) AS gap_sec
        FROM ev),
      pu AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
               CAST(sum(gap_sec) AS BIGINT) AS sum_gap
        FROM g WHERE gap_sec IS NOT NULL GROUP BY 1)
      SELECT CAST(length(bin(greatest(sum_gap // n_gaps, 1))) - 1 AS BIGINT)
               AS bucket,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(n_gaps) AS BIGINT) AS sum_gaps,
             CAST(sum(sum_gap) AS BIGINT) AS sum_gap_sec
      FROM pu GROUP BY 1""",
    // per-user Markov surprisal (integer-log2 surrogate), quarter-bit
    // mean histogram
    "q_event_seq_surprisal" -> """
      WITH ev AS (
        SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
               date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts2, event_type
        FROM events),
      tr AS (
        SELECT user_id,
               lag(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts2, event_id) AS from_type,
               event_type AS to_type
        FROM ev),
      ut AS (
        SELECT user_id, from_type, to_type, CAST(count(*) AS BIGINT) AS n_ut
        FROM tr WHERE from_type IS NOT NULL GROUP BY 1, 2, 3),
      pm AS (
        SELECT from_type, to_type, CAST(sum(n_ut) AS BIGINT) AS c_pair
        FROM ut GROUP BY 1, 2),
      fm AS (
        SELECT from_type, CAST(sum(c_pair) AS BIGINT) AS c_from
        FROM pm GROUP BY 1),
      bits AS (
        SELECT u.user_id, CAST(sum(u.n_ut) AS BIGINT) AS n_trans,
               CAST(sum(u.n_ut * (length(bin(f.c_from))
                                  - length(bin(p.c_pair)))) AS BIGINT) AS bits
        FROM ut u
        JOIN pm p ON p.from_type = u.from_type AND p.to_type = u.to_type
        JOIN fm f ON f.from_type = u.from_type
        GROUP BY 1)
      SELECT CAST(bits * 4 // n_trans AS BIGINT) AS qbits_bucket,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(n_trans) AS BIGINT) AS sum_trans
      FROM bits GROUP BY 1""",
    // per-source stopword-token rate (register/quality mix card)
    "q_stopword_profile" -> fromDocs("stopword_profile"),
    // per-source exact-dup token savings (dedup inflation card)
    "q_dup_inflation" -> fromDocs("dup_inflation"),
    // ISO day-of-week sales seasonality profile
    "q_sales_dow_profile" -> from("sales_dow"),
    // monthly customer-revenue Gini (exact integer ppm)
    "q_customer_gini_monthly" -> from("cust_gini"),
    // token BYTE-length histogram (octet_length — engine-neutral)
    "q_token_len_hist" -> fromDocs("token_len_hist"),
    // deterministic shard-size skew monitor (one row)
    "q_shard_skew_profile" -> fromDocs("shard_skew"),
    // monthly open-order share + cumulative backlog curve
    "q_order_backlog" -> """
      WITH m AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(count(*) FILTER (WHERE o_orderstatus <> 'F') AS BIGINT)
                 AS n_open
        FROM orders GROUP BY 1)
      SELECT month, n_orders, n_open,
             CAST(n_open * 1000000 // n_orders AS BIGINT) AS open_ppm,
             CAST(sum(n_open) OVER (ORDER BY month
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS backlog
      FROM m""",
    // per-product-line exact (quantity, whole-dollar price) moments
    "q_price_qty_moments" -> """
      SELECT p_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(q_i) AS BIGINT) AS sx,
             CAST(sum(p_i) AS BIGINT) AS sy,
             CAST(sum(q_i * q_i) AS BIGINT) AS sxx,
             CAST(sum(p_i * p_i) AS BIGINT) AS syy,
             CAST(sum(q_i * p_i) AS BIGINT) AS sxy
      FROM (SELECT p_type,
                   CAST(floor(l_quantity) AS BIGINT) AS q_i,
                   CAST(floor(l_extendedprice) AS BIGINT) AS p_i
            FROM lineitem JOIN part ON p_partkey = l_partkey) t
      GROUP BY 1""",
    // weekly telemetry-value drift card
    "q_event_value_weekly" -> """
      WITH ev AS (
        SELECT CAST(user_id AS BIGINT) AS u,
               date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts2,
               CAST(floor(value) AS BIGINT) AS v
        FROM events)
      SELECT CAST(date_trunc('week', ts2) AS TIMESTAMP) AS week,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT u) AS BIGINT) AS n_users,
             CAST(sum(v) AS BIGINT) AS v_sum,
             CAST(min(v) AS BIGINT) AS v_min,
             CAST(max(v) AS BIGINT) AS v_max
      FROM ev GROUP BY 1""")
}
