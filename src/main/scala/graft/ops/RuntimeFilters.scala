package graft.ops

import graft.expr.{BloomMightContainLong, CmsEstimateLong}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Sketch-accelerated exact queries: bloom semi-join reduction and
  * CMS-verified heavy hitters (SURVEY §2 beyond-reference set; the 100 TB
  * shuffle-avoidance patterns).
  *
  * Both queries are EXACT — the sketch only prunes, never decides:
  *  - bloom false positives are eliminated by the real join that follows;
  *  - CMS over-estimates produce extra candidates that the exact count
  *    verification then drops.
  * So both share a plain-SQL DuckDB oracle with no sketch in it.
  */
object RuntimeFilters {

  private def liOrders(spark: SparkSession, dir: String) = (
    spark.read.parquet(s"$dir/lineitem.parquet"),
    spark.read.parquet(s"$dir/orders.parquet"))

  /** Revenue by return flag over lineitems of URGENT orders, with the fact
    * side pre-filtered by a bloom of the qualifying order keys.
    *
    * Scale shape: the dim-side predicate (`o_orderpriority = '1-URGENT'`,
    * ~20% of orders) is consumed twice — once driver-side into a ~1 MB bloom
    * that drops ~80% of the 100 TB fact inside its scan stage, once as the
    * broadcast hash side that removes the bloom's false positives. The
    * shuffle (and at cluster scale, the network) only ever sees the reduced
    * fact. Mirrors Spark's own `InjectRuntimeFilter`, but explicit, so the
    * reduction also applies when the optimizer's heuristics would not fire. */
  def bloomUrgentRevenue(spark: SparkSession, dir: String): DataFrame = {
    val (li, orders) = liOrders(spark, dir)
    val urgent = orders.where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val nUrgent = math.max(urgent.count(), 1L)
    val bloom = urgent.stat.bloomFilter("o_orderkey", nUrgent, 0.01)
    val reduced = li.where(BloomMightContainLong(li("l_orderkey"), bloom))
    reduced
      .join(urgent.hint("broadcast"),
            reduced("l_orderkey") === urgent("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
           // exact DECIMAL sums (order-independent), DOUBLE only at output
           sum(col("l_quantity").cast(DecimalType(14, 2))).cast("double")
             .as("sum_qty"),
           sum(col("l_extendedprice").cast(DecimalType(14, 2))).cast("double")
             .as("revenue"))
  }

  /** Exact heavy hitters (parts ordered more than `minCount` times), found
    * through a Count-Min sketch: one pass builds the CMS, the candidate set
    * is the (dimension-sized) part list filtered by CMS estimate — a
    * distributed probe via [[CmsEstimateLong]], never a collect — and the
    * final exact count runs over the fact semi-join-reduced to candidates.
    *
    * Scale shape: the full-fact `groupBy(part)` shuffle (20k+ distinct keys
    * per 100 TB) is replaced by a ~KB sketch broadcast + a shuffle whose
    * input only holds candidate keys' rows. CMS guarantees estimate >= true
    * count, so the candidate set is a superset and the verified output is
    * exactly the plain GROUP BY ... HAVING result. */
  def heavyHitterParts(spark: SparkSession, dir: String,
                       minCount: Long = 40): DataFrame = {
    val (li, _) = liOrders(spark, dir)
    val part = spark.read.parquet(s"$dir/part.parquet")
    val cms = li.stat.countMinSketch(col("l_partkey"),
      0.0001, 0.999, 42)
    val candidates = part.select(col("p_partkey"))
      .where(CmsEstimateLong(col("p_partkey"), cms) >= lit(minCount))
    val reduced = li.join(candidates.hint("broadcast"),
      li("l_partkey") === candidates("p_partkey"), "left_semi")
    reduced.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_orders"),
           sum(col("l_quantity").cast(DecimalType(14, 2))).cast("double")
             .as("sum_qty"))
      .where(col("n_orders") >= minCount)
  }
}
