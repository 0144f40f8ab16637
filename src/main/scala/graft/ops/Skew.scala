package graft.ops

import graft.etl.Feeds
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §4 / prompt: "salting for skew").
  *
  * AQE's skew-join splitting handles most cases at runtime; these are the
  * explicit, deterministic forms for when the skew is known a priori
  * (hot keys in a 100 TB fact) or when AQE's thresholds don't trigger.
  * Salts are derived with `pmod(hash(...))` — deterministic per row, no RNG.
  */
object Skew {

  /** Two-phase aggregation for skewed group keys: partial-aggregate on
    * (key, salt) — spreading a hot key over `nSalts` reducers — then final
    * aggregate on key. Semantically identical to a direct groupBy-sum for
    * any decomposable aggregate. */
  def saltedSum(df: DataFrame, keyCol: String, valCol: String,
                saltSource: Column, nSalts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(hash(saltSource), lit(nSalts)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valCol)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as(s"sum_$valCol"))

  /** Skew-safe equi-join of a big (skewed) side against a small side:
    * the big side gets a deterministic salt in [0, nSalts); the small side
    * is replicated once per salt value; the join key becomes (key, salt) —
    * a hot key's rows land on `nSalts` different reducers instead of one.
    * Output equals the plain inner join (row multiset). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltSource: Column, nSalts: Int = 16): DataFrame = {
    val salted = big.withColumn("__salt", pmod(hash(saltSource), lit(nSalts)))
    val replicated = small
      .withColumn("__salt", explode(expr(s"sequence(0, ${nSalts - 1})")))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** q_priority_sales_salted: revenue per order priority via [[saltedSum]].
    * o_orderpriority has FIVE distinct values — on a 100 TB orders table a
    * plain groupBy funnels ~20% of all rows through each of 5 reducers; the
    * salt spreads every priority over 16, then re-aggregates 80 partials.
    * Sums are exact DECIMAL (associative — safe to re-associate across
    * salts), canonicalized to DOUBLE at output like every money column. */
  def prioritySalesSalted(spark: SparkSession, dir: String): DataFrame = {
    val orders = Feeds.table(spark, dir, "orders")
      .select(col("o_orderpriority"),
              col("o_totalprice").cast("decimal(14,2)").as("rev"),
              col("o_orderkey"))
    saltedSum(orders, "o_orderpriority", "rev", col("o_orderkey"))
      .select(col("o_orderpriority"), col("sum_rev").cast("double").as("sum_rev"))
  }

  /** q_brand_qty_salted: lineitem⋈part through [[saltedJoin]] (the explicit
    * skew-safe form for when the dimension is too big to broadcast and AQE's
    * skew thresholds don't trigger), then quantity rollup per brand.
    * Output ≡ the plain equi-join + groupBy (oracle states exactly that). */
  def brandQtySalted(spark: SparkSession, dir: String): DataFrame = {
    val li = Feeds.table(spark, dir, "lineitem")
      .select(col("l_partkey").as("p_partkey"), col("l_orderkey"),
              expr("CAST(floor(l_quantity) AS BIGINT)").as("qty"))
    val part = Feeds.table(spark, dir, "part").select("p_partkey", "p_brand")
    saltedJoin(li, part, "p_partkey", col("l_orderkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_rows"), sum(col("qty")).as("sum_qty"))
  }
}
