package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The sketch-accelerated queries are EXACT: each must equal its plain
  * (sketch-free) formulation on the same data. sf0.001 keeps the suite
  * fast; the oracle re-checks at sf0.01. */
class RuntimeFiltersSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bloom semi-join reduction equals the plain join aggregate") {
    val got = RuntimeFilters.bloomUrgentRevenue(spark, dir)
      .orderBy("l_returnflag").collect().toSeq
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val urgent = spark.read.parquet(s"$dir/orders.parquet")
      .where(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val want = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
           sum(col("l_quantity").cast("decimal(14,2)")).cast("double")
             .as("sum_qty"),
           sum(col("l_extendedprice").cast("decimal(14,2)")).cast("double")
             .as("revenue"))
      .orderBy("l_returnflag").collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("CMS-verified heavy hitters equal the plain GROUP BY ... HAVING") {
    val minCount = 20L // sf0.001 is small; lower the bar so rows exist
    val got = RuntimeFilters.heavyHitterParts(spark, dir, minCount)
      .orderBy("l_partkey").collect().toSeq
    val want = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("n_orders"),
           sum(col("l_quantity").cast("decimal(14,2)")).cast("double")
             .as("sum_qty"))
      .where(col("n_orders") >= minCount)
      .orderBy("l_partkey").collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("customer deciles match the ntile window formulation") {
    val uol = graft.etl.Pipeline.of(spark, dir).uol
    val got = Analytics.customerDecilesOf(uol)
      .select("customer_id", "decile")
      .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
      .collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("revenue").desc, col("customer_id"))
    val want = uol.groupBy("customer_id")
      .agg(sum(col("payment_amount")).as("revenue"))
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .select("customer_id", "decile")
      .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
      .collect().toMap
    assert(got == want)
    assert(got.values.toSet == (1L to 10L).toSet)
  }

  test("ANN recall is bounded and counts true intersections") {
    val recall = Vectors.annRecall(spark, dir)
    val rows = recall.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hits = r.getAs[Long]("n_hits")
      assert(hits >= 0 && hits <= 3)
      assert(math.abs(r.getAs[Double]("recall") - hits / 3.0) < 1e-15)
    }
  }
}
