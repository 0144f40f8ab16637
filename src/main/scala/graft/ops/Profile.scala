package graft.ops

import graft.etl.Feeds
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact data-quality profiling — per-column row/null/distinct counts and
  * numeric ranges, the first step of any training-data ingest. One pass per
  * profiled column set via a single multi-aggregate projection would also
  * work; the per-column union keeps the output long-format (column, stats)
  * like production profilers, and each branch is a partial-aggregatable
  * scan of exactly one column (parquet pruning per branch). */
object Profile {

  private def numericProfile(df: DataFrame, column: String): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      count(col(column)).as("n_nonnull"),
      countDistinct(col(column)).as("n_distinct"),
      min(col(column)).cast("double").as("min_val"),
      max(col(column)).cast("double").as("max_val"))
      .select(lit(column).as("column"), col("n_rows"), col("n_nonnull"),
              col("n_distinct"), col("min_val"), col("max_val"))

  /** Profile of the orders table's numeric columns. */
  def ordersProfile(spark: SparkSession, dir: String): DataFrame = {
    val o = Feeds.table(spark, dir, "orders")
    Seq("o_orderkey", "o_custkey", "o_totalprice")
      .map(numericProfile(o, _))
      .reduce(_ unionAll _)
  }
}
