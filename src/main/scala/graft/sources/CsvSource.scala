package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Schema-first CSV ingestion — the reference's actual feed format
  * (SURVEY §2.1 S4-S6): pandas `read_csv` + hand-written INSERT column
  * lists (/root/reference/src/dags/ETL_logs_inc.py:126,150,169,188), with
  * `price_log` headerless and named manually (:126) and the activity feed
  * dropping the CSV's positional id column on ingest (:171-177).
  *
  * Never infers schemas: inference costs an extra full pass over 100 TB and
  * produces type drift between daily files. The declared StructTypes below
  * are the reference DDL (staging.create_*.sql) translated per SURVEY §1.1.
  */
object CsvSource {

  val userOrderLogSchema: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("uniq_id", StringType),
    StructField("date_time", TimestampType),
    StructField("city_id", IntegerType),
    StructField("city_name", StringType),
    StructField("customer_id", LongType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("item_id", IntegerType),
    StructField("item_name", StringType),
    StructField("quantity", LongType),
    StructField("payment_amount", DecimalType(14, 2))))

  /** Increment variant carries `status` (create_stage_inc_tables.sql:26). */
  val userOrderLogIncSchema: StructType =
    StructType(userOrderLogSchema.fields :+ StructField("status", StringType))

  val userActivityLogSchema: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("uniq_id", StringType),
    StructField("date_time", TimestampType),
    StructField("action_id", LongType),
    StructField("customer_id", LongType),
    StructField("quantity", LongType)))

  val customerResearchSchema: StructType = StructType(Seq(
    StructField("date_id", TimestampType),
    StructField("category_id", IntegerType),
    StructField("geo_id", IntegerType),
    StructField("sales_qty", IntegerType),
    StructField("sales_amt", DecimalType(14, 2))))

  val priceLogSchema: StructType = StructType(Seq(
    StructField("prod_name", StringType),
    StructField("price", IntegerType)))

  /** Header CSV with a declared schema (S4/S5). */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .option("mode", "FAILFAST") // schema drift should fail loud, not null out
      .csv(path)

  /** The reference's order feed (header CSV). */
  def userOrderLog(spark: SparkSession, path: String): DataFrame =
    readCsv(spark, path, userOrderLogSchema)

  def userOrderLogInc(spark: SparkSession, path: String): DataFrame =
    readCsv(spark, path, userOrderLogIncSchema)

  /** Activity feed: positional first column dropped on ingest (S6). */
  def userActivityLog(spark: SparkSession, path: String): DataFrame =
    readCsv(spark, path, userActivityLogSchema).drop("id")

  def customerResearch(spark: SparkSession, path: String): DataFrame =
    readCsv(spark, path, customerResearchSchema)

  /** Headerless price_log with manual column names (S5 quirk). */
  def priceLog(spark: SparkSession, path: String): DataFrame =
    readCsv(spark, path, priceLogSchema, header = false)
}
