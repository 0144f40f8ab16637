package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** The pinned reader contract for the driver-generated testdata, plus the
  * two runtime services built on it:
  *
  *  - [[preflight]]: a schema-only check every entry point (`Verify.main`,
  *    `Bench.main`) runs BEFORE any query, so a driver-side testdata
  *    regeneration surfaces as ONE message naming the table and column —
  *    not as N downstream query crashes (round 8: `events.ts` changed
  *    parquet type mid-round and the drift surfaced as 22 analysis
  *    failures spread over two artifacts).
  *  - [[fingerprintJson]]: the dataset identity (per-table schema hash +
  *    row count) stamped into `BENCH_full.json` and the Verify out-dir,
  *    so artifact consumers can tell a testdata regeneration from a code
  *    change mechanically (round 9: the 47.5 s-vs-58.6 s cross-round
  *    delta was cross-DATASET, and only a doc footnote said so).
  *
  * TestdataSchemaSpec asserts the same pins under `sbt test`; this object
  * is the single source of truth for them. A pin maps a column to the SET
  * of Spark types the readers can adapt to (cf. `Feeds.normalizeEventTs`
  * for the events.ts multi-vintage story) — drift inside the set is
  * handled, drift outside it is reported.
  */
object TestdataContract {

  /** Timestamp columns accept both parquet flavors — UTC-adjusted
    * (TimestampType) and NTZ — since the pinned UTC session zone makes
    * the cast wall-clock identity. */
  private val tsLike: Set[DataType] = Set(TimestampType, TimestampNTZType)

  /** events.ts additionally accepts nanos-as-long (the round 1-7
    * generator vintage, readable only with the nanosAsLong legacy conf
    * that [[rawTable]] sets). */
  private val eventsTs: Set[DataType] = tsLike + LongType

  val tables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def pins(name: String): Map[String, Set[DataType]] = name match {
    case "region" => Map("r_regionkey" -> Set(IntegerType),
      "r_name" -> Set(StringType))
    case "nation" => Map("n_nationkey" -> Set(IntegerType),
      "n_name" -> Set(StringType), "n_regionkey" -> Set(IntegerType))
    case "customer" => Map("c_custkey" -> Set(LongType),
      "c_name" -> Set(StringType), "c_nationkey" -> Set(IntegerType),
      "c_acctbal" -> Set(DoubleType), "c_mktsegment" -> Set(StringType))
    case "supplier" => Map("s_suppkey" -> Set(LongType),
      "s_name" -> Set(StringType), "s_nationkey" -> Set(IntegerType),
      "s_acctbal" -> Set(DoubleType))
    case "part" => Map("p_partkey" -> Set(LongType),
      "p_name" -> Set(StringType), "p_brand" -> Set(StringType),
      "p_type" -> Set(StringType), "p_size" -> Set(IntegerType),
      "p_retailprice" -> Set(DoubleType))
    case "orders" => Map("o_orderkey" -> Set(LongType),
      "o_custkey" -> Set(LongType), "o_orderstatus" -> Set(StringType),
      "o_totalprice" -> Set(DoubleType), "o_orderdate" -> tsLike,
      "o_orderpriority" -> Set(StringType))
    case "lineitem" => Map("l_orderkey" -> Set(LongType),
      "l_partkey" -> Set(LongType), "l_suppkey" -> Set(LongType),
      "l_linenumber" -> Set(IntegerType), "l_quantity" -> Set(DoubleType),
      "l_extendedprice" -> Set(DoubleType), "l_discount" -> Set(DoubleType),
      "l_tax" -> Set(DoubleType), "l_returnflag" -> Set(StringType),
      "l_linestatus" -> Set(StringType), "l_shipdate" -> tsLike)
    case "events" => Map("event_id" -> Set(LongType),
      "user_id" -> Set(LongType), "event_type" -> Set(StringType),
      "value" -> Set(DoubleType), "props" -> Set(StringType),
      "ts" -> eventsTs)
    case "documents" => Map("doc_id" -> Set(LongType),
      "text" -> Set(StringType), "lang" -> Set(StringType),
      "source" -> Set(StringType), "n_chars" -> Set(LongType))
    case "embeddings" => Map("vec_id" -> Set(LongType),
      "embedding" -> Set(ArrayType(FloatType, containsNull = true),
                         ArrayType(FloatType, containsNull = false)),
      "label" -> Set(IntegerType))
    case other => throw new IllegalArgumentException(s"no pin for $other")
  }

  /** Raw (un-normalized) read of one input table. The nanosAsLong conf is
    * session-wide and harmless on non-nanos files; setting it here keeps
    * a nanos-vintage events.parquet readable for schema checks exactly as
    * `Feeds.events` reads it for queries. */
  private def rawTable(spark: SparkSession, dir: String, name: String) = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** One table's contract violations as (table, column, detail). A table
    * that cannot be read at all reports a single ("table", "*", why) row.
    * Schema-only — no data is scanned. */
  private[graft] def checkTable(spark: SparkSession, dir: String,
                                name: String): Seq[(String, String, String)] =
    try {
      val schema = rawTable(spark, dir, name).schema
      pins(name).toSeq.sortBy(_._1).flatMap { case (colName, ok) =>
        schema.fieldNames.find(_ == colName) match {
          case None => Seq((name, colName, s"column $colName missing"))
          case Some(_) =>
            val got = schema(colName).dataType
            if (ok.contains(got)) Nil
            else Seq((name, colName,
              s"$name.$colName is $got, engine expects one of " +
                ok.mkString("/")))
        }
      }
    } catch { case e: Throwable =>
      Seq((name, "*", s"$name unreadable: " +
        s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}"))
    }

  /** All contract violations for a testdata dir; empty = contract holds. */
  def preflight(spark: SparkSession, dir: String): Seq[(String, String, String)] =
    tables.flatMap(checkTable(spark, dir, _))

  /** Print violations loudly (one line per drift, table+column named) and
    * return them. Non-fatal by design: readers that adapt (tsLike sets)
    * pass untouched, and a drifted run still produces its per-query
    * artifacts — now with the root cause named FIRST in the log. */
  def preflightLoud(spark: SparkSession, dir: String): Seq[(String, String, String)] = {
    val drift = preflight(spark, dir)
    if (drift.nonEmpty) {
      System.err.println(
        s"[preflight] TESTDATA CONTRACT DRIFT in $dir — " +
        s"${drift.size} violation(s); downstream failures likely stem " +
        "from these, fix the readers first:")
      drift.foreach { case (t, c, d) =>
        System.err.println(s"[preflight]   $t.$c: $d") }
    }
    drift
  }

  /** 8-hex schema hash of one table's raw parquet schema (names + types,
    * field order included — order changes are reader-visible). */
  private[graft] def schemaHash(schema: StructType): String = {
    val canon = schema.fields
      .map(f => s"${f.name}:${f.dataType.sql}:${f.nullable}")
      .mkString("|")
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(canon.getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
  }

  /** Dataset identity as one JSON object: `{"table":{"schema":"8hex",
    * "rows":N}, ...}`, tables sorted. Row counts come from the parquet
    * footers (Spark's count-pushdown — no data scan), so this is cheap
    * enough to stamp into every bench/verify run. An unreadable table
    * records `"err"` instead of vanishing. */
  def fingerprintJson(spark: SparkSession, dir: String): String =
    tables.sorted.map { t =>
      val body =
        try {
          val df = rawTable(spark, dir, t)
          s"""{"schema":"${schemaHash(df.schema)}","rows":${df.count()}}"""
        } catch { case e: Throwable =>
          s"""{"err":"${e.getClass.getSimpleName}"}"""
        }
      s""""$t":$body"""
    }.mkString("{", ",", "}")
}
