package graft.sources

import graft.SparkSpec
import graft.etl.Feeds
import org.apache.spark.sql.types._

/** Tripwire for driver-side testdata regeneration (round 8: events.ts
  * silently changed from TIMESTAMP(NANOS) to micros TIMESTAMP_NTZ and 22
  * pipeline queries crashed in analysis — the failure surfaced as holes
  * in downstream artifacts, not as a named schema drift). This spec pins
  * the input schemas the engine was built against, so a regenerated
  * table fails HERE with the table and column named.
  *
  * If this spec fails after a testdata refresh: the generator changed a
  * schema. Check every reader of that column (grep the column name),
  * adapt them the way Feeds.normalizeEventTs adapts `ts`, then update
  * the pin to the new shape.
  */
class TestdataSchemaSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // name -> (column -> acceptable Spark types). Timestamp columns accept
  // both the UTC-adjusted and NTZ parquet flavors — both normalize to
  // the same wall clock under the pinned UTC session zone.
  private val tsLike: Set[DataType] = Set(TimestampType, TimestampNTZType)

  private def pinned(name: String): Map[String, Set[DataType]] = name match {
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
    case "documents" => Map("doc_id" -> Set(LongType),
      "text" -> Set(StringType), "lang" -> Set(StringType),
      "source" -> Set(StringType), "n_chars" -> Set(LongType))
    case "embeddings" => Map("vec_id" -> Set(LongType),
      "embedding" -> Set(ArrayType(FloatType, containsNull = true),
                         ArrayType(FloatType, containsNull = false)),
      "label" -> Set(IntegerType))
    case other => fail(s"no pin for table $other")
  }

  for (t <- Seq("region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "documents", "embeddings"))
    test(s"$t.parquet matches the pinned reader contract") {
      val schema = spark.read.parquet(s"$dir/$t.parquet").schema
      val pins = pinned(t)
      val missing = pins.keySet -- schema.fieldNames.toSet
      assert(missing.isEmpty,
        s"testdata schema drift: $t lost column(s) ${missing.mkString(",")}")
      for ((colName, ok) <- pins) {
        val got = schema(colName).dataType
        assert(ok.contains(got),
          s"testdata schema drift: $t.$colName is $got, engine expects " +
          s"one of ${ok.mkString("/")} — adapt the readers " +
          s"(cf. Feeds.normalizeEventTs), then update this pin")
      }
    }

  test("events.parquet loads through Feeds.events in any known ts vintage") {
    // events has its own multi-vintage contract (nanos-as-long, NTZ,
    // TimestampType) — normalizeEventTs either adapts or fails loud, and
    // FeedsEventsSpec covers each arm; here we pin the remaining columns
    val ev = Feeds.events(spark, dir)
    val pins = Map("event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType, "ts" -> TimestampType)
    for ((colName, want) <- pins)
      assert(ev.schema(colName).dataType == want,
        s"testdata schema drift: events.$colName is " +
        s"${ev.schema(colName).dataType}, engine expects $want")
  }
}
