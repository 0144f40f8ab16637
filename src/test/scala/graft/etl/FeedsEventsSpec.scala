package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the events `ts` schema adaptivity: the driver's generator has
  * shipped `events.ts` as parquet TIMESTAMP(NANOS) (read as raw longs,
  * rounds 1-7) and as micros TIMESTAMP_NTZ (round 8+) — the round-8
  * regression was exactly this: 22 pipeline queries crashed in analysis
  * because the reader assumed the nanos-as-long vintage. All vintages
  * must normalize to the same microsecond TimestampType frame. */
class FeedsEventsSpec extends SparkSpec {

  // 2024-05-06 07:08:09.123456789 UTC, as nanos since epoch
  private val nanos = 1714979289123456789L

  test("nanos-as-long vintage truncates to microsecond TimestampType") {
    val df = spark.range(1).select(lit(nanos).as("ts"))
    val out = Feeds.normalizeEventTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    val got = out.select(unix_micros(col("ts"))).head().getLong(0)
    assert(got == nanos / 1000) // truncation, not rounding
  }

  test("micros TIMESTAMP_NTZ vintage casts to the same wall clock (UTC)") {
    val df = spark.range(1)
      .select(lit(nanos / 1000).as("us"))
      .select(col("us"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    assert(df.schema("ts").dataType == TimestampNTZType) // fixture sanity
    val out = Feeds.normalizeEventTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    val got = out.select(unix_micros(col("ts"))).head().getLong(0)
    assert(got == nanos / 1000) // session tz is UTC: wall-clock identity
  }

  test("TimestampType vintage passes through unchanged") {
    val df = spark.range(1)
      .select(timestamp_micros(lit(nanos / 1000)).as("ts"))
    assert(Feeds.normalizeEventTs(df).schema("ts").dataType == TimestampType)
    assert(Feeds.normalizeEventTs(df).select(unix_micros(col("ts")))
      .head().getLong(0) == nanos / 1000)
  }

  test("a long ts below nanos magnitude fails loud, not shifted to 1970") {
    // the same instant in MICROS arriving as a plain INT64 — the nanos
    // arm must refuse it per-row (raise_error), not divide it by 1000.
    // The threshold is the SHARED constant, so guard and pins cannot
    // drift apart: micros for the pinned window sit far below it, nanos
    // far above.
    val floor = graft.sources.TestdataContract.EventsNanosFloor
    assert(nanos / 1000 < floor && nanos > floor)
    // floor ≈ 1973-03-03: every year the window pins is representable
    assert(java.time.Instant.ofEpochSecond(0, floor)
      .atZone(java.time.ZoneOffset.UTC).getYear == 1973)
    val df = spark.range(1).select(lit(nanos / 1000).as("ts"))
    val out = Feeds.normalizeEventTs(df) // plan builds fine (lazy)
    val e = intercept[Exception](out.collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("too small for epoch-nanos")), e)
    // nulls pass through as nulls, no error
    val withNull = spark.range(1)
      .select(lit(null).cast(LongType).as("ts"))
    assert(Feeds.normalizeEventTs(withNull).head().isNullAt(0))
  }

  test("an unexpected ts type fails loud, not downstream") {
    val df = spark.range(1).select(lit("2024-05-06").as("ts"))
    val e = intercept[IllegalArgumentException](Feeds.normalizeEventTs(df))
    assert(e.getMessage.contains("events.ts"))
  }

  test("the on-disk testdata vintage loads and normalizes to sane dates") {
    val ev = Feeds.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == TimestampType)
    // magnitude pin, not just type: a unit-shifted vintage (micros read
    // as nanos, or vice versa) lands decades away from the generator's
    // date range and must fail HERE, not as silent ~1970 timestamps
    val Array(lo, hi) = ev.agg(min(year(col("ts"))), max(year(col("ts"))))
      .head().toSeq.map(_.asInstanceOf[Int]).toArray
    // band = the SAME pin preflight enforces (TestdataContract.yearWindows)
    val (pinLo, pinHi) = graft.sources.TestdataContract.yearWindows
      .collectFirst { case ("events", "ts", l, h) => (l, h) }
      .getOrElse(fail("events.ts missing from TestdataContract.yearWindows"))
    assert(lo >= pinLo && hi <= pinHi,
      s"events.ts normalized to implausible years [$lo, $hi] — " +
      "unit-shift drift in the reader or the generator")
  }
}
