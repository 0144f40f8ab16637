package graft.ops

import graft.etl.Feeds
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Banded interval (range) join — "all right rows within ±w of the left
  * row's time, per key". The complement of [[AsOf]] (which keeps only the
  * latest): proximity joins, feature windows ("orders within 3 days of a
  * session"), slowly-moving correlation studies.
  *
  * Scale shape: Catalyst plans a naive `a.ts BETWEEN b.ts - w AND b.ts + w`
  * as BroadcastNestedLoopJoin — O(|L|·|R|) and a driver-sized broadcast:
  * unusable when both sides are fact-sized. The banded form buckets time
  * into width-(2w+1) bands, explodes the LEFT side into its band and both
  * neighbors (3 rows), equi-joins on (key, band) — hash join, shuffle on
  * the join key like any other — and re-applies the exact predicate. Every
  * qualifying pair shares a band with one of the three copies, each right
  * row owns exactly ONE band, so no dedup pass is needed. Band width tunes
  * the replication-vs-selectivity tradeoff exactly like LSH banding does
  * for similarity joins (ops/Dedup).
  */
object RangeJoin {

  /** Pairs (left, right) with `|leftDay - rightDay| <= windowDays`, joined
    * per key, via the 3-banded equi-join. Day columns are integer
    * day-numbers (datediff from epoch) — exact arithmetic, no timezone
    * edge. */
  def bandedDayJoin(left: DataFrame, right: DataFrame,
                    leftKey: String, rightKey: String,
                    leftDay: String, rightDay: String,
                    windowDays: Int): DataFrame = {
    val w = windowDays.toLong * 2 + 1
    // integer `div` (Column./ would promote to DOUBLE); day numbers are
    // positive so div == floor-division on both sides
    val l = left.withColumn("__band",
      explode(array((-1 to 1).map(d =>
        expr(s"($leftDay + ${d * w}) div $w")): _*)))
    val r = right.withColumn("__band", expr(s"$rightDay div $w"))
    l.join(r, l(leftKey) === r(rightKey) && l("__band") === r("__band"))
      .where(abs(col(leftDay) - col(rightDay)) <= windowDays)
      .drop(l("__band")).drop(r("__band"))
  }

  /** Events × orders proximity: for each event, every order by the same
    * customer within ±3 days of the event. Emits the pair plus the signed
    * day offset (negative = order precedes the event). */
  def eventOrderPairs(spark: SparkSession, dir: String,
                      windowDays: Int = 3): DataFrame = {
    val epoch = to_date(lit("1970-01-01"))
    val ev = Feeds.events(spark, dir).select(
      col("event_id"),
      col("user_id").cast("long").as("user_id"),
      datediff(date_trunc("second", col("ts")).cast("date"), epoch)
        .cast("long").as("ev_day"))
    val o = Feeds.table(spark, dir, "orders").select(
      col("o_orderkey"), col("o_custkey"),
      datediff(col("o_orderdate").cast("date"), epoch).cast("long")
        .as("ord_day"))
    bandedDayJoin(ev, o, "user_id", "o_custkey", "ev_day", "ord_day",
                  windowDays)
      .select(col("event_id"), col("user_id"), col("o_orderkey"),
              (col("ord_day") - col("ev_day")).as("day_diff"))
  }
}
