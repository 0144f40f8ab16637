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
  /** Floor division as a SQL fragment: Spark's `div` truncates toward zero,
    * which mis-bands NEGATIVE day numbers (pre-epoch dates) — -1 div 7 = 0
    * would share a band with day 0..6 instead of -7..-1. Correcting by the
    * remainder's sign keeps the banding algebra exact over all of BIGINT. */
  private def fdiv(x: String, w: Long): String =
    s"(CASE WHEN ($x) % $w < 0 THEN (($x) div $w) - 1 ELSE ($x) div $w END)"

  def bandedDayJoin(left: DataFrame, right: DataFrame,
                    leftKey: String, rightKey: String,
                    leftDay: String, rightDay: String,
                    windowDays: Int): DataFrame = {
    val w = windowDays.toLong * 2 + 1
    // integer [[fdiv]] (Column./ would promote to DOUBLE)
    val l = left.withColumn("__band",
      explode(array((-1 to 1).map(d =>
        expr(fdiv(s"$leftDay + ${d * w}", w))): _*)))
    val r = right.withColumn("__band", expr(fdiv(rightDay, w)))
    l.join(r, l(leftKey) === r(rightKey) && l("__band") === r("__band"))
      .where(abs(col(leftDay) - col(rightDay)) <= windowDays)
      .drop(l("__band")).drop(r("__band"))
  }

  /** Event self-proximity: pairs of events by the same user whose HOUR
    * numbers (epoch-seconds div 3600, second-truncated like the
    * sessionizer) lie within ±`windowHours` — the feature-window /
    * co-occurrence shape ("what else did this user do around then").
    * `event_a < event_b` keeps each unordered pair once; `hour_diff` is
    * signed relative to the id order. A banded self-join, NOT a window
    * function: the pairs cross session boundaries and Catalyst would
    * otherwise plan the time predicate as a nested-loop join. */
  def eventPairs(spark: SparkSession, dir: String,
                 windowHours: Int = 6): DataFrame = {
    val ev = Feeds.events(spark, dir).select(
        col("event_id"), col("user_id").cast("long").as("user_id"),
        unix_timestamp(date_trunc("second", col("ts"))).as("secs"))
      .withColumn("ev_hour", expr("secs div 3600")).drop("secs")
    val a = ev.select(col("event_id").as("event_a"), col("user_id"),
                      col("ev_hour").as("hour_a"))
    val b = ev.select(col("event_id").as("event_b"),
                      col("user_id").as("user_b"),
                      col("ev_hour").as("hour_b"))
    bandedDayJoin(a, b, "user_id", "user_b", "hour_a", "hour_b", windowHours)
      .where(col("event_a") < col("event_b"))
      .select(col("user_id"), col("event_a"), col("event_b"),
              (col("hour_b") - col("hour_a")).as("hour_diff"))
  }
}
