package graft.ops

import graft.etl.Feeds
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization and event-stream analytics over `events` — the
  * batch twin of [[graft.streaming.Sessionize]] (same 30-minute-gap
  * semantics, so the nightly batch recompute and the live stream agree).
  *
  * Scale: ONE shuffle on user_id; both windows (lag + running sum) and the
  * final session groupBy reuse that partitioning — a single exchange end to
  * end, state bounded by events-per-user-partition. No global window, no
  * driver-side iteration.
  */
object Sessions {

  /** Gap-based sessions: consecutive events of a user belong to one session
    * while the gap is ≤ `gapMinutes`. Output grain: one row per
    * (user_id, session_seq) with start/end, event count and quantity
    * (floor(value) sums — the activity feed's money rule).
    *
    * Determinism: timestamps are second-truncated (cross-engine rule for
    * the nanos feed, mirrored in the oracle) and the per-user order is
    * (ts, event_id) — total, since event_id is unique. */
  def sessionsOf(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts2", "event_id")
    val gapSec = gapMinutes * 60L
    val flagged = events
      .select(col("event_id"), col("user_id").cast("long").as("user_id"),
              date_trunc("second", col("ts")).as("ts2"),
              floor(col("value")).cast("long").as("qty"))
      .withColumn("new_s",
        when(lag(col("ts2"), 1).over(byUser).isNull
               .or(unix_timestamp(col("ts2")) -
                   unix_timestamp(lag(col("ts2"), 1).over(byUser)) > gapSec),
             1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_s")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged
      .groupBy("user_id", "session_seq")
      .agg(min(col("ts2")).as("session_start"),
           max(col("ts2")).as("session_end"),
           count(lit(1)).as("n_events"),
           sum(col("qty")).as("quantity"))
  }

  def sessions(spark: SparkSession, dir: String): DataFrame =
    sessionsOf(Feeds.events(spark, dir))

  /** Per-event-type stats with an EXACT distinct-user count — the oracle
    * anchor for the approximate (HLL) variant below. */
  def eventTypeStatsOf(events: DataFrame): DataFrame =
    events.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
           countDistinct(col("user_id").cast("long")).as("n_users"),
           sum(floor(col("value")).cast("long")).as("quantity"))

  def eventTypeStats(spark: SparkSession, dir: String): DataFrame =
    eventTypeStatsOf(Feeds.events(spark, dir))

  /** Sketch path: approx_count_distinct (HyperLogLog++) — at corpus scale
    * the exact distinct needs a (event_type, user_id) pre-aggregation
    * shuffle, while the sketch merges fixed-size registers map-side. Not
    * oracle-checked (estimates are engine-specific); SessionsSpec pins the
    * estimate within rsd tolerance of the exact count. */
  def eventTypeStatsApproxOf(events: DataFrame, rsd: Double = 0.02): DataFrame =
    events.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
           approx_count_distinct(col("user_id").cast("long"), rsd)
             .as("n_users_approx"))

  /** Ordered funnel conversion: stage k counts users whose EARLIEST
    * stage-k event is at-or-after their earliest stage-(k-1) event,
    * chained from stage 0. One (user, type) min-aggregation (the only
    * shuffle — it collapses the event volume to ≤|stages| rows per user),
    * then a per-user conditional pivot and a global count. Equal-second
    * ties count as converted (pinned, mirrored in the oracle). */
  def funnelOf(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least 2 stages")
    val firsts = events
      .where(col("event_type").isin(stages: _*))
      .groupBy(col("user_id").cast("long").as("user_id"), col("event_type"))
      .agg(min(date_trunc("second", col("ts"))).as("first_ts"))
    val byUser = firsts.groupBy("user_id")
      .pivot("event_type", stages)
      .agg(first(col("first_ts")))
    val reached = stages.indices.map { i =>
      val cond = (1 to i).foldLeft(col(stages.head).isNotNull) { (acc, j) =>
        acc && col(stages(j)).isNotNull && col(stages(j)) >= col(stages(j - 1))
      }
      sum(when(cond, 1L).otherwise(0L)).as(s"n_stage_$i")
    }
    byUser.agg(reached.head, reached.tail: _*)
  }

  /** signup → view → purchase over the events feed. */
  def funnel(spark: SparkSession, dir: String): DataFrame =
    funnelOf(Feeds.events(spark, dir), Seq("signup", "view", "purchase"))
}
