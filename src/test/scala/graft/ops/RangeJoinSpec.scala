package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference: plain cross join + exact predicate. */
  private def bruteForce(l: Seq[(Long, Long)], r: Seq[(Long, Long)],
                         w: Int): Set[(Long, Long, Long)] =
    (for ((lk, ld) <- l; (rk, rd) <- r
          if lk == rk && math.abs(ld - rd) <= w)
      yield (lk, ld, rd)).toSet

  private def run(l: Seq[(Long, Long)], r: Seq[(Long, Long)],
                  w: Int): Set[(Long, Long, Long)] =
    RangeJoin.bandedDayJoin(
        l.toDF("k", "ld"), r.toDF("k2", "rd"), "k", "k2", "ld", "rd", w)
      .select($"k", $"ld", $"rd").as[(Long, Long, Long)].collect().toSet

  test("banded join equals the exact range predicate") {
    val l = for (k <- 1L to 5L; d <- Seq(0L, 3L, 7L, 20L, 21L)) yield (k, d)
    val r = for (k <- 1L to 5L; d <- 0L to 25L by 2L) yield (k, d)
    assert(run(l, r, 3) == bruteForce(l, r, 3))
  }

  test("banded join is exact for NEGATIVE day numbers (pre-epoch dates)") {
    // straddles 0 where truncating `div` would mis-band: -1 div 7 == 0
    val l = for (k <- 1L to 3L; d <- -9L to 9L by 3L) yield (k, d)
    val r = for (k <- 1L to 3L; d <- -10L to 10L) yield (k, d)
    for (w <- Seq(1, 3))
      assert(run(l, r, w) == bruteForce(l, r, w), s"windowDays=$w")
  }

  test("banded join plans as an equi-join, never a nested loop") {
    // the naive range predicate would plan BroadcastNestedLoopJoin — the
    // O(|L|·|R|) shape banding exists to avoid; the banded form must hash
    val df = RangeJoin.eventPairs(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"), plan.take(600))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
           plan.take(600))
  }

  test("eventPairs equals the exact self-join predicate on sf0.001") {
    val got = RangeJoin.eventPairs(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, a, b, diff) =>
      assert(a < b && math.abs(diff) <= 6) }
    // exact (unbanded) formulation over the same hour numbers
    val ev = graft.etl.Feeds.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id").cast("long").as("user_id"),
              unix_timestamp(date_trunc("second", col("ts"))).as("secs"))
      .withColumn("h", expr("secs div 3600"))
    val a = ev.select(col("event_id").as("ea"), col("user_id"),
                      col("h").as("ha"))
    val b = ev.select(col("event_id").as("eb"), col("user_id").as("ub"),
                      col("h").as("hb"))
    val exact = a.join(b, a("user_id") === b("ub") && a("ea") < b("eb") &&
        abs(a("ha") - b("hb")) <= 6)
      .select(col("ea"), col("eb")).as[(Long, Long)].collect().toSet
    assert(got.map(t => (t._2, t._3)).toSet == exact)
  }
}
