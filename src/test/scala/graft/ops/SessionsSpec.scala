package graft.ops

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  // user 1: two sessions (40-min gap splits); user 2: one session
  private lazy val events = Seq(
    (10L, 1L, ts(0), 1.5),
    (11L, 1L, ts(10), 2.5),
    (12L, 1L, ts(50), 3.5), // 40 min after previous -> new session
    (13L, 2L, ts(0), 9.0))
    .toDF("event_id", "user_id", "ts", "value")

  test("gap sessionization splits on >30min and aggregates per session") {
    val got = Sessions.sessionsOf(events)
      .select("user_id", "session_seq", "session_start", "session_end",
              "n_events", "quantity")
      .as[(Long, Long, Timestamp, Timestamp, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1L, 1L, ts(0), ts(10), 2L, 3L),  // floor(1.5)+floor(2.5) = 3
      (1L, 2L, ts(50), ts(50), 1L, 3L),
      (2L, 1L, ts(0), ts(0), 1L, 9L)))
  }

  test("a gap of exactly 30 minutes stays in one session") {
    val e = Seq((1L, 1L, ts(0), 1.0), (2L, 1L, ts(30), 1.0))
      .toDF("event_id", "user_id", "ts", "value")
    assert(Sessions.sessionsOf(e).count() == 1)
    val e2 = Seq((1L, 1L, ts(0), 1.0), (2L, 1L, ts(31), 1.0))
      .toDF("event_id", "user_id", "ts", "value")
    assert(Sessions.sessionsOf(e2).count() == 2)
  }

  test("batch sessions agree with the streaming sessionizer's closed set") {
    // Closed sessions only: the stream withholds a session until a later
    // event or the watermark proves the gap, so compare on sessions the
    // batch query also sees closed (user 3's trailing singleton never
    // closes in-stream and is excluded).
    import graft.streaming.Sessionize
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Sessionize.Event]
    val q = Sessionize.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess_batch_eq")
      .outputMode("append").start()
    try {
      input.addData(
        Sessionize.Event(1L, ts(0), 1.0), Sessionize.Event(1L, ts(10), 2.0),
        Sessionize.Event(1L, ts(50), 3.0), Sessionize.Event(2L, ts(5), 4.0))
      q.processAllAvailable()
      // push the watermark far ahead so every real session times out closed
      input.addData(Sessionize.Event(99L, ts(600), 0.0))
      q.processAllAvailable()
      input.addData(Sessionize.Event(98L, ts(601), 0.0))
      q.processAllAvailable()
      val streamed = spark.table("sess_batch_eq")
        .where($"user_id" < 90L)
        .select("user_id", "session_start", "session_end", "n_events")
        .as[(Long, Timestamp, Timestamp, Long)].collect().sorted.toSeq
      val batch = Sessions.sessionsOf(
        Seq((1L, 1L, ts(0), 1.0), (2L, 1L, ts(10), 2.0),
            (3L, 1L, ts(50), 3.0), (4L, 2L, ts(5), 4.0))
          .toDF("event_id", "user_id", "ts", "value"))
        .select("user_id", "session_start", "session_end", "n_events")
        .as[(Long, Timestamp, Timestamp, Long)].collect().sorted.toSeq
      assert(streamed == batch && batch.length == 3)
    } finally q.stop()
  }

  test("funnel: stages gate on order, ties convert, dropouts stop the chain") {
    val e = Seq(
      // user 1 full ordered funnel
      (1L, 1L, ts(0), "signup"), (2L, 1L, ts(5), "view"),
      (3L, 1L, ts(9), "purchase"),
      // user 2 purchase BEFORE view: converts to view only
      (4L, 2L, ts(0), "signup"), (5L, 2L, ts(8), "view"),
      (6L, 2L, ts(3), "purchase"),
      // user 3 never signs up: not even stage 0
      (7L, 3L, ts(1), "view"), (8L, 3L, ts(2), "purchase"),
      // user 4 signup+view same second: tie counts as converted
      (9L, 4L, ts(0), "signup"), (10L, 4L, ts(0), "view"))
      .map { case (id, u, t, ty) => (id, t, u, ty, 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Sessions.funnelOf(e, Seq("signup", "view", "purchase"))
      .as[(Long, Long, Long)].head()
    assert(r == ((3L, 3L, 1L)))
  }

  test("approx distinct users within rsd tolerance of exact") {
    val ev = graft.etl.Feeds.events(spark, "/root/testdata/sf0.001")
    val exact = Sessions.eventTypeStatsOf(ev)
      .select("event_type", "n_users").as[(String, Long)].collect().toMap
    val approx = Sessions.eventTypeStatsApproxOf(ev, rsd = 0.02)
      .select("event_type", "n_users_approx").as[(String, Long)]
      .collect().toMap
    assert(exact.keySet == approx.keySet && exact.nonEmpty)
    for ((t, n) <- exact) {
      val a = approx(t)
      assert(math.abs(a - n).toDouble / n <= 0.10, s"$t: exact=$n approx=$a")
    }
  }
}
