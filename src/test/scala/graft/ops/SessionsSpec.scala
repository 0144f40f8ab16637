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

  test("KMV sketch: a group with <= k distinct hashes reports the exact count") {
    val e = Seq(
      (1L, 42L, ts(0), "view", 0.0), (2L, 42L, ts(1), "view", 0.0),
      (3L, 7L, ts(2), "view", 0.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val r = Sessions.kmvUsersOf(e, k = 64)
      .select("event_type", "n_hashes", "k_used", "est_users")
      .as[(String, Long, Long, Long)].head()
    assert(r == (("view", 2L, 2L, 2L)))
  }

  test("KMV hash prefix parses as the same integer DuckDB's hex cast yields") {
    // md5("42") = a1d0c6e8... -> 0xa1d0c6e8 = 2714814184 (pinned against
    // a live DuckDB ('0x'||substr(md5('42'),1,8))::BIGINT probe)
    val e = Seq((1L, 42L, ts(0), "view", 0.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val kth = Sessions.kmvUsersOf(e).select("kth_hash").as[Long].head()
    assert(kth == 2714814184L)
  }

  test("KMV estimator matches an independent (k-1)*2^32/h_k reimplementation") {
    val users = (1L to 40L)
    val e = users.zipWithIndex.map { case (u, i) =>
      (i.toLong, u, ts(i), "view", 0.0) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val k = 8
    // independent hash path: JDK MessageDigest, not Spark's md5
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = users.map { u =>
      val hex = md.digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }.distinct.sorted
    val hk = hashes(k - 1)
    val expected = (k - 1).toLong * 4294967296L / hk
    val r = Sessions.kmvUsersOf(e, k = k)
      .select("n_hashes", "k_used", "kth_hash", "est_users")
      .as[(Long, Long, Long, Long)].head()
    assert(r == ((40L, k.toLong, hk, expected)))
    // sanity: the estimate lands in the right neighborhood of the truth
    assert(expected > 10L && expected < 160L)
  }

  test("event transitions count ordered adjacencies; ties order by event_id") {
    val e = Seq(
      // user 1: a -> b -> c (b,c share a second: event_id breaks the tie)
      (1L, 1L, ts(0), "a", 0.0), (2L, 1L, ts(5), "b", 0.0),
      (3L, 1L, ts(5), "c", 0.0),
      // user 2: b -> c
      (4L, 2L, ts(0), "b", 0.0), (5L, 2L, ts(9), "c", 0.0),
      // user 3: single event -> no transition
      (6L, 3L, ts(0), "a", 0.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Sessions.eventTransitionsOf(e)
      .select("from_type", "to_type", "n", "n_users")
      .as[(String, String, Long, Long)].collect().sorted.toSeq
    assert(got == Seq(("a", "b", 1L, 1L), ("b", "c", 2L, 2L)))
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

  test("debounce drops same-(user,type) re-fires within 300s, keeps others") {
    def t(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)
    val ev = Seq(
      (1L, 1L, t(0),   "click"),
      (2L, 1L, t(200), "click"), // 200s after #1 -> dropped
      (3L, 1L, t(350), "click"), // 150s after #2: the lag rule compares to
                                 // the immediate predecessor (kept or not),
                                 // so a sustained burst stays suppressed
      (4L, 1L, t(100), "view"),  // different type: own stream -> kept
      (5L, 2L, t(250), "click"), // different user -> kept
      (6L, 1L, t(700), "click")) // 350s after #3 -> kept
      .toDF("event_id", "user_id", "ts", "event_type")
    val kept = Sessions.debounceOf(ev)
      .select("event_id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(1L, 4L, 5L, 6L))
    // boundary: exactly 300s is still a duplicate (strict >)
    val ev2 = Seq((1L, 1L, t(0), "click"), (2L, 1L, t(300), "click"))
      .toDF("event_id", "user_id", "ts", "event_type")
    assert(Sessions.debounceOf(ev2).count() == 1)
  }

  test("hourProfile: per-(hour, type) events, exact users, floored qty") {
    def h(hr: Int, sec: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-05 $hr%02d:00:$sec%02d")
    val ev = Seq(
      (1L, 1L, h(9, 0), "click", 1.9),
      (2L, 1L, h(9, 30), "click", 2.9), // same user, same hour
      (3L, 2L, h(9, 59), "click", 0.5),
      (4L, 1L, h(23, 0), "view", 1.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val r = Sessions.hourProfileOf(ev).orderBy("hour", "event_type")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(r == Seq((9L, "click", 3L, 2L, 3L), (23L, "view", 1L, 1L, 1L)))
  }

  test("eventRateHist: power-of-2 buckets over per-user counts") {
    // users: 1 -> 1 event (bucket 0), 2 -> 2 events, 3 -> 3 (both bucket 1)
    val ev = Seq((1L, 1L), (2L, 2L), (3L, 2L), (4L, 3L), (5L, 3L), (6L, 3L))
      .toDF("event_id", "user_id")
    val r = Sessions.eventRateHistOf(ev).orderBy("bucket")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((0L, 1L, 1L, 1L, 1L), (1L, 2L, 5L, 2L, 3L)))
  }
}
