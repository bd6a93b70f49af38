package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Windows

class WindowsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(1704067200000L + minute * 60000L) // 2024-01-01 UTC

  test("sessionize: 30-min gap splits sessions, within-gap merges") {
    val events = Seq(
      (1L, ts(0), 100L, "click", 1.0, ""),
      (2L, ts(10), 100L, "click", 2.0, ""),   // same session (gap 10m)
      (3L, ts(50), 100L, "click", 3.0, ""),   // new session (gap 40m)
      (4L, ts(0), 200L, "view", 4.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Windows.sessionize(events, "30 minutes")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (100L, ts(0), 2L, 3.0),
      (100L, ts(50), 1L, 3.0),
      (200L, ts(0), 1L, 4.0)))
  }

  test("tumbling windows align to epoch hours") {
    val events = Seq(
      (1L, ts(5), 1L, "a", 1.0, ""), (2L, ts(59), 1L, "a", 2.0, ""),
      (3L, ts(61), 1L, "a", 4.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Windows.tumblingCounts(events)
      .collect().map(r => (r.getTimestamp(0), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq((ts(0), 2L, 3.0), (ts(60), 1L, 4.0)))
  }

  test("perUserAnalytics running sum accumulates in event order") {
    val events = Seq(
      (1L, ts(0), 1L, "a", 1.25, ""), (2L, ts(1), 1L, "a", 2.5, ""),
      (3L, ts(2), 1L, "a", 4.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Windows.perUserAnalytics(events)
      .collect().map(r => (r.getLong(r.fieldIndex("rn")), r.getDouble(r.fieldIndex("running_value"))))
    assert(out.toSeq === Seq((1L, 1.25), (2L, 3.75), (3L, 7.75)))
  }

  test("funnelDaily: stage order enforced — pre-view clicks and pre-click purchases don't count") {
    val events = Seq(
      // user 1: full ordered funnel
      (1L, ts(0), 1L, "view", 0.0, ""), (2L, ts(5), 1L, "click", 0.0, ""),
      (3L, ts(9), 1L, "purchase", 0.0, ""),
      // user 2: click BEFORE the first view — stage 2 must not count it
      (4L, ts(2), 2L, "click", 0.0, ""), (5L, ts(4), 2L, "view", 0.0, ""),
      // user 3: purchase before any click — stage 3 must not count it
      (6L, ts(0), 3L, "view", 0.0, ""), (7L, ts(1), 3L, "purchase", 0.0, ""),
      (8L, ts(3), 3L, "click", 0.0, ""),
      // user 4: view only
      (9L, ts(0), 4L, "view", 0.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Windows.funnelDaily(events).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // 4 viewers; only users 1 and 3 click at-or-after their first view;
    // only user 1 purchases at-or-after that click
    assert(out.toSeq === Seq((4L, 2L, 1L)))
  }

  test("eventPatternMatches: ordered non-overlapping counts; same-ts ties break by event_id; noise never matches") {
    val events = Seq(
      // user 100: two complete consecutive funnels -> two matches
      (1L, ts(0), 100L, "view", 0.0, ""), (2L, ts(1), 100L, "click", 0.0, ""),
      (3L, ts(2), 100L, "purchase", 0.0, ""),
      (4L, ts(3), 100L, "view", 0.0, ""), (5L, ts(4), 100L, "click", 0.0, ""),
      (6L, ts(5), 100L, "purchase", 0.0, ""),
      // user 200: stages out of ORDER by ts but in order by event_id at
      // the same ts — the tie column decides, producing a match
      (7L, ts(0), 200L, "view", 0.0, ""), (8L, ts(1), 200L, "click", 0.0, ""),
      (9L, ts(1), 200L, "purchase", 0.0, ""),
      // user 300: right events, wrong order — no match
      (10L, ts(0), 300L, "purchase", 0.0, ""), (11L, ts(1), 300L, "click", 0.0, ""),
      (12L, ts(2), 300L, "view", 0.0, ""),
      // user 400: 'preview' must NOT satisfy the 'view' stage (token
      // boundaries, not substrings)
      (13L, ts(0), 400L, "preview", 0.0, ""), (14L, ts(1), 400L, "click", 0.0, ""),
      (15L, ts(2), 400L, "purchase", 0.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Windows.eventPatternMatches(events).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(100L -> 2L, 200L -> 1L))
  }

  test("eventPatternMatches: a funnel spanning a session boundary does not count") {
    val events = Seq(
      // user 1: view, click, then 40 minutes of silence before the
      // purchase — the purchase opens a NEW session, so no match
      (1L, ts(0), 1L, "view", 0.0, ""), (2L, ts(5), 1L, "click", 0.0, ""),
      (3L, ts(45), 1L, "purchase", 0.0, ""),
      // user 2: the identical funnel fully inside one session -> match
      (4L, ts(0), 2L, "view", 0.0, ""), (5L, ts(5), 2L, "click", 0.0, ""),
      (6L, ts(10), 2L, "purchase", 0.0, ""),
      // user 3: one funnel per session, two sessions -> per-session
      // counts sum to 2
      (7L, ts(0), 3L, "view", 0.0, ""), (8L, ts(1), 3L, "click", 0.0, ""),
      (9L, ts(2), 3L, "purchase", 0.0, ""),
      (10L, ts(60), 3L, "view", 0.0, ""), (11L, ts(61), 3L, "click", 0.0, ""),
      (12L, ts(62), 3L, "purchase", 0.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Windows.eventPatternMatches(events).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(2L -> 1L, 3L -> 2L))
  }

  test("eventPatternMatches state is session-bounded: a 10k-event hot user never materializes one whole-history row") {
    // 10_000 events, each 31 minutes apart -> 10_000 one-event
    // sessions; the largest collected span (token-string length) is
    // ONE event's token, proving no per-user whole-history buffer
    val hot = (0 until 10000).map { i =>
      (i.toLong, ts(i * 31), 7L, "click", 0.0, "")
    }
    // and a user whose 5-event burst stays within gaps -> one session
    val burst = (0 until 5).map { i =>
      (100000L + i, ts(i), 8L, "view", 0.0, "")
    }
    val events = (hot ++ burst).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val spans = Windows.sessionTokenStrings(events, gapMinutes = 30)
      .groupBy($"user_id").agg(
        count(lit(1)).as("n_sessions"), max(length($"s")).as("max_span"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(spans(7L) === ((10000L, "[click]".length)))
    assert(spans(8L) === ((1L, "[view]".length * 5)))
  }

  test("recursive CTE (Spark 4 UnionLoop): spine generation terminates and is dense") {
    val df = spark.sql(
      """WITH RECURSIVE r(n) AS (
        |  SELECT 1 UNION ALL SELECT n + 1 FROM r WHERE n < 12
        |) SELECT n FROM r ORDER BY n""".stripMargin)
    assert(df.collect().map(_.getInt(0)).toSeq === (1 to 12))
    assert(df.queryExecution.executedPlan.toString.contains("UnionLoop"),
      "recursive CTE should plan as UnionLoopExec")
  }
}
