package graft

import java.sql.Timestamp
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
}
