package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Profiling

class ProfilingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("columnProfile: nulls, exact distincts, typed min/max rendering, one row per column") {
    val df = Seq(
      (1L, Some("b"), 2.5),
      (2L, None, 1.0),
      (3L, Some("a"), 2.5),
      (3L, Some("a"), -4.0)
    ).toDF("k", "s", "x")
    val out = Profiling.columnProfile(df, Seq("k", "s", "x")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(out("k") === ((4L, 0L, 3L, "1", "3")))
    assert(out("s") === ((4L, 1L, 2L, "a", "b")))   // null neither counted nor min
    assert(out("x") === ((4L, 0L, 3L, "-4.0", "2.5")))
    assert(out.size === 3)
  }

  test("madOutliers: planted spike flagged, clean group clean, robust to the spike itself") {
    import org.apache.spark.sql.functions._
    // group a: nine values near 10 plus one wild spike; group b: flat
    val rows = ((1L to 9L).map(i => ("a", i, 10.0 + (i % 3))) :+ (("a", 10L, 500.0))) ++
      (1L to 8L).map(i => ("b", i, 7.0))
    val df = rows.toDF("event_type", "event_id", "value")
    val got = Profiling.madOutliers(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4), r.getDouble(5)))).toMap
    val (nA, medA, madA, outA, maxDevA) = got("a")
    assert(nA === 10L)
    assert(medA === 11.0, got.toString)      // the spike does NOT drag the median
    assert(outA === 1L, got.toString)        // exactly the spike flagged
    assert(maxDevA === 489.0)
    val (nB, _, madB, outB, _) = got("b")
    // flat group: every deviation is 0, MAD 0, and 0 > 0 is false —
    // a constant column flags nothing
    assert(nB === 8L && madB === 0.0 && outB === 0L)
  }
}
