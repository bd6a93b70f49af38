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

  test("heavyHitters: exact strict n·k > total cut, floor-ppm shares, no misses") {
    // 20 rows: 'a' ×10, 'b' ×5, 'c' ×4, 'd' ×1
    val df = (Seq.fill(10)("a") ++ Seq.fill(5)("b") ++ Seq.fill(4)("c") ++ Seq("d"))
      .toDF("key0")
    val got = Profiling.heavyHitters(df, "key0", k = 4).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // threshold total/k = 5: 'a' (10 > 5) in, 'b' (5 > 5 false) OUT —
    // the cut is STRICT, matching the pigeonhole bound's "< k results"
    assert(got.keySet === Set("a"))
    assert(got("a") === ((10L, 500000L)))
    // k=5 → threshold 4: b joins; c (4 > 4) still out
    val got5 = Profiling.heavyHitters(df, "key0", k = 5).collect()
      .map(r => r.getString(0)).toSet
    assert(got5 === Set("a", "b"))
    // pigeonhole: never k or more results, for any k
    (1 to 8).foreach { k =>
      assert(Profiling.heavyHitters(df, "key0", k).count() < k)
    }
  }

  test("skewReport: uniform key → entropy_norm 1, constant key → 0, shares exact") {
    val df = (1L to 64L).map(i => (i % 8, "x")).toDF("u", "c")
    val got = Profiling.skewReport(df, Seq("u", "c")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    val (nkU, totU, top1U, top10U, bitsU, normU) = got("u")
    // 8 uniform keys: top1 = 8/64 = 125000 ppm, all 8 keys within top10,
    // entropy exactly 3 bits and normalized 1.0
    assert(nkU === 8L && totU === 64L)
    assert(top1U === 125000L && top10U === 1000000L)
    assert(bitsU === 3.0 && normU === 1.0)
    val (nkC, _, top1C, _, bitsC, normC) = got("c")
    // constant column: one key owns the table; entropy 0 by the
    // n_keys > 1 guard (0/0 would otherwise NaN the report)
    assert(nkC === 1L && top1C === 1000000L && bitsC === 0.0 && normC === 0.0)
  }
}
