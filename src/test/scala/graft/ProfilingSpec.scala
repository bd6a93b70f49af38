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

  test("weightedMedian: weight pulls the pick; unit weights reduce to plain median") {
    import graft.operators.Relational
    val spark2 = spark; import spark2.implicits._
    // values 1..4; weight 10 on value 4 drags the weighted median to 4
    // (cum: 1,2,3,13 of 13 — first 2·cum >= 13 is value 3? cum(3)=3,
    // 6 < 13; cum(4)=13, 26 >= 13 → pick 4)
    val fx = Seq(("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 1.0), ("a", 4.0, 10.0),
      ("b", 1.0, 1.0), ("b", 2.0, 1.0), ("b", 3.0, 1.0))
      .toDF("grp", "v", "w")
    val got = Relational.weightedMedian(fx, "grp", "v", "w").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got("a") === ((4.0, 13.0)))
    assert(got("b") === ((2.0, 3.0)))    // unit weights → plain median
  }

  test("fkIntegrity: planted orphans counted exactly, clean edges zero") {
    import graft.operators.Relational
    val spark2 = spark; import spark2.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(1L, 1L, 2L, 9L, 8L).toDF("fk")       // two orphans
    val clean = Seq(3L, 3L).toDF("fk")
    val got = Relational.fkIntegrity(Seq(
      ("dirty", child, "fk", parent, "pk"),
      ("clean", clean, "fk", parent, "pk"))).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("dirty") === ((5L, 2L)))
    assert(got("clean") === ((2L, 0L)))
  }

  test("joinability: subset FK scores 1.0, disjoint scores 0, partial exact") {
    import graft.operators.Profiling
    val spark2 = spark; import spark2.implicits._
    val parent = Seq(1L, 2L, 3L, 4L).toDF("pk")
    val fk = Seq(1L, 1L, 2L).toDF("fk")          // distinct {1,2} ⊂ parent
    val disjoint = Seq(100L, 200L).toDF("fk")
    val partial = Seq(3L, 4L, 5L, 6L).toDF("fk") // {3,4} of 4 ∩ parent
    val got = Profiling.joinability(Seq(
      ("fk", fk, "fk", parent, "pk"),
      ("dis", disjoint, "fk", parent, "pk"),
      ("part", partial, "fk", parent, "pk"))).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got("fk") === ((2L, 4L, 2L, 1.0)))
    assert(got("dis") === ((2L, 4L, 0L, 0.0)))
    assert(got("part") === ((4L, 4L, 2L, 0.5)))
  }

  test("winsorizedStats: the clamp tames a planted spike the raw mean eats") {
    import graft.operators.Profiling
    val spark2 = spark; import spark2.implicits._
    // 19 values of 10, one 1000: p95 pick at rank ceil(20·0.95)=19 → 10
    val rows = (1L to 19L).map(i => ("a", i, 10.0)) :+ (("a", 20L, 1000.0))
    val got = Profiling.winsorizedStats(rows.toDF("event_type", "event_id", "value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).head
    val (_, n, p05, p95, raw, win) = got
    assert(n === 20L && p05 === 10.0 && p95 === 10.0)
    assert(raw === 59.5)          // (19·10 + 1000)/20
    assert(win === 10.0)          // spike clamped to p95
  }

  test("benfordScreen: exact counts, leading digit from strings, expectation sums to ~1e6") {
    val spark2 = spark; import spark2.implicits._
    // digits by hand: 12.3→1, 0.5 dropped (<1), 199→1, 23→2, 9001→9, -345→3
    val fx = Seq(12.3, 0.5, 199.0, 23.0, 9001.0, -345.0).toDF("x")
    val got = Profiling.benfordScreen(fx, "x").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L)._1 === 2L && got(2L)._1 === 1L && got(3L)._1 === 1L && got(9L)._1 === 1L)
    assert(got(1L)._2 === 400000L)                        // 2/5 floor-ppm
    assert(got(1L)._3 === 301029L)                        // floor(1e6·log10 2)
    // Benford expectations over all nine digits total ~1e6 (floor loss < 9)
    val full = (1 to 9).map(d =>
      math.floor(math.log(1.0 + 1.0 / d) / math.log(10.0) * 1e6).toLong).sum
    assert(full > 999990L && full <= 1000000L)
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

  test("skewReport: the bounded above-cutover branch is value-identical to the fused window branch") {
    // the WindowCutover contract (round 13): below the cutover the
    // report runs the single fused window pipeline, above it the
    // bounded GroupedTopK/broadcast/plain-agg plan — forcing the
    // bounded branch with cutover = 0 must reproduce the default
    // branch row-for-row on real data, so the cutover can never move
    // the oracle hash
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val cols = Seq("l_orderkey", "l_suppkey", "l_returnflag", "l_linestatus")
    val fused = Profiling.skewReport(li, cols).collect().map(_.toSeq).toSet
    val bounded = Profiling.skewReport(li, cols, cutover = 0L).collect().map(_.toSeq).toSet
    assert(fused === bounded)
  }

  test("skewReport sizeHint: picks either branch without a count job, values never move") {
    // VERDICT r13 #4: the branch decision accepts a caller-supplied
    // row-count bound (catalog stat / parquet footers) so the default
    // path schedules no extra full-scan job; a hint on EITHER side of
    // the cutover reproduces the unhinted report exactly
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val cols = Seq("l_orderkey", "l_returnflag")
    val unhinted = Profiling.skewReport(li, cols).collect().map(_.toSeq).toSet
    val hintSmall = Profiling.skewReport(li, cols, sizeHint = Some(1L))
      .collect().map(_.toSeq).toSet
    val hintBig = Profiling.skewReport(li, cols, sizeHint = Some(Long.MaxValue))
      .collect().map(_.toSeq).toSet
    assert(hintSmall === unhinted && hintBig === unhinted)
    // and the footer stat the registered query feeds it is the true count
    val tt = graft.sources.Tables(spark, "/root/testdata/sf0.001")
    assert(tt.rowCountStat("lineitem") === li.count())
  }

  test("skewReport: a stale too-small hint trips the in-plan guard instead of a single-task sort") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.toString).toSeq
    val ex = intercept[Exception] {
      Profiling.skewReport(li, Seq("l_returnflag"),
        cutover = 10L, sizeHint = Some(1L)).collect()
    }
    assert(chain(ex).exists(_.contains("stale size hint")), ex.toString)
  }
}
