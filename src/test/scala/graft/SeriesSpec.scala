package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Series

class SeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val pattern = Seq(1.0, 3.0, 2.0, 5.0, 4.0, 6.0, 5.5, 8.0)

  private def eventsOf(vals: Seq[(Long, Seq[Double])]) =
    vals.flatMap { case (user, vs) =>
      vs.zipWithIndex.map { case (v, i) =>
        (user * 10000L + i, new Timestamp(1704067200000L + i * 60000L), user, v)
      }
    }.toDF("event_id", "ts", "user_id", "value")

  test("a scaled and shifted copy of the pattern is found at distance zero") {
    // user 1 hides 10 + 2*pattern at position 5 (z-normalization is
    // scale/offset invariant, so the planted copy must score 0.0)
    val noise = Seq(9.0, 1.0, 7.0, 2.0)
    val planted = noise ++ pattern.map(x => 10.0 + 2.0 * x) ++ noise.reverse
    val other = Seq(5.0, 1.0, 9.0, 2.0, 8.0, 3.0, 7.0, 4.0, 6.0, 5.0)
    val top = Series.znormSubsequenceTopK(
      eventsOf(Seq(1L -> planted, 2L -> other)), pattern, k = 3).collect()
    assert(top.head.getLong(0) === 1L)
    assert(top.head.getLong(1) === (noise.length + 1).toLong) // 1-based start
    assert(top.head.getDouble(2) === 0.0)
  }

  test("matches an independent Scala fold with the identical association") {
    val vals = Seq(
      1L -> Seq(4.0, 8.0, 1.5, 6.0, 2.0, 9.0, 3.0, 7.5, 0.5, 5.0, 6.5, 2.5),
      2L -> Seq(1.0, 2.0, 4.0, 8.0, 3.0, 9.0, 2.5, 7.0, 6.0))
    val w = pattern.length
    val pMu = pattern.sum / w
    val pSd = math.sqrt(pattern.map(x => (x - pMu) * (x - pMu)).sum / w)
    val pz = pattern.map(x => (x - pMu) / pSd)
    val want = (for {
      (u, vs) <- vals
      i <- 0 to vs.length - w
      win = vs.slice(i, i + w)
      mu = win.foldLeft(0.0)(_ + _) / w
      sd = math.sqrt(win.map(x => (x - mu) * (x - mu)).foldLeft(0.0)(_ + _) / w)
      if sd > 0
      d = win.zip(pz).map { case (x, p) =>
        ((x - mu) / sd - p) * ((x - mu) / sd - p) }.foldLeft(0.0)(_ + _)
    } yield (u, (i + 1).toLong,
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toSeq.sortBy { case (u, p, d) => (d, u, p) }.take(20)
    val got = Series.znormSubsequenceTopK(eventsOf(vals), pattern, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === want)
  }

  test("segmented builder equals the collect path on keys spanning many segments") {
    // deterministic pseudo-random series much longer than one segment:
    // with segLen = 32, user 1 spans 5 segments (150 values) and the
    // planted pattern copy straddles a segment boundary (start 30,
    // covers positions 30..37 across segments 0 and 1)
    val rng = new scala.util.Random(42)
    val base = Seq.fill(150)(rng.nextDouble() * 10.0)
    val planted = base.patch(29, pattern.map(x => 3.0 + 0.5 * x), pattern.length)
    val vals = Seq(1L -> planted, 2L -> Seq.fill(40)(rng.nextDouble() * 10.0))
    val expect = Series.znormSubsequenceTopK(eventsOf(vals), pattern, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val got = Series.znormSubsequenceTopKSegmented(eventsOf(vals), pattern, k = 20, segLen = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expect)
    assert(got.head === ((1L, 30L, 0.0))) // the boundary-straddling plant wins at distance 0
  }

  test("segmented builder: per-group collected state is segment-bounded") {
    // 200-value series, segLen 32, w 8: every (key, segment) group
    // holds at most segLen + w - 1 = 39 values — never the whole key
    val vals = Seq(1L -> Seq.tabulate(200)(i => math.sin(i * 0.7) * 5 + i % 13))
    val df = eventsOf(vals)
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val positioned = df.select($"user_id", $"ts", $"event_id", $"value".as("__v"))
      .withColumn("p", row_number().over(byKey).cast("long"))
    val segLen = 32
    val w = pattern.length
    val segs = positioned.select($"user_id", $"p", $"__v",
      explode(when(expr(s"(p - 1) % $segLen") <= lit(w - 2) && expr(s"(p - 1) div $segLen") > 0,
        array(expr(s"(p - 1) div $segLen"), expr(s"(p - 1) div $segLen") - 1))
        .otherwise(array(expr(s"(p - 1) div $segLen")))).as("seg"))
    val maxGroup = segs.groupBy($"user_id", $"seg").count()
      .agg(max($"count")).collect().head.getLong(0)
    assert(maxGroup <= segLen + w - 1)
    assert(maxGroup > segLen) // overlap tails really replicate
  }

  test("flat windows are skipped: a constant series yields no matches") {
    val got = Series.znormSubsequenceTopK(
      eventsOf(Seq(1L -> Seq.fill(12)(4.25))), pattern, k = 5).collect()
    assert(got.isEmpty)
  }

  test("trendSlopes: exact slope on a planted linear ramp; flat key slope 0; short key dropped") {
    def day(d: Int) = Timestamp.valueOf(f"2024-03-${d}%02d 12:00:00")
    // ramp: y = 2x + 3 on days 1..6 (x = 0..5) → slope exactly 2, icpt 3
    val rows =
      (1 to 6).flatMap { d => (1 to (2 * (d - 1) + 3)).map(i => (d * 100L + i, day(d), 1L, "ramp", 1.0, "{}")) } ++
      (1 to 5).flatMap { d => (1 to 4).map(i => (9000L + d * 10 + i, day(d), 2L, "flat", 1.0, "{}")) } ++
      (1 to 2).flatMap { d => (1 to 9).map(i => (8000L + d * 10 + i, day(d), 3L, "short", 1.0, "{}")) }
    val got = Series.trendSlopes(rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got("ramp") === ((6L, 2.0, 3.0)))
    assert(got("flat") === ((5L, 0.0, 4.0)))
    assert(!got.contains("short"))     // below minDays
  }

  test("changePoints: CUSUM peaks exactly at a planted level shift") {
    def day(d: Int) = Timestamp.valueOf(f"2024-03-${d}%02d 12:00:00")
    // 5 days at 4/day then 5 days at 20/day: |CUSUM| peaks on day 5
    // (the last pre-shift day), where the running deficit is largest
    val rows =
      (1 to 10).flatMap { d =>
        val n = if (d <= 5) 4 else 20
        (1 to n).map(i => (d * 100L + i, day(d), 1L, "shift", 1.0, "{}"))
      } ++
      (1 to 6).flatMap { d => (1 to 7).map(i => (7000L + d * 10 + i, day(d), 2L, "level", 1.0, "{}")) }
    val got = Series.changePoints(rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect().map(r => r.getString(0) -> ((r.getDate(1).toString, r.getLong(2), r.getDouble(3)))).toMap
    val (chDay, nDays, peak) = got("shift")
    assert(chDay === "2024-03-05" && nDays === 10L)
    // exact: n·S₅ − 5·total = 10·20 − 5·120 = −400; scaled /10 = −40
    assert(peak === -40.0)
    // a level series has peak |cusum| at most rounding-size, and the
    // argmax lands on day 1 by the tie-break (all cusum_n are 0)
    assert(got("level")._3 === 0.0)
    assert(got("level")._1 === "2024-03-01")
  }

  test("rollingAnomaly: planted spike flagged against its own trailing baseline") {
    // 10 steady days of 10 events, then a 100-event day, then steady —
    // plus a second key that stays flat (variance 0 → z null, never
    // flagged) and a cold-start key with too little history
    def day(d: Int) = Timestamp.valueOf(f"2024-03-${d}%02d 12:00:00")
    val rows =
      (1 to 12).flatMap { d =>
        val n = if (d == 11) 100 else 10 + (d % 2)   // slight wiggle → var > 0
        (1 to n).map(i => (d.toLong * 1000 + i, day(d), 1L, "spiky", 1.0, "{}"))
      } ++
      (1 to 8).flatMap { d => (1 to 5).map(i => (90000L + d * 100 + i, day(d), 2L, "flat", 1.0, "{}")) } ++
      (1 to 3).flatMap { d => (1 to 7).map(i => (80000L + d * 100 + i, day(d), 3L, "cold", 1.0, "{}")) }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Series.rollingAnomaly(ev).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(3), Option(r.get(5)).map(_.asInstanceOf[Double]), r.getBoolean(6)))).toMap
    // the spike day: full 7-day baseline of ~10.5, count 100 → huge z
    val (np, z, flag) = got(("spiky", "2024-03-11"))
    assert(np === 7L && flag, s"spike row: $np $z $flag")
    assert(z.exists(_ > 100), s"z was $z")
    // the day AFTER the spike: baseline now contains the spike —
    // variance explodes, today's normal count is NOT flagged
    assert(!got(("spiky", "2024-03-12"))._3)
    // flat key: zero variance → z null, is_anomaly false
    val flatRows = got.filter(_._1._1 == "flat").values
    assert(flatRows.nonEmpty && flatRows.forall(v => v._2.isEmpty && !v._3))
    // cold key: only 2 prior days ever — below minPrior, no rows at all
    assert(!got.keySet.exists(_._1 == "cold"))
    // steady pre-spike days with full history: |z| small, unflagged
    val steady = got(("spiky", "2024-03-10"))
    assert(!steady._3 && steady._2.exists(z => math.abs(z) < 3))
  }

  test("stlDecompose: exact additive identity, dow anchor, flat series decomposes to zero") {
    // 3 weeks of a weekly-shaped series: weekday level 10, a +5
    // weekend bump, plus one planted +40 spike
    val rows = (0 until 21).map { i =>
      val day = java.time.LocalDate.of(2024, 3, 4).plusDays(i.toLong) // a Monday
      val dowBump = if (day.getDayOfWeek.getValue >= 6) 15 else 10
      val n = dowBump + (if (i == 9) 40 else 0)
      (day.toString, n)
    }
    val events = rows.flatMap { case (d, n) =>
      (1 to n).map(j => (Timestamp.valueOf(d + " 12:00:00"), "load", j.toLong))
    }.toDF("ts", "event_type", "event_id")
    val got = Series.stlDecompose(events).collect()
      .map(r => r.getDate(1).toString ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(got.size === 21)
    // the additive identity holds EXACTLY in micro-units for every row
    got.values.foreach { case (n, trend, _, seasonal, residual) =>
      val lhs = math.round(trend * 1e6) + math.round(seasonal * 1e6) + math.round(residual * 1e6)
      assert(lhs === n * 1000000L, s"identity broke: $n vs $lhs")
    }
    // dow anchor: 2024-03-04 is a Monday -> dow 0; the weekend carries
    // positive seasonal, midweek negative
    assert(got("2024-03-04")._3 === 0L)
    assert(got("2024-03-09")._3 === 5L && got("2024-03-09")._4 > 0)
    // a weekday whose dow does NOT host the spike (the spike sits on
    // Wednesday and lifts that dow's seasonal mean): Tuesday is below
    // the overall level, so its seasonal runs negative
    assert(got("2024-03-05")._3 === 1L && got("2024-03-05")._4 < 0, got("2024-03-05").toString)
    // the spike day owns the LARGEST residual
    val maxResDay = got.maxBy(_._2._5)._1
    assert(maxResDay === "2024-03-13", got("2024-03-13").toString)
  }

  test("stlFromDaily: the streaming split — a pre-built (key, day, n) relation decomposes identically") {
    // the contract streaming_stl stands on: the stream maintains only
    // per-(key, day) counters, so the finish over that relation must
    // equal the batch operator over the raw events — regardless of
    // the daily relation's row order or partitioning
    val rows = (0 until 21).map { i =>
      val day = java.time.LocalDate.of(2024, 3, 4).plusDays(i.toLong)
      val n = (if (day.getDayOfWeek.getValue >= 6) 15 else 10) + (if (i == 9) 40 else 0)
      (day.toString, n)
    }
    val events = rows.flatMap { case (d, n) =>
      (1 to n).map(j => (Timestamp.valueOf(d + " 12:00:00"), "load", j.toLong))
    }.toDF("ts", "event_type", "event_id")
    val daily = rows.reverse.map { case (d, n) => ("load", java.sql.Date.valueOf(d), n.toLong) }
      .toDF("key", "day", "n").repartition(7)
    val batch = Series.stlDecompose(events).orderBy("key", "day").collect().map(_.toSeq)
    val split = Series.stlFromDaily(daily).orderBy("key", "day").collect().map(_.toSeq)
    assert(batch.toSeq === split.toSeq)
  }
}
