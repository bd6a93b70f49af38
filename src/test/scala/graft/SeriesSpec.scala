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

  test("flat windows are skipped: a constant series yields no matches") {
    val got = Series.znormSubsequenceTopK(
      eventsOf(Seq(1L -> Seq.fill(12)(4.25))), pattern, k = 5).collect()
    assert(got.isEmpty)
  }
}
