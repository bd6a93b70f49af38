package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps

/** Bit-level parity with the reference's bin hash
  * (map_reduce.cpp:214-217): hash = Σ(22 + 23·(c−14)); bin = hash % 1024.
  * Note the REPORT documents a different formula; the code wins
  * (SURVEY.md §2.2). */
class RefBinHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Direct transliteration of the C loop as the oracle. */
  private def cBin(word: String, bins: Int = 1024): Long = {
    var hash = 0L
    for (c <- word) hash += 22 + 23 * (c.toInt - 14)
    ((hash % bins) + bins) % bins
  }

  test("refBinHash matches the C formula on representative words") {
    val words = Seq("the", "a", "zebra", "mapreduce", "x1000", "dont", "q")
    val got = words.toDF("word")
      .select($"word", TextOps.refBinHash($"word").as("bin"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (w <- words) assert(got(w) === cBin(w), s"word '$w'")
  }

  test("bins stay in [0, 1024)") {
    val bins = TextOps.refBinHistogram(Seq((1L, "alpha beta gamma delta " * 10)).toDF("doc_id", "text"))
      .collect().map(_.getLong(0))
    assert(bins.forall(b => b >= 0 && b < 1024))
  }
}
