package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Cleaning

class CleaningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("luhnValid agrees with an independent Scala checksum on all fixture numbers") {
    val nums = (Cleaning.TestCards ++ Cleaning.TestNonCards)
      .map(_.replaceAll("[ -]", "")) ++ Seq("6011111111111117", "0000000000000")
    def luhn(s: String): Boolean = {
      val tot = s.reverse.zipWithIndex.map { case (c, i) =>
        val d = c - '0'
        if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum
      tot % 10 == 0
    }
    val got = nums.toDF("ds")
      .select(col("ds"), Cleaning.luhnValid(col("ds")).as("ok")).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    nums.foreach(n => assert(got(n) === luhn(n), n))
    // the four test cards validate, the two non-cards do not
    Cleaning.TestCards.foreach(c => assert(got(c.replaceAll("[ -]", ""))))
    Cleaning.TestNonCards.foreach(c => assert(!got(c.replaceAll("[ -]", ""))))
  }

  test("scrubCards redacts only Luhn-valid candidates and counts both") {
    val docs = Seq(
      (0L, "pay 4111111111111111 now"),                       // valid, plain
      (1L, "ref 4111111111111112 code"),                      // shape-match, invalid
      (2L, "card 4012-8888-8888-1881 and 1234 5678 9012 3456 tail"), // one of each
      (3L, "order 42 shipped on 2026-08-14"),                 // no 13+-digit run
      (4L, "amex 3782 822463 10005 works")                    // 15-digit, spaced
    ).toDF("doc_id", "text")
    val got = Cleaning.scrubCards(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(0L) === ((1L, 1L, "pay <CARD> now")))
    assert(got(1L) === ((1L, 0L, "ref 4111111111111112 code")))
    assert(got(2L) === ((2L, 1L, "card <CARD> and 1234 5678 9012 3456 tail")))
    assert(got(3L) === ((0L, 0L, "order 42 shipped on 2026-08-14")))
    assert(got(4L) === ((1L, 1L, "amex <CARD> works")))
  }
}
