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

  test("homoglyphNormalize: spoof round-trips to the original; fold tables stay aligned") {
    import org.apache.spark.sql.functions.col
    // the two constants must be positionally aligned or translate()
    // silently mismaps
    assert(Cleaning.ConfusablesFrom.length === Cleaning.ConfusablesTo.length)
    assert(Cleaning.ConfusablesFrom.toSet.size === Cleaning.ConfusablesFrom.length)
    val docs = Seq((1L, "big sale on cyber xylophones today"),
      (2L, "Мирный attack Не really")).toDF("doc_id", "text")
    val spoofed = docs.select(col("doc_id"),
      Cleaning.homoglyphSpoof(col("text")).as("text"))
    // the spoof changed the bytes (it hit a/e/o/p/c/y/x)...
    val raw = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val sp = spoofed.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sp(1L) !== raw(1L))
    // ...and the fold recovers the original exactly
    val folded = spoofed.select(col("doc_id"),
      Cleaning.homoglyphNormalize(col("text")).as("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(folded(1L) === raw(1L))
    // real Cyrillic words fold their confusable letters too (М, Н, и
    // stay — only the lookalike set maps); the fold is deterministic,
    // not a language guesser
    assert(Cleaning.ConfusablesFrom.contains('М') &&
      folded(2L).contains("M") && folded(2L).contains("H"))
  }

  test("piiScan: phones and IPs counted and redacted; prose digits survive") {
    val docs = Seq(
      (0L, "call 555-867-5309 now"),
      (1L, "from 192.168.1.77 seen"),
      (2L, "dial +1 (415) 555-0199 via 10.0.0.255 today"),
      (3L, "order 42 costs 1999 in 2026"),
      (4L, "v1.2.3.4 is a version not an address")
    ).toDF("doc_id", "text")
    val got = Cleaning.piiScan(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(0L) === ((1L, 0L, "call <PHONE> now")))
    assert(got(1L) === ((0L, 1L, "from <IP> seen")))
    assert(got(2L) === ((1L, 1L, "dial <PHONE> via <IP> today")))
    assert(got(3L) === ((0L, 0L, "order 42 costs 1999 in 2026")))
    // the \b guard: no boundary sits between 'v' and '1', so a
    // version-prefixed quad is NOT an address and survives
    assert(got(4L) === ((0L, 0L, "v1.2.3.4 is a version not an address")))
  }
}
