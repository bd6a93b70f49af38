package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Warc

/** Container framing: round trips, marker-immunity (a payload that
  * SPELLS the record header), truncation, and malformed-header
  * degradation. */
class WarcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkContainers(rows: Seq[(Long, String, Long, String)], n: Int = 2) =
    Warc.containersFromDocs(
      rows.toDF("doc_id", "url", "fetch_ts", "html"), nContainers = n)

  private val rows = Seq(
    (0L, "https://a.example.com/0", 1000L, "<p>zero page prose</p>"),
    (1L, "https://b.example.com/1", 1001L, "<p>one</p>"),
    (2L, "https://a.example.com/2", 1002L, ""), // empty payload frames too
    (3L, "https://c.example.co.uk/3", 1003L, "<p>three &amp; more</p>"))

  test("containers round-trip: every record recovered byte-exactly, in order") {
    val got = Warc.records(mkContainers(rows))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getBoolean(3))).toSet
    assert(got === rows.map { case (_, u, t, h) => (u, t, h, false) }.toSet)
  }

  test("length framing is marker-immune: a payload spelling the record header parses") {
    val evil = "before\r\n\r\n" + Warc.RecordMagic + "\r\nWARC-Target-URI: fake\r\n" +
      "Content-Length: 5\r\n\r\nafter"
    val rs = Seq((0L, "https://x/0", 1L, evil), (1L, "https://x/1", 2L, "tail record"))
    val got = Warc.records(mkContainers(rs, n = 1))
      .orderBy("fetch_ts")
      .collect().map(r => (r.getString(0), r.getString(2), r.getBoolean(3)))
    assert(got.toSeq === Seq(
      ("https://x/0", evil, false), // the spoofed header is payload, not structure
      ("https://x/1", "tail record", false)))
  }

  test("truncated final payload is emitted flagged; earlier records survive") {
    // build one good record + one whose declared length overshoots
    val good = spark.sql("SELECT 1").select(
      Warc.recordExpr(lit("https://x/ok"), lit(10L), lit("complete payload")).as("r"))
      .collect().head.getAs[Array[Byte]](0)
    val cut = Warc.RecordMagic + "\r\nWARC-Target-URI: https://x/cut\r\n" +
      "WARC-Date: 11\r\nContent-Length: 999\r\n\r\nonly this much"
    val bytes = good ++ cut.getBytes("UTF-8")
    val got = Warc.parseRecords(bytes)
    assert(got.map(r => (r.url, r.html, r.truncated)) === Seq(
      ("https://x/ok", "complete payload", false),
      ("https://x/cut", "only this much", true)))
  }

  test("malformed header ends the parse but keeps prior records") {
    val good = spark.sql("SELECT 1").select(
      Warc.recordExpr(lit("https://x/ok"), lit(10L), lit("fine")).as("r"))
      .collect().head.getAs[Array[Byte]](0)
    // missing Content-Length: nothing safe to frame on — stop
    val bad = Warc.RecordMagic + "\r\nWARC-Target-URI: https://x/bad\r\n\r\npayload"
    assert(Warc.parseRecords(good ++ bad.getBytes("UTF-8"))
      .map(r => (r.url, r.truncated)) === Seq(("https://x/ok", false)))
    // wrong magic line: same degradation
    val wrongMagic = "NOT-WARC/9.9\r\nContent-Length: 3\r\n\r\nxyz"
    assert(Warc.parseRecords(good ++ wrongMagic.getBytes("UTF-8"))
      .map(_.url) === Seq("https://x/ok"))
    // trailing garbage with no header shape at all
    assert(Warc.parseRecords(good ++ "garbage bytes".getBytes("UTF-8"))
      .map(_.url) === Seq("https://x/ok"))
  }

  test("record-gzipped containers inflate to the identical record stream") {
    val containers = Warc.containersFromDocs(
      rows.toDF("doc_id", "url", "fetch_ts", "html"), nContainers = 2, gzip = true)
    val got = Warc.records(containers)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getBoolean(3))).toSet
    assert(got === rows.map { case (_, u, t, h) => (u, t, h, false) }.toSet)
    // the compressed container is NOT the plain one (the flag isn't a no-op)
    val plain = mkContainers(rows).collect().map(_.getAs[Array[Byte]]("content")).toSeq
    val gz = containers.collect().map(_.getAs[Array[Byte]]("content")).toSeq
    assert(plain.map(_.toSeq).toSet !== gz.map(_.toSeq).toSet)
  }

  test("truncated gzip payload cannot inflate: empty html, still flagged truncated") {
    val full = spark.sql("SELECT 1").select(
      Warc.recordExpr(lit("https://x/gz"), lit(7L), lit("payload to deflate"), gzip = true).as("r"))
      .collect().head.getAs[Array[Byte]](0)
    // cut the record 4 bytes into the compressed payload: header
    // parses (declared length overshoots what's left), inflate fails
    val headerEnd = {
      var i = 0
      while (!(full(i) == '\r' && full(i + 1) == '\n' && full(i + 2) == '\r' && full(i + 3) == '\n')) i += 1
      i + 4
    }
    val cut = full.take(headerEnd + 4)
    val got = Warc.parseRecords(cut)
    assert(got.map(r => (r.url, r.html, r.truncated)) === Seq(("https://x/gz", "", true)))
  }

  test("multi-byte payloads frame on BYTE length, not char count") {
    val rs = Seq((0L, "https://x/é", 1L, "café — 2½° ’quoted’"),
      (1L, "https://x/plain", 2L, "ascii"))
    val got = Warc.records(mkContainers(rs, n = 1))
      .orderBy("fetch_ts").collect().map(r => (r.getString(0), r.getString(2)))
    assert(got.toSeq === Seq(("https://x/é", "café — 2½° ’quoted’"), ("https://x/plain", "ascii")))
  }
}
