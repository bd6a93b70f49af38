package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Charsets

/** Legacy-charset transcode audit: declared-charset extraction,
  * decode against the published charset tables, malformed-unit
  * accounting and per-row isolation, unsupported-charset fallback,
  * and UTF-8-clean passthrough. */
class CharsetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def page(prefix: String, planted: Array[Byte], suffix: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(prefix.getBytes("ISO-8859-1"))
    bos.write(planted)
    bos.write(suffix.getBytes("ISO-8859-1"))
    bos.toByteArray
  }

  private def auditOf(rows: (Long, Array[Byte])*) =
    Charsets.transcodeAudit(rows.toSeq.toDF("doc_id", "raw"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("UTF-8-clean passthrough: zero damage, not transcoded") {
    val m = auditOf((1L, page("<meta charset=\"utf-8\"><p>caf",
      Array(0xC3.toByte, 0xA9.toByte), "</p>")))
    val r = m(1L)
    assert(r.getAs[String]("charset") === "utf-8")
    assert(r.getAs[String]("text") === "<meta charset=\"utf-8\"><p>café</p>")
    assert(r.getAs[Long]("malformed_units") === 0L)
    assert(r.getAs[Long]("utf8_malformed") === 0L)
    assert(!r.getAs[Boolean]("transcoded") && r.getAs[Boolean]("ok"))
  }

  test("published table pins: ISO-8859-1, Shift-JIS, windows-1251 decode to the known chars") {
    val m = auditOf(
      (1L, page("<meta charset=\"iso-8859-1\"><p>caf", Array(0xE9.toByte), "</p>")),
      (2L, page("<meta charset=\"shift_jis\"><p>",
        Array(0x83.toByte, 0x65.toByte, 0x93.toByte, 0xFA.toByte), "</p>")),
      (3L, page("<meta http-equiv=\"Content-Type\" content=\"text/html; charset=windows-1251\"><p>",
        Array(0xCF.toByte, 0xF0.toByte), "</p>")),
      (4L, page("<meta charset=\"gbk\"><p>",
        Array(0xBA.toByte, 0xBA.toByte, 0xD3.toByte, 0xEF.toByte), "</p>")))
    assert(m(1L).getAs[String]("text").contains("café"))
    assert(m(2L).getAs[String]("text").contains("テ日")) // テ日
    assert(m(3L).getAs[String]("text").contains("Пр")) // Пр
    assert(m(4L).getAs[String]("text").contains("汉语")) // 汉语 (GBK 0xBABA 0xD3EF)
    // all four repaired: transcode damage 0, naive-utf-8 damage > 0
    for (id <- 1L to 4L) {
      assert(m(id).getAs[Boolean]("transcoded"), id.toString)
      assert(m(id).getAs[Long]("malformed_units") === 0L, id.toString)
      assert(m(id).getAs[Long]("utf8_malformed") > 0L, id.toString)
    }
    // the http-equiv form extracts like the html5 form
    assert(m(3L).getAs[String]("charset") === "windows-1251")
    assert(m(3L).getAs[Boolean]("declared"))
  }

  test("malformed bytes: counted as spec error units, replaced, isolated per-row") {
    val m = auditOf(
      (1L, page("<meta charset=\"utf-8\"><p>a ", Array(0xFF.toByte), " ok</p>")),
      (2L, page("<meta charset=\"utf-8\"><p>clean</p>", Array.emptyByteArray, "")))
    assert(m(1L).getAs[Long]("malformed_units") === 1L)
    assert(m(1L).getAs[String]("text").contains("a � ok"))
    assert(!m(1L).getAs[Boolean]("ok"))
    // the bad row did not poison its neighbor
    assert(m(2L).getAs[Long]("malformed_units") === 0L && m(2L).getAs[Boolean]("ok"))
  }

  test("unsupported declared charset: utf-8 fallback, flagged unsupported") {
    val m = auditOf((1L, page("<meta charset=\"x-klingon\"><p>hi</p>",
      Array.emptyByteArray, "")))
    assert(m(1L).getAs[String]("charset") === "x-klingon")
    assert(!m(1L).getAs[Boolean]("supported") && !m(1L).getAs[Boolean]("ok"))
    assert(m(1L).getAs[String]("text").contains("hi"))
  }

  test("no declaration: utf-8 when clean, declared=false") {
    val m = auditOf((1L, page("<p>plain</p>", Array.emptyByteArray, "")))
    assert(m(1L).getAs[String]("charset") === "utf-8")
    assert(!m(1L).getAs[Boolean]("declared") && m(1L).getAs[Boolean]("ok"))
  }

  test("detector ladder pins: each arm chosen on its published-table byte class") {
    def det(bs: Array[Byte]) = Charsets.detectCharset(bs)
    // arm 1: UTF-8 cleanliness is near-proof
    assert(det("pure ascii".getBytes("ISO-8859-1")) === "utf-8")
    assert(det(page("caf", Array(0xC3.toByte, 0xA9.toByte), " ok")) === "utf-8")
    // arm 2: clean SJIS + a 0x81-0x9F/0xE0-0xEF lead present (テ日)
    assert(det(page("<p>", Array(0x83.toByte, 0x65, 0x93.toByte, 0xFA.toByte), "</p>")) === "shift_jis")
    // arm 3: clean cp1251, all high bytes in А-я, adjacent run (Пр)
    assert(det(page("<p>", Array(0xCF.toByte, 0xF0.toByte), "</p>")) === "windows-1251")
    // arm 4 fallbacks: a LONE high byte between ASCII is Latin-1
    // evidence (caf<E9>), as is a stray 0xFF
    assert(det(page("caf", Array(0xE9.toByte), " au lait")) === "iso-8859-1")
    assert(det(page("x ", Array(0xFF.toByte), " y")) === "iso-8859-1")
    // genuinely ambiguous bytes resolve by ladder priority: 0x98 0xC0
    // is a VALID SJIS lead+trail pair (and 0x98 is cp1251-undefined),
    // so the SJIS arm claims it before the Cyrillic arm is consulted
    assert(det(page("", Array(0xC0.toByte, 0x98.toByte, 0xC0.toByte), "")) === "shift_jis")
    // bytes invalid in BOTH sjis (trail 0xFF) and the Cyrillic gate
    // (0x98 < 0xC0) drop to the latin-1 floor
    assert(det(page("", Array(0xC0.toByte, 0x98.toByte, 0xFF.toByte, 0xC0.toByte), "")) === "iso-8859-1")
    // half-width-katakana singles only (0xA1-0xDF, no lead) → too
    // weak for SJIS, fails the А-я gate too → latin-1
    assert(det(page("<p>", Array(0xB1.toByte, 0xB2.toByte), "</p>")) === "iso-8859-1")
  }

  test("undeclared fixture: detection repairs every class to zero malformed units") {
    val audit = Charsets.transcodeAudit(
      Charsets.pagesFromDocs((0L until 42L).toDF("doc_id"), declare = false))
    val rows = audit.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    for (id <- 0L until 42L) {
      val r = rows(id)
      val expCs = id % 6 match {
        case 1 | 4 => "iso-8859-1"; case 2 => "shift_jis"
        case 3 => "windows-1251"; case _ => "utf-8"
      }
      assert(r.getAs[String]("charset") === expCs, id.toString)
      assert(!r.getAs[Boolean]("declared"), id.toString)
      // the whole point: zero damage everywhere — the declared
      // fixture's %6==4 class counted 1 unrepaired unit, the
      // undeclared twin reads the same byte as Latin-1 ÿ
      assert(r.getAs[Long]("malformed_units") === 0L, id.toString)
      assert(r.getAs[Boolean]("ok"), id.toString)
      if (id % 6 == 4) assert(r.getAs[String]("text").contains("ÿ"), id.toString)
    }
  }

  test("fixture classes match their closed forms over a full id cycle") {
    // id%6 × id%7 repeats with period 42: covering 0..41 proves the
    // registered query's closed-form twin for every doc_id at any sf
    val audit = Charsets.transcodeAudit(
      Charsets.pagesFromDocs((0L until 42L).toDF("doc_id")))
    val rows = audit.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    for (id <- 0L until 42L) {
      val r = rows(id)
      val c = id % 6
      val expCs = c match {
        case 1 => "iso-8859-1"; case 2 => "shift_jis"
        case 3 => "windows-1251"; case _ => "utf-8"
      }
      assert(r.getAs[String]("charset") === expCs, id.toString)
      assert(r.getAs[Long]("malformed_units") === (if (c == 4) 1L else 0L), id.toString)
      val expU8 = c match {
        case 1 => 1L; case 2 => 3L; case 3 => 2L; case 4 => 1L; case _ => 0L
      }
      assert(r.getAs[Long]("utf8_malformed") === expU8, id.toString)
    }
    // the pre-damaged class is the ONLY one the composed mojibake
    // screen flags after transcode
    val moji = graft.operators.TextQuality
      .mojibakeScreen(audit.select(col("doc_id"), col("text")))
      .where(col("is_moji")).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(moji === (0L until 42L).filter(_ % 6 == 5).toSet)
  }
}
