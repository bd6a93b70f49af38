package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Legacy-charset repair for the crawl front door — real crawls are
  * ~5-10% ISO-8859-1 / Shift-JIS / GBK / windows-1251, and a naive
  * UTF-8 read of those pages silently shreds them into replacement
  * chars BEFORE any quality gate can see the damage.
  * [[TextQuality.mojibakeScreen]] DETECTS double-encoding damage;
  * this module is the missing repair half: extract the page's
  * DECLARED charset (the `<meta charset=…>` /
  * `http-equiv Content-Type` tag — one regex over the byte-preserving
  * Latin-1 view of the prefix, the standard bootstrap for reading a
  * tag that names its own encoding), decode with the JDK `Charset`
  * machinery under malformed-input ACCOUNTING (the
  * `Jsonl.readAudited` posture applied to encodings: every
  * malformed/unmappable unit is counted and replaced with U+FFFD,
  * never thrown, so one bad byte isolates per-row), and report the
  * naive-UTF-8 damage alongside so "transcode repaired N units" is a
  * grading surface, not a hope.
  *
  * Scale shape: a narrow per-row scalar UDF over the page bytes (no
  * built-in codec exists — same justification class as the JPEG
  * decode UDFs), zero shuffle, zero state; the decode runs where the
  * bytes live and the audit columns are a constant-width projection,
  * so the operator scales with executors exactly like the multimodal
  * decode family. */
object Charsets {

  /** Charset declaration regex — covers `<meta charset="utf-8">` and
    * `<meta http-equiv="Content-Type" content="text/html;
    * charset=iso-8859-1">` (and raw `Content-Type` header lines):
    * everything reduces to the first `charset=` token. Java∩RE2-safe
    * (the twin replays it). */
  val DeclPattern = "(?i)charset\\s*=\\s*[\"']?([A-Za-z0-9_][A-Za-z0-9._\\-]*)"
  private val DeclRe = DeclPattern.r

  /** Decode `bytes` with `cs`, REPLACE-accounting every
    * malformed/unmappable unit: returns (text, bad units). One error
    * unit = one U+FFFD in the output, `CoderResult.length` input
    * bytes skipped — the JDK's own error-unit segmentation, which is
    * the published UTF-8/SJIS/… spec's notion of "one malformed
    * sequence". */
  private[graft] def decodeCounted(bytes: Array[Byte],
                                   cs: java.nio.charset.Charset): (String, Long) = {
    import java.nio.charset.CodingErrorAction
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    val in = java.nio.ByteBuffer.wrap(bytes)
    // ≤ 1 char per input byte for every real charset (a surrogate
    // pair is ≥ 4 input bytes), + slack for replacements at the tail
    val out = java.nio.CharBuffer.allocate(bytes.length + 8)
    var bad = 0L
    var done = false
    while (!done) {
      val cr = if (in.hasRemaining) dec.decode(in, out, true)
               else java.nio.charset.CoderResult.UNDERFLOW
      if (cr.isError) { bad += 1; in.position(in.position() + cr.length); out.put('\uFFFD') }
      else done = true
    }
    dec.flush(out)
    out.flip()
    (out.toString, bad)
  }

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8
  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  /** Transcode audit over raw page bytes: per page, the declared
    * charset (default utf-8 when absent), whether the JRE supports
    * it (unsupported → utf-8 fallback, flagged), the transcoded text
    * with its malformed-unit count, and the malformed-unit count a
    * NAIVE utf-8 read of the same bytes would have suffered — the
    * repair delta. Columns: doc_id, charset, declared, supported,
    * text, malformed_units, utf8_malformed, transcoded (charset was
    * not utf-8), ok (supported ∧ zero damage). A null/undecodable row
    * yields null audit columns, never a failed scan. */
  def transcodeAudit(pages: DataFrame, bytesCol: String = "raw",
                     idCol: String = "doc_id"): DataFrame = {
    val audit = udf((bytes: Array[Byte]) => {
      if (bytes == null) None
      else {
        val prefix = new String(bytes, Latin1) // byte-preserving view
        val declared = DeclRe.findFirstMatchIn(prefix).map(_.group(1))
        val name = declared.getOrElse("utf-8").toLowerCase(java.util.Locale.ROOT)
        val cs = try {
          if (java.nio.charset.Charset.isSupported(name))
            Some(java.nio.charset.Charset.forName(name))
          else None
        } catch { case _: java.nio.charset.IllegalCharsetNameException => None }
        val (text, bad) = decodeCounted(bytes, cs.getOrElse(Utf8))
        val (_, utf8Bad) = decodeCounted(bytes, Utf8)
        Some((name, declared.isDefined, cs.isDefined, text, bad, utf8Bad))
      }
    })
    pages.select(col(idCol).as("doc_id"), audit(col(bytesCol)).as("__a"))
      .select(col("doc_id"),
        col("__a._1").as("charset"), col("__a._2").as("declared"),
        col("__a._3").as("supported"), col("__a._4").as("text"),
        col("__a._5").as("malformed_units"), col("__a._6").as("utf8_malformed"))
      .withColumn("transcoded", col("charset") =!= "utf-8")
      .withColumn("ok", col("supported") && col("malformed_units") === 0)
  }

  /** Deterministic legacy-charset page fixture over a documents
    * relation: six classes of hand-constructed BYTES (ASCII scaffold
    * + planted byte sequences from the published charset tables —
    * 0xE9=é in ISO-8859-1, 0x83 0x65 0x93 0xFA=テ日 in Shift-JIS,
    * 0xCF 0xF0=Пр in windows-1251 — NOT produced by an encoder, so
    * the fixture is independent of the codec under test):
    * id%6 = 0 clean UTF-8 (é + 日 as real UTF-8 bytes), 1 ISO-8859-1,
    * 2 Shift-JIS, 3 windows-1251, 4 declared-utf-8 with one malformed
    * 0xFF byte (per-row isolation class), 5 clean UTF-8 whose CONTENT
    * is pre-damaged mojibake (Ã©) — decodes clean, and the composed
    * mojibakeScreen must still flag it. */
  def pagesFromDocs(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val build = udf((id: Long) => {
      def a(s: String): Array[Byte] = s.getBytes(Latin1) // pure ASCII here
      val m = (id % 7).toString
      val bos = new java.io.ByteArrayOutputStream()
      (id % 6) match {
        case 0 =>
          bos.write(a("<meta charset=\"utf-8\"><p>doc " + m + " caf"))
          bos.write(Array[Byte](0xC3.toByte, 0xA9.toByte, 0x20,
            0xE6.toByte, 0x97.toByte, 0xA5.toByte)) // é + 日 in UTF-8
          bos.write(a("</p>"))
        case 1 =>
          bos.write(a("<meta charset=\"iso-8859-1\"><p>doc " + m + " caf"))
          bos.write(Array[Byte](0xE9.toByte)) // é in Latin-1
          bos.write(a("</p>"))
        case 2 =>
          bos.write(a("<meta charset=\"shift_jis\"><p>doc " + m + " "))
          bos.write(Array[Byte](0x83.toByte, 0x65, 0x93.toByte, 0xFA.toByte)) // テ日
          bos.write(a("</p>"))
        case 3 =>
          bos.write(a("<meta charset=\"windows-1251\"><p>doc " + m + " "))
          bos.write(Array[Byte](0xCF.toByte, 0xF0.toByte)) // Пр
          bos.write(a("</p>"))
        case 4 =>
          bos.write(a("<meta charset=\"utf-8\"><p>doc " + m + " "))
          bos.write(Array[Byte](0xFF.toByte)) // malformed anywhere in UTF-8
          bos.write(a(" ok</p>"))
        case _ =>
          bos.write(a("<meta charset=\"utf-8\"><p>doc " + m + " mal "))
          bos.write(Array[Byte](0xC3.toByte, 0x83.toByte, 0xC2.toByte, 0xA9.toByte)) // Ã© as UTF-8
          bos.write(a(" input</p>"))
      }
      bos.toByteArray
    })
    docs.select(col(idCol).as("doc_id"), build(col(idCol)).as("raw"))
  }
}
