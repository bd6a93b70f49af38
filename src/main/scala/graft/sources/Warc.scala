package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Crawl-record container ingestion (SURVEY.md §2.11 [NS]) — the stage
  * between "real crawl dump" and the extract→dedup→pack chain. A real
  * 100 TB crawl does not arrive as one row per page: it arrives as
  * concatenated record-container files (WARC: a version line, named
  * headers, Content-Length, payload, blank-line terminators — public
  * ISO 28500 shape). The engine must SPLIT containers into (url,
  * fetch_ts, html) records before any page-level operator can run.
  *
  * Two halves, the GVID device (Multimodal.videoFromDocs) applied to
  * crawl records:
  *
  *  - [[containersFromDocs]] builds deterministic container BLOBS
  *    in-engine: per-record strings are pure concat expressions, a
  *    groupBy + sorted collect_list concatenates each container's
  *    records in doc_id order, encode() yields the bytes. No UDF, no
  *    filesystem — the fixture is the data, the oracle rebuilds it
  *    closed-form.
  *  - [[records]] is the operator under test: a per-container record
  *    iterator doing byte-exact Content-Length framing (find the
  *    header's blank line, read the declared payload bytes, expect the
  *    record terminator, repeat). Length framing — never marker
  *    splitting — is what makes a payload that SPELLS the record
  *    header parse correctly (the spec proves it). A scalar UDF by
  *    choice, like the media codecs: it runs once per CONTAINER
  *    (file granularity, embarrassingly parallel), framing is
  *    inherently an imperative cursor loop, and there is no built-in.
  *
  * Malformed input degrades the way real WARC readers do: a truncated
  * final payload is emitted with `truncated = true`; a malformed or
  * unparseable header ends that container's parse (without lengths
  * there is nothing safe to resync on), keeping every record already
  * parsed.
  */
object Warc {

  val RecordMagic = "GRAFT-WARC/1.0"

  /** One parsed crawl record. */
  final case class Rec(url: String, fetch_ts: Long, html: String, truncated: Boolean)

  /** Deterministic per-record gzip (JDK Deflater: MTIME pinned to 0,
    * fixed level — same input bytes → same output bytes, which the
    * hash gate requires of a fixture). */
  private[graft] def gzipBytes(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(b); gz.close()
    bos.toByteArray
  }

  private[graft] def gunzipBytes(b: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b))
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var r = in.read(buf)
    while (r > 0) { bos.write(buf, 0, r); r = in.read(buf) }
    bos.toByteArray
  }

  /** Record BYTES for the fixture side: WARC-shaped header block +
    * payload + blank-line terminator. Content-Length counts payload
    * BYTES after any compression — the real WARC contract (crawl
    * archives ship record-gzipped: each record independently
    * compressed so containers stay splittable at record bounds). With
    * `gzip` the payload is compressed and the header says
    * `Content-Encoding: gzip`. Binary throughout — a gzip payload is
    * not UTF-8. */
  def recordExpr(url: Column, fetchTs: Column, html: Column,
                 gzip: Boolean = false): Column = {
    val payload =
      if (!gzip) encode(html, "UTF-8")
      else udf((s: String) => gzipBytes(s.getBytes(StandardCharsets.UTF_8))).apply(html)
    val encodingHeader = if (gzip) "Content-Encoding: gzip\r\n" else ""
    concat(
      encode(concat(
        lit(RecordMagic + "\r\n"),
        lit("WARC-Target-URI: "), url, lit("\r\n"),
        lit("WARC-Date: "), fetchTs.cast("string"), lit("\r\n"),
        lit(encodingHeader),
        lit("Content-Length: "), length(payload).cast("string"), lit("\r\n"),
        lit("\r\n")), "UTF-8"),
      payload,
      encode(lit("\r\n\r\n"), "UTF-8"))
  }

  /** Deterministic containers: records grouped by `doc_id %
    * nContainers`, concatenated in doc_id order as BYTES. Expects
    * (doc_id, url, fetch_ts, html). */
  def containersFromDocs(pages: DataFrame, nContainers: Int = 8,
                         gzip: Boolean = false): DataFrame =
    pages
      .select((col("doc_id") % nContainers).as("container_id"),
        struct(col("doc_id"),
          recordExpr(col("url"), col("fetch_ts"), col("html"), gzip).as("rec")).as("r"))
      .groupBy(col("container_id"))
      .agg(aggregate(transform(array_sort(collect_list(col("r"))), r => r.getField("rec")),
        lit(Array.emptyByteArray), (acc, x) => concat(acc, x)).as("content"))
      .select(col("container_id"), col("content"))

  /** Byte-cursor record iterator (see object doc for the malformed-
    * input contract). */
  private[graft] def parseRecords(bytes: Array[Byte]): Seq[Rec] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Rec]
    val n = bytes.length
    def blankLine(from: Int): Int = {
      var i = from
      while (i + 3 < n) {
        if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
          bytes(i + 2) == '\r' && bytes(i + 3) == '\n') return i
        i += 1
      }
      -1
    }
    var pos = 0
    while (pos < n) {
      val hEnd = blankLine(pos)
      if (hEnd < 0) pos = n // truncated/absent header: nothing to frame
      else {
        val lines = new String(bytes, pos, hEnd - pos, StandardCharsets.UTF_8).split("\r\n")
        val kv = lines.iterator.drop(1).flatMap { l =>
          val i = l.indexOf(": ")
          if (i < 0) None else Some(l.take(i) -> l.drop(i + 2))
        }.toMap
        val parsed = for {
          _ <- Some(()).filter(_ => lines.headOption.contains(RecordMagic))
          url <- kv.get("WARC-Target-URI")
          ts <- kv.get("WARC-Date").flatMap(_.toLongOption)
          len <- kv.get("Content-Length").flatMap(_.toIntOption).filter(_ >= 0)
        } yield (url, ts, len)
        parsed match {
          case None => pos = n // malformed header: stop, keep prior records
          case Some((url, ts, len)) =>
            // record-level compression (the real crawl-archive layout:
            // each record independently gzipped so containers stay
            // splittable at record bounds); a payload cut mid-stream
            // cannot inflate — best effort is the empty string, still
            // flagged truncated
            val gz = kv.get("Content-Encoding").contains("gzip")
            def payloadStr(off: Int, l: Int): String =
              if (!gz) new String(bytes, off, l, StandardCharsets.UTF_8)
              else try new String(
                gunzipBytes(java.util.Arrays.copyOfRange(bytes, off, off + l)),
                StandardCharsets.UTF_8)
              catch { case _: java.io.IOException | _: java.lang.ArrayIndexOutOfBoundsException => "" }
            val start = hEnd + 4
            val avail = n - start
            if (avail < len) { // truncated payload: emit what exists, flagged
              out += Rec(url, ts, payloadStr(start, math.max(avail, 0)), truncated = true)
              pos = n
            } else {
              out += Rec(url, ts, payloadStr(start, len), truncated = false)
              val after = start + len
              // record terminator must follow; anything else is
              // malformed framing and ends the parse
              pos = if (after + 4 <= n && bytes(after) == '\r' && bytes(after + 1) == '\n' &&
                bytes(after + 2) == '\r' && bytes(after + 3) == '\n') after + 4
              else n
            }
        }
      }
    }
    out.toSeq
  }

  /** Split a container table into records: one row per successfully
    * framed record, with `truncated` marking a cut-short final
    * payload. */
  def records(containers: DataFrame, contentCol: String = "content"): DataFrame = {
    val parse = udf((b: Array[Byte]) => parseRecords(b))
    containers
      .select(explode(parse(col(contentCol))).as("r"))
      .select(col("r.url").as("url"), col("r.fetch_ts").as("fetch_ts"),
        col("r.html").as("html"), col("r.truncated").as("truncated"))
  }
}
