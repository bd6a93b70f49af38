package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-cleaning / PII-redaction operators for corpus curation
  * (SURVEY.md §2.11 [NS]). A production training-data build scrubs
  * markup and contact details BEFORE dedup/quality so near-identical
  * pages collapse and no address survives into the training set.
  *
  * Every transform here is a narrow, zero-shuffle projection built
  * from codegen'd regexp expressions — it scales linearly and fuses
  * into whatever scan precedes it. The regexes are deliberately kept
  * inside the RE2-compatible subset (no backrefs, no lookaround) so
  * the DuckDB oracle evaluates the identical pattern.
  */
object Cleaning {

  /** Email addresses (conservative: no quoted local parts). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** http/https URLs up to the next whitespace. */
  val UrlRe = "https?://[^\\s]+"

  /** C0 control characters + DEL (tab/newline are handled by the
    * whitespace collapse, but stray NUL/VT/escape bytes in scraped
    * text must not survive into training data). */
  val CtrlRe = "[\\x00-\\x08\\x0b-\\x1f\\x7f]"

  /** SGML/HTML tags: anything between angle brackets with no nested
    * '<' — the standard tag-stripping approximation (comments and
    * CDATA degrade to their inner text, never to markup). */
  val TagRe = "<[^<>]*>"

  /** Strip markup: drop tags, then decode the five predefined XML
    * entities. Entity decode runs AFTER tag removal, so text that
    * spells out markup (`&lt;b&gt;`) decodes to visible text and is
    * never re-interpreted as a tag. */
  def stripMarkup(c: Column): Column = {
    val noTags = regexp_replace(c, TagRe, " ")
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
        "&amp;" -> "&") // amp LAST: "&amp;lt;" must yield "&lt;", not "<"
      .foldLeft(noTags) { case (acc, (e, ch)) => regexp_replace(acc, e, ch) }
  }

  /** Redact URLs then emails (URLs first — a userinfo URL contains an
    * '@' and must be swallowed whole, not half-matched as an email). */
  def redact(c: Column): Column =
    regexp_replace(regexp_replace(c, UrlRe, "<URL>"), EmailRe, "<EMAIL>")

  /** Collapse whitespace runs to one space and trim the ends; strip
    * control characters first so they can't glue tokens together. */
  def normalizeWhitespace(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, CtrlRe, " "), "\\s+", " "))

  /** Full cleaning pass: markup strip → URL/email redaction →
    * control-char strip + whitespace collapse, with match counts kept
    * as per-document curation features. Emails are counted on the
    * URL-redacted text, so the counts agree exactly with what the
    * clean text had redacted (a userinfo URL's embedded address is a
    * URL, not an email). Output: doc_id, n_urls, n_emails, clean. */
  def clean(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val unmarked = stripMarkup(col(textCol))
    val noUrls = regexp_replace(unmarked, UrlRe, "<URL>")
    docs.select(
      col(idCol).as("doc_id"),
      size(regexp_extract_all(unmarked, lit(UrlRe), lit(0))).cast(LongType).as("n_urls"),
      size(regexp_extract_all(noUrls, lit(EmailRe), lit(0))).cast(LongType).as("n_emails"),
      normalizeWhitespace(regexp_replace(noUrls, EmailRe, "<EMAIL>")).as("clean"))
  }
}
