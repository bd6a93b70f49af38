package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Html

/** Boilerplate extraction: block splitting, link-density gating,
  * entity round trips, malformed/nested markup, and the lossless
  * page-fixture inversion the html_extract oracle relies on. */
class HtmlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pages(htmls: String*) =
    htmls.zipWithIndex.map { case (h, i) => (i.toLong, h) }.toDF("doc_id", "html")

  private def extract(html: String,
                      minLen: Int = 1, num: Int = 1, den: Int = 3): (Long, Long, String) = {
    val r = Html.extractMain(pages(html), minLen = minLen, densityNum = num, densityDen = den)
      .collect().head
    (r.getLong(1), r.getLong(2), r.getString(3))
  }

  test("prose kept, link-dense chrome dropped") {
    val html = "<nav><a href=\"/\">Home</a> <a href=\"/x\">About us</a></nav>" +
      "<p>real content words here</p>" +
      "<footer><a href=\"#\">Terms</a></footer>"
    val (nBlocks, nKept, text) = extract(html)
    assert(nBlocks === 3L)
    assert(nKept === 1L)
    assert(text === "real content words here")
  }

  test("mixed block: moderate link density passes the 1/3 gate") {
    // one 4-char anchor inside 30+ chars of prose: alen*3 <= len
    val html = "<p>read the <a href=\"/d\">docs</a> for all further details</p>"
    val (_, nKept, text) = extract(html)
    assert(nKept === 1L)
    assert(text === "read the docs for all further details")
  }

  test("minLen gate drops short blocks") {
    val html = "<p>ok</p><p>a much longer paragraph of text</p>"
    val (nBlocks, nKept, text) = extract(html, minLen = 10)
    assert(nBlocks === 2L)
    assert(nKept === 1L)
    assert(text === "a much longer paragraph of text")
  }

  test("nested inline markup inside a block is stripped to spaces") {
    val html = "<p>one <b>two <i>three</i></b> four</p>"
    assert(extract(html)._3 === "one two three four")
  }

  test("malformed: unclosed tags and stray '<' degrade to text, never markup") {
    // '<oops' has no closing '>' before the next '<' tag, so the
    // standard tag-strip approximation leaves it as visible text
    val html = "<p>before <oops after</p>"
    assert(extract(html)._3 === "before <oops after")
  }

  test("entities decode after tag strip: spelled-out markup stays text") {
    val html = "<p>&lt;b&gt;not bold&lt;/b&gt; &amp;amp; stays</p>"
    assert(extract(html)._3 === "<b>not bold</b> &amp; stays")
  }

  test("escape/unescape round-trips the five entities") {
    val tricky = "a<b & c>\"d\" 'e' &amp;lt;"
    val df = Seq(tricky).toDF("t")
      .select(Html.unescapeHtml(Html.escapeHtml(col("t"))).as("rt"))
    assert(df.collect().head.getString(0) === tricky)
  }

  test("entity decoder: named, decimal, hex, supplementary, invalid, unknown") {
    val cases = Seq(
      "a&nbsp;b" -> "a\u00a0b",
      "caf&eacute; fa&ccedil;ade" -> "café façade",
      "r&#111;w" -> "row",
      "it&#x2019;s &#X2014;" -> "it’s —", // both hex markers
      "&#x1F600;" -> new String(Character.toChars(0x1F600)), // 4-byte UTF-8
      "&mdash;&hellip;&frac12;&euro;" -> "—…½€",
      // unknown name, too-short name, too-long name: all literal
      "&unknown; &q;x &notarealentityname;" -> "&unknown; &q;x &notarealentityname;",
      // invalid codepoints stay literal: zero, surrogate, past max
      "&#0; &#xD800; &#1114112;" -> "&#0; &#xD800; &#1114112;",
      // one-pass: the decoded '&' of &amp; is never rescanned
      "&amp;#65; &amp;nbsp; &amp;amp;" -> "&#65; &nbsp; &amp;",
      "" -> "")
    val got = cases.map(_._1).zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("i", "t").select(col("i"), Html.unescapeHtml(col("t")).as("d"))
      .orderBy("i").collect().map(_.getString(1))
    cases.map(_._2).zip(got).zipWithIndex.foreach { case ((want, g), i) =>
      assert(g === want, s"case $i")
    }
  }

  test("entity fixture paragraph decodes to its published constant") {
    val got = Seq(Html.EntityFixtureRaw).toDF("h")
      .select(Html.unescapeHtml(regexp_replace(col("h"), "<[^<>]*>", " ")).as("d"))
      .select(trim(regexp_replace(col("d"), "\\s+", " ")).as("d"))
      .collect().head.getString(0)
    assert(got === Html.EntityFixtureDecoded)
  }

  test("page fixture inverts: extract(pageFromDocs(docs)) == collapsed text") {
    val texts = Seq(
      "plain words only",
      "  leading   and   trailing   whitespace  collapse   ",
      "doc that spells <p>markup</p> & entities &lt;x&gt;",
      "",
      ("w" + (1 to 30).mkString(" w")), // multiple paragraphs
      "tab\tand\nnewline separated")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Html.extractMain(Html.pageFromDocs(docs)).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    texts.zipWithIndex.foreach { case (t, i) =>
      val ws = t.split("\\s+").filter(_.nonEmpty)
      val nPara = (ws.length + 11) / 12
      val (_, nBlocks, nKept, text) = got(i)
      assert(nBlocks === nPara + 3L, s"doc $i n_blocks")
      assert(nKept === nPara.toLong, s"doc $i n_kept")
      assert(text === ws.mkString(" "), s"doc $i text")
    }
  }

  test("script/style bodies and comments vanish entirely — even with markup inside") {
    val html = "<script>var x = '<p>fake</p>'; f();</script>" +
      "<style>p { color: blue }</style>" +
      "<!-- hidden <p>comment content</p> -->" +
      "<p>only real prose survives</p>"
    val (nBlocks, nKept, text) = extract(html)
    assert(nBlocks === 1L)
    assert(nKept === 1L)
    assert(text === "only real prose survives")
  }

  test("unterminated script degrades to tag-strip, not to swallowing the page") {
    val html = "<script>var x = 1; <p>after the unterminated script</p>"
    // no </script>: the container regex cannot match, so the script
    // TAG strips like any tag and its body text remains — the standard
    // malformed-markup degradation (never drops trailing real content)
    val (_, _, text) = extract(html)
    assert(text.endsWith("after the unterminated script"))
  }

  test("uppercase tags split and strip like lowercase (case-insensitive regexes)") {
    val html = "<NAV><A HREF=\"/\">Home</A></NAV><P>upper case prose here</P>"
    val (nBlocks, nKept, text) = extract(html)
    assert(nBlocks === 2L)
    assert(nKept === 1L)
    assert(text === "upper case prose here")
  }

  test("outlinks: /doc hrefs extracted, self-loops dropped, parallel links deduped") {
    val html = "<nav><a href=\"/\">Home</a> <a href=\"/doc/7\">A</a> " +
      "<a href=\"/doc/7\">again</a> <a href=\"/DOC/9\">caps path matches too</a>" +
      "<a href=\"/doc/3\">B</a> <a href=\"/doc/1\">self</a></nav>"
    val got = Html.outlinks(pages(html).withColumnRenamed("doc_id", "doc_id"))
    // page doc_id = 0 (pages() zips from 0); self would be /doc/0
    val edges = got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges === Set((0L, 7L), (0L, 3L), (0L, 1L), (0L, 9L)))
  }

  test("fixture graph: outlinks(pageFromDocs) == closed-form targets") {
    val docs = Seq((0L, "x"), (1L, "y"), (41L, "z")).toDF("doc_id", "text")
    val got = Html.outlinks(Html.pageFromDocs(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Seq(0L, 1L, 41L).flatMap { id =>
      Seq((id * 7 + 3) % 1000, (id * 13 + 5) % 1000, (id + 1) % 1000)
        .filter(_ != id).map(d => (id, d))
    }.toSet
    assert(got === want)
  }

  test("urlNormalize: resolution + canonicalization matrix") {
    val base = "https://Site1.Example.COM:443/a/b/page?q=1"
    val cases = Seq(
      "HTTP://Other.COM:80/X/Y#frag" -> "http://other.com/X/Y", // path case preserved
      "https://h.com:443/p" -> "https://h.com/p",
      "https://h.com:8080/p" -> "https://h.com:8080/p", // non-default port kept
      "//cdn.com/lib.js" -> "https://cdn.com/lib.js",
      "/root/x?a=b#c" -> "https://site1.example.com/root/x?a=b",
      "rel/x" -> "https://site1.example.com/a/b/rel/x",
      "../up" -> "https://site1.example.com/a/up",
      "../../up2" -> "https://site1.example.com/up2",
      "../../../over" -> "https://site1.example.com/over", // above root: residue dropped
      "./here" -> "https://site1.example.com/a/b/here",
      "x/./y" -> "https://site1.example.com/a/b/x/y",
      // empty / fragment-only hrefs resolve to the base page (query
      // dropped — the normalized form is a fetch key, not a replay)
      "" -> "https://site1.example.com/a/b/page",
      "#frag" -> "https://site1.example.com/a/b/page")
    val got = cases.map(_._1).zipWithIndex.map { case (u, i) => (i, u) }.toDF("i", "u")
      .select(col("i"), Html.urlNormalize(col("u"), lit(base)).as("n"))
      .orderBy("i").collect().map(_.getString(1))
    cases.map(_._2).zip(got).zipWithIndex.foreach { case ((want, g), i) =>
      assert(g === want, s"case $i (${cases(i)._1})")
    }
  }

  test("registeredDomain: plain and multi-label public suffixes") {
    val cases = Seq(
      "site3.shop.example.co.uk" -> "example.co.uk",
      "a.b.example.com" -> "example.com",
      "example.com" -> "example.com",
      "localhost" -> "localhost",
      "EXAMPLE.COM:8080" -> "example.com",
      "www.gov.uk" -> "www.gov.uk") // gov.uk as last-2 → take 3; only 2 labels + www
    val got = cases.map(_._1).zipWithIndex.map { case (u, i) => (i, u) }.toDF("i", "h")
      .select(col("i"), Html.registeredDomain(col("h")).as("s"))
      .orderBy("i").collect().map(_.getString(1))
    cases.map(_._2).zip(got).zipWithIndex.foreach { case ((want, g), i) =>
      assert(g === want, s"case $i (${cases(i)._1})")
    }
  }

  test("stripTrackingParams: strip set, param sort, empty-query collapse") {
    val cases = Seq(
      // tracking stripped, survivors SORTED
      "https://h.com/p?page=2&utm_source=x&a=1" -> "https://h.com/p?a=1&page=2",
      "https://h.com/p?b=2&a=1" -> "https://h.com/p?a=1&b=2",
      // all-tracking query drops its '?'
      "https://h.com/p?utm_campaign=c&gclid=g1&fbclid=f" -> "https://h.com/p",
      // no query unchanged; lone '?' drops
      "https://h.com/p" -> "https://h.com/p",
      "https://h.com/p?" -> "https://h.com/p",
      // a bare flag param (no '=') is NOT a tracking param — kept
      "https://h.com/p?debug&utm_source=x" -> "https://h.com/p?debug",
      // utm must be a KEY prefix: a value mentioning utm_ survives
      "https://h.com/p?q=utm_source" -> "https://h.com/p?q=utm_source")
    val got = cases.map(_._1).zipWithIndex.map { case (u, i) => (i, u) }.toDF("i", "u")
      .select(col("i"), Html.stripTrackingParams(col("u")).as("n"))
      .orderBy("i").collect().map(_.getString(1))
    cases.map(_._2).zip(got).zipWithIndex.foreach { case ((want, g), i) =>
      assert(g === want, s"case $i (${cases(i)._1})")
    }
  }

  test("blocklistFilter: suffix-chain match, longest-prefix pick, allowed pass-through") {
    val urls = Seq(
      "https://www.example.com/a/1",          // blocked: suffix rule example.com
      "https://notexample.com/a/1",           // allowed: dot-boundary, not substring
      "https://other.org/a/1",                // allowed: no rule
      "https://a.com/p1",                     // blocked: /p beats whole-domain rule
      "https://a.com/q",                      // blocked: whole-domain rule
      "https://s3.shop.example.co.uk/x/7",    // blocked: deep suffix + prefix
      "https://s3.shop.example.co.uk/y"       // allowed: prefix /x misses
    ).toDF("url")
    val rules = Seq(
      ("example.com", ""), ("a.com", ""), ("a.com", "/p"),
      ("shop.example.co.uk", "/x")).toDF("host", "prefix")
    val got = Html.blocklistFilter(urls, rules)
      .collect().map(r => r.getString(0) -> ((r.getBoolean(1), r.getString(2), r.getString(3))))
      .toMap
    assert(got("https://www.example.com/a/1") === ((true, "example.com", "")))
    assert(got("https://notexample.com/a/1") === ((false, "", "")))
    assert(got("https://other.org/a/1") === ((false, "", "")))
    assert(got("https://a.com/p1") === ((true, "a.com", "/p")))
    assert(got("https://a.com/q") === ((true, "a.com", "")))
    assert(got("https://s3.shop.example.co.uk/x/7") === ((true, "shop.example.co.uk", "/x")))
    assert(got("https://s3.shop.example.co.uk/y") === ((false, "", "")))
  }

  test("outlinksFull over the URL fixture: host edges equal the closed-form map") {
    val docs = (0L to 9L).map(i => (i, "x")).toDF("doc_id", "text")
    val pages = Html.urlPageFromDocs(docs)
    val hostEdges = Html.outlinksFull(pages)
      .select(Html.urlHost(col("src_url")).as("a"), Html.urlHost(col("dst_url")).as("b"))
      .where(col("a") =!= col("b")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    def host(k: Long): String =
      if (k % 3 == 0) s"site$k.shop.example.co.uk" else s"site$k.example.com"
    val want = (0L to 9L).map { id =>
      (host(id % 50), host(((id * 7 + 3) % 1000) % 50))
    }.filter(p => p._1 != p._2).toSet
    assert(hostEdges === want)
  }

  test("plan shape: page build + extraction is narrow past ONE deliberate fan-out exchange") {
    // pageFromDocs fans its input to defaultParallelism before page
    // assembly (optimization r17: the documents table is one scan task
    // otherwise, serializing the whole regex chain) — so the pinned
    // shape is exactly ONE exchange, and it must be the explicit
    // repartition, not a join/aggregate shuffle that crept in.
    val docs = Seq((0L, "a b c")).toDF("doc_id", "text")
    val df = Html.extractMain(Html.pageFromDocs(docs))
    assert(graft.plans.Bucketing.shuffleExchangeCount(df) === 1,
      df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode))
    assert(df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
      .contains("REPARTITION_BY_NUM"))
  }

  test("empty doc page still shows the 3 chrome blocks, extracts nothing") {
    val docs = Seq((0L, "")).toDF("doc_id", "text")
    val r = Html.extractMain(Html.pageFromDocs(docs)).collect().head
    assert(r.getLong(1) === 3L && r.getLong(2) === 0L && r.getString(3) === "")
  }

  test("politeSchedule: one fetch per host per wave, priority-ordered slots, tie by url") {
    val frontier = Seq(
      (101L, 9L, 1L), (102L, 8L, 1L), (103L, 7L, 1L), // host 1: three urls
      (201L, 10L, 2L),                                // host 2: one
      (301L, 5L, 3L), (302L, 5L, 3L)                  // host 3: score tie -> url asc
    ).toDF("dst", "n_inlinks", "host")
    val got = Html.politeSchedule(frontier).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    // wave = per-host rank: no host fetched twice in a wave
    assert(got(201L) === ((1L, 1L)) && got(101L) === ((1L, 2L)) && got(301L) === ((1L, 3L)))
    assert(got(102L) === ((2L, 1L)) && got(302L) === ((2L, 2L)))
    assert(got(103L) === ((3L, 1L)))
    // determinism under repartitioning
    val again = Html.politeSchedule(frontier.repartition(5)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(again === got)
  }

  test("metaRobots: directive parsed case-blind; absent tag means index+follow; 'index' is not 'noindex'") {
    import spark.implicits._
    val pages = Seq(
      (1L, "<html><head><meta name=\"robots\" content=\"NOINDEX, NOFOLLOW\"></head><body>x</body></html>"),
      (2L, "<html><head><META name=\"robots\" content=\"noindex\"><title>t</title></head><body>x</body></html>"),
      (3L, "<html><head><meta name=\"robots\" content=\"index, follow\"></head><body>x</body></html>"),
      (4L, "<html><head><title>no directive</title></head><body>x</body></html>")
    ).toDF("doc_id", "html")
    val got = Html.metaRobots(pages).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(got(1L) === (("noindex, nofollow", true, true)))
    assert(got(2L) === (("noindex", true, false)))
    // the \b guard: "index, follow" contains "index" but NOT "noindex"
    assert(got(3L) === (("index, follow", false, false)))
    assert(got(4L) === (("", false, false)))
  }
}
