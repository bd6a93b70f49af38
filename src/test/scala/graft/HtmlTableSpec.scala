package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Html

/** HTML table lifting: nested extraction grammar (tables → rows →
  * th/td cells), header ordering, multi-table indexing, the ragged
  * flag, and fixture-class agreement. */
class HtmlTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cellsOf(html: String) =
    Html.extractTables(Seq((1L, html)).toDF("doc_id", "html"))
      .orderBy("table_idx", "row_idx", "col_idx").collect()
      .map(r => (r.getAs[Long]("table_idx"), r.getAs[Long]("row_idx"),
        r.getAs[Long]("col_idx"), r.getAs[Boolean]("is_header"),
        r.getAs[String]("cell")))

  test("header and data rows lift with 1-based coordinates") {
    val got = cellsOf(
      "<p>pre</p><table><tr><th>name</th><th>age</th></tr>" +
        "<tr><td>ada</td><td>36</td></tr></table><p>post</p>")
    assert(got === Array(
      (1L, 1L, 1L, true, "name"), (1L, 1L, 2L, true, "age"),
      (1L, 2L, 1L, false, "ada"), (1L, 2L, 2L, false, "36")))
  }

  test("two tables index in document order; cells never leak across tables") {
    val got = cellsOf(
      "<table><tr><td>a</td></tr></table>mid<table><tr><td>b</td><td>c</td></tr></table>")
    assert(got === Array(
      (1L, 1L, 1L, false, "a"),
      (2L, 1L, 1L, false, "b"), (2L, 1L, 2L, false, "c")))
  }

  test("a mixed th/td row orders header cells first; pages without tables emit nothing") {
    val got = cellsOf("<table><tr><th>h</th><td>d</td></tr></table>")
    assert(got === Array((1L, 1L, 1L, true, "h"), (1L, 1L, 2L, false, "d")))
    assert(cellsOf("<p>no tables here</p>").isEmpty)
  }

  test("real-crawl markup: attributes, mixed case, and whitespaced closers lift (VERDICT r16 #3)") {
    val got = cellsOf(
      """<TABLE CLASS="wikitable" border=1><TR ALIGN=left><TH scope=col>name</TH><th>age</th></TR>""" +
        """<tr id="r2"><TD colspan=2>ada</TD><td class="num">36</td></tr ></TABLE >""")
    assert(got === Array(
      (1L, 1L, 1L, true, "name"), (1L, 1L, 2L, true, "age"),
      (1L, 2L, 1L, false, "ada"), (1L, 2L, 2L, false, "36")))
  }

  test("tag-name word boundary: <thead>/<tdata>-style tags never match as th/td") {
    val got = cellsOf(
      "<table><thead><tr><th>h</th></tr></thead><tbody><tr><td>d</td></tr></tbody></table>")
    assert(got === Array((1L, 1L, 1L, true, "h"), (1L, 2L, 1L, false, "d")))
  }

  test("nested table policy: inner </table> ends the outer capture (non-nesting grammar)") {
    val got = cellsOf(
      "<table><tr><td>outer</td></tr><table><tr><td>inner</td></tr></table></table>")
    // the outer capture runs to the FIRST </table>, so both rows land
    // in table 1 — documented flattening, not silent loss
    assert(got === Array((1L, 1L, 1L, false, "outer"), (1L, 2L, 1L, false, "inner")))
  }

  test("tableShapes: ragged rows flagged, header detected, counts exact") {
    val cells = Html.extractTables(Seq(
      (1L, "<table><tr><th>k</th><th>v</th></tr><tr><td>a</td><td>1</td></tr><tr><td>short</td></tr></table>"),
      (2L, "<table><tr><td>x</td><td>y</td></tr><tr><td>z</td><td>w</td></tr></table>"))
      .toDF("doc_id", "html"))
    val got = Html.tableShapes(cells).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_cols"),
          r.getAs[Boolean]("has_header"), r.getAs[Boolean]("ragged"))).toMap
    assert(got(1L) === ((3L, 2L, true, true)))
    assert(got(2L) === ((2L, 2L, false, false)))
  }

  test("fixture classes: no-table, ragged, and second-table ids land as planted") {
    val docs = (0L until 124L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val shapes = Html.tableShapes(Html.extractTables(Html.tablesFromDocs(docs)))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("table_idx")) -> r).toMap
    assert(!shapes.contains((31L, 2L)) && shapes.contains((31L, 1L)) === (31 % 19 == 0))
    assert(shapes((11L, 1L)).getAs[Boolean]("ragged"))
    assert(!shapes((1L, 1L)).getAs[Boolean]("ragged"))
    assert(shapes.contains((19L, 2L)) && !shapes((19L, 2L)).getAs[Boolean]("has_header"))
    assert(shapes((0L, 1L)).getAs[Long]("n_rows") === 1L) // %31: only the appended table
    assert(shapes((1L, 1L)).getAs[Long]("n_rows") === 3L)
  }
}
