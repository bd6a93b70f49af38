package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Markdown

/** Fenced-code-block extraction: grammar pins (labeled/unlabeled/
  * adjacent/multi-line blocks), the unclosed-fence non-swallow
  * guarantee, the parity audit, and the extractor↔audit cross-check
  * on the fixture classes. */
class MarkdownSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def blocksOf(text: String) =
    Markdown.extractCodeBlocks(Seq((1L, text)).toDF("doc_id", "text"))
      .orderBy("block_idx").collect()
      .map(r => (r.getAs[Long]("block_idx"), r.getAs[String]("lang_tag"),
        r.getAs[String]("code"), r.getAs[Long]("code_lines")))

  test("labeled, unlabeled, and adjacent blocks extract in document order") {
    val got = blocksOf(
      "intro\n```python\na = 1\nb = 2\n```\nmid\n```\nplain\n```\n```scala\nval z = 9\n```\ntail")
    assert(got === Array(
      (1L, "python", "a = 1\nb = 2", 2L),
      (2L, "", "plain", 1L),
      (3L, "scala", "val z = 9", 1L)))
  }

  test("an unclosed trailing fence matches nothing — the page tail is never swallowed") {
    val got = blocksOf("```python\nok = 1\n```\nprose\n```js\ntruncated here")
    assert(got.length === 1 && got(0)._2 === "python" && got(0)._3 === "ok = 1")
  }

  test("code containing single backticks and colons is preserved verbatim") {
    val got = blocksOf("```sh\necho `date`: now\n```")
    assert(got === Array((1L, "sh", "echo `date`: now", 1L)))
  }

  test("fenceAudit: parity flags the unclosed class; marks == 2*blocks when balanced") {
    val a = Markdown.fenceAudit(Seq(
      (1L, "```py\nx\n```\n```\ny\n```"),         // 2 blocks, 4 marks
      (2L, "```py\nx\n```\n```js\nunterminated"), // 1 block, 3 marks
      (3L, "no fences at all")).toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_blocks"), r.getAs[Long]("fence_marks"),
          r.getAs[Boolean]("unclosed"))).toMap
    assert(a(1L) === ((2L, 4L, false)))
    assert(a(2L) === ((1L, 3L, true)))
    assert(a(3L) === ((0L, 0L, false)))
  }

  test("real-world fences: CRLF, info strings, non-word tags, empty bodies all close") {
    assert(blocksOf("```python\r\na = 1\r\nb = 2\r\n```") ===
      Array((1L, "python", "a = 1\r\nb = 2", 2L)))
    assert(blocksOf("```python title=x linenos\nz = 1\n```") ===
      Array((1L, "python", "z = 1", 1L)))
    assert(blocksOf("```c#\nvar x = 1;\n```") ===
      Array((1L, "c#", "var x = 1;", 1L)))
    assert(blocksOf("pre\n```\n```\npost") === Array((1L, "", "", 1L)))
  }

  test("tilde fences extract like backtick fences, and the kinds don't cross-close") {
    assert(blocksOf("~~~yaml\nkey: v\n~~~\nprose\n~~~\nplain\n~~~") ===
      Array((1L, "yaml", "key: v", 1L), (2L, "", "plain", 1L)))
    // a ``` line inside a ~~~ block is CONTENT, and vice versa
    assert(blocksOf("~~~md\nexample:\n```py\nx = 1\n```\n~~~") ===
      Array((1L, "md", "example:\n```py\nx = 1\n```", 4L)))
    assert(blocksOf("```md\n~~~\nnot a fence\n~~~\n```") ===
      Array((1L, "md", "~~~\nnot a fence\n~~~", 3L)))
    // an unclosed tilde fence swallows nothing
    assert(blocksOf("~~~yaml\ndangling").isEmpty)
  }

  test("line anchoring: an inline ``` in prose opens nothing and counts no marker") {
    assert(blocksOf("use ``` to fence\n```py\nx\n```") ===
      Array((1L, "py", "x", 1L)))
    val a = Markdown.fenceAudit(Seq(
      (1L, "a ``` mid-line and ~~~ too\n```py\nx\n```")).toDF("doc_id", "text"))
      .collect().map(r => (r.getAs[Long]("n_blocks"),
        r.getAs[Long]("fence_marks"), r.getAs[Boolean]("unclosed"))).head
    assert(a === ((1L, 2L, false)))
  }

  test("a closing fence sits alone on its line: ```info inside a block is not a closer") {
    // CommonMark: a line-start ```scala inside an open block cannot
    // close it — the block runs to the next bare fence
    assert(blocksOf("```py\nx\n```scala\ny\n```\ntail") ===
      Array((1L, "py", "x\n```scala\ny", 3L)))
    // trailing blanks after the closer are legal
    assert(blocksOf("```py\nx\n```  \ntail") === Array((1L, "py", "x", 1L)))
    // a closer at end-of-document without a newline closes
    assert(blocksOf("```py\nx\n```") === Array((1L, "py", "x", 1L)))
  }

  test("per-kind parity: a dangling ``` is never cleared by a balanced ~~~ pair") {
    val a = Markdown.fenceAudit(Seq(
      (1L, "```py\nx\n~~~\ny\n~~~"),          // bt 1 (odd), td 2 (even)
      (2L, "~~~\na\n~~~\n```\nb\n```")).toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_blocks"), r.getAs[Long]("fence_marks"),
          r.getAs[Boolean]("unclosed"))).toMap
    // doc 1: the ```py opener swallows nothing, the ~~~ pair INSIDE
    // it... is not inside anything — ```py is unclosed, so the ~~~
    // block is free-standing and extracts
    assert(a(1L) === ((1L, 3L, true)))
    assert(a(2L) === ((2L, 4L, false)))
  }

  test("langConsistency: evidence-based mismatch, ties and zero evidence stay unflagged") {
    val blocks = Seq(
      (1L, 1L, "python", "print(1)\nlambda x: x"),   // consistent
      (2L, 1L, "scala", "print(42)"),                // mislabeled → mismatch
      (3L, 1L, "", "val x = 1"),                     // unlabeled: guess, no flag
      (4L, 1L, "python", "y = 1"),                   // zero evidence: no flag
      (5L, 1L, "js", "const f = (x) => x"),          // consistent js
      (6L, 1L, "rust", "print(9)")                   // unrecognized tag: no flag
    ).toDF("doc_id", "block_idx", "lang_tag", "code")
    val got = Markdown.langConsistency(blocks).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("guessed"), r.getAs[Boolean]("mismatch"))).toMap
    assert(got(1L) === (("python", false)))
    assert(got(2L) === (("python", true)))
    assert(got(3L) === (("scala", false)))
    assert(got(4L) === (("", false)))
    assert(got(5L) === (("js", false)))
    assert(got(6L) === (("python", false)))
  }

  test("fixture classes: extractor and audit agree across 124 ids") {
    val docs = (0L until 124L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi")).toDF("doc_id", "text")
    val md = Markdown.mdFromDocs(docs)
    val audit = Markdown.fenceAudit(md).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val blocks = Markdown.extractCodeBlocks(md).collect()
      .groupBy(_.getAs[Long]("doc_id")).view.mapValues(_.length).toMap
    (0L until 124L).foreach { i =>
      val expBlocks = (if (i % 4 != 3) 1 else 0) + (if (i % 19 == 0) 1 else 0)
      assert(audit(i).getAs[Long]("n_blocks") === expBlocks.toLong, s"doc $i")
      assert(blocks.getOrElse(i, 0) === expBlocks, s"doc $i blocks")
      assert(audit(i).getAs[Boolean]("unclosed") === (i % 31 == 0 || i % 41 == 0),
        s"doc $i parity")
      assert(audit(i).getAs[Long]("fence_marks") ===
        2L * expBlocks + (if (i % 31 == 0) 1L else 0L) + (if (i % 41 == 0) 1L else 0L),
        s"doc $i marks")
    }
  }
}
