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
      assert(audit(i).getAs[Boolean]("unclosed") === (i % 31 == 0), s"doc $i parity")
      assert(audit(i).getAs[Long]("fence_marks") ===
        2L * expBlocks + (if (i % 31 == 0) 1L else 0L), s"doc $i marks")
    }
  }
}
