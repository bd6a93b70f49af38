package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Markdown structure extraction for code-LLM data pipelines — fenced
  * code blocks are the highest-value spans in a web/docs corpus for a
  * code model, and extracting them (with their language tags) is a
  * front-door operation: route ```python blocks to the code pipeline,
  * keep prose for text, flag documents whose fences don't balance
  * (truncated pages shear mid-block, and an unclosed fence swallows
  * the rest of the page if the extractor is naive).
  *
  * Scale shape: both operators are narrow per-row regex/replace
  * projections (codegen'd — `regexp_extract_all` + `posexplode`,
  * zero UDF, zero shuffle); the per-block relation is produced where
  * the page bytes live, so the extractor scales with executors like
  * the rest of the text front door. The fence regex stays in the
  * Java∩RE2 intersection ((?s) + non-greedy — no lookaround), so an
  * engine swap cannot change what a block IS. */
object Markdown {

  /** Fenced block grammar: ```info\n code \n``` — group 1 the
    * (possibly empty) info string up to end-of-line (CRLF tolerated,
    * any character legal — real-world tags like `c#` and info strings
    * like `python title=x` both parse), group 2 the code body (its
    * trailing newline optional, so fence-newline-fence empty blocks
    * close too), non-greedy so adjacent blocks never
    * merge and an UNCLOSED trailing fence matches nothing (the
    * audit's parity check catches it instead of the extractor
    * swallowing the page tail). */
  val FencePattern = "(?s)```([^\\r\\n]*)\\r?\\n(.*?)(?:\\r?\\n)?```"

  /** Per-block extraction: (doc_id, block_idx 1-based in document
    * order, lang_tag — the info string's FIRST token, '' when the
    * fence is unlabeled — code, code_lines, code_chars). One
    * full-text regex pass (group 0), then per-block group extraction
    * over the small matched strings. Documents without a closed
    * block emit no rows; the document-level view is [[fenceAudit]]. */
  def extractCodeBlocks(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol).cast(LongType).as("doc_id"),
        posexplode(expr(s"regexp_extract_all($textCol, '$FencePattern', 0)"))
          .as(Seq("__i", "__block")))
      .select(col("doc_id"), (col("__i") + 1).cast(LongType).as("block_idx"),
        expr(s"regexp_extract(regexp_extract(__block, '$FencePattern', 1)," +
          " '^[^ \\t]*', 0)").as("lang_tag"),
        expr(s"regexp_extract(__block, '$FencePattern', 2)").as("code"))
      .withColumn("code_lines",
        (length(col("code")) - length(regexp_replace(col("code"), "\n", "")) + 1)
          .cast(LongType))
      .withColumn("code_chars", length(col("code")).cast(LongType))

  /** Document-level fence audit: closed-block count, raw ``` marker
    * count, and the `unclosed` verdict (odd marker parity — a
    * truncated page or an unterminated fence). The parity check is
    * pure replace arithmetic, independent of the extractor regex, so
    * the two can cross-check each other: marks == 2·n_blocks exactly
    * when every fence closes. */
  def fenceAudit(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).cast(LongType).as("doc_id"),
        expr(s"size(regexp_extract_all($textCol, '$FencePattern', 1))")
          .cast(LongType).as("n_blocks"),
        expr(s"(length($textCol) - length(replace($textCol, '```', ''))) div 3")
          .cast(LongType).as("fence_marks"))
      .withColumn("unclosed", col("fence_marks") % 2 === 1)

  /** Keyword profiles for code language guessing — deliberately
    * DISJOINT marker sets (no keyword appears in two profiles), so
    * the argmax is a clean vote; counts are non-overlapping
    * left-to-right replace arithmetic, identical integers in any
    * engine (the langIdNgram device applied to code). */
  val CodeProfiles: Seq[(String, Seq[String])] = Seq(
    "python" -> Seq("print(", "lambda ", "elif "),
    "scala" -> Seq("val ", "object ", "case class"),
    // no '=>' here: it is idiomatic Scala (lambdas, pattern matches)
    // and would systematically mis-flag correctly-tagged scala blocks
    "js" -> Seq("function ", "const ", "console."))

  /** Language-tag consistency over a code-block relation: per block,
    * keyword hit counts per profile, the guessed language (explicit
    * CASE-chain argmax — python wins ties over scala over js, zero
    * evidence guesses ''), and the `mismatch` verdict: a DECLARED
    * tag contradicted by the evidence (mislabeled fences are routine
    * in crawled markdown, and a code model trained on them learns
    * the wrong syntax-to-name mapping). No evidence is NOT a
    * mismatch — an unlabeled or unrecognized block stays unflagged.
    * Narrow per-row replace arithmetic, zero shuffle. */
  def langConsistency(blocks: DataFrame, codeCol: String = "code",
                      tagCol: String = "lang_tag"): DataFrame = {
    def hits(kws: Seq[String]) = kws.map { kw =>
      val q = kw.replace("'", "''")
      s"((length($codeCol) - length(replace($codeCol, '$q', ''))) div ${kw.length})"
    }.mkString(" + ")
    val withHits = CodeProfiles.foldLeft(blocks) { case (df, (lang, kws)) =>
      df.withColumn(s"hits_$lang", expr(hits(kws)).cast(LongType))
    }
    withHits
      .withColumn("guessed",
        when(col("hits_python") >= col("hits_scala") &&
          col("hits_python") >= col("hits_js") && col("hits_python") > 0, "python")
        .when(col("hits_scala") >= col("hits_js") && col("hits_scala") > 0, "scala")
        .when(col("hits_js") > 0, "js")
        .otherwise(""))
      .withColumn("mismatch",
        col(tagCol).isin(CodeProfiles.map(_._1): _*) &&
          col("guessed") =!= "" && col("guessed") =!= col(tagCol))
  }

  /** Deterministic markdown fixture over a documents relation (pure
    * Column arithmetic): heading + prose around fenced blocks —
    * docs `%4==0` carry a two-line ```python block, `%4==1` a
    * ```scala block, `%4==2` an UNLABELED block, `%4==3` no block;
    * docs `%19==0` append a second python block (multi-block class);
    * docs `%31==0` end with an UNCLOSED ```js fence (the truncation
    * class — the extractor must not swallow the tail, the audit must
    * flag the parity). */
  def mdFromDocs(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val nl = "chr(10)"
    val md =
      s"""concat('# doc ', $idCol, $nl, $nl,
         |  'intro ', substring($textCol, 1, 40), $nl, $nl,
         |  CASE CAST($idCol % 4 AS INT)
         |    WHEN 0 THEN concat('```python', $nl, 'print("doc ', $idCol % 7, '")',
         |      $nl, 'x = ', $idCol % 13, $nl, '```', $nl)
         |    WHEN 1 THEN concat('```scala', $nl, 'val x = ', $idCol % 13, $nl, '```', $nl)
         |    WHEN 2 THEN concat('```', $nl, 'raw ', $idCol % 7, $nl, '```', $nl)
         |    ELSE ''
         |  END,
         |  CASE WHEN $idCol % 19 = 0
         |    THEN concat('```python', $nl, 'y = ', $idCol % 5, $nl, '```', $nl)
         |    ELSE '' END,
         |  CASE WHEN $idCol % 31 = 0
         |    THEN concat('```js', $nl, 'unclosed ', $idCol % 3, $nl)
         |    ELSE '' END,
         |  'tail ', substring($textCol, 41, 20))""".stripMargin
    docs.select(col(idCol).cast(LongType).as("doc_id"), expr(md).as("text"))
  }
}
