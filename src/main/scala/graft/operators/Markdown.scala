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

  /** Fenced block grammar (CommonMark-aligned; VERDICT r16 task 4
    * widened it from backtick-only, unanchored): BOTH ``` and ~~~
    * fences, each an explicit alternation arm (RE2 has no backrefs,
    * so "same character closes" cannot be one pattern — the two-arm
    * union stays in the Java∩RE2 intersection). Fences are anchored
    * to LINE START ((?m)^): an inline ``` in prose or a code span
    * mentioning fences never opens a block. The CLOSING fence must
    * sit alone on its line (optional trailing blanks/tabs, then EOL
    * or end-of-document) — per CommonMark a line-start ```info
    * inside a block is not a closer. Group 1 the (possibly empty)
    * info string up to end-of-line (CRLF tolerated, any character
    * legal — real-world tags like `c#` and info strings like
    * `python title=x` both parse), group 2 the code body (trailing
    * newline optional, so fence-newline-fence empty blocks close
    * too). Non-greedy bodies keep adjacent blocks separate; an
    * UNCLOSED fence matches nothing (the non-swallow guarantee —
    * the audit flags parity instead of the extractor eating the
    * page tail; deliberate divergence from CommonMark, which runs
    * an unclosed fence to EOF). One fence kind at line start inside
    * a block of the other kind is CONTENT (leftmost match: the
    * outer opener wins). Documented remaining divergences: no 1-3
    * space indented fence openers, no longer-closer-for-longer-
    * opener matching (````/~~~~ count as their first three chars),
    * and no 4-space-indented code blocks. */
  private val BtArm =
    "^```([^\\r\\n]*)\\r?\\n(.*?)(?:\\r?\\n)?^```[ \\t]*(?:\\r?\\n|$)"
  private val TdArm = BtArm.replace("```", "~~~")
  val BacktickFence: String = "(?sm)" + BtArm
  val TildeFence: String = "(?sm)" + TdArm
  /** Group-0 union of both fence kinds, for document-order scans. */
  val FencePattern: String = s"(?sm)(?:$BtArm|$TdArm)"

  /** Per-block extraction: (doc_id, block_idx 1-based in document
    * order, lang_tag — the info string's FIRST token, '' when the
    * fence is unlabeled — code, code_lines, code_chars). One
    * full-text regex pass (group 0), then per-block group extraction
    * over the small matched strings. Documents without a closed
    * block emit no rows; the document-level view is [[fenceAudit]]. */
  def extractCodeBlocks(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    // group extraction per block goes through the KIND's own pattern
    // (regexp patterns must be foldable, so both are evaluated and a
    // CASE on the block's first characters picks the winner)
    def grp(i: Int) =
      s"""CASE WHEN __block LIKE '~~~%'
         | THEN regexp_extract(__block, '$TildeFence', $i)
         | ELSE regexp_extract(__block, '$BacktickFence', $i) END""".stripMargin
    docs
      .select(col(idCol).cast(LongType).as("doc_id"),
        posexplode(expr(s"regexp_extract_all($textCol, '$FencePattern', 0)"))
          .as(Seq("__i", "__block")))
      .select(col("doc_id"), (col("__i") + 1).cast(LongType).as("block_idx"),
        expr(s"regexp_extract(${grp(1)}, '^[^ \\t]*', 0)").as("lang_tag"),
        expr(grp(2)).as("code"))
      .withColumn("code_lines",
        (length(col("code")) - length(regexp_replace(col("code"), "\n", "")) + 1)
          .cast(LongType))
      .withColumn("code_chars", length(col("code")).cast(LongType))
  }

  /** Document-level fence audit: closed-block count (both fence
    * kinds), line-anchored fence MARKER count, and the `unclosed`
    * verdict (odd marker parity in EITHER kind — a truncated page or
    * an unterminated fence; parity is judged per kind because a
    * dangling ``` cannot be closed by a ~~~). The marker count is a
    * bare `(?m)^```/`(?m)^~~~` scan — anchored like the extractor
    * (an inline ``` in prose is not a marker) but independent of the
    * full fence grammar, so the two cross-check each other:
    * marks == 2·n_blocks exactly when every fence closes. (A
    * line-start ```info line INSIDE a block counts as a marker
    * without being a closer, so a document using that CommonMark
    * corner reads as parity-odd — the audit is a screen, and that
    * page class deserves the flag.) */
  def fenceAudit(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).cast(LongType).as("doc_id"),
        expr(s"size(regexp_extract_all($textCol, '$FencePattern', 0))")
          .cast(LongType).as("n_blocks"),
        expr(s"size(regexp_extract_all($textCol, '(?m)^```', 0))")
          .cast(LongType).as("__bt"),
        expr(s"size(regexp_extract_all($textCol, '(?m)^~~~', 0))")
          .cast(LongType).as("__td"))
      .withColumn("fence_marks", (col("__bt") + col("__td")).cast(LongType))
      .withColumn("unclosed", col("__bt") % 2 === 1 || col("__td") % 2 === 1)
      .drop("__bt", "__td")

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
    * ```scala block, `%4==2` an UNLABELED block fenced with ~~~
    * (the tilde-fence class — older docs corpora use it routinely),
    * `%4==3` no block; docs `%19==0` append a second python block
    * (multi-block class); docs `%5==0` carry an INLINE ``` mid-line
    * in the prose (must open nothing and count as no marker — the
    * line-anchoring class); docs `%31==0` end with an UNCLOSED
    * ```js fence and docs `%41==0` with an UNCLOSED ~~~yaml fence
    * (the truncation classes, one per fence kind — the extractor
    * must not swallow the tail, the audit must flag the parity).
    * Extraction output (lang_tag, code) is IDENTICAL whether a
    * block is backtick- or tilde-fenced, so the closed-form oracle
    * twin for the block relation is fence-kind-agnostic; only the
    * fence-audit twin sees the %41 arm. */
  def mdFromDocs(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val nl = "chr(10)"
    val md =
      s"""concat('# doc ', $idCol, $nl, $nl,
         |  'intro ', substring($textCol, 1, 40), $nl, $nl,
         |  CASE WHEN $idCol % 5 = 0
         |    THEN concat('note: a ``` here is prose, not a fence', $nl)
         |    ELSE '' END,
         |  CASE CAST($idCol % 4 AS INT)
         |    WHEN 0 THEN concat('```python', $nl, 'print("doc ', $idCol % 7, '")',
         |      $nl, 'x = ', $idCol % 13, $nl, '```', $nl)
         |    WHEN 1 THEN concat('```scala', $nl, 'val x = ', $idCol % 13, $nl, '```', $nl)
         |    WHEN 2 THEN concat('~~~', $nl, 'raw ', $idCol % 7, $nl, '~~~', $nl)
         |    ELSE ''
         |  END,
         |  CASE WHEN $idCol % 19 = 0
         |    THEN concat('```python', $nl, 'y = ', $idCol % 5, $nl, '```', $nl)
         |    ELSE '' END,
         |  CASE WHEN $idCol % 31 = 0
         |    THEN concat('```js', $nl, 'unclosed ', $idCol % 3, $nl)
         |    ELSE '' END,
         |  CASE WHEN $idCol % 41 = 0
         |    THEN concat('~~~yaml', $nl, 'dangling: ', $idCol % 3, $nl)
         |    ELSE '' END,
         |  'tail ', substring($textCol, 41, 20))""".stripMargin
    docs.select(col(idCol).cast(LongType).as("doc_id"), expr(md).as("text"))
  }
}
