package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Byte-pair-encoding subword tokenization (SURVEY.md §2.11 [NS]) —
  * the unit real token budgets are denominated in (whitespace words
  * under-count CJK/code/URLs badly). Two halves, mirroring how real
  * tokenizers ship:
  *
  *  - [[learnMerges]]: the classic BPE learner (Sennrich et al. 2016,
  *    public) — iteratively merge the most frequent adjacent symbol
  *    pair. Learning runs on the TOP-`vocabCap` words by frequency:
  *    one corpus-wide aggregate + a bounded driver loop, the standard
  *    scale posture (a 100 TB corpus learns its tokenizer from a
  *    capped vocabulary sample; the artifact, not the corpus, is what
  *    applies everywhere).
  *  - [[tokens]]: the applier — a tiny per-word loop against a
  *    BROADCAST rank map (merge tables are KBs). Runs over DISTINCT
  *    words, never the exploded corpus: tokenize the vocabulary once,
  *    then join counts back — at corpus scale the vocab relation is
  *    orders of magnitude smaller than the token stream.
  *
  * Determinism device for the oracle: the applier merges the SINGLE
  * best-ranked pair's FIRST occurrence per iteration (not merge-all
  * per pass). That is expressible as a DuckDB recursive CTE — one
  * list_slice splice per step — so `bpe_tokens` is hash-checked
  * cross-engine, the same graduation trick as fingerprint_ref. For
  * every merge table learned by [[learnMerges]] the result coincides
  * with pass-based merge-all BPE: both always merge the globally
  * best-ranked pair present, and splicing one occurrence never
  * changes which pair that is (the spec asserts equality against an
  * independent merge-all fold).
  *
  * The applier is a scalar UDF by choice: it runs on the vocab-sized
  * DISTINCT relation (not the corpus hot path), and a rank-map loop
  * has no higher-order-function equivalent that stays readable.
  */
object Bpe {

  /** One-at-a-time best-rank BPE apply (see object doc). */
  private[graft] def applyMerges(word: String, rank: Map[(String, String), Int]): Seq[String] =
    applyMerges(word, rank, None)

  /** [[applyMerges]] with the artifact's OOV story: when `alphabet`
    * is given, any codepoint OUTSIDE it is expanded to its UTF-8
    * bytes as `<0xHH>` marker tokens before merging — the byte-level
    * BPE fallback (GPT-2 class tokenizers ship the same guarantee: no
    * input is ever unrepresentable). Byte tokens never appear in the
    * merge table, so they pass through the loop untouched. With
    * `None` every codepoint is its own base symbol (the pre-artifact
    * behavior custom-merge specs rely on). */
  private[graft] def applyMerges(word: String, rank: Map[(String, String), Int],
                                 alphabet: Option[Set[String]]): Seq[String] = {
    val base: Vector[String] = alphabet match {
      case None => word.map(_.toString).toVector
      case Some(ab) =>
        // iterate CODEPOINTS so astral-plane chars fall back as whole
        // characters, not as lone surrogates
        word.codePoints().toArray.toVector.flatMap { cp =>
          val s = new String(Character.toChars(cp))
          if (ab.contains(s)) Vector(s)
          else s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            .toVector.map(b => f"<0x${b & 0xff}%02x>")
        }
    }
    var toks = base
    var done = toks.length < 2
    while (!done) {
      var best = Int.MaxValue
      var at = -1
      var i = 0
      while (i < toks.length - 1) {
        val r = rank.getOrElse((toks(i), toks(i + 1)), Int.MaxValue)
        if (r < best) { best = r; at = i } // first occurrence wins ties
        i += 1
      }
      if (at < 0) done = true
      else toks = (toks.take(at) :+ (toks(at) + toks(at + 1))) ++ toks.drop(at + 2)
    }
    toks
  }

  /** Column form of the applier over a broadcast rank map; pass an
    * `alphabet` to arm the byte-fallback OOV path. */
  def tokens(word: Column, merges: Seq[(String, String)],
             alphabet: Option[Set[String]] = None): Column = {
    val rank = merges.zipWithIndex.toMap
    udf((w: String) => applyMerges(w, rank, alphabet)).apply(word)
  }

  /** Classic BPE learner over the corpus's top-`vocabCap` words.
    * Pair selection: highest summed frequency, ties to the
    * lexicographically smallest (left, right) — fully deterministic.
    * Merge application inside the learner is the standard
    * left-to-right merge-all pass. */
  def learnMerges(docs: DataFrame, numMerges: Int, vocabCap: Int = 50000,
                  textCol: String = "text"): Seq[(String, String)] = {
    val freqRows = docs
      .select(explode(TextOps.tokens(col(textCol))).as("tok"))
      .select(lower(col("tok")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(vocabCap)
      .collect()
    var vocab: Vector[(Vector[String], Long)] =
      freqRows.iterator.map(r => (r.getString(0).map(_.toString).toVector, r.getLong(1))).toVector
    val out = mutable.ArrayBuffer.empty[(String, String)]
    var m = 0
    while (m < numMerges) {
      val pairCnt = mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (toks, c) =>
        var i = 0
        while (i < toks.length - 1) {
          val p = (toks(i), toks(i + 1))
          pairCnt.update(p, pairCnt.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (pairCnt.isEmpty) m = numMerges
      else {
        val best = pairCnt.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        out += best
        vocab = vocab.map { case (toks, c) =>
          val nw = Vector.newBuilder[String]
          var i = 0
          while (i < toks.length) {
            if (i < toks.length - 1 && toks(i) == best._1 && toks(i + 1) == best._2) {
              nw += toks(i) + toks(i + 1); i += 2
            } else { nw += toks(i); i += 1 }
          }
          (nw.result(), c)
        }
        m += 1
      }
    }
    out.toSeq
  }

  /** Frozen merge artifact for the oracle-checked queries, shipped as
    * a classpath RESOURCE exactly how production tokenizers ship
    * (GPT-2's merges.txt is a fixed file, not re-learned per job):
    * learned ONCE by [[graft.tools.LearnBpe]] from the COMPOSITE
    * testdata text corpus (documents ∪ part names/types ∪ customer +
    * supplier names ∪ nation/region names ∪ event type+props), which
    * also records the corpus ALPHABET — the declared base-symbol set
    * whose complement takes the `<0xHH>` byte fallback in
    * [[applyMerges]]. The composite makes the 2048-merge budget
    * BINDING (the documents corpus alone is a closed 31-word
    * vocabulary that saturates at 89 merges): the artifact carries
    * real digit/structure subwords, so fertility and packing budgets
    * behave like a production tokenizer's instead of a character
    * count's. */
  private lazy val artifact: (Seq[String], Seq[(String, String)]) =
    loadArtifact("/graft/bpe_merges.txt")

  lazy val DefaultMerges: Seq[(String, String)] = artifact._2

  /** The artifact's declared base alphabet. */
  lazy val DefaultAlphabet: Set[String] = artifact._1.toSet

  private def loadArtifact(res: String): (Seq[String], Seq[(String, String)]) = {
    val in = getClass.getResourceAsStream(res)
    require(in != null, s"BPE artifact $res missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val lines = try src.getLines().toVector finally src.close()
    val data = lines.filterNot(l => l.isEmpty || l.startsWith("#"))
    val (abLine, mergeLines) = (data.head, data.tail)
    require(abLine.startsWith("alphabet\t"), s"BPE artifact $res: first data line must declare the alphabet")
    val alphabet = abLine.stripPrefix("alphabet\t").split("").toSeq.filter(_.nonEmpty)
    val merges = mergeLines.map { l =>
      val parts = l.split("\t", -1)
      require(parts.length == 2, s"BPE artifact $res: bad merge line '$l'")
      (parts(0), parts(1))
    }
    (alphabet, merges)
  }

  /** Corpus-wide BPE token histogram under `merges`: tokenize the
    * DISTINCT lowercased words once, join word frequencies back, sum
    * per token. Output: (token, n) — the vocabulary a budgeter or
    * embedding table would be sized from. */
  def tokenHistogram(docs: DataFrame, merges: Seq[(String, String)],
                     textCol: String = "text",
                     alphabet: Option[Set[String]] = None): DataFrame = {
    val words = docs
      .select(explode(TextOps.tokens(col(textCol))).as("tok"))
      .select(lower(col("tok")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    words
      .select(explode(tokens(col("word"), merges, alphabet)).as("token"), col("cnt"))
      .groupBy(col("token")).agg(sum(col("cnt")).cast(LongType).as("n"))
  }

  /** Per-document BPE token count under `merges`: per-word token
    * counts from the DISTINCT-word relation, joined back to the
    * exploded corpus and summed per doc — the real budget column for
    * packing (whitespace words undercount). Documents with no words
    * are absent from the output — the engine-wide word-relation
    * contract (truncateToTokenBudget posture); consumers that need a
    * zero row right-join the doc list. */
  def docTokenCounts(docs: DataFrame, merges: Seq[(String, String)],
                     textCol: String = "text", idCol: String = "doc_id",
                     alphabet: Option[Set[String]] = None): DataFrame = {
    val docWords = docs
      .select(col(idCol).as("doc_id"), explode(TextOps.tokens(col(textCol))).as("tok"))
      .select(col("doc_id"), lower(col("tok")).as("word"))
      .where(length(col("word")) > 0)
    val perWord = docWords.select(col("word")).distinct()
      .select(col("word"), size(tokens(col("word"), merges, alphabet)).cast(LongType).as("n_toks"))
    docWords.join(perWord, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n_toks")).as("bpe_tokens"), count(lit(1)).cast(LongType).as("ws_tokens"))
  }

  /** Context-limit enforcement with EXACT token accounting: keep each
    * document's longest whole-word prefix whose BPE token total fits
    * `budget`, reassembled with single spaces. The keep predicate
    * (tokens-before + own-tokens ≤ budget, tokens-before counting ALL
    * prior words) is prefix-closed — once a word overflows, every
    * later word's tokens-before already exceeds the budget — so no
    * sequential scan is needed: one per-doc window + a filter.
    * Output: (doc_id, ws_tokens_kept, bpe_tokens_kept, truncated,
    * prefix). Docs whose every word overflows keep nothing and report
    * an empty prefix; docs with NO words at all are absent from the
    * output entirely (the totals relation is built from the word
    * relation — the DuckDB twin mirrors the omission).
    *
    * Scale shape: the applier runs on DISTINCT words only
    * ([[docTokenCounts]]); doc-scale work is one doc-partitioned
    * running sum and one ordered reassembly whose collect_list is
    * bounded by the kept prefix (≤ budget tokens → ≤ budget words). */
  def truncateToTokenBudget(docs: DataFrame, merges: Seq[(String, String)],
                            budget: Long,
                            textCol: String = "text", idCol: String = "doc_id",
                            alphabet: Option[Set[String]] = None): DataFrame = {
    require(budget > 0, "truncateToTokenBudget needs budget > 0")
    val docWords = docs
      .select(col(idCol).as("doc_id"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "tok")))
      .where(length(col("tok")) > 0)
      .withColumn("word", lower(col("tok")))
    val perWord = docWords.select(col("word")).distinct()
      .select(col("word"), size(tokens(col("word"), merges, alphabet)).cast(LongType).as("n_toks"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = docWords.join(perWord, Seq("word"))
      .withColumn("cum_before", coalesce(sum(col("n_toks")).over(w), lit(0L)))
    val totals = cum.groupBy(col("doc_id")).agg(sum(col("n_toks")).as("bpe_total"))
    cum.where(col("cum_before") + col("n_toks") <= budget)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("ws_tokens_kept"),
        sum(col("n_toks")).as("bpe_tokens_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok"))).as("prefix"))
      // right join: a doc whose FIRST word already overflows keeps 0
      .join(totals, Seq("doc_id"), "right")
      .select(col("doc_id"),
        coalesce(col("ws_tokens_kept"), lit(0L)).as("ws_tokens_kept"),
        coalesce(col("bpe_tokens_kept"), lit(0L)).as("bpe_tokens_kept"),
        (col("bpe_total") > budget).as("truncated"),
        coalesce(col("prefix"), lit("")).as("prefix"))
  }
}
