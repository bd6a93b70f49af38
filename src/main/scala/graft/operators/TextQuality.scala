package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for training-data curation (SURVEY.md §2.11
  * [NS]): quality scoring, token counting, stopword-based language ID
  * and rolling-hash document fingerprinting. All single-pass, narrow
  * transforms (no shuffle at all except fingerprint's none) — they
  * scale linearly with the corpus and stay inside whole-stage codegen
  * except for the higher-order array folds.
  */
object TextQuality {

  /** Non-empty whitespace tokens of a text column. */
  private def toks(c: Column): Column = filter(split(c, "\\s+"), t => length(t) > 0)

  /** Small multilingual stopword lists — plan-time constants. */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "den"),
    "es" -> Seq("el", "la", "los", "y", "en", "que", "un", "se"),
    "fr" -> Seq("le", "les", "et", "une", "est", "dans", "pour", "que"),
    "zh" -> Seq("的", "是", "在", "了", "我", "有", "和", "不"))

  private def stopHits(tokens: Column, lang: String): Column =
    size(filter(tokens, t => array_contains(array(Stopwords(lang).map(lit): _*), lower(t))))

  /** Per-document quality features: token/char counts, mean token
    * length, punctuation / digit / stopword ratios. Ratios are plain
    * IEEE divisions of integer counts — deterministic. */
  def qualityFeatures(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    val tk = toks(t)
    val nTok = size(tk)
    val punctStripped = regexp_replace(t, TextOps.IspunctClass, "")
    val digitStripped = regexp_replace(t, "[0-9]", "")
    docs.select(
      col(idCol).as("doc_id"),
      nTok.cast(LongType).as("n_tokens"),
      length(t).cast(LongType).as("n_chars"),
      (aggregate(tk, lit(0L), (acc, x) => acc + length(x)) / nTok).as("avg_token_len"),
      ((length(t) - length(punctStripped)) / length(t)).as("punct_ratio"),
      ((length(t) - length(digitStripped)) / length(t)).as("digit_ratio"),
      (stopHits(tk, "en") / nTok).as("stopword_ratio"))
  }

  /** Token counting three ways: whitespace, a BPE-ish regex pre-token
    * split ([A-Za-z]+ | digit runs | single other chars), and the
    * chars/4 LLM heuristic. */
  def tokenCounts(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol).as("doc_id"),
      size(toks(t)).cast(LongType).as("ws_tokens"),
      size(regexp_extract_all(t, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast(LongType).as("bpe_ish_tokens"),
      ceil(length(t) / lit(4.0)).cast(LongType).as("approx_llm_tokens"))
  }

  /** Stopword-vote language ID with a fixed priority order on ties
    * (en > de > es > fr > zh) — a deterministic n-gram-free heuristic;
    * emits the per-language scores so downstream filters can threshold
    * confidence. */
  def langId(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val tk = toks(col(textCol))
    val langs = Seq("en", "de", "es", "fr", "zh")
    val scored = docs.select(
      col(idCol).as("doc_id") +: langs.map(l => stopHits(tk, l).cast(LongType).as(s"s_$l")): _*)
    val s: String => Column = l => col(s"s_$l")
    val pred = when(s("en") >= s("de") && s("en") >= s("es") && s("en") >= s("fr") && s("en") >= s("zh"), "en")
      .when(s("de") >= s("es") && s("de") >= s("fr") && s("de") >= s("zh"), "de")
      .when(s("es") >= s("fr") && s("es") >= s("zh"), "es")
      .when(s("fr") >= s("zh"), "fr")
      .otherwise("zh")
    scored.select(col("doc_id"), pred.as("pred_lang"),
      col("s_en"), col("s_de"), col("s_es"), col("s_fr"), col("s_zh"))
  }

  /** Order-sensitive polynomial rolling hash (Rabin-Karp style) over
    * the cleaned word sequence: fp = fold(acc * P + xxhash64(word)),
    * wrapping 64-bit (needs spark.sql.ansi.enabled=false). Unlike the
    * content digest (Dedup.hashGroups) this is computable incrementally
    * and composable over chunks. */
  def fingerprint(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val cleaned = transform(toks(col(textCol)), t => TextOps.cleanWord(t))
    val nonEmpty = filter(cleaned, w => length(w) > 0)
    val fp = aggregate(nonEmpty, lit(0L), (acc, w) => acc * lit(1099511628211L) + xxhash64(w))
    docs.select(col(idCol).as("doc_id"), fp.as("fp"))
  }
}
