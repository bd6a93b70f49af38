package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full-text retrieval over the corpus: inverted index construction and
  * BM25 ranking. No reference analog (the reference's single query is
  * word count, map_reduce.cpp:452-616), but the inverted index is the
  * canonical MapReduce workload one step past word count — same
  * scan → explode → shuffle-on-term shape, with postings instead of
  * counts — and BM25 is what a training-data pipeline runs to pull
  * topical slices out of a 100 TB corpus (targeted subset selection).
  *
  * Scale shape: everything shuffles on the term, never on the document
  * body. [[docTermFreqs]] is partial-aggregated map-side before the
  * exchange (one row per (term, doc) leaves each task, not one per
  * occurrence). BM25 scoring touches only the query terms' postings —
  * an `isin` filter that prunes before the shuffle — and the corpus
  * constants (N, avgdl) ride a broadcast, so the score join is
  * term-postings × tiny. Hot terms ("the") are real skew at 100 TB:
  * the index carries df, so callers cap or drop stop-term postings the
  * same way Dedup caps stop-shingles (maxDf there, df filter here).
  */
object Retrieval {

  /** One row per (word, doc) with its term frequency — the posting
    * before grouping. Tokenization is the reference-exact pipeline
    * (TextOps.words) so index terms agree with the wordcount family. */
  def docTermFreqs(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), explode(TextOps.tokens(col(textCol))).as("tok"))
      .select(col("doc_id"), TextOps.cleanWord(col("tok")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy(col("word"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))

  /** The inverted index: term → document frequency, collection
    * frequency, and the sorted posting list. Postings render as a
    * comma-joined string for byte-stable comparison; the arrayed form
    * is the structural output. A posting list is bounded by df — at
    * 100 TB the df column is exactly what a caller filters on to keep
    * stop-term rows from dominating the agg state. */
  def invertedIndex(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docTermFreqs(docs, textCol, idCol)
      .groupBy(col("word"))
      .agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("cf"),
        concat_ws(",",
          transform(sort_array(collect_list(col("doc_id"))), _.cast("string"))).as("postings"))

  /** BM25 (Robertson/Spärck Jones; the +1 inside the log is the
    * Lucene/BM25+ variant that keeps IDF positive for df > N/2).
    * Returns the top-k documents for a bag of query terms.
    *
    * Determinism across engines: each term's contribution is computed
    * once per (term, doc) row, the per-document sum is a fixed
    * left-to-right fold over the terms in the order given (a pivot to
    * one column per term, then explicit `+` — never a float `sum()`
    * whose accumulation order the engine picks), and the final score
    * is rounded to 4 decimals with doc_id as tie-break. */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    val tf = docTermFreqs(docs, textCol, idCol).where(col("word").isin(terms: _*))
    val dl = docs.select(
      col(idCol).as("doc_id"),
      size(filter(TextOps.tokens(col(textCol)), t => length(TextOps.cleanWord(t)) > 0)).as("dl"))
    // corpus constants: exact integer sums, one double division — ride a broadcast
    val stats = dl.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))

    val contrib = tf
      .join(broadcast(df), Seq("word"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(
        col("doc_id"), col("word"),
        (log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          .as("w_score"))

    // fixed-order fold over the query terms (deterministic association)
    val perTerm = contrib.groupBy(col("doc_id"))
      .pivot(col("word"), terms)
      .agg(first(col("w_score")))
    val score = terms.map(t => coalesce(col(s"`$t`"), lit(0.0))).reduceLeft(_ + _)
    perTerm
      .select(col("doc_id"), round(score, 4).as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }
}
