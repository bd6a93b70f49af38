package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native generator must agree with the composed
  * split→slide→concat pipeline it replaces, for every edge the SQL
  * generator contract defines. */
class WordNGramsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def grams(text: String, n: Int): Seq[String] = {
    Seq(Tuple1(text)).toDF("text").createOrReplaceTempView("wng_one")
    spark.sql(s"SELECT ngram FROM wng_one LATERAL VIEW word_ngrams(text, $n) g AS ngram")
      .as[String].collect().toSeq
  }

  test("sliding trigrams over a whitespace-run tokenization") {
    assert(grams("a  b\tc \n d", 3) === Seq("a b c", "b c d"))
    assert(grams("a b c", 1) === Seq("a", "b", "c"))
    assert(grams(" leading  and trailing ", 2) === Seq("leading and", "and trailing"))
    // vertical tab is NOT a separator: Java regex \s would split here,
    // RE2 (the DuckDB twin) would not — the explicit [ \t\n\f\r] class
    // pins both engines to the same tokenization
    assert(grams("a\u000Bb c d", 3) === Seq("a\u000Bb c d"))
  }

  test("too-short and null text emit no rows; LATERAL VIEW OUTER resurrects them") {
    assert(grams("only two", 3) === Seq.empty)
    assert(grams("", 1) === Seq.empty)
    Seq((1L, Some("a b c")), (2L, None)).toDF("id", "text")
      .createOrReplaceTempView("wng_null")
    val outer = spark.sql(
      """SELECT id, ngram FROM wng_null
        |LATERAL VIEW OUTER word_ngrams(text, 3) g AS ngram ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
    assert(outer.toSeq === Seq((1L, Some("a b c")), (2L, None)))
  }

  test("agrees with the composed explode pipeline on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("wng_docs")
    val native = spark.sql(
      """SELECT ngram, count(*) AS n FROM wng_docs
        |LATERAL VIEW word_ngrams(text, 3) g AS ngram GROUP BY ngram""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val composed = docs
      .select(split(col("text"), "\\s+").as("w"))
      .select(filter(col("w"), x => length(x) > 0).as("w"))
      .where(size(col("w")) >= 3)
      .select(explode(expr(
        "transform(sequence(0, size(w) - 3), i -> concat_ws(' ', slice(w, i + 1, 3)))")).as("ngram"))
      .groupBy("ngram").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(native === composed)
    assert(native.nonEmpty)
  }

  test("non-literal n is rejected at analysis, not at runtime") {
    Seq(("a b c", 2)).toDF("text", "k").createOrReplaceTempView("wng_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT ngram FROM wng_bad LATERAL VIEW word_ngrams(text, k) g AS ngram").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal integer"), e.getMessage)
  }
}
