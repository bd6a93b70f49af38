package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{DamerauLevenshtein, DamerauLevenshteinImpl}
import org.apache.spark.unsafe.types.UTF8String

class DamerauLevenshteinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def dl(a: String, b: String) =
    DamerauLevenshteinImpl.dist(UTF8String.fromString(a), UTF8String.fromString(b))

  test("kernel is TRUE Damerau-Levenshtein, not the OSA restriction") {
    // the discriminating case: OSA forbids editing a transposed pair
    // again and answers 3; true DL transposes CA→AC then inserts B
    assert(dl("CA", "ABC") === 2)
    assert(dl("ac", "cba") === 2)     // transpose + insert
    // agreement cases (values probed from DuckDB's builtin)
    assert(dl("ab", "ba") === 1)
    assert(dl("kitten", "sitting") === 3)
    assert(dl("abcdef", "abcfed") === 2)
    assert(dl("", "abc") === 3 && dl("abc", "") === 3)
    assert(dl("same", "same") === 0)
    // transposition is 1 edit where plain levenshtein needs 2
    assert(dl("cloud", "culod") === 2)
  }

  test("expression: nulls propagate, codegen and SQL surface agree with the kernel") {
    val spark2 = spark; import spark2.implicits._
    val df = Seq(("CA", "ABC"), ("ab", "ba"), (null, "x")).toDF("a", "b")
    val got = df.select(DamerauLevenshtein.damerauLevenshtein(col("a"), col("b"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(got.toSeq === Seq(Some(2), Some(1), None))
    df.createOrReplaceTempView("dl_fixture")
    val viaSql = spark.sql(
      "SELECT damerau_levenshtein(a, b) FROM dl_fixture WHERE a IS NOT NULL")
      .collect().map(_.getInt(0))
    assert(viaSql.toSeq === Seq(2, 1))
  }
}
