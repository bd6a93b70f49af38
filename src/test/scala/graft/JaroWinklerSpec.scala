package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{JaroWinkler, JaroWinklerImpl}
import org.apache.spark.unsafe.types.UTF8String

class JaroWinklerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def s(x: String) = UTF8String.fromString(x)
  private def jw(a: String, b: String) = JaroWinklerImpl.sim(s(a), s(b))

  test("kernel matches DuckDB/RapidFuzz on the canonical cases, bit for bit") {
    // expected values captured from DuckDB jaro_winkler_similarity —
    // the engine the oracle twin runs
    assert(jw("MARTHA", "MARHTA") === 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") === 0.8133333333333332)
    assert(jw("JELLYFISH", "SMELLYFISH") === 0.8962962962962964)
    assert(jw("DWAYNE", "DUANE") === 0.8400000000000001)
    assert(jw("kitten", "sitting") === 0.746031746031746)
    assert(jw("abc", "abc") === 1.0)
    // prefix boost caps at 4 even when 6 chars are shared
    assert(jw("abcdefg", "abcdefx") === 0.9428571428571428)
  }

  test("kernel edge semantics are the RapidFuzz ones, not the textbook ones") {
    // either side empty → 0.0 (DuckDB returns 0.0 for two empties too)
    assert(jw("", "") === 0.0)
    assert(jw("", "abc") === 0.0)
    assert(jw("a", "b") === 0.0)
    // window 0 for 2-char strings: "ab"/"ba" share no in-window match
    assert(jw("ab", "ba") === 0.0)
    // odd transposition count FLOORS (integer halving): the value
    // DuckDB returns for this cyclic-shift case, not the x.5 variant
    assert(jw("abcxxyy", "bcaxxyy") === 0.9523809523809524)
    // boost threshold is strict >0.7 with no prefix: value unchanged
    assert(jw("CRATE", "TRACE") === 0.7333333333333334)
  }

  test("expression: codegen and interpreted agree; nulls propagate; SQL name registered") {
    val spark2 = spark; import spark2.implicits._
    val df = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), (null, "x"), ("y", null))
      .toDF("a", "b")
    val viaCol = df.select(JaroWinkler.jaroWinkler(col("a"), col("b"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(viaCol.toSeq === Seq(Some(0.9611111111111111), Some(0.8133333333333332), None, None))
    // the SQL surface (GraftExtensions) carries DuckDB's exact name
    df.createOrReplaceTempView("jw_fixture")
    val viaSql = spark.sql(
      "SELECT jaro_winkler_similarity(a, b) FROM jw_fixture WHERE a IS NOT NULL AND b IS NOT NULL")
      .collect().map(_.getDouble(0))
    assert(viaSql.toSeq === Seq(0.9611111111111111, 0.8133333333333332))
    // interpreted path (no codegen) produces the identical doubles
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = df.where(col("a").isNotNull && col("b").isNotNull)
        .select(JaroWinkler.jaroWinkler(col("a"), col("b"))).collect().map(_.getDouble(0))
      assert(interp.toSeq === Seq(0.9611111111111111, 0.8133333333333332))
    }
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
