package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.NfcNormalize

class NfcNormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val decomposed = "cafe\u0301 A\u030A \u212B x"
  private val composed = "caf\u00E9 \u00C5 \u00C5 x"

  test("recomposes combining sequences and singletons; already-NFC text is unchanged") {
    val df = Seq((1L, decomposed), (2L, composed), (3L, "plain"), (4L, null.asInstanceOf[String]))
      .toDF("id", "s")
    val got = df.select(col("id"), NfcNormalize.nfc(col("s")).as("n")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L) === Some(composed))
    assert(got(2L) === Some(composed))
    assert(got(3L) === Some("plain"))
    assert(got(4L) === None)
    // matches the JDK normalizer it wraps, and is idempotent
    assert(got(1L).get === java.text.Normalizer.normalize(decomposed, java.text.Normalizer.Form.NFC))
    val twice = df.select(NfcNormalize.nfc(NfcNormalize.nfc(col("s"))).as("n"))
      .collect().map(r => Option(r.getString(0)))
    assert(twice.toSeq === df.select(NfcNormalize.nfc(col("s"))).collect().map(r => Option(r.getString(0))).toSeq)
  }

  test("registered as a SQL function through GraftExtensions") {
    // Spark's CHAR(n) is ascii-mod-256 (not a codepoint like DuckDB's
    // chr), so the combining char goes into the SQL text directly
    val got = spark.sql(s"SELECT nfc_normalize('cafe\u0301') AS n").head().getString(0)
    assert(got === "caf\u00E9")
  }

  test("interpreted eval path agrees with codegen") {
    import org.apache.spark.sql.GraftSqlShim
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val e = NfcNormalize(Literal(UTF8String.fromString(decomposed),
      org.apache.spark.sql.types.StringType))
    assert(e.eval(null).toString === composed)
  }
}
