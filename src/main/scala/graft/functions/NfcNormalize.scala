package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst Unicode NFC normalization (UAX #15, public): the
  * canonical-composition pass every multilingual corpus needs before
  * dedup or tokenization — "é" typed as e+U+0301 and "é" as U+00E9 are
  * the SAME text to a reader but different bytes to sha256, shingles
  * and group-by keys, so un-normalized corpora leak duplicates past
  * every exact-hash stage.
  *
  * Spark has no built-in for this; the alternatives are a Scala UDF
  * (opaque to codegen, serialization overhead per row) or pushing the
  * corpus through an external pass. This expression stays inside
  * whole-stage codegen and takes the cheap exit first:
  * `Normalizer.isNormalized` is a scan-only check and virtually all
  * real text is already NFC — the allocation-heavy `normalize` call
  * runs only on rows that actually need recomposition.
  *
  * Cross-engine: DuckDB's `nfc_normalize` (utf8proc) and the JDK's
  * `java.text.Normalizer` both implement UAX #15 — identical output
  * on any codepoint both Unicode versions know, which is what lets
  * the oracle hash-check this expression directly.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nfc_normalize requires string, got $t")
  }

  override def dataType: DataType = child.dataType

  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      s"""
         |String $s = $c.toString();
         |${ev.value} = java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)
         |  ? $c
         |  : org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Column API entry point. */
  def nfc(c: Column): Column = GraftSqlShim.column(NfcNormalize(GraftSqlShim.expression(c)))
}
