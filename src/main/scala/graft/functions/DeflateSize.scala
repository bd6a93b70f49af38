package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst deflate-size: the compressed byte length of a
  * string under zlib DEFLATE at a fixed level — the one-number
  * repetition detector production corpus filters use (RefinedWeb /
  * Dolma-class pipelines gate on compression ratio: boilerplate,
  * keyword stuffing and generator loops compress far below prose,
  * and the signal needs no tokenizer, no model, no language). The
  * Gopher n-gram gates catch STRUCTURED repetition; deflate catches
  * everything with low entropy, including what n-gram templates miss.
  *
  * A native expression rather than a UDF: stays inside whole-stage
  * codegen (no row-at-a-time serialization), one Deflater per call
  * sized single-shot. Deterministic for a fixed (input, level) on a
  * given zlib build — the JDK's bundled zlib here — which is why the
  * registered query is a rows-only check with the determinism and
  * monotonicity spec, not a DuckDB hash twin (no SQL engine exposes
  * deflate).
  */
case class DeflateSize(child: Expression, level: Int = 6) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"deflate_size requires string, got $t")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "deflate_size"

  override def nullSafeEval(input: Any): Any =
    DeflateSize.sizeOf(input.asInstanceOf[UTF8String].getBytes, level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DeflateSize.sizeOf($c.getBytes(), $level);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateSize {
  /** Single-shot deflate length; shared by eval and codegen. */
  def sizeOf(bytes: Array[Byte], level: Int): Int = {
    val d = new java.util.zip.Deflater(level)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](bytes.length + 64)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  def deflateSize(c: Column, level: Int = 6): Column =
    GraftSqlShim.column(DeflateSize(GraftSqlShim.expression(c), level))
}
