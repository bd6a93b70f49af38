package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst 2-D Hilbert-curve index (Hilbert 1891; the xy2d
  * walk as given in Warren, Hacker's Delight / the public reference
  * formulation): maps a (x, y) cell to its distance along the
  * space-filling curve. Same role as [[graft.sources.StatsManifest]]'s
  * Z-order interleave — cluster multi-dimensional data so per-file
  * min/max stats prune box predicates — but with strictly better
  * locality: consecutive Hilbert positions are ALWAYS grid-adjacent
  * (Z-order jumps across the plane at bit boundaries), so file value
  * ranges are tighter and a box predicate skips more files on the
  * same data (StatsManifestSpec counts both).
  *
  * The per-level rotate/reflect state machine mutates (x, y) — as a
  * pure Column expression tree that recurrence doubles per level and
  * explodes codegen, so it lives behind a native expression calling
  * one static loop (the [[DeflateSize]] device): still inside
  * whole-stage codegen, one call per row, no UDF serialization.
  * Inputs clamp to [0, 2^bits): order-preserving, negatives cluster
  * at the origin (the zValueN clamp rationale). */
case class HilbertIndex2(left: Expression, right: Expression, bits: Int = 16)
    extends BinaryExpression {

  require(bits >= 1 && 2 * bits <= 62, s"hilbert: 2 x $bits bits must fit a Long")

  override def checkInputDataTypes(): TypeCheckResult = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val ok = Seq(left, right).forall(e =>
      Seq(ByteType, ShortType, IntegerType, LongType).contains(e.dataType))
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_index requires integral inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "hilbert_index"

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex2.index(
      a.asInstanceOf[Number].longValue(), b.asInstanceOf[Number].longValue(), bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HilbertIndex2.index((long)$a, (long)$b, $bits);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex2 {
  /** xy2d: shared by eval and codegen. Clamps each coordinate to
    * [0, 2^bits) order-preservingly. */
  def index(x: Long, y: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    var xx = math.min(math.max(x, 0L), mask)
    var yy = math.min(math.max(y, 0L), mask)
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((xx & s) > 0) 1L else 0L
      val ry = if ((yy & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) { // rotate the quadrant so the curve connects
        if (rx == 1) {
          xx = s - 1 - xx
          yy = s - 1 - yy
        }
        val t = xx; xx = yy; yy = t
      }
      s >>= 1
    }
    d
  }

  def hilbert(a: Column, b: Column, bits: Int = 16): Column =
    GraftSqlShim.column(HilbertIndex2(
      GraftSqlShim.expression(a), GraftSqlShim.expression(b), bits))
}
