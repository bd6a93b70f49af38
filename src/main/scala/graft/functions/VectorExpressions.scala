package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types._

/** Native Catalyst dot product over float/double array columns.
  *
  * The interpreted alternative — `aggregate(zip_with(a, b, _*_), ...)`
  * — allocates an intermediate array and breaks whole-stage codegen for
  * every similarity pair; at ANN scale (queries x corpus x dim) that is
  * the hot loop of the whole engine. This expression stays inside
  * codegen: one fused scalar loop, no allocation, accumulating in
  * index order in double (float x float products are exact in double),
  * so results are bit-identical to the HOF formulation it replaces.
  *
  * Null handling: null input array → null (nullSafe); array ELEMENTS
  * are assumed non-null (embedding vectors; enforced upstream).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okType(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left) && okType(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<float|double> inputs, got ${left.dataType} / ${right.dataType}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_dot"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lAcc = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rAcc = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double)$a.$lAcc($i)) * ((double)$b.$rAcc($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Specialized self-dot-product: one array access per element instead
  * of VecDot(a, a)'s two. Same accumulation order and arithmetic, so
  * the result is bit-identical to the VecDot form it replaces — which
  * is what lets [[VecSelfDotRule]] substitute it during optimization
  * without touching any oracle. */
case class VecSqNorm(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"vec_sq_norm requires array<float|double>, got $t")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_sq_norm"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val f = elemIsFloat
    var s = 0.0
    var i = 0
    while (i < x.numElements()) {
      val v = if (f) x.getFloat(i).toDouble else x.getDouble(i)
      s += v * v
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acc = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double)$a.$acc($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd asymmetric-distance (ADC) score for product quantization:
  * given per-query lookup tables `tables: array<array<double>>` (one
  * kCent-wide table per subspace) and a corpus vector's
  * `codes: array<int>`, returns Σ_j tables[j][codes[j]].
  *
  * The HOF formulation — aggregate(zip_with(tables, codes, (t, c) ->
  * element_at(t, c+1)), ...) — is evaluated interpreted, per row, with
  * a zipped intermediate array; at ADC scan scale (queries × corpus
  * rows) that interpreter loop IS the query. This expression is the
  * same m table lookups fused into one codegen'd scalar loop.
  *
  * Null inputs → null; codes are 0-based (matching the dense centroid
  * codes built by graft.operators.Similarity.pqTopK); a code outside
  * its table's bounds is a construction bug upstream and throws.
  */
case class VecAdcScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"vec_adc_score requires (array<array<double>>, array<int>), got $l / $r")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_adc_score"

  override def nullSafeEval(t: Any, c: Any): Any = {
    val tables = t.asInstanceOf[ArrayData]
    val codes = c.asInstanceOf[ArrayData]
    val n = math.min(tables.numElements(), codes.numElements())
    var s = 0.0
    var j = 0
    while (j < n) {
      s += tables.getArray(j).getDouble(codes.getInt(j))
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, c) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      s"""
         |int $n = java.lang.Math.min($t.numElements(), $c.numElements());
         |double $s = 0.0;
         |for (int $j = 0; $j < $n; $j++) {
         |  $s += $t.getArray($j).getDouble($c.getInt($j));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Catalyst optimizer rule (injected by graft.GraftExtensions):
  * VecDot(a, b) with semantically-equal deterministic children becomes
  * VecSqNorm(a). vec_norm — and through it every similarity operator —
  * is written as sqrt(vec_dot(a, a)), so this rule halves the array
  * accesses in the norm loop of every production plan while provably
  * preserving results (identical accumulation, see VecSqNorm). The
  * demo-grade instance of the pattern: engine-specific rewrites belong
  * in a Rule[LogicalPlan], not hand-applied at call sites. */
object VecSelfDotRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case VecDot(a, b) if a.deterministic && a.semanticEquals(b) => VecSqNorm(a)
    }
}

object VectorFunctions {
  /** Codegen'd dot product of two array<float|double> columns. */
  def vec_dot(a: Column, b: Column): Column =
    GraftSqlShim.column(VecDot(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))

  /** L2 norm via the same fused loop. vec_norm(a) builds VecDot(a, a);
    * [[VecSelfDotRule]] rewrites that to the single-access VecSqNorm
    * when the extensions are installed. */
  def vec_norm(a: Column): Column = sqrt(vec_dot(a, a))

  /** Codegen'd PQ asymmetric-distance score: Σ_j tables[j][codes[j]]. */
  def vec_adc_score(tables: Column, codes: Column): Column =
    GraftSqlShim.column(VecAdcScore(GraftSqlShim.expression(tables), GraftSqlShim.expression(codes)))
}
