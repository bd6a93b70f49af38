package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The scoring kernel, kept as a standalone object so whole-stage
  * codegen can call it as a static method (Scala emits a static
  * forwarder for top-level objects without a companion class).
  *
  * Semantics deliberately mirror the RapidFuzz implementation that
  * DuckDB's `jaro_winkler_similarity` wraps (both public), down to
  * the decisions that change the value:
  *  - either side empty → 0.0 (NOT the textbook 1.0 for two empties);
  *  - match window = max(|a|,|b|)/2 − 1, floored at 0;
  *  - transpositions = (mismatched matched-positions) / 2 in INTEGER
  *    division (an odd count floors — observed: jaro("abcxxyy",
  *    "bcaxxyy") = 0.952381, the floored value);
  *  - Winkler boost only when jaro STRICTLY > 0.7, prefix capped at
  *    4, jw = jaro + l·0.1·(1 − jaro);
  *  - float association copied operation-for-operation (three +=
  *    then /3; (l·0.1)·(1−sim)) so both engines produce bit-equal
  *    doubles and the oracle can hash-compare raw similarity values.
  *
  * Operates on UTF-16 code units; supplementary-plane codepoints
  * count as two units (the fixtures and the reference use cases are
  * names — BMP text; documented deviation, not a bug trap).
  */
object JaroWinklerImpl {

  def sim(au: UTF8String, bu: UTF8String): Double = {
    val a = au.toString; val b = bu.toString
    val la = a.length; val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var matched = false
      while (j <= hi && !matched) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var trans = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    var s = 0.0
    s += md / la
    s += md / lb
    s += (m - trans / 2).toDouble / md
    s = s / 3.0
    if (s > 0.7) {
      val maxPref = math.min(4, math.min(la, lb))
      var l = 0
      while (l < maxPref && a.charAt(l) == b.charAt(l)) l += 1
      s += l * 0.1 * (1.0 - s)
    }
    s
  }
}

/** Native Catalyst Jaro-Winkler similarity — the fuzzy-match scorer
  * record linkage and entity resolution lean on when edit distance
  * over-penalizes transposed typos ("MARHTA") and under-values shared
  * prefixes (human names, product codes). Spark has no built-in; the
  * alternative is a Scala UDF (row-at-a-time Encoder boxing, opaque
  * to codegen). This expression stays inside whole-stage codegen via
  * a static kernel call — the NfcNormalize posture.
  *
  * Cross-engine: DuckDB ships `jaro_winkler_similarity` (RapidFuzz);
  * [[JaroWinklerImpl.sim]] mirrors it operation-for-operation, so
  * oracle twins compare RAW doubles, no rounding dance needed.
  */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires (string, string), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerImpl.sim($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Column API entry point. */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftSqlShim.column(JaroWinkler(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))
}
