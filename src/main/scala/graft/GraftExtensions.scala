package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{VecDot, VecSelfDotRule}

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions as SQL functions, so `spark.sql("... vec_dot
  * (a, b) ...")` works next to the Column API, and injects the
  * engine's optimizer rules (VecSelfDotRule: self-dot-product →
  * squared-norm specialization). Attach with
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1))))
    ext.injectOptimizerRule(_ => VecSelfDotRule)
    ext.injectPlannerStrategy(_ => graft.plans.GroupedTopKStrategy)
  }
}
