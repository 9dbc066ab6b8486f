package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions injector: registers graft's native expressions
  * under SQL names so `spark.sql("SELECT dot_d(a, b) ...")` works in any
  * session built with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    val builder: Seq[Expression] => Expression = {
      case Seq(a, b) => DotProductD(a, b)
      case other =>
        throw new IllegalArgumentException(
          s"dot_d expects 2 arguments, got ${other.length}")
    }
    ext.injectFunction((
      FunctionIdentifier("dot_d"),
      new ExpressionInfo(classOf[DotProductD].getName, "dot_d"),
      builder))
    ext.injectPlannerStrategy(_ => graft.plans.StrideSampleStrategy)
  }
}
