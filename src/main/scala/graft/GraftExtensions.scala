package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.VecDot

/** SparkSessionExtensions entry point: launch with
  * `--conf spark.sql.extensions=graft.GraftExtensions` and every session
  * (SQL included) gets the engine's native functions declaratively —
  * the cluster-deployment alternative to the imperative
  * `VectorFunctions.register(spark)` used by the library paths.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VecDot(exprs.head, exprs(1))))
}
