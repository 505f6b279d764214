package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{MinHashSig, VecDot}

/** SparkSessionExtensions entry point: launch with
  * `--conf spark.sql.extensions=graft.GraftExtensions` and every session
  * (SQL included) gets the engine's native functions declaratively —
  * the cluster-deployment alternative to the imperative
  * `VectorFunctions.register(spark)` used by the library paths.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VecDot(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => exprs(1) match {
        case Literal(k: Int, _) => MinHashSig(exprs.head, k)
        case other => throw new IllegalArgumentException(
          s"minhash_sig(arr, k): k must be an int literal, got $other")
      }))
  }
}
