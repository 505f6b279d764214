package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for dense-vector dot products.
  *
  * Why not built-ins: `aggregate`/`zip_with` higher-order lambdas are
  * interpreted per element (measured 67 s for the 2M-pair cosine scan at
  * sf0.1), and unrolling 64 `element_at` terms bloats the expression
  * tree until planning+codegen dominates (110 s). This expression
  * generates a single primitive `for` loop over the two `ArrayData`
  * buffers — no boxing, no per-element virtual dispatch — and stays
  * inside whole-stage codegen (SURVEY §7 "custom Expression only if
  * bench demands": it did).
  *
  * Null elements inside the arrays are treated as 0-contribution
  * undefined behavior (embeddings are dense); a NULL array yields NULL.
  */
case class VecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<double> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column-API access for the vector expressions. */
object VectorFunctions {

  /** Idempotent per-session registration (the analyzer resolves
    * `call_function("vec_dot", ...)` against the session's registry, so
    * every session that runs these plans must register first).
    */
  def register(spark: SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction("vec_dot",
        exprs => VecDot(exprs.head, exprs(1)), "built-in")

  /** Codegen'd dot product of two array<double> columns. */
  def vecDot(a: Column, b: Column): Column = call_function("vec_dot", a, b)
}
