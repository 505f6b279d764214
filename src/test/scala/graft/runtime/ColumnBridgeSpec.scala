package graft.runtime

import graft.SparkSpec
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions._

/** The GraftColumnBridge drift TRIPWIRE (VERDICT r10 task 8). The
  * bridge pattern-matches Spark's PRIVATE ColumnNode AST
  * (`org.apache.spark.sql.internal`), so a Spark bump can drift under
  * it in two ways, and this spec converts both into loud CI signals:
  *
  *  - a SHAPE change (field added to a case class) breaks the bridge's
  *    unapply arity at COMPILE time — sbt always compiles against the
  *    running Spark, so that case needs no runtime check;
  *  - a SEMANTIC change (an operator's internal function NAME changes,
  *    e.g. "=" → "equals") silently maps a modeled conjunct to None —
  *    pruning vanishes with no failure anywhere. The positive cases
  *    below pin every node type the bridge CLAIMS to model to the
  *    exact catalyst class it must produce, so that drift fails here,
  *    naming the operator.
  *
  * The supported range is pinned to the version string: bumping Spark
  * past it must fail this suite until someone re-verifies the AST and
  * widens the pin — that is the intended maintenance gate.
  */
class ColumnBridgeSpec extends SparkSpec {

  private val SupportedSparkRange = """^4\.[01]\..*"""

  test(s"supported Spark range pin: bridge validated against 4.0-4.1") {
    assert(spark.version.matches(SupportedSparkRange),
      s"Spark ${spark.version} is outside GraftColumnBridge's validated " +
        "range (4.0-4.1). The bridge reads the private ColumnNode AST: " +
        "re-run this suite's model/decline cases against the new version, " +
        "then widen SupportedSparkRange in ColumnBridgeSpec AND the range " +
        "note on GraftColumnBridge.predicateConjuncts.")
  }

  private def one(c: org.apache.spark.sql.Column): Option[Expression] = {
    val cs = GraftColumnBridge.predicateConjuncts(c)
    assert(cs.size == 1, s"expected one conjunct, got $cs")
    cs.head
  }

  test("models every claimed node type, producing the exact catalyst class") {
    def expect[T <: Expression](c: org.apache.spark.sql.Column)(
        implicit ct: scala.reflect.ClassTag[T]): Unit = {
      val e = one(c)
      assert(e.isDefined, s"bridge DECLINED a claimed-modeled predicate: $c — " +
        "the internal function name it matches on has drifted")
      assert(ct.runtimeClass.isInstance(e.get),
        s"$c produced ${e.get.getClass.getSimpleName}, " +
          s"expected ${ct.runtimeClass.getSimpleName}")
    }
    expect[EqualTo](col("k") === 7L)
    expect[EqualNullSafe](col("k") <=> 7L)
    expect[GreaterThan](col("k") > 7L)
    expect[GreaterThanOrEqual](col("k") >= 7L)
    expect[LessThan](col("k") < 7L)
    expect[LessThanOrEqual](col("k") <= 7L)
    expect[IsNull](col("k").isNull)
    expect[IsNotNull](col("k").isNotNull)
    expect[In](col("k").isin(1L, 2L, 3L))
    expect[Not](!col("b"))
    expect[Or](col("k") === 1L || col("k") === 2L)
    // attribute and literal leaves resolve to the raw catalyst leaves
    one(col("k") === 7L).get match {
      case EqualTo(a, l) =>
        assert(a.isInstanceOf[org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute])
        assert(l == Literal(7L), s"literal must stay RAW (no cast), got $l")
      case other => fail(s"unexpected shape $other")
    }
    // top-level AND splits into conjuncts rather than nesting
    val cs = GraftColumnBridge.predicateConjuncts(
      col("k") === 1L && col("v") > 2L && col("w").isNull)
    assert(cs.size == 3 && cs.forall(_.isDefined), cs.toString)
  }

  test("declines everything outside the model as None conjuncts, never throwing") {
    val unmodelable = Seq(
      expr("k = 1"),                        // SQL-string node
      col("k") + 1 === 2L,                  // arithmetic inside the comparison
      lower(col("s")) === "x",              // function call over the attr
      udf((x: Long) => x > 0).apply(col("k")), // UDF node
      col("s").contains("x"),               // unmodeled predicate fn
      col("k").cast("string") === "7")      // cast wrapper
    unmodelable.foreach { c =>
      val cs = GraftColumnBridge.predicateConjuncts(c)
      assert(cs.nonEmpty && cs.forall(_.isEmpty),
        s"bridge must decline (None), not model or throw: $c -> $cs")
    }
    // a mixed predicate keeps the modelable conjunct and declines the rest
    val mixed = GraftColumnBridge.predicateConjuncts(
      col("k") === 1L && lower(col("s")) === "x")
    assert(mixed.size == 2 && mixed.head.isDefined && mixed(1).isEmpty, mixed.toString)
  }
}
