package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute => CAttr}
import org.apache.spark.sql.catalyst.expressions.{And, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal => CLit, Not, Or}
import org.apache.spark.sql.internal.{ColumnNode, Literal => NLit, UnresolvedAttribute => NAttr, UnresolvedFunction => NFn}

/** Bridge from the Spark 4 Column API to catalyst expression trees for
  * PREDICATE INSPECTION (graft.runtime.FragmentedTable's zone-map
  * probe). Spark 4 removed the public `Column.expr` accessor when
  * Column became a shared classic/connect wrapper around an internal
  * ColumnNode AST, and the official converter defers to the ANALYZER
  * (whose type coercion wraps literals in casts and needs a plan to
  * resolve against). The probe only needs the comparison SHAPE —
  * attr-vs-literal conjuncts — so this bridge translates the ColumnNode
  * AST structurally: known boolean/comparison functions become their
  * typed catalyst nodes with raw literals, and anything else becomes
  * None ("opaque"), which consumers must treat as un-prunable. It lives
  * in the `org.apache.spark.sql` package purely to satisfy the
  * `private[sql]` access qualifier on `Column.node`.
  */
object GraftColumnBridge {

  /** The analyzer-deferred converter (kept for callers that want the
    * full expression and can afford resolution semantics).
    */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  def nodeOf(c: Column): ColumnNode = c.node

  /** Top-level conjuncts of the predicate, each translated to a typed
    * catalyst comparison tree, or None where the conjunct contains any
    * construct the translator doesn't model (function calls, SQL
    * strings, arithmetic, UDFs, ...). A None conjunct still FILTERS at
    * execution time — it just cannot justify skipping data.
    *
    * SUPPORTED SPARK RANGE: written against the Spark 4.x ColumnNode
    * AST (`org.apache.spark.sql.internal`, present since 4.0). The
    * design degrade is SOFT by construction: any node shape this
    * translator does not recognize — including shapes a future Spark
    * minor introduces or renames — maps to None, and every consumer
    * treats None as "scan, don't skip". An API drift therefore costs
    * pruning, never correctness; FragmentSkipSpec pins the fallback
    * with deliberately unmodelable predicates. A drift that breaks
    * COMPILATION (e.g. `Column.node` moving again) fails loudly at
    * build time, which is the desired failure mode for a private-API
    * shim. The SILENT drift mode — an internal function name change
    * turning a modeled conjunct into None, costing pruning with no
    * failure anywhere — is tripwired by ColumnBridgeSpec, which pins
    * every claimed node type to its exact catalyst class and pins the
    * validated Spark range; widen both together on a version bump.
    */
  def predicateConjuncts(c: Column): Seq[Option[Expression]] = split(c.node)

  /** The SAME top-level conjunct split as [[predicateConjuncts]] —
    * index-aligned with it — but each conjunct handed back as an
    * EXECUTABLE Column (its original ColumnNode re-wrapped, so filter
    * semantics are exactly the conjunct's within the original
    * predicate). Lets a consumer that proved a conjunct safe to push
    * (e.g. key-only conjuncts below a last-writer-wins merge) apply it
    * without a catalyst→Column round-trip.
    */
  def conjunctColumns(c: Column): Seq[Column] = splitNodes(c.node).map(Column(_))

  private def split(n: ColumnNode): Seq[Option[Expression]] =
    splitNodes(n).map(toExpr)

  private def splitNodes(n: ColumnNode): Seq[ColumnNode] = n match {
    case NFn("and", Seq(l, r), _, _, _, _) => splitNodes(l) ++ splitNodes(r)
    case other                             => Seq(other)
  }

  private def toExpr(n: ColumnNode): Option[Expression] = n match {
    case NFn(name, args, _, _, _, _) =>
      lazy val t = args.map(toExpr)
      (name, args.size) match {
        case ("and", 2) => for { l <- t(0); r <- t(1) } yield And(l, r)
        case ("or", 2)  => for { l <- t(0); r <- t(1) } yield Or(l, r)
        case ("!", 1)   => t(0).map(Not)
        case ("=", 2) | ("==", 2) => for { l <- t(0); r <- t(1) } yield EqualTo(l, r)
        case ("<=>", 2) => for { l <- t(0); r <- t(1) } yield EqualNullSafe(l, r)
        case (">", 2)   => for { l <- t(0); r <- t(1) } yield GreaterThan(l, r)
        case (">=", 2)  => for { l <- t(0); r <- t(1) } yield GreaterThanOrEqual(l, r)
        case ("<", 2)   => for { l <- t(0); r <- t(1) } yield LessThan(l, r)
        case ("<=", 2)  => for { l <- t(0); r <- t(1) } yield LessThanOrEqual(l, r)
        case ("isNull", 1)    => t(0).map(IsNull)
        case ("isNotNull", 1) => t(0).map(IsNotNull)
        case ("in", sz) if sz >= 2 =>
          val ts = args.map(toExpr)
          if (ts.forall(_.isDefined)) Some(In(ts.head.get, ts.tail.map(_.get)))
          else None
        case _ => None
      }
    case NAttr(nameParts, _, _, _) => Some(CAttr(nameParts))
    case NLit(value, dtOpt, _) =>
      scala.util.Try(dtOpt.fold(CLit(value))(dt => CLit.create(value, dt))).toOption
    case _ => None
  }
}
