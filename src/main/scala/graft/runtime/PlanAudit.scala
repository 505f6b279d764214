package graft.runtime

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.catalyst.expressions.{Attribute, BinaryComparison, Expression, Literal, ScalaUDF}
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, ProjectExec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Static scale audit of a query's physical plan: the checklist a plan
  * review applies before a job is let anywhere near 100 TB, as a library
  * call. Every gate the engine's own plan-shape specs enforce
  * (PlanShapeSpec and friends) exists here as a reusable detector, so a
  * USER pipeline built on the engine can be linted the same way the
  * engine lints itself.
  *
  * Detectors (each conservative — a finding is a reviewed judgement
  * call, absence of findings is not a proof):
  *
  *  - `cartesian-product` (high): CartesianProduct or
  *    BroadcastNestedLoopJoin — O(|L|·|R|) row pairs; at scale this is
  *    the difference between minutes and weeks.
  *  - `single-partition-window` (high): a window function with an empty
  *    PARTITION BY — every row flows through ONE task regardless of
  *    cluster size (the documented cost of the reference's global
  *    ROW_NUMBER quirk; `Ids.scaleSafeId` is the shipped alternative).
  *  - `broadcastable-shuffle-join` (medium): a shuffle join whose
  *    smaller side's optimizer estimate fits the broadcast threshold —
  *    usually a missed `broadcast()` hint or a disabled/too-low
  *    `spark.sql.autoBroadcastJoinThreshold`.
  *  - `missing-pushdown` (medium): a Filter with pushable
  *    column-vs-literal conjuncts sitting on a file scan that pushed
  *    NOTHING down (e.g. pushdown disabled by conf, or a source format
  *    without filter support) — the scan reads and materializes rows
  *    the filter immediately drops.
  *  - `scala-udf` (info): an opaque UDF in a Project/Filter — evaluated
  *    outside expression codegen and invisible to the optimizer;
  *    fine when necessary (the engine's own Bloom-probe/BPE UDFs), but
  *    worth knowing about in a hot path.
  *  - `global-sort` (info): a total ordering (range-partitioned sort) —
  *    legitimate for bounded output, a scale smell before a wide
  *    transform.
  *
  * Metrics count shuffles, broadcasts and scans so a review can track
  * plan-shape drift numerically.
  */
object PlanAudit {

  /** Enforcement posture a [[Materializer]] applies to every frame it
    * is about to commit (both the DataFrame-API and SQL-text model
    * surfaces funnel through the same commit seam):
    *  - [[Mode.Off]] (default): no audit — byte-identical to pre-audit
    *    behavior;
    *  - [[Mode.Log]]: audit and log structured findings on
    *    high-severity results, then write anyway — the observability
    *    posture for existing pipelines;
    *  - [[Mode.Enforce]]: REFUSE to materialize a plan with a
    *    high-severity finding ([[PlanAuditException]], nothing
    *    written) — the CI posture: a planted cartesian join fails the
    *    run instead of burning the cluster.
    */
  sealed trait Mode
  object Mode {
    case object Off extends Mode
    case object Log extends Mode
    case object Enforce extends Mode
  }

  /** A refused materialization under [[Mode.Enforce]]; carries the full
    * report so callers can render or triage findings programmatically.
    */
  final class PlanAuditException(msg: String, val report: Report)
    extends RuntimeException(msg)

  final case class Finding(kind: String, severity: String, node: String,
                           detail: String)

  final case class Report(findings: Seq[Finding], metrics: Map[String, Long]) {
    def highSeverity: Seq[Finding] = findings.filter(_.severity == "high")
    def render: String =
      (metrics.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
        .mkString("metrics: ", " ", "") +:
        findings.map(f => s"[${f.severity}] ${f.kind} @ ${f.node}: ${f.detail}"))
        .mkString("\n")
  }

  def audit(ds: Dataset[_]): Report = {
    val plan = ds.queryExecution.executedPlan
    val nodes = flatten(plan)
    val findings = nodes.flatMap(inspect(_, ds))
    val metrics = Map(
      "shuffles"   -> nodes.count(_.isInstanceOf[ShuffleExchangeExec]).toLong,
      "broadcasts" -> nodes.count(_.isInstanceOf[BroadcastExchangeExec]).toLong,
      "file_scans" -> nodes.count(_.isInstanceOf[FileSourceScanExec]).toLong,
      "joins"      -> nodes.count(n => n.nodeName.toLowerCase.contains("join")).toLong)
    Report(findings, metrics)
  }

  /** Physical tree including AQE-wrapped stages and reused exchanges. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val here = p match {
      case a: AdaptiveSparkPlanExec => Seq(a) ++ flatten(a.executedPlan)
      case q: QueryStageExec        => Seq(q) ++ flatten(q.plan)
      case r: ReusedExchangeExec    => Seq(r) ++ flatten(r.child)
      case other                    => Seq(other) ++ other.children.flatMap(flatten)
    }
    here.distinct
  }

  private def inspect(node: SparkPlan, ds: Dataset[_]): Seq[Finding] = node match {
    case j: CartesianProductExec =>
      Seq(Finding("cartesian-product", "high", j.nodeName,
        "O(|L|*|R|) pair explosion; add an equi-join key or an explicit bound"))
    case j: BroadcastNestedLoopJoinExec =>
      Seq(Finding("cartesian-product", "high", j.nodeName,
        "nested-loop join (non-equi predicate); every probe row scans the " +
          "whole broadcast side"))
    case w: WindowExec if w.partitionSpec.isEmpty =>
      Seq(Finding("single-partition-window", "high", w.nodeName,
        "window with no PARTITION BY: all rows on one task; " +
          "partition the window or use a scale-safe id"))
    case j: SortMergeJoinExec =>
      broadcastableSide(ds, j.left, j.right, j.joinType).map { bytes =>
        Finding("broadcastable-shuffle-join", "medium", j.nodeName,
          s"smaller legally-buildable side estimated ~$bytes bytes: " +
            "broadcast() it instead of shuffling both sides")
      }.toSeq
    case j: ShuffledHashJoinExec =>
      broadcastableSide(ds, j.left, j.right, j.joinType).map { bytes =>
        Finding("broadcastable-shuffle-join", "medium", j.nodeName,
          s"smaller legally-buildable side estimated ~$bytes bytes: " +
            "broadcast() it instead of shuffling both sides")
      }.toSeq
    case f: FilterExec =>
      val udf = if (hasUdf(f.condition))
        Seq(Finding("scala-udf", "info", f.nodeName,
          "filter evaluates an opaque UDF; no codegen, no pushdown")) else Nil
      val push = scanBeneath(f.child) match {
        case Some(scan)
          if !formatPushesFilters(scan, ds) && hasPushableConjunct(f.condition) =>
          Seq(Finding("missing-pushdown", "medium", scan.nodeName,
            "pushable column-vs-literal predicate evaluated above a " +
              s"${formatName(scan)} scan that will not use it; " +
              "switch format or enable the format's filterPushdown conf"))
        case _ => Nil
      }
      udf ++ push
    case p: ProjectExec if p.projectList.exists(hasUdf) =>
      Seq(Finding("scala-udf", "info", p.nodeName,
        "projection evaluates an opaque UDF; no codegen"))
    case s: SortExec if s.global =>
      Seq(Finding("global-sort", "info", s.nodeName,
        "total ordering (range shuffle); fine for bounded output, " +
          "a smell mid-pipeline"))
    case _ => Nil
  }

  private def hasUdf(e: Expression): Boolean =
    e.exists(_.isInstanceOf[ScalaUDF])

  /** The file scan directly under `p`, looking through the execution
    * plumbing (columnar-to-row bridges, codegen adapters) that sits
    * between a Filter and its scan in a prepared plan.
    */
  private def scanBeneath(p: SparkPlan): Option[FileSourceScanExec] = p match {
    case s: FileSourceScanExec => Some(s)
    case u if u.children.size == 1 &&
      (u.nodeName.contains("ColumnarToRow") || u.nodeName.contains("InputAdapter") ||
        u.nodeName.contains("WholeStageCodegen")) => scanBeneath(u.children.head)
    case _ => None
  }

  /** Will this scan's FORMAT actually evaluate pushed filters? The
    * v1 scan's `PushedFilters` metadata lists every TRANSLATABLE filter
    * whether or not the reader consumes it, so the real signal is the
    * format class plus its pushdown conf. Unknown formats are treated
    * as non-pushing (the finding asks the reviewer to check).
    */
  private def formatPushesFilters(scan: FileSourceScanExec, ds: Dataset[_]): Boolean = {
    def on(key: String) =
      ds.sparkSession.conf.get(key, "true").equalsIgnoreCase("true")
    formatName(scan) match {
      case "ParquetFileFormat" => on("spark.sql.parquet.filterPushdown")
      case "OrcFileFormat"     => on("spark.sql.orc.filterPushdown")
      case "CSVFileFormat"     => on("spark.sql.csv.filterPushdown.enabled")
      case "JsonFileFormat"    => on("spark.sql.json.filterPushdown.enabled")
      case _                   => false
    }
  }

  private def formatName(scan: FileSourceScanExec): String =
    scan.relation.fileFormat.getClass.getSimpleName

  /** A conjunct a columnar source could push: attribute <cmp> literal. */
  private def hasPushableConjunct(cond: Expression): Boolean = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    conjuncts(cond).exists {
      case c: BinaryComparison =>
        (c.left.isInstanceOf[Attribute] && c.right.isInstanceOf[Literal]) ||
          (c.left.isInstanceOf[Literal] && c.right.isInstanceOf[Attribute])
      case _ => false
    }
  }

  /** Smallest LEGALLY-BUILDABLE side's optimizer size estimate, when it
    * fits the broadcast bar but was shuffled anyway. Build-side legality
    * follows Spark's own join-strategy rules (a full-outer join can
    * broadcast neither side; a left-outer only its right; a right-outer
    * only its left), so the finding never recommends a hint Spark would
    * ignore. With broadcasting disabled (threshold <= 0) the bar falls
    * back to 10 MB — exactly the configuration under which this finding
    * is most useful.
    */
  private def broadcastableSide(ds: Dataset[_], left: SparkPlan,
                                right: SparkPlan,
                                joinType: org.apache.spark.sql.catalyst.plans.JoinType)
      : Option[BigInt] = {
    import org.apache.spark.sql.catalyst.plans._
    val canBuildRight = joinType match {
      case _: InnerLike | LeftOuter | LeftSemi | LeftAnti => true
      case _: ExistenceJoin                               => true
      case _                                              => false
    }
    val canBuildLeft = joinType match {
      case _: InnerLike | RightOuter => true
      case _                         => false
    }
    val conf = ds.sparkSession.conf
    val threshold = BigInt(conf.get("spark.sql.autoBroadcastJoinThreshold",
      "10485760").stripSuffix("b").stripSuffix("B") match {
      case t if t.forall(c => c.isDigit || c == '-') => t
      case _ => "10485760"
    })
    val bar = if (threshold > 0) threshold else BigInt(10485760)
    val sizes = (if (canBuildLeft) sideSize(left) else None).toSeq ++
      (if (canBuildRight) sideSize(right) else None).toSeq
    sizes.sorted.headOption.filter(_ <= bar)
  }

  private def sideSize(p: SparkPlan): Option[BigInt] =
    p.logicalLink.map(_.stats.sizeInBytes)
      .orElse(p.children.headOption.flatMap(sideSize))
}
