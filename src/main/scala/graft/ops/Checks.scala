package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** dbt schema-test analogs (`unique`, `not_null`, `accepted_values`,
  * `relationships` — the four built-ins every dbt project leans on; the
  * reference declares none, `tests/.gitkeep`, but a switching user
  * expects the harness). Each check returns its VIOLATION rows — empty
  * means pass — so callers can count, sample, or quarantine them;
  * [[summary]] folds a batch of checks into the one-row-per-check frame
  * a CI gate reads.
  *
  * Scale: unique is one partial-aggregated count shuffle; not_null and
  * accepted_values are map-side filters; relationships is an anti-join
  * against the DISTINCT parent keys (dimension-sized → broadcastable,
  * and the planner/AQE decides — no forced hint, parents are unbounded
  * in general).
  */
object Checks {

  /** Key tuples appearing more than once: (cols..., n). */
  def unique(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)

  /** Rows with a NULL in `c`. */
  def notNull(df: DataFrame, c: String): DataFrame = df.filter(col(c).isNull)

  /** Rows whose non-null `c` is outside `allowed` (NULLs pass — that is
    * `not_null`'s job, mirroring dbt's split).
    */
  def acceptedValues(df: DataFrame, c: String, allowed: Seq[String]): DataFrame =
    df.filter(col(c).isNotNull && !col(c).isin(allowed: _*))

  /** Child rows whose non-null foreign key has no parent (orphans). */
  def relationships(child: DataFrame, childCol: String,
                    parent: DataFrame, parentCol: String): DataFrame =
    child.filter(col(childCol).isNotNull)
      .join(parent.select(col(parentCol).as(childCol)).distinct(),
        Seq(childCol), "left_anti")

  /** Fold named checks into (check, violations) — the CI-gate frame. */
  def summary(checks: Seq[(String, DataFrame)]): DataFrame = {
    require(checks.nonEmpty, "summary needs at least one check")
    checks.map { case (name, v) =>
      v.agg(count(lit(1)).as("violations"))
        .select(lit(name).as("check"), col("violations"))
    }.reduce(_.unionByName(_))
  }
}
