package graft.runtime

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

/** dbt's `on_schema_change` contract for incremental models: what happens
  * when a fresh batch's schema drifts from the materialized table's
  * (reference config surface: the same `materialized='incremental'`
  * blocks SURVEY §2.10 covers — the reference leaves the knob at dbt's
  * default, `ignore`).
  *
  * Modes (dbt docs, incremental-models):
  *  - `Ignore` (dbt default): columns ADDED by the batch are not written;
  *    the table schema never changes. A column the batch REMOVED is an
  *    error — the insert cannot supply it (dbt fails the same way).
  *  - `Fail`: any name/type difference aborts the run.
  *  - `AppendNewColumns`: added columns widen the table (pre-existing
  *    rows read NULL there); removed columns STAY in the table and the
  *    batch's rows carry NULL for them.
  *  - `SyncAllColumns`: the table takes the batch's schema exactly —
  *    added columns widen, departed columns drop.
  *
  * [[align]] is a pure frame function: both sides come back with the
  * IDENTICAL target schema (names, order, types), ready for the upsert's
  * anti-join ∪ union. Missing columns materialize as typed NULL literals
  * — a metadata-only projection, no data pass, so evolution costs
  * nothing at scale beyond the rewrite the upsert already does.
  */
sealed trait SchemaChange
object SchemaChange {
  case object Ignore extends SchemaChange
  case object Fail extends SchemaChange
  case object AppendNewColumns extends SchemaChange
  case object SyncAllColumns extends SchemaChange
}

object SchemaEvolution {

  /** Align `prior` (the materialized table) and `fresh` (the new batch)
    * to one target schema per `mode`. Returns (prior', fresh') with
    * identical columns in target order.
    */
  def align(prior: DataFrame, fresh: DataFrame,
            mode: SchemaChange): (DataFrame, DataFrame) = {
    val pCols = prior.columns.toSeq
    val fCols = fresh.columns.toSeq
    val pSet = pCols.toSet
    val fSet = fCols.toSet

    def typeOf(df: DataFrame, n: String) = df.schema(df.schema.fieldIndex(n)).dataType
    def project(df: DataFrame, has: Set[String], other: DataFrame,
                target: Seq[String]): DataFrame =
      df.select(target.map { n =>
        if (has(n)) col(n) else lit(null).cast(typeOf(other, n)).as(n)
      }: _*)

    mode match {
      case SchemaChange.Fail =>
        val pTyped = pCols.map(n => n -> typeOf(prior, n)).toSet
        val fTyped = fCols.map(n => n -> typeOf(fresh, n)).toSet
        require(pTyped == fTyped,
          s"on_schema_change=fail: batch schema drifted (table: $pCols, batch: $fCols)")
        (prior, fresh.select(pCols.map(col): _*))
      case SchemaChange.Ignore =>
        val removed = pSet -- fSet
        require(removed.isEmpty,
          s"on_schema_change=ignore: batch is missing table column(s) ${removed.mkString(", ")}")
        // added batch columns are silently not written. Shared columns
        // whose TYPE drifted are cast back to the table's type — the
        // documented contract is "the table schema never changes", and
        // without the cast the downstream unionByName would silently
        // coerce the materialized schema to a widened common type.
        // Only LOSSLESS drifts qualify (Catalyst's up-cast rule): a
        // lossy cast would null un-castable values row by row — silent
        // corruption — so it errors like the removed-column case.
        val lossy = pCols.filter { n =>
          val (pt, ft) = (typeOf(prior, n), typeOf(fresh, n))
          pt != ft &&
            !org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(ft, pt)
        }
        require(lossy.isEmpty,
          s"on_schema_change=ignore: batch column(s) ${lossy.mkString(", ")} " +
            "drifted to a type that cannot cast losslessly back to the " +
            "table's; fix upstream or use sync_all_columns")
        (prior, fresh.select(pCols.map(n => col(n).cast(typeOf(prior, n)).as(n)): _*))
      case SchemaChange.AppendNewColumns =>
        val target = pCols ++ fCols.filterNot(pSet)
        (project(prior, pSet, fresh, target), project(fresh, fSet, prior, target))
      case SchemaChange.SyncAllColumns =>
        (project(prior, pSet, fresh, fCols), fresh)
    }
  }
}
