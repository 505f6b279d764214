package graft.runtime

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** dbt model CONTRACTS (`contract: {enforced: true}`): a model declares
  * its output schema — column names, types, and constraints — and the
  * run FAILS if the build drifts from it, instead of silently shipping
  * a changed shape downstream. The reference declares no contracts
  * (like most dbt projects), but the affordance is part of the same
  * config surface as `on_schema_change`; together they cover both
  * directions — contracts reject drift at the producing model,
  * schema-change policy absorbs it at the consuming table.
  *
  * Semantics mirrored from dbt:
  *  - name + type must match EXACTLY, order-insensitively; extra and
  *    missing columns are both breaches (dbt compares the compiled
  *    schema the same way). The error names every offending column.
  *  - `not_null` constraints are enforced on the DATA, like the NOT
  *    NULL DDL dbt emits: any null in a constrained column fails the
  *    run. This is one combined aggregate over all constrained columns
  *    — a single pass, partial-aggregable, and the same cost shape the
  *    warehouse pays to check its own constraints on insert.
  *  - [[enforce]] returns the frame RE-SELECTED in contract order, so a
  *    contracted model's physical column order is pinned by the
  *    contract, not by incidental build internals (dbt's "column order
  *    is governed by the yml" behavior).
  */
object Contract {

  /** One contracted column. `notNull` is the constraint dbt enforces
    * natively on every adapter.
    */
  final case class Col(name: String, dataType: DataType, notNull: Boolean = false)

  /** Validate `df` against the contract; throws IllegalArgumentException
    * naming every breach, else returns `df` in contract column order.
    * Schema checks are metadata-only; the not-null check runs one
    * aggregate job over the constrained columns (skipped when none).
    */
  def enforce(df: DataFrame, contract: Seq[Col]): DataFrame = {
    val have = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val want = contract.map(c => c.name -> c.dataType).toMap
    val missing = contract.map(_.name).filterNot(have.contains)
    val extra = df.columns.filterNot(want.contains)
    val mistyped = contract.filter(c =>
      have.get(c.name).exists(_ != c.dataType))
    val breaches =
      missing.map(n => s"missing column $n") ++
      extra.map(n => s"undeclared column $n") ++
      mistyped.map(c => s"column ${c.name}: contract ${c.dataType.simpleString}, build ${have(c.name).simpleString}")
    require(breaches.isEmpty, s"contract breach: ${breaches.mkString("; ")}")

    val constrained = contract.filter(_.notNull).map(_.name)
    if (constrained.nonEmpty) {
      val counts = df.agg(
        count(lit(1)).as("__rows"),
        constrained.map(n => count(col(n)).as(n)): _*).head()
      val rows = counts.getLong(0)
      val violated = constrained.zipWithIndex.collect {
        case (n, i) if counts.getLong(i + 1) < rows =>
          s"$n (${rows - counts.getLong(i + 1)} null row(s))"
      }
      require(violated.isEmpty,
        s"not_null constraint violated: ${violated.mkString(", ")}")
    }
    df.select(contract.map(c => col(c.name)): _*)
  }
}
