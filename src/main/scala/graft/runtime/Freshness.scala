package graft.runtime

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** dbt's `source freshness` check (`dbt source freshness`): is a source
  * table still being loaded? The reference declares sources
  * (`sources.yml`) but leaves `freshness:`/`loaded_at_field` unset —
  * this is the standard dbt affordance on that same surface.
  *
  * Semantics (dbt docs, source-freshness): age = now − max(loaded_at);
  * age > error_after ⇒ error, age > warn_after ⇒ warn, else pass. An
  * EMPTY source (no max) is an error — dbt cannot compute a freshness
  * snapshot either. `asOf` is caller-supplied like the Snapshots run
  * stamp: deterministic runs, pinnable oracles, no wall clock in the
  * engine. The check is one MAX aggregate — partial-aggregable,
  * map-side-combined, and at 100 TB it rides the column's parquet
  * row-group max stats rather than a full decode when the loaded-at
  * column is what the table is laid out on (the Materializer's
  * date-partitioned and range-clustered layouts both arrange exactly
  * that).
  *
  * Age arithmetic is whole SECONDS via epoch truncation on both sides
  * (timestamp→long), so thresholds compare integers — no sub-second
  * float riding in a gate.
  */
object Freshness {

  /** One-row freshness snapshot for one source table:
    * (src, max_loaded_at, age_s, status).
    */
  def check(df: DataFrame, loadedAtCol: String, source: String,
            asOf: java.sql.Timestamp,
            warnAfterS: Long, errorAfterS: Long): DataFrame = {
    require(warnAfterS <= errorAfterS,
      s"warn_after ($warnAfterS s) must not exceed error_after ($errorAfterS s)")
    df.agg(max(col(loadedAtCol)).cast("timestamp").as("max_loaded_at"))
      .select(
        lit(source).as("src"),
        col("max_loaded_at"),
        (lit(asOf).cast("long") - col("max_loaded_at").cast("long")).as("age_s"))
      .withColumn("status",
        when(col("max_loaded_at").isNull || col("age_s") > errorAfterS, lit("error"))
          .when(col("age_s") > warnAfterS, lit("warn"))
          .otherwise(lit("pass")))
  }

  /** Fold per-source checks into one snapshot frame — the CI-gate shape,
    * like `Checks.summary`.
    */
  def summary(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty,
      "Freshness.summary: no checks supplied — pass at least one Freshness.check frame")
    checks.reduce(_ unionByName _)
  }
}
