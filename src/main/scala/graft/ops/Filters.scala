package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Filter/predicate operators (SURVEY §2.2 P3-P10).
  *
  * Reference semantics replicated:
  *  - P4: Redshift `!=`/`<>` drops NULL rows (non-null-safe) — Spark `=!=`
  *    matches (reference: traffic_daily_agg.sql:21).
  *  - P5: `NOT ILIKE '%bot%'` ×3 case-insensitive bot exclusion
  *    (reference: traffic_daily_agg.sql:22-24).
  *  - P10: incremental high-watermark `date > max(prior)` with 1900-01-01
  *    default (reference: traffic_pages_agg.sql:20-24).
  *
  * All are Column expressions → fully codegen'd and pushed to the parquet
  * scan by Catalyst (PushedFilters); nothing here costs a shuffle.
  */
object Filters {

  /** P5 — case-insensitive multi-pattern exclusion (Redshift NOT ILIKE ×3).
    * Spark's `ilike` compiles to a codegen'd LIKE over lower(); stays inside
    * WholeStageCodegen and pushes a StringContains-ish filter to parquet.
    */
  def notIlikeAny(c: Column, patterns: Seq[String]): Column =
    patterns.map(p => !c.ilike(p)).reduce(_ && _)

  /** The reference bot gate (traffic_daily_agg.sql:22-24): useragent NOT
    * ILIKE any of %bot%, %spider%, %crawl%. NULL useragent rows are dropped
    * (NOT ILIKE on NULL is NULL → filtered), matching Redshift.
    */
  def botFilter(useragent: Column): Column =
    notIlikeAny(useragent, Seq("%bot%", "%spider%", "%crawl%"))

  /** P3 + P4 — event-kind gate (traffic_daily_agg.sql:20-21). */
  def pageViewFilter(event: Column, refrMedium: Column): Column =
    event === "page_view" && refrMedium =!= "internal"

  /** P6 — n-column NOT NULL output gate (lead_activities_agg.sql:181-184). */
  def notNullGate(df: DataFrame, cols: Seq[String]): DataFrame =
    df.filter(cols.map(col(_).isNotNull).reduce(_ && _))

  /** P10/A4 — incremental high-watermark predicate. `prior` is the model's
    * previous materialization (None on first run → no filter, full scan).
    * The MAX is collected on the driver (one tiny job over the prior
    * output's single column — column-pruned scan), mirroring dbt's
    * compile-time scalar subquery rather than a Spark correlated subquery
    * (reference: lead_activities_agg.sql:13-15).
    *
    * When a prior EXISTS but its max date is NULL (empty table, or all
    * dates NULL), the reference's `NVL(MAX(..), '1900-01-01')` still
    * applies `date > '1900-01-01'` — which drops NULL-date rows — so the
    * fallback date is returned rather than skipping the filter.
    */
  val watermarkEpoch: java.sql.Date = java.sql.Date.valueOf("1900-01-01")

  def watermark(prior: Option[DataFrame], wmCol: String): Option[java.sql.Date] =
    prior.map { p =>
      val row = p.agg(max(col(wmCol))).head()
      if (row.isNullAt(0)) watermarkEpoch else row.getDate(0)
    }

  def watermarkFilter(df: DataFrame, dateCol: String, wm: Option[java.sql.Date]): DataFrame =
    wm.fold(df)(d => df.filter(col(dateCol) > lit(d)))
}
