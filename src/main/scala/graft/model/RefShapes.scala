package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic derivations of the reference's source-table shapes
  * (SURVEY §1.2-1.3, FIXTURES.md §A) from the driver fixture tables
  * (FIXTURES.md §B), so the three reference model pipelines can run as
  * golden tests over the fixtures. The same arithmetic is mirrored
  * LITERALLY in the DuckDB oracle SQL (`graft.registry.ModelQueries`);
  * any edit here must be applied there too.
  *
  * Value domains are chosen to exercise every branch of the reference
  * logic: mixed-case bot useragents (ILIKE, traffic_daily_agg.sql:22-24),
  * the full refr_medium classifier domain incl. 'internal'/'paid'/NULL
  * (traffic_daily_agg.sql:35-42), NULLs in every NVL-guarded column, and
  * campaign_name values overlapping col_4's paid/organic/'unknown' output
  * domain so the spend join (traffic_daily_agg.sql:106-109) matches rows.
  *
  * All derivations are pure per-row expressions — codegen'd, no shuffle,
  * and scale-independent (modulo arithmetic on int64 columns).
  */
object RefShapes {

  private def nullStr: Column = lit(null).cast("string")

  /** `atomic.events` shape (14 cols, FIXTURES.md §A) from fixture `events`. */
  def eventsRef(events: DataFrame): DataFrame = {
    val eid = col("event_id")
    val uid = col("user_id")
    events.select(
      eid.cast("string").as("event_id"),
      col("ts").as("collector_tstamp"),
      concat(lit("u"), uid.cast("string")).as("domain_userid"),
      concat(lit("app"), (uid % 3).cast("string")).as("app_id"),
      when(col("event_type").isin("click", "view"), "page_view")
        .otherwise(col("event_type")).as("event"),
      when(eid % 11 === 0, "MegaBot/2.1")
        .when(eid % 11 === 1, "WebSpider/1.0")
        .when(eid % 11 === 2, "site-Crawler/3")
        .otherwise("Mozilla/5.0 (X11; Linux x86_64)").as("useragent"),
      when(eid % 13 === 0, "internal").when(eid % 13 === 1, "cpc")
        .when(eid % 13 === 2, "ppc").when(eid % 13 === 3, "paidsearch")
        .when(eid % 13 === 4, "display").when(eid % 13 === 5, "social")
        .when(eid % 13 === 6, "search").when(eid % 13 === 7, "email")
        .when(eid % 13 === 8, "").when(eid % 13 === 9, "unknown")
        .when(eid % 13 === 10, "paid").when(eid % 13 === 11, "referral")
        .otherwise(nullStr).as("refr_medium"),
      when(eid % 5 === 0, nullStr).when(eid % 5 === 1, "")
        .otherwise(concat(lit("net"), (eid % 5).cast("string"))).as("mkt_network"),
      when(eid % 7 === 0, nullStr)
        .otherwise(concat(lit("MSrc"), (eid % 7).cast("string"))).as("mkt_source"),
      when(eid % 4 === 0, nullStr)
        .otherwise(concat(lit("rsrc"), (eid % 4).cast("string"))).as("refr_source"),
      when(eid % 6 === 0, nullStr)
        .otherwise(concat(lit("Camp-"), (eid % 6).cast("string"))).as("mkt_campaign"),
      when(eid % 8 === 0, nullStr)
        .otherwise(concat(lit("term"), (eid % 8).cast("string"))).as("mkt_term"),
      when(eid % 9 === 0, nullStr)
        .otherwise(concat(lit("Med"), (eid % 9).cast("string"))).as("mkt_medium"),
      when(eid % 17 === 0, nullStr)
        .otherwise(concat(lit("/p/"), (eid % 50).cast("string"))).as("page_urlpath"))
  }

  /** `public.campaign_spends` shape (5 cols) from fixture `events`.
    * spend uses /4 so values are exact binary fractions (bit-identical in
    * any IEEE engine); campaign_name overlaps col_4's output domain.
    */
  def campaignSpendsRef(events: DataFrame): DataFrame = {
    val eid = col("event_id")
    val uid = col("user_id")
    events.filter(col("event_type") === "purchase" && eid % 2 === 0).select(
      (uid % 7).cast("string").as("company_id"),
      concat(lit("app"), (uid % 3).cast("string")).as("company_domain"),
      col("ts").as("spend_date"),
      when(eid % 4 === 0, "unknown")
        .when(eid % 4 === 1, concat(lit("term"), (eid % 8).cast("string")))
        .otherwise(concat(lit("Camp-"), (eid % 6).cast("string"))).as("campaign_name"),
      when(eid % 10 === 0, lit(null).cast("double"))
        .otherwise((eid % 97).cast("double") / 4).as("spend"))
  }

  /** `public.lead_stage_change_events` shape (19 cols) from fixture
    * `events` (signup slice). domain_userid shares the eventsRef domain so
    * the last-touch join (lead_activities_agg.sql:144-145) matches; NULLs
    * land in the four output-gate columns (:181-184).
    */
  def leadStageChangeEventsRef(events: DataFrame): DataFrame = {
    val eid = col("event_id")
    val uid = col("user_id")
    events.filter(col("event_type") === "signup" && eid % 3 === 0).select(
      concat(lit("Dom"), (uid % 20).cast("string")).as("company_domain"),
      (uid % 7).cast("string").as("company_id"),
      concat(lit("u"), uid.cast("string")).as("domain_userid"),
      concat(lit("L"), eid.cast("string")).as("lead_id"),
      concat(lit("P"), uid.cast("string")).as("person_id"),
      to_date(col("ts")).as("date"),
      (eid % 5).cast("string").as("lead_generator_id"),
      when(eid % 5 === 0, nullStr)
        .otherwise(concat(lit("Gen"), (eid % 5).cast("string"))).as("lead_generator_name"),
      (eid % 11).cast("string").as("lead_source_ehr_id"),
      when(eid % 12 === 0, nullStr)
        .otherwise((eid % 4).cast("string")).as("new_stage_id"),
      when(eid % 15 === 0, nullStr)
        .otherwise(concat(lit("Stage-"), (eid % 4).cast("string"))).as("new_stage_name"),
      when(eid % 10 === 0, nullStr)
        .otherwise((eid % 4).cast("string")).as("old_stage_id"),
      when(eid % 10 === 0, nullStr)
        .otherwise(concat(lit("Stage-"), ((eid + 3) % 4).cast("string"))).as("old_stage_name"),
      when(eid % 18 === 0, nullStr)
        .otherwise((eid % 3).cast("string")).as("pipeline_id"),
      when(eid % 21 === 0, nullStr)
        .otherwise(concat(lit("Pipe"), (eid % 3).cast("string"))).as("pipeline_name"),
      (eid % 30).cast("string").as("product_id"),
      concat(lit("Prod "), (eid % 30).cast("string")).as("product_name"),
      ((eid % 500).cast("double") + 0.5).as("product_price"),
      concat(lit("SKU-"), (eid % 30).cast("string")).as("product_sku"))
  }
}
