package graft.runtime

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.{LeadActivitiesAgg, RefShapes, TrafficDailyAgg, TrafficPagesAgg}
import graft.ops.Filters

/** Explicit model DAG (SURVEY §3 step 2): the reference hides the
  * traffic_daily_agg → lead_activities_agg dependency by reading model 1's
  * output *as a source* (sources.yml:12 + lead_activities_agg.sql:110), so
  * dbt would not order them; correct operation silently assumes model 1
  * ran first. Here the edge is explicit — model 3 receives model 1's
  * freshly materialized output.
  *
  * Each node runs through `Materializer` (incremental upsert-by-id,
  * SURVEY §2.10); on a cluster the nodes without edges (daily ∥ pages)
  * are independent Spark jobs and can run concurrently.
  *
  * @param log sink for the A5 debug lines (default: stdout); injectable
  *            so ModelDagSpec can assert on them.
  */
final class ModelDag(sources: Sources, mat: Materializer,
                     log: String => Unit = m => println(m)) {

  /** Materialize all three models in dependency order; returns each
    * model's post-upsert output.
    */
  def run(): Map[String, DataFrame] = {
    val events = RefShapes.eventsRef(sources.events)
    val daily = mat.materialize("traffic_daily_agg", "id")(prior =>
      TrafficDailyAgg.build(events, RefShapes.campaignSpendsRef(sources.events), prior))
    val pages = mat.materialize("traffic_pages_agg", "id")(prior =>
      TrafficPagesAgg.build(events, prior))
    logLeadDebugCounts(events)
    val leads = mat.materialize("lead_activities_agg", "id")(prior =>
      LeadActivitiesAgg.build(events,
        RefShapes.leadStageChangeEventsRef(sources.events), daily, prior))
    Map("traffic_daily_agg" -> daily, "traffic_pages_agg" -> pages,
      "lead_activities_agg" -> leads)
  }

  /** The same DAG run driven entirely through the SQL surface — the
    * reference user's `dbt run`: every model executes its SQL text with
    * the `{{ this }}` seam resolved to the prior materialized table
    * (seam wiring shared with the gated queries via SqlModels'
    * per-model helpers), the A5 debug scalars log before model 3 just
    * like the reference's run_query block, and the hidden DAG edge
    * resolves to model 1's freshly MATERIALIZED output (not an inline
    * rebuild), exactly as dbt reads the warehouse table. Output is
    * row-identical to [[run]] (asserted in ModelDagSpec) — the two
    * surfaces share sources, Materializer, and semantics.
    */
  def runSql(): Map[String, DataFrame] = {
    val spark = sources.events.sparkSession
    graft.sql.SqlModels.registerCatalog(spark, sources.dir)
    import graft.sql.SqlModels
    val daily = mat.materialize("traffic_daily_agg", "id") { prior =>
      val (ev, sp) = prior.map { p =>
        p.createOrReplaceTempView("graft_dag_this_daily")
        SqlModels.dailyIncrementalWheres("graft_dag_this_daily")
      }.getOrElse(("", ""))
      SqlModels.runDaily(spark, ev, sp)
    }
    val pages = mat.materialize("traffic_pages_agg", "id") { prior =>
      val where = prior.map { p =>
        p.createOrReplaceTempView("graft_dag_this_pages")
        SqlModels.pagesIncrementalWhere("graft_dag_this_pages")
      }.getOrElse("")
      SqlModels.runPages(spark, where)
    }
    daily.createOrReplaceTempView(
      SqlModels.sourceView("public_public", "traffic_daily_agg"))
    logLeadDebugCounts(RefShapes.eventsRef(sources.events))
    val leads = mat.materialize("lead_activities_agg", "id") { prior =>
      val where = prior.map { p =>
        p.createOrReplaceTempView("graft_dag_this_leads")
        SqlModels.leadsIncrementalWhere("graft_dag_this_leads")
      }.getOrElse("")
      spark.sql(SqlModels.leadActivitiesAggSql(where))
    }
    Map("traffic_daily_agg" -> daily, "traffic_pages_agg" -> pages,
      "lead_activities_agg" -> leads)
  }

  /** A5 — the reference's compile-time `run_query` debug block
    * (lead_activities_agg.sql:9-31): immediately before model 3 runs, dbt
    * executes two scalar count queries on the driver and logs them —
    * (a) the lead-source input count, watermarked on `date >
    * max(activity_date)` of the prior output when incremental, and
    * (b) COUNT(DISTINCT domain_userid) over the bot-/internal-filtered
    * page_view events. Both are O(1)-result driver collects mirroring
    * dbt's pre-run scalars; neither feeds the pipeline (logging only).
    */
  private def logLeadDebugCounts(events: DataFrame): Unit = {
    val leadsSrc = RefShapes.leadStageChangeEventsRef(sources.events)
    val wm = Filters.watermark(mat.readPrior("lead_activities_agg"), "activity_date")
    val leadCount = Filters.watermarkFilter(leadsSrc, "date", wm).count()
    log(s"Lead activities input count: $leadCount")
    val eventUserCount = events
      .filter(col("event") === "page_view" &&
        Filters.botFilter(col("useragent")) &&
        col("refr_medium") =!= "internal")
      .agg(countDistinct(col("domain_userid"))).head().getLong(0)
    log(s"Unique domain_userid in events: $eventUserCount")
  }
}
