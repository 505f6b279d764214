package graft.runtime

import org.apache.spark.sql.DataFrame
import graft.model.{LeadActivitiesAgg, RefShapes, TrafficDailyAgg, TrafficPagesAgg}

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
  */
final class ModelDag(sources: Sources, mat: Materializer) {

  /** Materialize all three models in dependency order; returns each
    * model's post-upsert output.
    */
  def run(): Map[String, DataFrame] = {
    val events = RefShapes.eventsRef(sources.events)
    val daily = mat.materialize("traffic_daily_agg", "id")(prior =>
      TrafficDailyAgg.build(events, RefShapes.campaignSpendsRef(sources.events), prior))
    val pages = mat.materialize("traffic_pages_agg", "id")(prior =>
      TrafficPagesAgg.build(events, prior))
    val leads = mat.materialize("lead_activities_agg", "id")(prior =>
      LeadActivitiesAgg.build(events,
        RefShapes.leadStageChangeEventsRef(sources.events), daily, prior))
    Map("traffic_daily_agg" -> daily, "traffic_pages_agg" -> pages,
      "lead_activities_agg" -> leads)
  }
}
