package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Aggs, Filters, Ids, Pivot}

/** Model 2 — per-page daily traffic aggregate, all vs unique visitors.
  * Faithful re-expression of `traffic_pages_agg.sql:1-78` (the smallest
  * reference model: scan → filter → dual-count agg → all/unique UNION
  * pivot → global ROW_NUMBER id → final projection).
  *
  * `prior` carries the incremental high-watermark source (None = first
  * run / full refresh, mirroring `is_incremental()`,
  * traffic_pages_agg.sql:20-24).
  *
  * Scale notes: the only non-scalable elements are the reference's own
  * global ROW_NUMBER id (single-partition sort, SURVEY §7 hard-part 1)
  * and the exact COUNT(DISTINCT) — both replicated faithfully by
  * default; `Profile.AtScale` switches them to `Ids.scaleSafeId` and
  * `Aggs.dualCountApprox` (see [[Profile]] for the documented deltas).
  * Everything else is one shuffle (hash agg on 3 group keys with
  * map-side partial agg) and the pivot is a zero-shuffle projection pair.
  */
object TrafficPagesAgg {

  private def labeledOf(pageTraffic: DataFrame): DataFrame =
    Pivot.byUnion(pageTraffic,
      Seq("company_domain", "date", "page_urlpath"),
      labelCol = "type", valueCol = "traffic",
      allFrom = "total_visits", uniqueFrom = "unique_visits")

  private def idKeys =
    Seq(col("date"), col("company_domain"), col("page_urlpath"), col("type"))

  private def project(withId: DataFrame): DataFrame =
    withId
      .withColumn("company_id", lit(1))
      .select("id", "date", "type", "page_urlpath", "traffic", "company_id", "company_domain")

  /** labeled_visits + final projection (:38-78) under the AtScale id —
    * the model's TAIL from any frame in the page_traffic shape. The
    * content-hash id is a pure function of the key columns, which is
    * what makes the streaming surface's id-keyed upsert exact
    * (streaming/PageTrafficModel reuses this verbatim per micro-batch).
    */
  private[graft] def finishAtScale(pageTraffic: DataFrame): DataFrame =
    project(Ids.scaleSafeId(labeledOf(pageTraffic), idKeys))

  /** @param events `atomic.events`-shaped input (RefShapes.eventsRef). */
  def build(events: DataFrame, prior: Option[DataFrame] = None,
            profile: Profile = Profile.Faithful): DataFrame = {
    // filtered_events (traffic_pages_agg.sql:7-25)
    val wm = Filters.watermark(prior, "date")
    val filtered = Filters.watermarkFilter(
      events.filter(
        Filters.pageViewFilter(col("event"), col("refr_medium")) &&
        Filters.botFilter(col("useragent")) &&
        col("page_urlpath").isNotNull)
        .select(
          to_date(col("collector_tstamp")).as("event_date"),
          col("app_id"), col("domain_userid"), col("page_urlpath")),
      "event_date", wm)

    // page_traffic (:27-36)
    val groupKeys =
      Seq(col("event_date").as("date"), col("app_id").as("company_domain"), col("page_urlpath"))
    val pageTraffic = profile match {
      case Profile.Faithful =>
        Aggs.dualCount(filtered, groupKeys, col("domain_userid"),
          totalName = "total_visits", uniqueName = "unique_visits")
      case Profile.AtScale =>
        Aggs.dualCountApprox(filtered, groupKeys, col("domain_userid"),
          totalName = "total_visits", uniqueName = "unique_visits")
    }

    // labeled_visits + final_rows + projection (:38-78)
    profile match {
      case Profile.Faithful => project(Ids.globalRowNumber(labeledOf(pageTraffic), idKeys))
      case Profile.AtScale => finishAtScale(pageTraffic)
    }
  }
}
