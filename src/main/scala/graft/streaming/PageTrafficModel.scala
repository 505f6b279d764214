package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.model.TrafficPagesAgg
import graft.ops.{Aggs, Filters}
import graft.runtime.Materializer

/** Streaming upgrade path for the model-2 shape (traffic_pages_agg.sql)
  * under the AtScale profile — with this, ALL THREE reference models
  * have a continuously-maintained equivalent of their batch build.
  *
  * The FAITHFUL pages model is inherently batch: its id is a global
  * ROW_NUMBER over the whole output (traffic_pages_agg.sql:58-66), a
  * total order no unbounded stream can maintain. The AtScale profile
  * replaces it with the content-hash id (`Ids.scaleSafeId`) — a pure
  * function of the row's key columns — which is exactly what makes a
  * streaming id-keyed upsert exact, so the streaming surface targets
  * that profile and StreamingSpec asserts row-identity against the
  * batch AtScale build (same HLL rsd, same ids).
  *
  * Pipeline: page_view gate (the batch model's own filter) → watermarked
  * 1-day-window dual-count agg (`Aggs.dualCountApprox`, the same
  * operator the batch AtScale path calls) → each micro-batch of updated
  * groups runs [[TrafficPagesAgg.finishAtScale]] — the batch model's own
  * pivot + id + projection tail — and upserts by id.
  *
  * Scale shape: state is one HLL sketch + counter per (day × domain ×
  * path), bounded by the watermark retiring old day windows; no joins.
  */
object PageTrafficModel {

  /** Event stream → gated page views (the batch model's filter,
    * timestamp kept for the window).
    */
  def toPageViews(events: DataFrame): DataFrame =
    events.filter(
      Filters.pageViewFilter(col("event"), col("refr_medium")) &&
      Filters.botFilter(col("useragent")) &&
      col("page_urlpath").isNotNull)
      .select(col("collector_tstamp"), col("app_id"),
        col("domain_userid"), col("page_urlpath"))

  /** Streaming page_traffic: the model's 3-key dual-count aggregate as a
    * watermarked day-window agg, output schema identical to the batch
    * `page_traffic` stage. REQUIRES a UTC session (same reason as
    * DailyTrafficModel.eventTraffic: epoch-aligned windows vs session-tz
    * `to_date` coincide only under UTC).
    */
  def pageTraffic(views: DataFrame, delay: String = "1 day"): DataFrame = {
    StreamingOps.requireUtcSession(views.sparkSession)
    Aggs.dualCountApprox(
      views.withWatermark("collector_tstamp", delay),
      Seq(window(col("collector_tstamp"), "1 day").as("w"),
        col("app_id"), col("page_urlpath")),
      col("domain_userid"),
      totalName = "total_visits", uniqueName = "unique_visits")
      .select(to_date(col("w.start")).as("date"),
        col("app_id").as("company_domain"), col("page_urlpath"),
        col("total_visits"), col("unique_visits"))
  }

  /** Sink: every micro-batch of updated groups runs the batch model's
    * AtScale tail and upserts by the (key-functional) content-hash id.
    */
  def sink(agg: DataFrame, mat: Materializer, model: String): DataStreamWriter[Row] =
    agg.writeStream.outputMode("update").foreachBatch {
      (batch: DataFrame, _: Long) =>
        mat.materialize(model, "id")(_ => TrafficPagesAgg.finishAtScale(batch))
        ()
    }

  /** The full streaming model in one call. */
  def stream(events: DataFrame, mat: Materializer, model: String,
             delay: String = "1 day"): DataStreamWriter[Row] =
    sink(pageTraffic(toPageViews(events), delay), mat, model)
}
