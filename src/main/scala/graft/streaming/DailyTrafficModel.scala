package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.model.TrafficDailyAgg
import graft.runtime.Materializer

/** Streaming upgrade path for the WHOLE model-1 shape
  * (traffic_daily_agg.sql): the windowed 5-key dual-count aggregate +
  * the batch model's own enrichment tail (spend join, all/unique pivot,
  * surrogate key) + the batch Materializer, so the continuously
  * maintained table equals the batch rerun over the same events.
  *
  * Pipeline: `atomic.events` stream in → the batch model's OWN filter +
  * classification ([[TrafficDailyAgg.classifiedEventsOf]], with the raw
  * timestamp carried through) → watermarked 1-day-window aggregate on
  * the same 5 keys → each micro-batch of UPDATED groups runs
  * [[TrafficDailyAgg.enrich]] — the exact code the batch model runs —
  * and upserts through the production Materializer keyed on `id`.
  *
  * Unlike model 3's per-user attribution (LeadEnrichment, whose
  * surrogate id CHANGES when a better touch arrives), model 1's `id` is
  * a pure function of the five group keys, so the plain id-keyed upsert
  * is exact: an updated group re-emits full recomputed counts under the
  * same id and replaces its two pivot rows in place.
  *
  * Exact COUNT(DISTINCT) is unsupported over streams (and is the 100 TB
  * pain point anyway) → `approx_count_distinct` at the SAME rsd as the
  * batch AtScale profile. HLL++ sketches are a pure function of the
  * value set — merge order doesn't change the estimate — so the
  * streamed table matches the batch AtScale build row-for-row, not just
  * within tolerance (asserted in StreamingSpec).
  *
  * Scale shape: state is one HLL sketch + counter per (day × app ×
  * channel × campaign) group — O(active groups), bounded by the
  * watermark delay retiring old day windows; the enrichment joins
  * broadcast the (small) micro-batch side and the spend dimension.
  */
object DailyTrafficModel {

  /** Event stream → classified per-event frame with event-time column
    * (the batch gate + classification, timestamp kept for the window).
    */
  def toClassifiedEvents(events: DataFrame): DataFrame =
    TrafficDailyAgg.classifiedEventsOf(events, wm = None, keepTs = true)

  /** Streaming event_traffic: the model's 5-key dual-count aggregate as
    * a watermarked day-window agg. Output schema matches the batch
    * `eventTrafficOf` exactly. REQUIRES a UTC session: `window(ts, "1
    * day")` aligns to epoch (UTC) days while the batch `to_date(ts)`
    * uses the session timezone — they coincide only under UTC, so a
    * non-UTC session would silently split civil days across two windows.
    * Asserted here rather than documented-and-hoped.
    */
  def eventTraffic(classified: DataFrame, delay: String = "1 day"): DataFrame = {
    StreamingOps.requireUtcSession(classified.sparkSession)
    classified
      .filter(col("traffic_type").isNotNull)
      .withWatermark("collector_tstamp", delay)
      .groupBy(window(col("collector_tstamp"), "1 day").as("w") +:
        TrafficDailyAgg.trafficGroupKeys: _*)
      .agg(count(lit(1)).as("total_visits"),
        approx_count_distinct(col("domain_userid"), TrafficDailyAgg.ApproxRsd)
          .as("unique_visitors"))
      .select(to_date(col("w.start")).as("event_date"),
        col("app_id"), col("traffic_type"), col("col_3"), col("col_4"),
        col("total_visits"), col("unique_visitors"))
  }

  /** Sink: every micro-batch of updated groups runs the batch model's
    * enrichment tail and upserts by the (key-functional) surrogate id.
    */
  def sink(agg: DataFrame, spends: DataFrame,
           mat: Materializer, model: String): DataStreamWriter[Row] = {
    val spendData = TrafficDailyAgg.spendDataOf(spends, wm = None)
    agg.writeStream.outputMode("update").foreachBatch {
      (batch: DataFrame, _: Long) =>
        mat.materialize(model, "id")(_ => TrafficDailyAgg.enrich(batch, spendData))
        ()
    }
  }

  /** The full streaming model in one call: classify → window-agg →
    * enrich-and-upsert. Returns the writer; `.start()` to run.
    */
  def stream(events: DataFrame, spends: DataFrame, mat: Materializer,
             model: String, delay: String = "1 day"): DataStreamWriter[Row] =
    sink(eventTraffic(toClassifiedEvents(events), delay), spends, mat, model)
}
