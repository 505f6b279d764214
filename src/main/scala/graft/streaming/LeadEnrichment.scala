package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.model.LeadActivitiesAgg
import graft.ops.Classify
import graft.runtime.Materializer

/** Streaming upgrade path for the WHOLE model-3 shape
  * (lead_activities_agg.sql): last-touch attribution state + the batch
  * model's own enrichment tail + the batch Materializer, so the
  * continuously-maintained table equals the batch rerun on the same
  * events.
  *
  * Pipeline: page_view events stream in as [[LeadTouch]] → per-user
  * running argmax (`mapGroupsWithState`, state = ONE row per user) → each
  * micro-batch joins the UPDATED users' current best touch against the
  * static lead table and spend dimension through
  * `LeadActivitiesAgg.enrich` — the exact code the batch model runs — and
  * upserts through the production Materializer keyed on `domain_userid`.
  *
  * Keying the upsert per-USER (not per-`id`) is load-bearing: a user's
  * new best touch changes `event_id` and therefore the surrogate `id`,
  * so an id-keyed upsert would strand the stale attribution row. Each
  * micro-batch re-emits ALL lead rows for its touched users, so
  * delete+insert-by-user is exactly the batch semantics. The key is the
  * RAW lead user id carried as an internal extra column
  * ([[LeadEnrichment.UserKey]]): the model's own `domain_userid` output
  * is LOWERcased — lossy across case-variant users, so keying on it
  * would delete one user's rows when upserting another's. Scale shape:
  * state is O(users), each micro-batch's work is O(touched users'
  * leads), and the enrichment joins broadcast the (small) batch side.
  */
object LeadEnrichment {

  /** Internal raw-user upsert key column on the materialized table;
    * project it away when reading the table as model output.
    */
  val UserKey = "__touch_user"

  /** W1 priority (lead_activities_agg.sql:45-55): paid touch first, then
    * latest timestamp, then highest event id — same total order as the
    * batch window and StreamingOps.touchPriority.
    */
  val touchPriority: Ordering[LeadTouch] = (a: LeadTouch, b: LeadTouch) => {
    val byRank = Integer.compare(a.paidRank, b.paidRank)
    if (byRank != 0) byRank
    else {
      val byTs = java.lang.Long.compare(b.tstampMicros, a.tstampMicros)
      if (byTs != 0) byTs else b.eventId.compareTo(a.eventId)
    }
  }

  /** `atomic.events`-shaped frame → typed touch stream, applying the
    * batch model's event gate (page_view, bot filter, non-internal) and
    * precomputing the paid rank so the stateful fold needs no re-parse.
    */
  def toLeadTouches(events: DataFrame): Dataset[LeadTouch] = {
    import events.sparkSession.implicits._
    events.filter(
      col("event") === "page_view" &&
      graft.ops.Filters.botFilter(col("useragent")) &&
      col("refr_medium") =!= "internal")
      .select(
        col("domain_userid").as("domainUserid"),
        col("event_id").cast("string").as("eventId"),
        Classify.paidTouchRank(col("refr_medium"), col("mkt_network")).cast("int").as("paidRank"),
        unix_micros(col("collector_tstamp")).as("tstampMicros"),
        col("mkt_medium").as("mktMedium"),
        col("mkt_source").as("mktSource"),
        col("mkt_campaign").as("mktCampaign"),
        to_date(col("collector_tstamp")).as("visitDate"),
        col("page_urlpath").as("pageUrlpath"))
      .as[LeadTouch]
  }

  /** Per-user running best touch (same state shape as
    * StreamingOps.lastTouch, carrying the full enrichment payload).
    */
  def lastTouch(events: Dataset[LeadTouch]): Dataset[LeadTouch] = {
    import events.sparkSession.implicits._
    StreamingOps.runningBest(events)(_.domainUserid)(touchPriority)
  }

  /** Touch-state rows → the batch model's latest_events shape. */
  private def latestEventsFrame(batch: DataFrame): DataFrame =
    batch.select(
      col("domainUserid").as("domain_userid"),
      col("eventId").as("event_id"),
      col("mktMedium").as("mkt_medium"),
      col("mktSource").as("mkt_source"),
      col("mktCampaign").as("mkt_campaign"),
      col("visitDate").as("visit_date"),
      col("pageUrlpath").as("page_urlpath"))

  /** First-run seed: materialize every lead with NULL attribution (the
    * batch left-join-miss shape), so users whose touches never arrive
    * still carry their lead rows — exactly the batch output for them.
    */
  def seed(spark: SparkSession, leads: DataFrame, trafficDaily: DataFrame,
           mat: Materializer, model: String): DataFrame = {
    import spark.implicits._
    val emptyTouches = latestEventsFrame(spark.emptyDataset[LeadTouch].toDF())
    mat.materialize(model, UserKey)(_ =>
      LeadActivitiesAgg.enrich(LeadActivitiesAgg.leadActivitiesOf(leads, None),
        emptyTouches, LeadActivitiesAgg.trafficSpendOf(trafficDaily),
        keepRawUserAs = Some(UserKey)))
  }

  /** Sink: every micro-batch of updated touch states re-enriches the
    * touched users' lead rows through the batch model's own tail and
    * upserts them by `domain_userid`. The static-upstream form: the
    * spend dimension is derived once from a fixed daily table.
    */
  def sink(touches: Dataset[LeadTouch], leads: DataFrame, trafficDaily: DataFrame,
           mat: Materializer, model: String): DataStreamWriter[Row] = {
    val trafficSpend = LeadActivitiesAgg.trafficSpendOf(trafficDaily)
    sinkWithSpend(touches, leads, () => trafficSpend, mat, model)
  }

  /** Sink variant for a LIVE upstream (the streaming `ref()` edge,
    * streaming/StreamingDag): `trafficSpend()` is re-evaluated at every
    * micro-batch, so a daily table that is itself being maintained by a
    * streaming query is picked up as it changes. Eventually consistent
    * while upstream is in motion — a user's attribution row refreshes
    * with the then-current spend at each of their touches — and exactly
    * the batch DAG's answer once upstream is quiescent and the user is
    * touched again.
    */
  def sinkWithSpend(touches: Dataset[LeadTouch], leads: DataFrame,
                    trafficSpend: () => DataFrame,
                    mat: Materializer, model: String): DataStreamWriter[Row] = {
    val leadActivities = LeadActivitiesAgg.leadActivitiesOf(leads, None)
    touches.toDF().writeStream.outputMode("update").foreachBatch {
      (batch: DataFrame, _: Long) =>
        val latest = latestEventsFrame(batch)
        val touched = leadActivities.join(
          latest.select("domain_userid").distinct(), Seq("domain_userid"), "left_semi")
        mat.materialize(model, UserKey)(_ =>
          LeadActivitiesAgg.enrich(touched, latest, trafficSpend(),
            keepRawUserAs = Some(UserKey)))
        ()
    }
  }
}

/** One attribution touch with the full enrichment payload (the streaming
  * analog of the batch model's latest_events row).
  */
case class LeadTouch(domainUserid: String, eventId: String, paidRank: Int,
                     tstampMicros: Long, mktMedium: String, mktSource: String,
                     mktCampaign: String, visitDate: java.sql.Date,
                     pageUrlpath: String)
