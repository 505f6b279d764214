package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.{Classify, Filters, Joins, Keys}

/** Model 1 — daily traffic × channel × campaign aggregate joined to ad
  * spend. Faithful re-expression of `traffic_daily_agg.sql:1-145`:
  * scan → filter → paid/organic CASE classification → 5-key dual-count
  * agg → LEFT join campaign spend (constant `traffic_type='paid'` in the
  * ON clause — disables the match, not the row) → all/unique UNION ALL →
  * 6-column surrogate key.
  *
  * Plan-shape deviation (documented, results identical): the reference
  * writes the spend join twice, once per UNION branch
  * (traffic_daily_agg.sql:106-129, verbatim duplicates); here the join
  * runs ONCE and the two branches are projections of the joined result —
  * legal because the join condition touches neither `total_visits` nor
  * `unique_visitors`, and halves the join work. The spend side is
  * broadcast (dimension-sized vs the event stream, SURVEY §2.4 J1).
  */
object TrafficDailyAgg {

  /** The HLL rsd the AtScale profile uses everywhere (batch AND
    * streaming) — the estimate is a pure function of the value set, so
    * the two surfaces agree bit-for-bit only if the rsd matches.
    */
  val ApproxRsd = 0.01

  /** filtered_events + classified_events (traffic_daily_agg.sql:8-49).
    * `keepTs` additionally carries the raw `collector_tstamp` through —
    * the streaming surface needs the event-time column for its watermark
    * and day window, while the batch path groups on the derived date.
    */
  private[graft] def classifiedEventsOf(events: DataFrame,
                                        wm: Option[java.sql.Date],
                                        keepTs: Boolean = false): DataFrame = {
    val cols = Seq(
      to_date(col("collector_tstamp")).as("event_date"),
      col("app_id"), col("domain_userid"), col("refr_medium"), col("mkt_source"),
      col("refr_source"), col("mkt_network"), col("mkt_campaign"), col("mkt_term")) ++
      (if (keepTs) Seq(col("collector_tstamp")) else Nil)
    Filters.watermarkFilter(
      events.filter(
        Filters.pageViewFilter(col("event"), col("refr_medium")) &&
        Filters.botFilter(col("useragent")))
        .select(cols: _*),
      "event_date", wm)
      .withColumn("traffic_type",
        Classify.trafficType(col("refr_medium"), coalesce(col("mkt_network"), lit(""))))
  }

  /** The 5 grouping columns of event_traffic (:51-76): the date and app
    * plus the classification and its two pickers.
    */
  private[graft] def trafficGroupKeys: Seq[Column] = Seq(
    col("app_id"), col("traffic_type"),
    Classify.channelSource(col("traffic_type"), col("mkt_source"),
      col("refr_source"), col("mkt_network")).as("col_3"),
    Classify.campaign(col("traffic_type"), col("mkt_campaign"), col("mkt_term")).as("col_4"))

  /** event_traffic (:51-76): 5-key dual-count aggregate. */
  private[graft] def eventTrafficOf(classified: DataFrame, profile: Profile): DataFrame =
    classified
      .filter(col("traffic_type").isNotNull)
      .groupBy(col("event_date") +: trafficGroupKeys: _*)
      .agg(count(lit(1)).as("total_visits"),
        (profile match {
          case Profile.Faithful => countDistinct(col("domain_userid"))
          case Profile.AtScale => approx_count_distinct(col("domain_userid"), ApproxRsd)
        }).as("unique_visitors"))

  /** campaign_spend_data (:79-90). */
  private[graft] def spendDataOf(spends: DataFrame, wm: Option[java.sql.Date]): DataFrame =
    Filters.watermarkFilter(
      spends.filter(col("spend").isNotNull)
        .select(col("company_id"), col("company_domain"),
          to_date(col("spend_date")).as("spend_date"), col("campaign_name"), col("spend")),
      "spend_date", wm)

  /** combined_traffic + final projection (:92-145): the model's TAIL —
    * spend join (once; the two UNION branches are projections of it),
    * all/unique pivot, 6-column surrogate key. Takes any frame in the
    * event_traffic shape, so the streaming surface reuses it verbatim
    * on each micro-batch of updated groups.
    */
  private[graft] def enrich(eventTraffic: DataFrame, spendData: DataFrame): DataFrame = {
    val et = eventTraffic.as("et")
    val joined = Joins.leftOn(et, spendData.as("csd"),
      col("et.col_4") === col("csd.campaign_name") &&
      col("et.event_date") === col("csd.spend_date") &&
      col("et.traffic_type") === lit("paid"),
      smallRight = true)

    def branch(valueCol: String, label: String): DataFrame = joined.select(
      lit(999).as("company_id"),
      col("et.app_id").as("company_domain"),
      col("et.event_date").as("spend_date"),
      col(s"et.$valueCol").as("traffic"),
      coalesce(col("csd.spend"), lit(0)).as("spend"),
      lit(label).as("col_1"),
      col("et.traffic_type").as("col_2"),
      col("et.col_3"), col("et.col_4"),
      lit(null).cast("string").as("col_5"),
      lit(null).cast("string").as("col_6"))

    branch("total_visits", "all").unionByName(branch("unique_visitors", "unique"))
      .withColumn("id", Keys.surrogateKey(col("company_domain"), col("spend_date"),
        col("col_1"), col("col_2"), col("col_3"), col("col_4")))
      .select("id", "company_id", "company_domain", "spend_date", "traffic", "spend",
        "col_1", "col_2", "col_3", "col_4", "col_5", "col_6")
  }

  /** @param events `atomic.events` shape; @param spends `campaign_spends`
    * shape; @param profile Faithful = exact COUNT(DISTINCT) (oracle
    * parity), AtScale = approx_count_distinct (see [[Profile]]).
    */
  def build(events: DataFrame, spends: DataFrame, prior: Option[DataFrame] = None,
            profile: Profile = Profile.Faithful): DataFrame = {
    val wm = Filters.watermark(prior, "spend_date")
    enrich(
      eventTrafficOf(classifiedEventsOf(events, wm), profile),
      spendDataOf(spends, wm))
  }
}
