package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Traffic-type classifier + channel/campaign pickers (SURVEY §2.3 F9/F10).
  *
  * Faithful replication of the reference CASE chains, branch order
  * preserved exactly (including the unreachable `refr_medium <> 'paid'`
  * arm noted in SURVEY §2.10):
  *  - classifier: traffic_daily_agg.sql:35-42
  *  - source picker: traffic_daily_agg.sql:56-59
  *  - campaign picker: traffic_daily_agg.sql:60-65
  *
  * Pure `when` chains → whole-stage codegen, no shuffle.
  */
object Classify {

  private val PaidMediums =
    Seq("cpc", "ppc", "paidsearch", "display", "social", "search", "email", "", "unknown")
  private val OrganicMediums =
    Seq("display", "social", "search", "email", "", "unknown")

  /** F9 — paid/organic/NULL classifier. `mktNetwork` is pre-NVL'd to ''
    * upstream in the reference (traffic_daily_agg.sql:36).
    */
  def trafficType(refrMedium: Column, mktNetwork: Column): Column =
    when(refrMedium.isin(PaidMediums: _*) && mktNetwork =!= "", "paid")
      .when(refrMedium === "paid", "paid")
      .when(refrMedium.isin(OrganicMediums: _*) && mktNetwork === "", "organic")
      .otherwise(lit(null).cast("string"))

  /** Priority expression for the W1 attribution window
    * (lead_activities_agg.sql:48-52): paid-touch events rank first.
    */
  def paidTouchRank(refrMedium: Column, mktNetwork: Column): Column =
    when(refrMedium.isin(PaidMediums: _*) && coalesce(mktNetwork, lit("")) =!= "", 1)
      .when(refrMedium === "paid", 1)
      .otherwise(2)

  /** F10 — per-traffic-type source fallback chain (traffic_daily_agg.sql:56-60):
    * paid → NVL(mkt_source, refr_source, mkt_network, 'unknown');
    * organic → NVL(mkt_source, refr_source, 'unknown'); else NULL.
    */
  def channelSource(trafficType: Column, mktSource: Column, refrSource: Column,
                    mktNetwork: Column): Column =
    when(trafficType === "paid", coalesce(mktSource, refrSource, mktNetwork, lit("unknown")))
      .when(trafficType === "organic", coalesce(mktSource, refrSource, lit("unknown")))
      .otherwise(lit(null).cast("string"))

  /** F10 — campaign picker (traffic_daily_agg.sql:61-65):
    * paid → NVL(mkt_campaign, 'unknown');
    * organic → NVL(mkt_term, mkt_campaign, 'unknown'); else NULL.
    */
  def campaign(trafficType: Column, mktCampaign: Column, mktTerm: Column): Column =
    when(trafficType === "paid", coalesce(mktCampaign, lit("unknown")))
      .when(trafficType === "organic", coalesce(mktTerm, mktCampaign, lit("unknown")))
      .otherwise(lit(null).cast("string"))
}
