package graft.model

import graft.SparkSpec
import graft.ops.Filters
import org.apache.spark.sql.functions._
import java.sql.{Date, Timestamp}

/** The semantic delta between the faithful model-3 incremental (events
  * rescanned in full every run — the reference's cost-profile quirk)
  * and its r18 [EXT] watermarked twin (`q_model_leads_incr_watermarked`:
  * events scan pruned to `> max(activity_date)` of the prior output).
  * The sf0.01 fixture happens not to exercise the delta (every batch-2
  * lead's last touch post-dates the watermark there), so this spec
  * CONSTRUCTS it: a returning lead whose only touch predates the
  * watermark keeps full-history attribution under the faithful row and
  * loses it (NULL event columns) under the twin — exactly the trade the
  * twin's registry scaladoc documents.
  */
class LeadsWatermarkedTwinSpec extends SparkSpec {
  import spark.implicits._

  private def eventsDf(rows: Seq[(String, String, String)]) =
    rows.map { case (eid, u, t) =>
      (eid, Timestamp.valueOf(t), u, "page_view", "Mozilla/5.0 (X11; Linux x86_64)",
        "organic", "net1", "MSrc1", "Camp-1", "Med1", "/p/1")
    }.toDF("event_id", "collector_tstamp", "domain_userid", "event", "useragent",
      "refr_medium", "mkt_network", "mkt_source", "mkt_campaign", "mkt_medium",
      "page_urlpath")

  private def leadsDf(rows: Seq[(String, String)]) =
    rows.map { case (u, d) =>
      ("appdom", "c1", u, "lead1", "p1", Date.valueOf(d), "lg1", "LGen",
        "ehr1", "s2", "Stage2", "s1", "Stage1", "pl1", "Pipe", "pr1",
        "Prod", "9.99", "SKU1")
    }.toDF("company_domain", "company_id", "domain_userid", "lead_id", "person_id",
      "date", "lead_generator_id", "lead_generator_name", "lead_source_ehr_id",
      "new_stage_id", "new_stage_name", "old_stage_id", "old_stage_name",
      "pipeline_id", "pipeline_name", "product_id", "product_name",
      "product_price", "product_sku")

  private val emptyDaily =
    Seq.empty[(Double, Long, String, String, Date)]
      .toDF("spend", "traffic", "col_4", "col_1", "spend_date")

  test("a pre-watermark last touch: the faithful row attributes, the twin documents the loss") {
    // u1's ONLY touch is Jan 10 — before the Jan 15 watermark the prior
    // output establishes; u1's new lead lands Jan 20 (batch 2)
    val events = eventsDf(Seq(("e1", "u1", "2024-01-10 10:00:00")))
    val leads = leadsDf(Seq(("u1", "2024-01-20"), ("u1", "2024-01-05")))
    val prior = Seq(Date.valueOf("2024-01-15")).toDF("activity_date")

    val faithful = LeadActivitiesAgg.build(events, leads, emptyDaily, Some(prior))
    // the twin's registered pipeline: the SAME build, events pruned by
    // the SAME watermark scalar the leads scan uses
    val wm = Filters.watermark(Some(prior), "activity_date")
    val evWm = Filters.watermarkFilter(
      events.withColumn("__evd", to_date(col("collector_tstamp"))), "__evd", wm)
      .drop("__evd")
    val twin = LeadActivitiesAgg.build(evWm, leads, emptyDaily, Some(prior))

    // both watermark the LEADS identically: only the Jan 20 activity emits
    assert(faithful.count() == 1 && twin.count() == 1)
    val f = faithful.select("event_id", "mkt_campaign", "activity_date").head
    val t = twin.select("event_id", "mkt_campaign", "activity_date").head
    assert(f.getString(0) == "e1" && f.getString(1) == "camp-1",
      s"faithful keeps full-history attribution, got $f")
    assert(t.isNullAt(0) && t.isNullAt(1),
      s"twin loses pre-watermark attribution (the documented trade), got $t")
    assert(f.getDate(2) == Date.valueOf("2024-01-20") && t.getDate(2) == f.getDate(2))
  }

  test("a post-watermark touch: faithful and twin agree exactly") {
    val events = eventsDf(Seq(("e2", "u1", "2024-01-18 09:00:00")))
    val leads = leadsDf(Seq(("u1", "2024-01-20")))
    val prior = Seq(Date.valueOf("2024-01-15")).toDF("activity_date")
    val wm = Filters.watermark(Some(prior), "activity_date")
    val evWm = Filters.watermarkFilter(
      events.withColumn("__evd", to_date(col("collector_tstamp"))), "__evd", wm)
      .drop("__evd")
    val faithful = LeadActivitiesAgg.build(events, leads, emptyDaily, Some(prior))
    val twin = LeadActivitiesAgg.build(evWm, leads, emptyDaily, Some(prior))
    assert(faithful.collect().toSeq == twin.collect().toSeq,
      "the twin diverges ONLY when history predates the watermark")
  }
}
