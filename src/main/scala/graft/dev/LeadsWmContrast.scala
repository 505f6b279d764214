package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only contrast measurement for the model-3 incremental pair
  * (VERDICT r17 task 4's perf evidence): the registered rows
  * (`q_model_leads_incr` / `q_model_leads_incr_watermarked`) pin
  * SEMANTICS, but each row's wall-clock is dominated by its in-row
  * batch-1 full refresh, and the fixtures' fixed Jan-15 cut leaves
  * batch 2 ≈ the whole stretched history at sf1 — so the row pair
  * cannot exhibit the incremental-step contrast the twin exists for.
  * This harness measures THE STEP ALONE, steady-state-shaped: prior =
  * everything up to (max lead date − 5 days), then one incremental
  * batch, faithful (events rescanned whole — the reference quirk) vs
  * watermarked (events pruned to `> max(activity_date)` of prior).
  * Run at sf0.1 and sf1 (10× history): the faithful step grows with
  * history, the watermarked step stays ~flat.
  *
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.dev.LeadsWmContrast [out.json]"`
  */
object LeadsWmContrast {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.runtime.Sources.bootstrap(spark)

    val ev = graft.runtime.Sources(spark, sfDir).events
    val events = graft.model.RefShapes.eventsRef(ev)
    val leads = graft.model.RefShapes.leadStageChangeEventsRef(ev)
    // materialize the model-1 dependency once and read it back, exactly
    // as the registered incr row does (dbt reads the warehouse table
    // through the hidden edge) — recomputing it inside the timed step
    // would charge both variants an identical full-events scan and mask
    // the contrast under test
    val dailyDir = java.nio.file.Files.createTempDirectory("graft_wmc_daily").toString
    graft.model.TrafficDailyAgg.build(
      events, graft.model.RefShapes.campaignSpendsRef(ev))
      .write.mode("overwrite").parquet(dailyDir)
    val daily = spark.read.parquet(dailyDir)
    // steady-state split: prior covers all but the last 5 days of leads
    val cut = leads.agg(date_sub(max(col("date")), 5)).head.getDate(0)
    val prior = graft.model.LeadActivitiesAgg.build(
      events, leads.filter(col("date") <= lit(cut)), daily)
    prior.cache(); val priorRows = prior.count() // materialize outside the timed step

    def evalOnce(fn: => DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val df = fn
      df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      (s, df.count())
    }
    // INTERLEAVED min-of-3 per variant: a fixed variant order charges
    // the later one the session's accumulated broadcast/cleaner drift
    // (the bias Bench's between-rows hygiene exists for) — the first
    // cut of this harness measured the watermarked step 20% SLOWER at
    // sf1 purely from running second every time
    def timePair(a: => DataFrame, b: => DataFrame): ((Double, Long), (Double, Long)) = {
      val runs = (1 to 3).map(_ => (evalOnce(a), evalOnce(b)))
      ((runs.map(_._1._1).min, runs.head._1._2),
       (runs.map(_._2._1).min, runs.head._2._2))
    }
    def r3(v: Double) = math.round(v * 1000.0) / 1000.0
    val wm = graft.ops.Filters.watermark(Some(prior), "activity_date")
    def evWmF = graft.ops.Filters.watermarkFilter(
      events.withColumn("__evd", to_date(col("collector_tstamp"))), "__evd", wm)
      .drop("__evd")
    val (f0, w0) = timePair(
      graft.model.LeadActivitiesAgg.build(events, leads, daily, Some(prior)),
      graft.model.LeadActivitiesAgg.build(evWmF, leads, daily, Some(prior)))
    val faithful = ("faithful_step", r3(f0._1), f0._2)
    val watermarked = ("watermarked_step", r3(w0._1), w0._2)
    // the attribution sub-plan alone (W1 window over the events scan) —
    // the piece the watermark actually prunes
    val evWmFrame = graft.ops.Filters.watermarkFilter(
      events.withColumn("__evd", to_date(col("collector_tstamp"))), "__evd", wm)
      .drop("__evd")
    val (w1f, w1w) = timePair(
      graft.model.LeadActivitiesAgg.latestEventsOf(events),
      graft.model.LeadActivitiesAgg.latestEventsOf(evWmFrame))
    val w1Full = ("w1_full", r3(w1f._1), w1f._2)
    val w1Wm = ("w1_wm", r3(w1w._1), w1w._2)
    if (sys.env.get("SPARK_GRAFT_WMC_EXPLAIN").contains("1")) {
      println("==== FAITHFUL STEP PLAN ====")
      graft.model.LeadActivitiesAgg.build(events, leads, daily, Some(prior))
        .explain("formatted")
      println("==== WATERMARKED STEP PLAN ====")
      graft.model.LeadActivitiesAgg.build(evWmFrame, leads, daily, Some(prior))
        .explain("formatted")
    }
    val json =
      s"""{"what":"model-3 incremental STEP timing, steady-state split (prior = max(date)-5d)",""" +
      s""""sf_dir":"$sfDir","prior_rows":$priorRows,"cut":"$cut",""" +
      s""""faithful_step_sec":${faithful._2},"faithful_step_rows":${faithful._3},""" +
      s""""watermarked_step_sec":${watermarked._2},"watermarked_step_rows":${watermarked._3},""" +
      s""""w1_full_sec":${w1Full._2},"w1_full_rows":${w1Full._3},""" +
      s""""w1_wm_sec":${w1Wm._2},"w1_wm_rows":${w1Wm._3}}"""
    println(json)
    args.headOption.foreach(p => java.nio.file.Files.write(
      java.nio.file.Paths.get(p), json.getBytes("UTF-8")))
    spark.stop()
  }
}
