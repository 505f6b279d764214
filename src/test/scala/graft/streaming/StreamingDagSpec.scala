package graft.streaming

import graft.SparkSpec
import graft.model.{LeadActivitiesAgg, Profile, RefShapes, TrafficDailyAgg, TrafficPagesAgg}
import graft.runtime.{Materializer, Sources}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The full reference DAG running continuously: all three models off one
  * fixture event stream, model 3 consuming model 1's LIVE table through
  * the streaming ref() edge. Quiesced upstream-first here so the
  * equality against the batch DAG is exact (the edge is eventually
  * consistent while upstream is in motion, by documented design).
  */
class StreamingDagSpec extends SparkSpec {

  private def rows(df: DataFrame, cols: Seq[String]) =
    df.select(cols.map(col).toIndexedSeq: _*)
      .collect().map(_.toSeq.map(String.valueOf)).toSet

  test("StreamingDag: all three tables equal the batch builds once quiescent") {
    val dir = "/root/testdata/sf0.001"
    val raw = Sources(spark, dir).events
    val events = RefShapes.eventsRef(raw)
    val spends = RefShapes.campaignSpendsRef(raw)
    val leads = RefShapes.leadStageChangeEventsRef(raw)

    // fixture parquet as a replayable stream (file source needs a dir)
    val streamDir = java.nio.file.Files.createTempDirectory("graft_dag_src_")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val rawStream = spark.readStream.schema(rawSchema).parquet(streamDir.toString)
    val streamEvents = RefShapes.eventsRef(
      if (rawSchema("ts").dataType == org.apache.spark.sql.types.LongType)
        rawStream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else rawStream)

    val mat = new Materializer(spark,
      java.nio.file.Files.createTempDirectory("graft_dag_out_").toString)
    val dag = new StreamingDag(spark, streamEvents, spends, leads, mat,
      delay = "3650 days")
    try {
      dag.daily.processAllAvailable()
      dag.pages.processAllAvailable()
      val leadsQ = dag.startLeads()
      try leadsQ.processAllAvailable() finally leadsQ.stop()
    } finally { dag.daily.stop(); dag.pages.stop() }

    // models 1 and 2: row-identical to their batch AtScale builds
    val expDaily = TrafficDailyAgg.build(events, spends, profile = Profile.AtScale)
    val gotDaily = mat.readPrior(StreamingDag.DailyModel).get
    assert(rows(gotDaily, expDaily.columns) == rows(expDaily, expDaily.columns),
      "streamed daily table diverged from the batch build")
    val expPages = TrafficPagesAgg.build(events, profile = Profile.AtScale)
    assert(rows(mat.readPrior(StreamingDag.PagesModel).get, expPages.columns) ==
      rows(expPages, expPages.columns),
      "streamed pages table diverged from the batch build")

    // model 3: the batch model fed the SAME materialized daily table the
    // streaming edge read — isolates the ref-edge semantics exactly
    val expLeads = LeadActivitiesAgg.build(events, leads, gotDaily)
    val gotLeads = rows(mat.readPrior(StreamingDag.LeadsModel).get, expLeads.columns)
    assert(gotLeads == rows(expLeads, expLeads.columns),
      s"streamed leads table diverged from the batch DAG")
    assert(gotLeads.nonEmpty)
  }
}
