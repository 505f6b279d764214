package graft.runtime

import graft.SparkSpec
import java.nio.file.Files

/** DAG-level incremental semantics over the sf0.001 fixtures: a second run
  * with no new data must leave every model's materialization unchanged
  * (the watermark filters the whole input; upsert keeps prior rows).
  */
class ModelDagSpec extends SparkSpec {

  test("full run then no-new-data rerun is a fixed point for all models") {
    val dir = Files.createTempDirectory("graft-dag").toString
    val sources = Sources(spark, "/root/testdata/sf0.001")
    val dag = new ModelDag(sources, new Materializer(spark, dir))

    val first = dag.run().map { case (k, df) => k -> df.count() }
    assert(first.values.forall(_ > 0), s"empty model output: $first")

    val second = dag.run().map { case (k, df) => k -> df.count() }
    assert(second == first, s"rerun drifted: $first vs $second")
  }

  test("daily model output feeds lead model spend enrichment") {
    // sf0.01: at sf0.001 the (campaign, date) spend join legitimately has
    // zero matches (verified against the DuckDB oracle — 0 of 27 rows)
    val dir = Files.createTempDirectory("graft-dag2").toString
    val sources = Sources(spark, "/root/testdata/sf0.01")
    val out = new ModelDag(sources, new Materializer(spark, dir)).run()
    val leads = out("lead_activities_agg")
    // some leads picked up a non-zero spend_per_visit through the J3 join
    assert(leads.filter(leads("mkt_spend") > 0).count() > 0)
  }
}
