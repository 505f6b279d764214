package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sql.SqlModels

/** SQL-front-end golden queries: the three reference models run through
  * `spark.sql(...)` over the registered view catalog (graft.sql.SqlModels)
  * instead of the DataFrame builders — same inputs, same semantics, so
  * they hash-check against the SAME DuckDB oracles as the q_model_*
  * DataFrame queries. One model additionally runs two-batch incremental
  * through the production Materializer path with the `{{ this }}` seam
  * resolved to a prior-output view, proving the SQL surface covers the
  * reference's full incremental contract too.
  */
object SqlQueries {

  type Q = (SparkSession, String) => DataFrame

  private val PagesCut = "\n      AND CAST(collector_tstamp AS DATE) <= DATE '2024-01-15'"
  private val ThisPages = "graft_this_traffic_pages_agg"

  val queries: Map[String, Q] = Map(
    "q_model_pages_sql" -> ((s, dir) => {
      SqlModels.registerCatalog(s, dir)
      SqlModels.runPages(s)
    }),
    "q_model_daily_sql" -> ((s, dir) => {
      SqlModels.registerCatalog(s, dir)
      SqlModels.runDaily(s)
    }),
    "q_model_leads_sql" -> ((s, dir) => {
      SqlModels.registerCatalog(s, dir)
      SqlModels.runLeads(s)
    }),
    // model 2 incrementally through the SQL surface: batch 1 full-builds
    // the pre-cutoff slice, batch 2 watermarks on {{ this }} (the prior
    // output registered as a view) — production Materializer write/swap,
    // same oracle as the DataFrame-path q_model_pages_incr.
    "q_model_pages_sql_incr" -> ((s, dir) => {
      SqlModels.registerCatalog(s, dir)
      ModelQueries.incrViaMaterializer(s, "traffic_pages_agg_sql")(
        SqlModels.runPages(s, PagesCut)) { prior =>
        val where = prior.map { p =>
          p.createOrReplaceTempView(ThisPages)
          SqlModels.incrementalWhere("CAST(collector_tstamp AS DATE)", "date", ThisPages)
        }.getOrElse("")
        SqlModels.runPages(s, where)
      }
    }),
  )

  val oracle: Map[String, String] = Map(
    "q_model_pages_sql" -> ModelQueries.oracle("q_model_pages"),
    "q_model_daily_sql" -> ModelQueries.oracle("q_model_daily"),
    "q_model_leads_sql" -> ModelQueries.oracle("q_model_leads"),
    "q_model_pages_sql_incr" -> ModelQueries.oracle("q_model_pages_incr"),
  )
}
