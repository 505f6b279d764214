package graft.runtime

import org.apache.spark.sql.SparkSession

/** Cost-based-optimizer wiring (ANALYZE TABLE → Catalyst CBO). Spark's
  * CBO — stats-driven join reordering and build-side selection — only
  * fires on CATALOG tables carrying computed statistics; a path-based
  * `spark.read.parquet` exposes nothing but size-on-disk, so every join
  * of path reads is planned from declaration order and byte estimates.
  * At warehouse scale the difference is structural: a star join whose
  * most selective dimension is named LAST still wants probing FIRST,
  * and a filtered fact slice whose post-filter cardinality is tiny
  * should broadcast — decisions that need row counts and column
  * histograms, not file sizes. AQE recovers some of this at RUNTIME
  * from shuffle statistics; CBO gets the plan right BEFORE the first
  * shuffle executes, which is the difference between avoiding a 100 TB
  * exchange and re-planning after one.
  *
  * [[registerAndAnalyze]] is the `dbt run-operation`-style maintenance
  * step: register the warehouse parquet as external catalog tables and
  * compute table + column stats. ANALYZE costs one scan per table —
  * amortized across every query planned from the catalog after it.
  */
object Stats {

  /** Register each `name` as an external parquet table over
    * `dir/name.parquet` and compute table + all-column statistics.
    * Idempotent (re-registering refreshes the stats). Returns the
    * analyzed row counts by table, read back from the catalog — the
    * caller's evidence the stats actually landed.
    */
  def registerAndAnalyze(spark: SparkSession, dir: String,
                         tables: Seq[String]): Map[String, BigInt] = {
    tables.map { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t USING parquet LOCATION '$dir/$t.parquet'")
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
      val rc = spark.table(t).queryExecution.optimizedPlan.stats.rowCount
        .getOrElse(sys.error(s"ANALYZE left no rowCount for $t"))
      t -> rc
    }.toMap
  }

  /** Run `body` with CBO + stats-based join reordering enabled,
    * restoring the previous confs after (session-shared test hygiene).
    */
  def withCbo[T](spark: SparkSession)(body: => T): T = {
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val old = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "true"))
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
