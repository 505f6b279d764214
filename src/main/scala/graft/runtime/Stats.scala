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

  /** Database holding the analyzed catalog tables. Qualified two-part
    * names are immune to temp-view shadowing: a session temp view named
    * `lineitem` hijacks the bare name `lineitem` for every later
    * single-part lookup, but can never capture `graft_stats.lineitem`.
    */
  val Database = "graft_stats"

  /** Register each `name` as an external parquet table over
    * `dir/name.parquet` in [[Database]] and compute table + all-column
    * statistics. Idempotent (re-registering refreshes the stats).
    * Returns the analyzed row counts keyed by QUALIFIED table name,
    * read back from the catalog — the caller's evidence the stats
    * actually landed.
    */
  def registerAndAnalyze(spark: SparkSession, dir: String,
                         tables: Seq[String]): Map[String, BigInt] = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $Database")
    tables.map { t =>
      val qt = s"$Database.$t"
      spark.sql(s"DROP TABLE IF EXISTS $qt")
      spark.sql(s"CREATE TABLE $qt USING parquet LOCATION '$dir/$t.parquet'")
      spark.sql(s"ANALYZE TABLE $qt COMPUTE STATISTICS FOR ALL COLUMNS")
      // read the row count from the CATALOG metadata, not a plan: plan
      // stats only surface rowCount when CBO is on, and a plan lookup by
      // bare name is hijackable by session temp views anyway
      val rc = spark.sessionState.catalog
        .getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(t, Some(Database)))
        .stats.flatMap(_.rowCount)
        .getOrElse(sys.error(s"ANALYZE left no rowCount for $qt"))
      qt -> rc
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
