package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.runtime.{Materializer, ModelDag, Sources}

/** Library front door — what a reference (dbt) user calls after
  * switching: one object that builds a correctly-configured session and
  * runs the warehouse build.
  *
  * {{{
  * val spark = Graft.session()                  // confs + extensions wired
  * Graft.run(spark, sourceDir, warehouseDir)    // = `dbt run` (DataFrame surface)
  * Graft.run(spark, sourceDir, warehouseDir, sql = true)   // SQL surface
  * }}}
  *
  * Everything the facade touches is the same seam the gated queries use
  * (Sources / Materializer / ModelDag), so the front door cannot drift
  * from the verified paths.
  */
object Graft {

  /** A session wired the way the engine expects: AQE on (skew joins and
    * runtime coalescing are part of the scale design), the engine's
    * native functions + optimizer rule injected, and — off `local[*]`
    * defaults — shuffle parallelism set to the machine's cores rather
    * than the stock 200 (on a cluster, pass the executor-core total).
    * Respects an existing session's context when one is already running
    * (getOrCreate semantics).
    */
  def session(master: String = "local[*]",
              shufflePartitions: Option[Int] = None): SparkSession = {
    val parallelism = shufflePartitions
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val s = graft.runtime.SessionTuning.tuned(SparkSession.builder()
      .master(master)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", parallelism))
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    Sources.bootstrap(s)
    s
  }

  /** Unified ANN front door: build the profile-selected index rung
    * (brute / IVF / SQ8 / IVF-PQ / HNSW) over `corpus` at `path` —
    * rung choice, persistence, `search`/`append`/`maintain`, and the
    * measured-recall gate all behind one handle
    * ([[graft.ext.VectorIndex]]). Reopen with [[loadIndex]]; a catalog
    * index registered under `<name>.vecindex` resolves through
    * [[graft.runtime.Sources.index]].
    */
  def index(corpus: DataFrame, path: String,
            profile: graft.ext.IndexProfile = graft.ext.IndexProfile.balanced)
      : graft.ext.VectorIndex =
    graft.ext.VectorIndex.build(corpus, path, profile)

  /** Reopen an index built by [[index]]. */
  def loadIndex(spark: SparkSession, path: String): graft.ext.VectorIndex =
    graft.ext.VectorIndex.load(spark, path)

  /** Static scale review of a query's physical plan: the checklist
    * every engine operator passes in its plan-shape specs, as a library
    * call for USER pipelines — cartesian/nested-loop joins,
    * single-partition windows, shuffle joins with a broadcast-sized
    * side, pushable filters above scans that won't use them, opaque
    * UDFs, plus shuffle/broadcast/scan counts
    * ([[graft.runtime.PlanAudit]]).
    *
    * The same checklist can gate WRITES: construct the
    * [[graft.runtime.Materializer]] with
    * `auditMode = PlanAudit.Mode.Enforce` and any model whose plan
    * carries a high-severity finding REFUSES to materialize (nothing
    * written) on both the DataFrame and SQL surfaces;
    * `PlanAudit.Mode.Log` records structured findings and writes
    * anyway. Default is `Off` — the audit stays opt-in.
    */
  def audit(df: org.apache.spark.sql.Dataset[_]): graft.runtime.PlanAudit.Report =
    graft.runtime.PlanAudit.audit(df)

  /** The reference user's `dbt run`: materialize all three models in
    * dependency order into `warehouseDir` (incremental on re-run — the
    * Materializer reads each model's prior table for the watermark
    * seam). `sql = true` drives the run through the SQL surface
    * instead of the DataFrame builders; both are row-identical
    * (ModelDagSpec).
    */
  def run(spark: SparkSession, sourceDir: String, warehouseDir: String,
          sql: Boolean = false): Map[String, DataFrame] = {
    Sources.bootstrap(spark)
    val dag = new ModelDag(Sources(spark, sourceDir),
      new Materializer(spark, warehouseDir))
    if (sql) dag.runSql() else dag.run()
  }
}
