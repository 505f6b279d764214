package graft.runtime

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Incremental materialization (SURVEY §2.10, S4/S5 + A4).
  *
  * Reproduces dbt's `materialized='incremental', unique_key='id'`
  * delete+insert strategy (reference config blocks:
  * traffic_daily_agg.sql:2-6, traffic_pages_agg.sql:1-5,
  * lead_activities_agg.sql:2-6):
  *
  *  1. First run (no prior output) → full build, plain write (CTAS).
  *  2. Subsequent runs → model fn receives the prior output (for its
  *     high-watermark filters, Filters.watermark) and produces the fresh
  *     batch; rows whose `id` matches an existing row REPLACE it, others
  *     append: `prior left_anti fresh on id` ∪ fresh.
  *
  * Parquet has no MERGE, so the upsert writes to a temp dir and swaps.
  * The swap is two renames (live → `__old`, `__tmp` → live), and every
  * read path first runs [[recover]]: a crash between the renames leaves
  * live missing and `__old` present — an unambiguous marker — so
  * recovery restores the prior table (`__old` wins; the fresh batch is
  * simply re-run). A crash after the second rename leaves a stale
  * `__old` NEXT TO a live table, which recovery deletes. Recovery
  * mutates nothing else: in particular a lone `__tmp` beside a healthy
  * live table is left alone — it is either a concurrent materialize's
  * in-flight write or a dead write the next run's Overwrite replaces —
  * so readers overlapping a writer's (long) PARQUET-WRITE phase are
  * safe. The swap window itself is serialized per model by an in-JVM
  * lock: recovery and the two renames hold the same monitor, so
  * same-process readers (e.g. a downstream streaming model re-reading
  * this table, streaming/StreamingDag) can never "restore" the prior
  * table out from under a live swap; [[withSwapLock]] additionally
  * lets a reader pin the directory across its own scan. CROSS-process
  * coordination is out of scope — that is where a table format's
  * atomic commit (Delta/Iceberg MERGE, or date-partition overwrite)
  * plugs in on a real deployment. The anti-join form shuffles both
  * sides by `id` once, which AQE sizes.
  */
final class Materializer(spark: SparkSession, baseDir: String) {

  def outPath(model: String): String = s"$baseDir/$model"

  // one monitor per model: serializes the swap renames against recovery
  // and against withSwapLock readers (same JVM; reentrant)
  private val swapLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(model: String): Object =
    swapLocks.computeIfAbsent(model, _ => new Object)

  /** Run `f` holding the model's swap lock: no swap or recovery of this
    * model's directories can interleave. Use to pin the table across a
    * read that must not see a mid-swap directory (force the scan —
    * collect/localCheckpoint — INSIDE `f`; a lazy plan escapes the
    * lock).
    */
  def withSwapLock[T](model: String)(f: => T): T = lockFor(model).synchronized(f)

  /** Repair an interrupted swap before any read — and ONLY when the
    * marker state is actually inconsistent (a `__old` dir exists).
    * Prefer `__old` (the last complete table) when the live dir is
    * missing; a `__old` beside a live table is the post-swap leftover
    * and is dropped. A lone `__tmp` is never touched (see class doc:
    * it may be a concurrent materialize's in-flight write). Idempotent;
    * no-op — no filesystem mutation at all — on a healthy table.
    */
  private def recover(model: String): Unit = lockFor(model).synchronized {
    val out = Paths.get(outPath(model))
    val bak = Paths.get(outPath(model) + "__old")
    if (Files.exists(bak)) {
      if (!Files.exists(out)) {
        Files.move(bak, out)
        // the interrupted swap's fresh batch; stale by policy (the
        // restored prior wins, the batch re-runs)
        deleteRecursive(Paths.get(outPath(model) + "__tmp"))
      } else deleteRecursive(bak)
    }
  }

  def exists(model: String): Boolean = {
    recover(model)
    Files.exists(Paths.get(outPath(model), "_SUCCESS"))
  }

  def readPrior(model: String): Option[DataFrame] =
    if (exists(model)) Some(spark.read.parquet(outPath(model))) else None

  /** Run one model incrementally. `build` receives the prior output (None
    * on first run) and returns the fresh batch, keyed by `uniqueKey`.
    */
  def materialize(model: String, uniqueKey: String)
                 (build: Option[DataFrame] => DataFrame): DataFrame = {
    val prior = readPrior(model)
    val fresh = build(prior)
    val result = prior match {
      case None => fresh
      case Some(old) =>
        // NB: a using-join puts the key column first — re-select in the
        // fresh batch's column order so the output schema is run-stable.
        old.join(fresh.select(uniqueKey).distinct(), Seq(uniqueKey), "left_anti")
          .unionByName(fresh)
          .select(fresh.columns.map(col).toIndexedSeq: _*)
    }
    val tmp = outPath(model) + "__tmp"
    result.write.mode(SaveMode.Overwrite).parquet(tmp)
    val out = Paths.get(outPath(model))
    val bak = Paths.get(outPath(model) + "__old")
    lockFor(model).synchronized {
      deleteRecursive(bak)
      if (Files.exists(out)) Files.move(out, bak)
      Files.move(Paths.get(tmp), out)
      deleteRecursive(bak)
    }
    spark.read.parquet(outPath(model))
  }

  /** Scale-path variant: dynamic partition overwrite on a date column
    * instead of the whole-table anti-join rewrite. Valid when the model's
    * `unique_key` is date-functional (true for traffic_daily_agg — id
    * embeds spend_date — NOT for traffic_pages_agg, whose cross-date id
    * collisions need the anti-join form): an incremental batch carries
    * complete recomputations of the dates it touches, so swapping those
    * partitions IS delete+insert-by-key, while untouched dates never
    * rewrite. At 100 TB this turns the upsert from O(table) to O(batch)
    * and makes the watermark filter real partition pruning on re-read.
    */
  def materializeByDatePartition(model: String, dateCol: String)
                                (build: Option[DataFrame] => DataFrame): DataFrame = {
    val prior = readPrior(model)
    val fresh = build(prior)
    val mode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      fresh.write.mode(SaveMode.Overwrite).partitionBy(dateCol).parquet(outPath(model))
    finally mode match {
      case Some(m) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    spark.read.parquet(outPath(model))
  }

  private def deleteRecursive(p: java.nio.file.Path): Unit = Fs.deleteRecursive(p)
}
