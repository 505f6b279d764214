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
  * Parquet has no MERGE, so the upsert writes to a UNIQUE temp dir per
  * invocation (`__tmp_<uuid>` — two concurrent materializes of one model
  * can never clobber each other's in-flight bytes) and swaps. The swap
  * is two renames (live → `__old`, tmp → live), and every read path
  * first runs [[recover]]: a crash between the renames leaves live
  * missing and `__old` present — an unambiguous marker — so recovery
  * restores the prior table (`__old` wins; the fresh batch is simply
  * re-run). A crash after the second rename leaves a stale `__old` NEXT
  * TO a live table, which recovery deletes. Recovery mutates nothing
  * else: in particular `__tmp_*` dirs beside a healthy live table are
  * left alone — each is either a concurrent materialize's in-flight
  * write or a crashed write (an orphan a deployment sweeps by age) — so
  * readers overlapping a writer's (long) PARQUET-WRITE phase are safe.
  *
  * [[materialize]] is serialized PER MODEL for its whole run at two
  * levels — in-JVM via one monitor per (canonical warehouse dir, model)
  * (JVM-GLOBAL companion registry, so even two Materializer instances
  * on one warehouse serialize) and cross-PROCESS via a blocking OS file
  * lock (`FileChannel.lock` on `<model>.lock`, reentrant through a
  * held-locks registry). That is dbt's own contract (a model never runs
  * concurrently with itself), and it is what makes concurrent callers
  * SERIALIZABLE: each build reads the previous winner's table as its
  * prior instead of racing its prior scan against another writer's
  * renames. Recovery and [[withSwapLock]] readers share the same
  * monitor, so same-process readers can never "restore" the prior
  * table out from under a live swap, and a reader can pin the
  * directory across its own scan. Cross-process READERS remain
  * uncoordinated (a reader in another process can still observe the
  * sub-millisecond rename window) — that last seam is where a table
  * format's atomic commit (Delta/Iceberg) plugs in on a real
  * deployment. The anti-join form shuffles both sides by `id` once,
  * which AQE sizes.
  */
final class Materializer(spark: SparkSession, baseDir: String) {

  def outPath(model: String): String = s"$baseDir/$model"

  // one monitor per (canonical dir, model), JVM-global: two instances on
  // the same warehouse share the monitor (and thereby never contend for
  // the OS file lock from one JVM, which would throw Overlapping-
  // FileLockException instead of blocking)
  private val canonicalBase = Paths.get(baseDir).toAbsolutePath.normalize.toString
  private def lockFor(model: String): Object =
    Materializer.swapLocks.computeIfAbsent(s"$canonicalBase/$model", _ => new Object)

  /** Run `f` holding the model's cross-process lock file (blocking OS
    * lock). REENTRANT per model: the caller must hold the in-JVM
    * monitor, under which a depth counter lets a nested call (recover
    * inside materialize) ride the already-held lock — a second
    * `FileChannel.lock` on a file this JVM holds would throw
    * OverlappingFileLockException rather than block.
    */
  private def withFileLock[T](model: String)(f: => T): T = {
    val key = s"$canonicalBase/$model"
    Materializer.heldFileLocks.get(key) match {
      case Some(depth) =>
        Materializer.heldFileLocks.update(key, depth + 1)
        try f
        finally Materializer.heldFileLocks.update(key, Materializer.heldFileLocks(key) - 1)
      case None =>
        Files.createDirectories(Paths.get(baseDir))
        val ch = java.nio.channels.FileChannel.open(
          Paths.get(s"$baseDir/$model.lock"),
          java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
        try {
          val l = ch.lock()
          Materializer.heldFileLocks.update(key, 1)
          try f
          finally { Materializer.heldFileLocks.remove(key); l.release() }
        } finally ch.close()
    }
  }

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
    if (Files.exists(bak)) withFileLock(model) {
      // re-check under the cross-process lock: another process may have
      // completed this same recovery between the probe and the lock
      if (Files.exists(bak)) {
        if (!Files.exists(out)) Files.move(bak, out)
        else deleteRecursive(bak)
      }
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
                 (build: Option[DataFrame] => DataFrame): DataFrame =
    // SERIALIZED per model for the WHOLE run (in-JVM monitor +
    // cross-process OS file lock) — dbt's own contract: a model never
    // runs concurrently with itself. Serialization is what makes
    // concurrent callers' upserts apply in SOME order (each build reads
    // the previous winner's table as its prior) instead of racing the
    // prior scan against another writer's swap renames.
    lockFor(model).synchronized { withFileLock(model) {
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
      // unique per invocation: even a writer that somehow bypasses the
      // locks (a crashed run's successor) can never clobber in-flight bytes
      val tmp = outPath(model) + "__tmp_" + java.util.UUID.randomUUID().toString
      try {
        result.write.mode(SaveMode.Overwrite).parquet(tmp)
        val out = Paths.get(outPath(model))
        val bak = Paths.get(outPath(model) + "__old")
        deleteRecursive(bak)
        if (Files.exists(out)) Files.move(out, bak)
        Files.move(Paths.get(tmp), out)
        deleteRecursive(bak)
      } catch {
        // a failed write must not orphan its tmp dir
        case e: Throwable => deleteRecursive(Paths.get(tmp)); throw e
      }
      spark.read.parquet(outPath(model))
    } }

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

object Materializer {
  // JVM-global swap monitors, keyed by canonical "warehouse/model": all
  // Materializer instances over one warehouse serialize on the same
  // monitor (a per-instance map would let two instances race the
  // renames and deadlock-by-exception on the shared OS file lock)
  private val swapLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  // OS file locks this JVM currently holds, with reentrancy depth; each
  // key is only ever touched under that key's swap monitor
  private val heldFileLocks = scala.collection.concurrent.TrieMap[String, Int]()
}
