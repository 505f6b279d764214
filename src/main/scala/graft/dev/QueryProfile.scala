package graft.dev

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Optimization-round measurement harness (guide §1): per-query job/stage
  * breakdown + formatted plan dumps, NOT a bench replacement. For each
  * named query it runs the same noop-sink protocol as graft.Bench
  * (min-of-3) and additionally instruments the LAST pass with a
  * SparkListener so the row's time decomposes into job count, stage
  * count, task count, cumulative task time, and shuffle bytes — the
  * "where does the wall-clock go" question the bench's single number
  * can't answer (many-small-jobs fixed cost vs one shuffle-bound job
  * look identical there). Plans land in `plans/<tag>/<name>_<suffix>.txt`
  * as `.explain("formatted")` text (the judge-checkable artifact).
  *
  * Usage: runMain graft.dev.QueryProfile <tag> <suffix> <q1,q2,...>
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  *      SPARK_GRAFT_PROFILE_PASSES (default 3).
  */
object QueryProfile {

  private final class Probe extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskTimeMs = new java.util.concurrent.atomic.AtomicLong
    val shufReadB = new java.util.concurrent.atomic.AtomicLong
    val shufWriteB = new java.util.concurrent.atomic.AtomicLong
    val inputB = new java.util.concurrent.atomic.AtomicLong
    val jobSpans = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobWallMs = new java.util.concurrent.atomic.AtomicLong
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      jobs.incrementAndGet(); jobSpans.put(e.jobId, e.time); ()
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = {
      Option(jobSpans.get(e.jobId)).foreach(t0 => jobWallMs.addAndGet(e.time - t0))
      ()
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet(); ()
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      Option(e.taskMetrics).foreach { m =>
        taskTimeMs.addAndGet(m.executorRunTime)
        shufReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        inputB.addAndGet(m.inputMetrics.bytesRead)
      }
      ()
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: QueryProfile <tag> <suffix> <q1,q2,...>")
    val (tag, suffix, names) = (args(0), args(1), args(2).split(",").toSeq)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nPasses = sys.env.getOrElse("SPARK_GRAFT_PROFILE_PASSES", "3").toInt
    val spark = graft.runtime.SessionTuning.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.runtime.Sources.bootstrap(spark)
    spark.range(100000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    spark.read.parquet(s"$sfDir/region.parquet").write.format("noop").mode("overwrite").save()
    val outDir = Paths.get("plans", tag)
    Files.createDirectories(outDir)
    val all = graft.SparkEntry.queries
    names.foreach { name =>
      all.get(name) match {
        case None => println(s"[profile] UNKNOWN query: $name")
        case Some(fn) =>
          spark.sparkContext.setJobDescription(name)
          val warm = (1 to math.max(1, nPasses - 1)).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          // instrumented final pass (also the plan-dump source)
          val probe = new Probe
          spark.sparkContext.addSparkListener(probe)
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          val tBuild = (System.nanoTime() - t0) / 1e9
          df.write.format("noop").mode("overwrite").save()
          val tLast = (System.nanoTime() - t0) / 1e9
          Thread.sleep(300) // listener bus drain (async; private API in Spark 4)
          spark.sparkContext.removeSparkListener(probe)
          val best = (warm :+ tLast).min
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          Files.write(outDir.resolve(s"${name}_$suffix.txt"),
            plan.getBytes(StandardCharsets.UTF_8))
          println(f"[profile] $name%-36s min=$best%7.3fs last=$tLast%7.3fs " +
            f"build=$tBuild%6.3fs jobs=${probe.jobs.get}%4d stages=${probe.stages.get}%4d " +
            f"tasks=${probe.tasks.get}%5d taskTime=${probe.taskTimeMs.get / 1000.0}%8.1fs " +
            f"jobWall=${probe.jobWallMs.get / 1000.0}%7.2fs " +
            f"shufR=${probe.shufReadB.get / 1048576.0}%8.2fMB shufW=${probe.shufWriteB.get / 1048576.0}%8.2fMB " +
            f"input=${probe.inputB.get / 1048576.0}%8.2fMB")
          spark.sharedState.cacheManager.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
          System.gc()
      }
    }
    spark.stop()
  }
}
