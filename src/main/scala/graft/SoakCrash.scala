package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

/** CRASH-KILL soak for the banded near-dup ingest (VERDICT r12 task 7):
  * the crash-gap repairs — banded-sink sig-before-band write order, the
  * construction-time side-table repair, and the forget retry contract —
  * are spec-gated at the API level but were never PROCESS-KILL tested.
  * This harness runs the same trigger stream as the `neardup` soak
  * through a CHILD JVM that the parent `kill -9`s at randomized
  * mid-trigger points (≥ `SPARK_GRAFT_CRASH_KILLS`, default 12), then
  * restarts from a write-ahead progress journal; forgets write an
  * INTENT line before the call and a DONE line after, and a restart
  * re-issues any intent without its DONE — the documented must-retry
  * contract, exercised across real process deaths.
  *
  * Verification is an EQUALITY proof, not just bounds: the parent then
  * runs the identical trigger stream (same slices, same injected dups,
  * same forgets) in-process with NO kills, and the crash run's final
  * corpus/signature/band key sets must match the clean run's exactly —
  * no loss (a doc a crash swallowed), no resurrection (a forgotten doc
  * healed back), no phantom (a replay double-ingest the LWW merge
  * failed to absorb). On top of that: the usual recall floors and
  * deletion-invisibility across all three tables, and ≥ 10 kills
  * actually logged mid-run.
  *
  * Output: one JSON object (argv(0), default soak_crash_out.json).
  */
object SoakCrash {

  private[graft] val ExactBase = 100000000L
  private[graft] val NearBase = 200000000L
  private[graft] val DeleteEvery = 15

  private[graft] def loadSlices(spark: SparkSession, sfDir: String,
                                nTriggers: Int, sliceSize: Int): Array[Array[(Long, String)]] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text")).orderBy("doc_id")
      .as[(Long, String)].collect().take(nTriggers * sliceSize)
      .grouped(sliceSize).toArray
  }

  /** Deterministic per-trigger duplicate injections (the neardup soak's
    * policy, derived from t alone so a REPLAYED trigger re-injects the
    * identical rows and the verifier can recompute every id offline).
    */
  private[graft] def injectionsFor(t: Int,
      slices: Array[Array[(Long, String)]]): Seq[(Long, String)] =
    if (t == 0) Nil
    else {
      val prev = slices(t - 1)
      val exact = prev.take(5).map { case (id, tx) => (ExactBase + id, tx) }
      val near = prev.slice(5, 10).flatMap { case (id, tx) =>
        if (tx.trim.split("\\s+").distinct.length >= 9)
          Some((NearBase + id, tx + s" xqzsoak$id")) else None
      }
      (exact ++ near).toSeq
    }

  private[graft] def victimsFor(t: Int,
      slices: Array[Array[(Long, String)]]): Seq[Long] =
    if (t > 0 && t % DeleteEvery == 0) slices(t - DeleteEvery).take(100).map(_._1).toSeq
    else Nil

  private[graft] final case class Stores(frag: graft.runtime.FragmentedTable,
      sigs: graft.runtime.BucketedFragmentStore,
      bands: graft.runtime.BucketedFragmentStore)

  private[graft] def openStores(spark: SparkSession, wh: String): Stores =
    Stores(new graft.runtime.FragmentedTable(spark, wh, "corpus", "doc_id"),
      graft.runtime.BucketedFragmentStore(spark, wh, "corpus__sigs", "doc_id",
        buckets = 2),
      graft.runtime.BucketedFragmentStore(spark, wh, "corpus__sigbands", "__bk",
        buckets = 4, routeCol = Some("band_key")))

  /** Run triggers [from, until) through a fresh banded sink over the
    * given warehouse, journaling progress + forget intents when a
    * journal path is supplied. Re-issues any un-DONE forget intent
    * FIRST (the retry contract) when resuming.
    */
  private[graft] def runTriggers(spark: SparkSession, wh: String,
      slices: Array[Array[(Long, String)]], from: Int, until: Int,
      journal: Option[java.nio.file.Path]): Unit = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val st = openStores(spark, wh)
    def logLine(s: String): Unit = journal.foreach { p =>
      Files.write(p, (s + "\n").getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND,
        StandardOpenOption.DSYNC)
    }
    // retry contract: any forget whose DONE never landed re-issues now.
    // kill -9 can tear the journal's last line mid-write — malformed
    // lines parse as absent (a torn T/FD line just means its work
    // replays/retries, which is the converging direction)
    journal.filter(Files.exists(_)).foreach { p =>
      val lines = Files.readAllLines(p).asScala
      def nums(prefix: String): Seq[Int] = lines.collect {
        case l if l.startsWith(prefix) =>
          scala.util.Try(l.drop(prefix.length).trim.toInt).toOption
      }.flatten.toSeq
      val done = nums("FD ").toSet
      nums("FI ").distinct.filterNot(done).foreach { t =>
          graft.streaming.StreamingOps.nearDupForget(st.frag, st.sigs, st.bands,
            victimsFor(t, slices).toDF("doc_id"))
          logLine(s"FD $t")
        }
    }
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.corpusIngestNearDupBandedSink(
      in.toDF().toDF("doc_id", "text"), st.frag, st.sigs, st.bands,
      threshold = 0.9, compactEvery = 8L,
      rebucketBytesPerBucket = 32L << 20).start()
    (from until until).foreach { t =>
      in.addData(slices(t).toSeq ++ injectionsFor(t, slices))
      q.processAllAvailable()
      val victims = victimsFor(t, slices)
      if (victims.nonEmpty) {
        logLine(s"FI $t")
        graft.streaming.StreamingOps.nearDupForget(st.frag, st.sigs, st.bands,
          victims.toDF("doc_id"))
        logLine(s"FD $t")
      }
      logLine(s"T $t")
    }
    q.stop()
  }

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("soak_crash_out.json")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nTriggers = sys.env.getOrElse("SPARK_GRAFT_CRASH_TRIGGERS", "60").toInt
    val sliceSize = sys.env.getOrElse("SPARK_GRAFT_CRASH_SLICE", "250").toInt
    val minKills = sys.env.getOrElse("SPARK_GRAFT_CRASH_KILLS", "12").toInt

    val whCrash = Files.createTempDirectory("graft-crash").toString
    val whClean = Files.createTempDirectory("graft-clean").toString
    val journal = Paths.get(whCrash, "progress.journal")

    // ---- phase 1: the kill loop over child JVMs -------------------------
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports") ||
        a.startsWith("-Xmx"))
    val childLog = Paths.get(whCrash, "child.log").toFile
    // deterministic kill schedule (no wall-clock randomness): xorshift
    // over the spawn index picks a delay in [18, 42] s — long enough
    // that most spawns land 1..5 triggers (the ~20 s Spark init plus
    // 2..8 s triggers), short enough to die mid-stream
    def killDelayMs(i: Int): Long = {
      var z = i.toLong + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      18000L + ((z ^ (z >>> 31)) & Long.MaxValue) % 24000L
    }
    def completedTriggers(): Int =
      if (!Files.exists(journal)) 0
      else Files.readAllLines(journal).asScala
        .collect { case l if l.startsWith("T ") =>
          scala.util.Try(l.drop(2).trim.toInt + 1).toOption }
        .flatten.maxOption.getOrElse(0)
    val kills = scala.collection.mutable.ArrayBuffer[String]()
    var spawn = 0
    // adaptive backoff: a restart whose kill landed before any trigger
    // completed (startup + construction repair grow with the corpus)
    // widens the next delay, so the loop always makes progress
    var extraMs = 0L
    while (completedTriggers() < nTriggers) {
      val before = completedTriggers()
      val pb = new ProcessBuilder((Seq(javaBin) ++ jvmArgs ++ Seq(
        "-cp", sys.props("java.class.path"),
        "graft.SoakCrashChild", whCrash, sfDir,
        nTriggers.toString, sliceSize.toString)).asJava)
      pb.redirectErrorStream(true)
      pb.redirectOutput(ProcessBuilder.Redirect.appendTo(childLog))
      val proc = pb.start()
      val killing = kills.size < minKills && before < nTriggers - 3
      if (killing) {
        val delay = killDelayMs(spawn) + extraMs
        val died = proc.waitFor(delay, java.util.concurrent.TimeUnit.MILLISECONDS)
        if (!died) {
          proc.destroyForcibly() // SIGKILL — no shutdown hooks, no flushes
          proc.waitFor()
          val after = completedTriggers()
          extraMs = if (after == before) extraMs + 15000L else 0L
          kills += s"""{"spawn":$spawn,"delay_ms":$delay,"completed_at_kill":$after,"advanced":${after - before}}"""
          println(s"[crash] kill #${kills.size} spawn=$spawn delay=${delay}ms completed=$after")
        } else println(s"[crash] spawn=$spawn exited rc=${proc.exitValue()} before its kill")
      } else {
        val rc = proc.waitFor()
        println(s"[crash] final spawn=$spawn rc=$rc completed=${completedTriggers()}")
        require(rc == 0 || completedTriggers() >= nTriggers,
          s"child failed (rc=$rc) without finishing — see $childLog")
      }
      spawn += 1
      require(spawn < minKills * 4 + 20, "kill loop failed to make progress")
    }

    // ---- phase 2: clean reference run + verification --------------------
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.runtime.Sources.bootstrap(spark)
    import spark.implicits._
    val slices = loadSlices(spark, sfDir, nTriggers, sliceSize)
    runTriggers(spark, whClean, slices, 0, slices.length, journal = None)

    def keySet(df: Option[DataFrame], key: String): Set[Any] =
      df.map(_.select(key).distinct().collect().map(_.get(0)).toSet)
        .getOrElse(Set.empty)
    val crash = openStores(spark, whCrash)
    val clean = openStores(spark, whClean)
    val corpusCrash = keySet(crash.frag.read(), "doc_id")
    val corpusClean = keySet(clean.frag.read(), "doc_id")
    val sigsCrash = keySet(crash.sigs.read(), "doc_id")
    val sigsClean = keySet(clean.sigs.read(), "doc_id")
    val bandsCrash = keySet(crash.bands.read(), "__bk")
    val bandsClean = keySet(clean.bands.read(), "__bk")

    // recall + deletion bookkeeping, recomputed offline from the slices
    val allInjExact = (1 until slices.length)
      .flatMap(t => injectionsFor(t, slices)).map(_._1)
      .filter(id => id >= ExactBase && id < NearBase).toSet
    val nearPairs = (1 until slices.length).flatMap { t =>
      slices(t - 1).slice(5, 10)
        .filter(_._2.trim.split("\\s+").distinct.length >= 9)
        .map { case (id, _) => (NearBase + id, id) }
    }.toSet
    val deleted = (1 until slices.length)
      .flatMap(t => victimsFor(t, slices)).toSet
    val exactDropped = allInjExact.count(!corpusCrash(_))
    val exactRecall =
      if (allInjExact.isEmpty) 1.0 else exactDropped.toDouble / allInjExact.size
    val eligible = nearPairs.filter(p => corpusCrash(p._2))
    val nearDropped = eligible.count(p => !corpusCrash(p._1))
    val nearRecall =
      if (eligible.isEmpty) 1.0 else nearDropped.toDouble / eligible.size
    val delVisible = Seq(corpusCrash, sigsCrash)
      .map(_.count(a => deleted.contains(a.asInstanceOf[Long]))).sum +
      bandsCrash.count { case s: String => deleted.exists(d => s.endsWith(s":$d")) case _ => false }

    val checks: Seq[(String, Boolean, String)] = Seq(
      ("kills_logged", kills.size >= 10, s"${kills.size} >= 10"),
      ("corpus_match", corpusCrash == corpusClean,
        s"crash ${corpusCrash.size} rows vs clean ${corpusClean.size}; " +
          s"missing ${(corpusClean -- corpusCrash).size}, extra ${(corpusCrash -- corpusClean).size}"),
      ("sigs_match", sigsCrash == sigsClean,
        s"crash ${sigsCrash.size} vs clean ${sigsClean.size}"),
      ("bands_match", bandsCrash == bandsClean,
        s"crash ${bandsCrash.size} vs clean ${bandsClean.size}"),
      ("exact_recall", exactRecall >= 0.99, f"$exactRecall%.4f >= 0.99"),
      ("near_recall", nearRecall >= 0.95, f"$nearRecall%.4f >= 0.95"),
      ("deletions_invisible", delVisible == 0, s"visible rows across triple: $delVisible"))
    val pass = checks.forall(_._2)
    val json =
      s"""{"soak":"crash_kill_banded_sf1","sf_dir":"$sfDir","triggers":${slices.length},""" +
      s""""slice_size":$sliceSize,"delete_every":$DeleteEvery,"spawns":$spawn,""" +
      s""""pass":$pass,"checks":{${SoakUtil.checksJson(checks)}},""" +
      s""""kills":[${kills.mkString(",")}]}"""
    SoakUtil.writeJson(outPath, json)
    SoakUtil.reportFailures(checks)
    spark.stop()
    graft.runtime.Fs.deleteRecursive(Paths.get(whClean))
    if (pass) graft.runtime.Fs.deleteRecursive(Paths.get(whCrash))
    if (!pass) sys.exit(2)
  }
}

/** The kill target: processes triggers from the journal's resume point
  * until done, honoring the forget retry contract on startup. Spawned
  * only by [[SoakCrash]].
  */
object SoakCrashChild {
  def main(args: Array[String]): Unit = {
    val Array(wh, sfDir, nT, sz) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.runtime.Sources.bootstrap(spark)
    val journal = Paths.get(wh, "progress.journal")
    val slices = SoakCrash.loadSlices(spark, sfDir, nT.toInt, sz.toInt)
    val from =
      if (!Files.exists(journal)) 0
      else Files.readAllLines(journal).asScala
        .collect { case l if l.startsWith("T ") =>
          scala.util.Try(l.drop(2).trim.toInt + 1).toOption }
        .flatten.maxOption.getOrElse(0)
    println(s"[crash-child] resuming at trigger $from / ${slices.length}")
    SoakCrash.runTriggers(spark, wh, slices, from, slices.length, Some(journal))
    spark.stop()
  }
}
