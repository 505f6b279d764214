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
  *
  * Since r14 (VERDICT r13 task 7) the harness is SCENARIO-dispatched
  * (`SPARK_GRAFT_CRASH_SCENARIO` = banded | quarantine | embed): the
  * quarantine sink's corpus-first fp-store commit order and reject
  * replay idempotence, and the embed sink's corpus-then-index appends,
  * two-rename maintain() swaps, and index-first deletion order, make
  * the same crash-equality claims as the banded sink — each scenario
  * runs its own trigger stream through the kill loop and proves its
  * own crash-vs-clean set equalities.
  */
object SoakCrash {

  private[graft] val ExactBase = 100000000L
  private[graft] val NearBase = 200000000L
  private[graft] val NullBase = 300000000L
  private[graft] val EmptyBase = 400000000L
  private[graft] val WsBase = 500000000L
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

  // --------------------------------------------------- simhash scenario
  // (VERDICT r15 task 4): the SimHash text sink shares the media sink's
  // repair/forget machinery but until r16 had only spec-level coverage —
  // this applies the media discipline (flatness soak + kill loop with
  // crash-vs-clean set equality) to the cheap text rung. Injections are
  // WHITESPACE TWINS of previous-slice docs: re-serializations whose
  // distinct-token SimHash is hamming-0 identical to their source, so
  // the drop claim is construction-exact, not probabilistic.

  private[graft] def simhashInjectionsFor(t: Int,
      slices: Array[Array[(Long, String)]]): Seq[(Long, String)] =
    if (t == 0) Nil
    // null-text docs are NOT injected (ADVICE r16): a null twin has a
    // null sig, rides into the corpus undeduped, and the coexistence
    // checks count any surviving (WsBase+id, id) pair by id arithmetic
    // alone — so a null-text doc in a slice's first 3 would false-fail
    // both the soak and crash scenarios. take(3) BEFORE the filter
    // mirrors the twin-pair bookkeeping exactly (same candidate window,
    // same survivors).
    else slices(t - 1).take(3).filter(_._2 != null).map { case (id, tx) =>
      (WsBase + id, tx.replace(" ", "  \t "))
    }.toSeq

  private[graft] final case class SimHashStores(
      frag: graft.runtime.FragmentedTable,
      bands: graft.runtime.BucketedFragmentStore)

  private[graft] def openSimHashStores(spark: SparkSession,
      wh: String): SimHashStores =
    SimHashStores(
      new graft.runtime.FragmentedTable(spark, wh, "scorpus", "doc_id"),
      graft.runtime.BucketedFragmentStore(spark, wh, "scorpus__sigbands",
        "__bk", buckets = 4, routeCol = Some("band_key")))

  /** Run triggers [from, until) through a fresh SimHash banded sink,
    * journaling progress + forget intents when a journal path is
    * supplied (same T/FI/FD protocol as the banded scenario; forgets go
    * through [[graft.streaming.StreamingOps.sigBandForget]]'s
    * caller-must-retry contract).
    */
  private[graft] def runSimHashTriggers(spark: SparkSession, wh: String,
      slices: Array[Array[(Long, String)]], from: Int, until: Int,
      journal: Option[java.nio.file.Path]): Unit = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val st = openSimHashStores(spark, wh)
    def logLine(s: String): Unit = journal.foreach { p =>
      Files.write(p, (s + "\n").getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND,
        StandardOpenOption.DSYNC)
    }
    journal.filter(Files.exists(_)).foreach { p =>
      val lines = Files.readAllLines(p).asScala
      def nums(prefix: String): Seq[Int] = lines.collect {
        case l if l.startsWith(prefix) =>
          scala.util.Try(l.drop(prefix.length).trim.toInt).toOption
      }.flatten.toSeq
      val done = nums("FD ").toSet
      nums("FI ").distinct.filterNot(done).foreach { t =>
        graft.streaming.StreamingOps.sigBandForget(st.frag, st.bands,
          victimsFor(t, slices).toDF("doc_id"))
        logLine(s"FD $t")
      }
    }
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.corpusIngestSimHashBandedSink(
      in.toDF().toDF("doc_id", "text"), st.frag, st.bands,
      maxDist = 3, compactEvery = 8L).start()
    (from until until).foreach { t =>
      in.addData(slices(t).toSeq ++ simhashInjectionsFor(t, slices))
      q.processAllAvailable()
      val victims = victimsFor(t, slices)
      if (victims.nonEmpty) {
        logLine(s"FI $t")
        graft.streaming.StreamingOps.sigBandForget(st.frag, st.bands,
          victims.toDF("doc_id"))
        logLine(s"FD $t")
      }
      logLine(s"T $t")
    }
    q.stop()
  }

  // ------------------------------------------------ quarantine scenario
  // (VERDICT r13 task 7): the routed quarantine sink's corpus-FIRST
  // commit order (corpus truth, then fp index; construction repair
  // backfills a lagging store) and reject-table replay idempotence make
  // the same no-loss/no-phantom equality claims as the banded sink —
  // killed here the same way. No forgets: the journal carries T lines
  // only.

  private[graft] def quarInjectionsFor(t: Int,
      slices: Array[Array[(Long, String)]]): Seq[(Long, String)] =
    if (t == 0) Nil
    else {
      val prev = slices(t - 1)
      val exact = prev.take(3).map { case (id, tx) => (ExactBase + id, tx) }
      val nulls = prev.slice(3, 5).map { case (id, _) =>
        (NullBase + id, null.asInstanceOf[String]) }
      val empties = prev.slice(5, 7).map { case (id, _) => (EmptyBase + id, "") }
      (exact ++ nulls ++ empties).toSeq
    }

  private[graft] final case class QuarStores(frag: graft.runtime.FragmentedTable,
      rej: graft.runtime.FragmentedTable,
      fps: graft.runtime.BucketedFragmentStore)

  private[graft] def openQuarStores(spark: SparkSession, wh: String): QuarStores =
    QuarStores(new graft.runtime.FragmentedTable(spark, wh, "qcorpus", "doc_id"),
      new graft.runtime.FragmentedTable(spark, wh, "qcorpus__rejects", "doc_id"),
      graft.runtime.BucketedFragmentStore(spark, wh, "qcorpus__fps", "fp",
        buckets = 4))

  private[graft] def runQuarTriggers(spark: SparkSession, wh: String,
      slices: Array[Array[(Long, String)]], from: Int, until: Int,
      journal: Option[java.nio.file.Path]): Unit = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val st = openQuarStores(spark, wh)
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.corpusIngestQuarantineRoutedSink(
      in.toDF().toDF("doc_id", "text"), st.frag, st.rej, Seq(
        "text_not_null" -> col("text").isNotNull,
        "text_nonempty" -> (length(col("text")) > 0)),
      st.fps, compactEvery = 8L).start()
    (from until until).foreach { t =>
      in.addData(slices(t).toSeq ++ quarInjectionsFor(t, slices))
      q.processAllAvailable()
      journal.foreach(p => Files.write(p, s"T $t\n".getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND, StandardOpenOption.DSYNC))
    }
    q.stop()
  }

  // ----------------------------------------------------- embed scenario
  // (VERDICT r13 task 7): the embed sink's corpus-then-index append
  // order (construction/cadence repair heals a lagging index), the
  // two-rename maintain() swaps, and the INDEX-FIRST deletion order
  // are all crash contracts — killed here with the same intent/DONE
  // retry journal the banded forgets use.

  private[graft] def loadVecSlices(spark: SparkSession, sfDir: String,
      nTriggers: Int, sliceSize: Int): Array[Array[(Long, Seq[Float])]] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("long"), col("embedding")).orderBy("vec_id")
      .as[(Long, Seq[Float])].collect().take(nTriggers * sliceSize)
      .grouped(sliceSize).toArray
  }

  // the embed soak's deterministic 5%-first-coordinate perturbation:
  // keeps cosine ≥ ~0.9988, above the 0.995 screen threshold
  private[graft] def perturb(v: Seq[Float]): Option[(Seq[Float], Double)] = {
    val n2 = v.foldLeft(0.0)((a, x) => a + x.toDouble * x)
    if (n2 == 0) None
    else {
      val d = 0.05 * math.sqrt(n2)
      val w = v.updated(0, (v.head + d).toFloat)
      val dot = v.zip(w).foldLeft(0.0)((a, p) => a + p._1.toDouble * p._2)
      val wn2 = w.foldLeft(0.0)((a, x) => a + x.toDouble * x)
      Some((w, dot / math.sqrt(n2 * wn2)))
    }
  }

  private[graft] def embedInjectionsFor(t: Int,
      slices: Array[Array[(Long, Seq[Float])]]): Seq[(Long, Seq[Float])] =
    if (t == 0) Nil
    else {
      val prev = slices(t - 1)
      val exact = prev.take(3).map { case (id, v) => (ExactBase + id, v) }
      val near = prev.slice(3, 6).flatMap { case (id, v) =>
        perturb(v) match {
          case Some((w, cos)) if cos >= 0.996 => Some((NearBase + id, w))
          case _ => None
        }
      }
      (exact ++ near).toSeq
    }

  private[graft] def embedVictimsFor(t: Int,
      slices: Array[Array[(Long, Seq[Float])]]): Seq[Long] =
    if (t > 0 && t % DeleteEvery == 0) slices(t - DeleteEvery).take(30).map(_._1).toSeq
    else Nil

  private[graft] def embedIdxPath(wh: String): String = s"$wh/vcorpus.vecindex"

  /** Embed-scenario index profile (VERDICT r16 task 6): the default
    * pins the IVF rung (the facade's bulk path, soaked since r13);
    * `SPARK_GRAFT_CRASH_EMBED_PROFILE=serving` pins the HNSW graph
    * rung instead, so its two-rename maintain()/tombstone swaps get
    * the same kill -9 byte-equality evidence — until r17 the serving
    * rung answered `q_ext_recall_knn_hnsw` with spec-only durability.
    * Read from env (not argv) so the kill loop's child JVMs and the
    * clean reference run inherit the same rung by construction.
    */
  private[graft] def embedCrashProfile(): graft.ext.IndexProfile =
    if (sys.env.get("SPARK_GRAFT_CRASH_EMBED_PROFILE").contains("serving"))
      graft.ext.IndexProfile(exactFloor = 0L, serving = true)
    else graft.ext.IndexProfile(exactFloor = 0L)

  /** The indexed deletion, applied the way
    * [[graft.streaming.StreamingOps.keyDeletionFragmentedSink]] applies
    * it — index tombstone FIRST, then corpus, both idempotent — so the
    * FI/FD retry journal can re-issue it across kills.
    */
  private[graft] def embedDelete(spark: SparkSession,
      frag: graft.runtime.FragmentedTable, idxPath: String,
      victims: Seq[Long]): Unit = {
    import spark.implicits._
    frag.read().foreach { cur =>
      val live = victims.toDF("vec_id")
        .join(cur.select("vec_id"), Seq("vec_id"), "left_semi")
      if (!live.isEmpty) {
        graft.ext.VectorIndex.load(spark, idxPath).delete(live, idCol = "vec_id")
        frag.deleteKeys(live)
      }
    }
  }

  private[graft] def runEmbedTriggers(spark: SparkSession, wh: String,
      slices: Array[Array[(Long, Seq[Float])]], from: Int, until: Int,
      journal: Option[java.nio.file.Path]): Unit = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val frag = new graft.runtime.FragmentedTable(spark, wh, "vcorpus", "vec_id")
    val idxPath = embedIdxPath(wh)
    def logLine(s: String): Unit = journal.foreach { p =>
      Files.write(p, (s + "\n").getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND,
        StandardOpenOption.DSYNC)
    }
    // deletion retry contract, same parse rules as the banded forgets
    journal.filter(Files.exists(_)).foreach { p =>
      val lines = Files.readAllLines(p).asScala
      def nums(prefix: String): Seq[Int] = lines.collect {
        case l if l.startsWith(prefix) =>
          scala.util.Try(l.drop(prefix.length).trim.toInt).toOption
      }.flatten.toSeq
      val done = nums("FD ").toSet
      nums("FI ").distinct.filterNot(done).foreach { t =>
        embedDelete(spark, frag, idxPath, embedVictimsFor(t, slices))
        logLine(s"FD $t")
      }
    }
    val in = MemoryStream[(Long, Seq[Float])]
    val q = graft.streaming.StreamingOps.corpusIngestEmbedVectorIndexSink(
      in.toDF().toDF("vec_id", "embedding"), frag, idxPath,
      embedCrashProfile(),
      threshold = 0.995, compactEvery = 8L).start()
    (from until until).foreach { t =>
      in.addData(slices(t).toSeq ++ embedInjectionsFor(t, slices))
      q.processAllAvailable()
      val victims = embedVictimsFor(t, slices)
      if (victims.nonEmpty) {
        logLine(s"FI $t")
        embedDelete(spark, frag, idxPath, victims)
        logLine(s"FD $t")
      }
      logLine(s"T $t")
    }
    q.stop()
  }

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("soak_crash_out.json")
    val scenario = sys.env.getOrElse("SPARK_GRAFT_CRASH_SCENARIO", "banded")
    require(Set("banded", "quarantine", "embed", "media", "simhash")(scenario),
      s"unknown crash scenario '$scenario'")
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
    val spark = graft.runtime.SessionTuning.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.runtime.Sources.bootstrap(spark)
    import spark.implicits._

    def keySet(df: Option[DataFrame], key: String): Set[Any] =
      df.map(_.select(key).distinct().collect().map(_.get(0)).toSet)
        .getOrElse(Set.empty)
    def matchCheck(name: String, crash: Set[Any], clean: Set[Any]) =
      (name, crash == clean,
        s"crash ${crash.size} vs clean ${clean.size}; " +
          s"missing ${(clean -- crash).size}, extra ${(crash -- clean).size}")

    // actual trigger count: when the source parquet holds fewer rows
    // than nTriggers*sliceSize, loadSlices returns fewer slices — the
    // artifact must report what RAN, not what was requested (ADVICE r14)
    var slicesRan = 0
    val scenarioChecks: Seq[(String, Boolean, String)] = scenario match {
      case "banded" =>
        val slices = loadSlices(spark, sfDir, nTriggers, sliceSize)
        slicesRan = slices.length
        runTriggers(spark, whClean, slices, 0, slices.length, journal = None)
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
        Seq(
          matchCheck("corpus_match", corpusCrash, corpusClean),
          matchCheck("sigs_match", sigsCrash, sigsClean),
          matchCheck("bands_match", bandsCrash, bandsClean),
          ("exact_recall", exactRecall >= 0.99, f"$exactRecall%.4f >= 0.99"),
          ("near_recall", nearRecall >= 0.95, f"$nearRecall%.4f >= 0.95"),
          ("deletions_invisible", delVisible == 0,
            s"visible rows across triple: $delVisible"))

      case "quarantine" =>
        val slices = loadSlices(spark, sfDir, nTriggers, sliceSize)
        slicesRan = slices.length
        runQuarTriggers(spark, whClean, slices, 0, slices.length, journal = None)
        val crash = openQuarStores(spark, whCrash)
        val clean = openQuarStores(spark, whClean)
        val corpusCrash = keySet(crash.frag.read(), "doc_id")
        val corpusClean = keySet(clean.frag.read(), "doc_id")
        // rejects must match INCLUDING the recorded reason, not just ids
        def rejSet(st: QuarStores): Set[Any] = st.rej.read()
          .map(_.select(col("doc_id"), col("reject_reason")).distinct()
            .collect().map(r => (r.get(0), r.get(1)): Any).toSet)
          .getOrElse(Set.empty)
        val fpsCrash = keySet(crash.fps.read(), "fp")
        val fpsClean = keySet(clean.fps.read(), "fp")
        val corpusInvalid = corpusCrash.count(
          a => a.asInstanceOf[Long] >= NullBase)
        Seq(
          matchCheck("corpus_match", corpusCrash, corpusClean),
          matchCheck("rejects_match", rejSet(crash), rejSet(clean)),
          matchCheck("fps_match", fpsCrash, fpsClean),
          ("no_invalid_in_corpus", corpusInvalid == 0,
            s"invalid rows in crash corpus: $corpusInvalid"))

      case "media" =>
        val slices = SoakMedia.loadIdSlices(spark, sfDir, nTriggers, sliceSize)
        slicesRan = slices.length
        SoakMedia.runTriggers(spark, whClean, slices, 0, slices.length,
          journal = None)
        val crash = SoakMedia.openStores(spark, whCrash)
        val clean = SoakMedia.openStores(spark, whClean)
        val corpusCrash = keySet(crash.frag.read(), "doc_id")
        val corpusClean = keySet(clean.frag.read(), "doc_id")
        val bandsCrash = keySet(crash.bands.read(), "__bk")
        val bandsClean = keySet(clean.bands.read(), "__bk")
        // rejects must match INCLUDING the recorded first-failing reason
        def rejSet(st: SoakMedia.MediaStores): Set[Any] = st.rej.read()
          .map(_.select(col("doc_id"), col("reject_reason")).distinct()
            .collect().map(r => (r.get(0), r.get(1)): Any).toSet)
          .getOrElse(Set.empty)
        // recall + deletion bookkeeping, recomputed offline from the ids
        val nearPairs = (1 until slices.length)
          .flatMap(t => SoakMedia.nearPairsFor(t, slices)).toSet
        val deleted = (1 until slices.length)
          .flatMap(t => SoakMedia.victimsFor(t, slices)).toSet
        val eligible = nearPairs.filter(p => corpusCrash(p._2))
        val nearDropped = eligible.count(p => !corpusCrash(p._1))
        val nearRecall =
          if (eligible.isEmpty) 1.0 else nearDropped.toDouble / eligible.size
        val corpusInvalid = corpusCrash.count(
          a => a.asInstanceOf[Long] >= SoakMedia.JunkBase)
        val bandDocsCrash = keySet(crash.bands.read(), "doc_id")
        val delVisible =
          corpusCrash.count(a => deleted.contains(a.asInstanceOf[Long])) +
          bandDocsCrash.count(a => deleted.contains(a.asInstanceOf[Long]))
        Seq(
          matchCheck("corpus_match", corpusCrash, corpusClean),
          matchCheck("rejects_match", rejSet(crash), rejSet(clean)),
          matchCheck("bands_match", bandsCrash, bandsClean),
          ("near_recall", nearRecall >= 0.99,
            f"$nearRecall%.4f >= 0.99 (${eligible.size} source-live pairs)"),
          ("no_invalid_in_corpus", corpusInvalid == 0,
            s"invalid rows in crash corpus: $corpusInvalid"),
          ("deletions_invisible", delVisible == 0,
            s"visible rows across corpus+bands: $delVisible"))

      case "simhash" =>
        val slices = loadSlices(spark, sfDir, nTriggers, sliceSize)
        slicesRan = slices.length
        runSimHashTriggers(spark, whClean, slices, 0, slices.length, journal = None)
        val crash = openSimHashStores(spark, whCrash)
        val clean = openSimHashStores(spark, whClean)
        val corpusCrash = keySet(crash.frag.read(), "doc_id")
        val corpusClean = keySet(clean.frag.read(), "doc_id")
        val bandsCrash = keySet(crash.bands.read(), "__bk")
        val bandsClean = keySet(clean.bands.read(), "__bk")
        // whitespace-twin drops are hamming-0 exact: every twin whose
        // source is live must be absent (it can only be absent — it
        // either dropped against its source or against another doc)
        val twinPairs = (1 until slices.length)
          .flatMap(t => slices(t - 1).take(3)
            .filter(_._2 != null)
            .map { case (id, _) => (WsBase + id, id) }).toSet
        val eligible = twinPairs.filter(p => corpusCrash(p._2))
        val twinDropped = eligible.count(p => !corpusCrash(p._1))
        val twinRecall =
          if (eligible.isEmpty) 1.0 else twinDropped.toDouble / eligible.size
        val deleted = (1 until slices.length)
          .flatMap(t => victimsFor(t, slices)).toSet
        val bandDocsCrash = keySet(crash.bands.read(), "doc_id")
        val delVisible =
          corpusCrash.count(a => deleted.contains(a.asInstanceOf[Long])) +
          bandDocsCrash.count(a => deleted.contains(a.asInstanceOf[Long]))
        // a twin coexisting with its live source is the violation (the
        // hamming-0 pair survived together); a twin alone is legitimate
        // — its witness was itself dropped or later forgotten
        val corpusTwins = corpusCrash.count { a =>
          val id = a.asInstanceOf[Long]
          id >= WsBase && corpusCrash(id - WsBase)
        }
        Seq(
          matchCheck("corpus_match", corpusCrash, corpusClean),
          matchCheck("bands_match", bandsCrash, bandsClean),
          ("ws_twin_recall", twinRecall >= 0.999,
            f"$twinRecall%.4f >= 0.999 (${eligible.size} source-live twins)"),
          ("no_coexisting_twin", corpusTwins == 0,
            s"twin+source pairs coexisting in crash corpus: $corpusTwins"),
          ("deletions_invisible", delVisible == 0,
            s"visible rows across corpus+bands: $delVisible"))

      case "embed" =>
        val slices = loadVecSlices(spark, sfDir, nTriggers, sliceSize)
        slicesRan = slices.length
        runEmbedTriggers(spark, whClean, slices, 0, slices.length, journal = None)
        val crashFrag = new graft.runtime.FragmentedTable(spark, whCrash,
          "vcorpus", "vec_id")
        val cleanFrag = new graft.runtime.FragmentedTable(spark, whClean,
          "vcorpus", "vec_id")
        val corpusCrash = keySet(crashFrag.read(), "vec_id")
        val corpusClean = keySet(cleanFrag.read(), "vec_id")
        val idx = graft.ext.VectorIndex.load(spark, embedIdxPath(whCrash))
        // sync: every crash-corpus id indexed (tombstoned counts as
        // indexed — the sink's own repair rule)
        val indexLag = crashFrag.read().map(_.select("vec_id")
          .join(idx.indexedIds, Seq("vec_id"), "left_anti").count()).getOrElse(0L)
        val deleted = (1 until slices.length)
          .flatMap(t => embedVictimsFor(t, slices)).toSet
        val delVisible = corpusCrash.count(
          a => deleted.contains(a.asInstanceOf[Long]))
        // unsearchable: probe the crash index with each deleted id's own
        // vector; surfacing that id means the tombstone was lost
        val byId = slices.flatten.toMap
        val delVecs = deleted.toSeq.sorted.flatMap(id => byId.get(id).map(v => (id, v)))
        val delSearchable = if (delVecs.isEmpty) 0L
          else idx.search(delVecs.toDF("vec_id", "embedding"), k = 1)
            .filter(col("query_id") === col("corpus_id")).count()
        val allInjExact = (1 until slices.length)
          .flatMap(t => embedInjectionsFor(t, slices)).map(_._1)
          .filter(id => id >= ExactBase && id < NearBase).toSet
        val exactDropped = allInjExact.count(!corpusCrash(_))
        val exactRecall =
          if (allInjExact.isEmpty) 1.0 else exactDropped.toDouble / allInjExact.size
        Seq(
          matchCheck("corpus_match", corpusCrash, corpusClean),
          // informational: which rung this run actually exercised (the
          // serving profile must show "hnsw" here, the default "ivf")
          ("index_kind", true, idx.kind),
          ("index_corpus_sync", indexLag == 0, s"lag $indexLag"),
          ("exact_recall", exactRecall >= 0.99, f"$exactRecall%.4f >= 0.99"),
          ("deletions_invisible", delVisible == 0, s"visible $delVisible"),
          ("deletions_unsearchable", delSearchable == 0,
            s"searchable $delSearchable"))
    }

    val checks: Seq[(String, Boolean, String)] =
      ("kills_logged", kills.size >= 10, s"${kills.size} >= 10") +: scenarioChecks
    val pass = checks.forall(_._2)
    val json =
      s"""{"soak":"crash_kill_${scenario}_sf1","sf_dir":"$sfDir","triggers":$slicesRan,""" +
      s""""triggers_requested":$nTriggers,""" +
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
    val scenario = sys.env.getOrElse("SPARK_GRAFT_CRASH_SCENARIO", "banded")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.runtime.SessionTuning.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.runtime.Sources.bootstrap(spark)
    val journal = Paths.get(wh, "progress.journal")
    val from =
      if (!Files.exists(journal)) 0
      else Files.readAllLines(journal).asScala
        .collect { case l if l.startsWith("T ") =>
          scala.util.Try(l.drop(2).trim.toInt + 1).toOption }
        .flatten.maxOption.getOrElse(0)
    println(s"[crash-child] scenario=$scenario resuming at trigger $from")
    scenario match {
      case "quarantine" =>
        val slices = SoakCrash.loadSlices(spark, sfDir, nT.toInt, sz.toInt)
        SoakCrash.runQuarTriggers(spark, wh, slices, from, slices.length,
          Some(journal))
      case "embed" =>
        val slices = SoakCrash.loadVecSlices(spark, sfDir, nT.toInt, sz.toInt)
        SoakCrash.runEmbedTriggers(spark, wh, slices, from, slices.length,
          Some(journal))
      case "media" =>
        val slices = SoakMedia.loadIdSlices(spark, sfDir, nT.toInt, sz.toInt)
        SoakMedia.runTriggers(spark, wh, slices, from, slices.length,
          Some(journal))
      case "simhash" =>
        val slices = SoakCrash.loadSlices(spark, sfDir, nT.toInt, sz.toInt)
        SoakCrash.runSimHashTriggers(spark, wh, slices, from, slices.length,
          Some(journal))
      case _ =>
        val slices = SoakCrash.loadSlices(spark, sfDir, nT.toInt, sz.toInt)
        SoakCrash.runTriggers(spark, wh, slices, from, slices.length,
          Some(journal))
    }
    spark.stop()
  }
}
