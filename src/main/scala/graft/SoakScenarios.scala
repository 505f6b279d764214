package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The r12 soak matrix beyond the banded near-dup sink (VERDICT r11
  * tasks 6+8): the ANN-indexed embed ingest + indexed deletion sink,
  * the quarantine dead-letter ingest, and the grow-then-shrink
  * re-sharding soak. Same contract as [[Soak]]: every bound is IN the
  * emitted JSON and a violated bound fails the run.
  */
private[graft] object SoakScenarios {
  import SoakUtil._

  private val ExactBase = 100000000L
  private val NearBase = 200000000L
  private val NullBase = 300000000L
  private val EmptyBase = 400000000L

  // ---------------------------------------------------------------- embed

  /** ANN-indexed embedding ingest under sustained triggers:
    * [[graft.streaming.StreamingOps.corpusIngestEmbedVectorIndexSink]]
    * (IVF rung past the 1k exact floor) with the INDEXED deletion sink
    * ([[graft.streaming.StreamingOps.keyDeletionFragmentedSink]])
    * firing every 25 triggers. Injected exact copies (same vector, new
    * id) and 5%-perturbed near copies (driver-verified cosine ≥ 0.996
    * against threshold 0.995) of the previous trigger's vectors must be
    * screened; deleted ids must be invisible in the corpus AND
    * unsearchable through the index at every later checkpoint; the
    * index must never lag the corpus (the sink's crash-repair
    * invariant); per-trigger latency must stay flat.
    */
  def embed(spark: SparkSession, sfDir: String, outPath: String): Boolean = {
    val nTriggers = sys.env.getOrElse("SPARK_GRAFT_SOAK_TRIGGERS", "100").toInt
    val checkpointEvery = sys.env.getOrElse("SPARK_GRAFT_SOAK_CHECKPOINT", "10").toInt
    val deleteEvery = 25
    val threshold = 0.995
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val warehouse = Files.createTempDirectory("graft-soak-embed").toString
    val frag = new graft.runtime.FragmentedTable(spark, warehouse, "vcorpus", "vec_id")
    val idxPath = s"$warehouse/vcorpus.vecindex"
    // exactFloor = 0: the rung is SELECTED AT BOOTSTRAP from the first
    // surviving batch (~200 rows), so any floor above that pins the
    // BRUTE rung for the whole run — the first soak attempt did exactly
    // that ("index_kind": "brute") and its O(corpus) scan was part of
    // the latency ramp. Zero floor selects the indexed path this
    // scenario exists to soak: IVF under the default profile, HNSW
    // under SPARK_GRAFT_SOAK_PROFILE=serving (r18, VERDICT r17 task 2
    // — the serving rung's own decade stretch, with the flatness gates
    // running on ITS designed cost model below).
    val profileName = sys.env.getOrElse("SPARK_GRAFT_SOAK_PROFILE", "balanced")
    val profile = profileName match {
      case "serving" => graft.ext.IndexProfile(serving = true, exactFloor = 0L)
      case "balanced" => graft.ext.IndexProfile(exactFloor = 0L)
      case other => sys.error(s"unknown SPARK_GRAFT_SOAK_PROFILE '$other' (balanced | serving)")
    }
    val expectedKind =
      if (profileName == "serving") graft.ext.VectorIndex.Hnsw
      else graft.ext.VectorIndex.Ivf

    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("long"), col("embedding")).orderBy("vec_id")
      .as[(Long, Seq[Float])].collect()
    val sliceSize = math.max(1, math.ceil(all.length.toDouble / nTriggers).toInt)
    val slices = all.grouped(sliceSize).toArray
    println(s"[soak-embed] ${all.length} vecs, ${slices.length} triggers of ~$sliceSize")

    val in = MemoryStream[(Long, Seq[Float])]
    val q = graft.streaming.StreamingOps.corpusIngestEmbedVectorIndexSink(
      in.toDF().toDF("vec_id", "embedding"), frag, idxPath, profile,
      threshold = threshold, compactEvery = 8L).start()
    // the indexed deletion sink needs a live index handle; the handle is
    // path-backed, but `load` needs the bootstrap trigger's files first
    val delIn = MemoryStream[Long]
    var delQ: Option[org.apache.spark.sql.streaming.StreamingQuery] = None

    def perturb(v: Seq[Float]): Option[(Seq[Float], Double)] = {
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

    // (copyId, sourceId) — recall over the source-live subset, same rule
    // as the text soak (a copy of an already-screened source is one
    // similarity hop from the retained witness); EXACT copies use the
    // same rule here because the screen is an index probe, not a
    // byte-hash
    val exactPairs = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val nearPairs = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val deletedIds = scala.collection.mutable.LinkedHashSet[Long]()
    val deletedVecs = scala.collection.mutable.ArrayBuffer[(Long, Seq[Float])]()
    var deletedRequested = 0L

    final case class Cp(t: Int, corpusRows: Long, corpusFrags: Int,
                        diskMb: Double, ingestMsAvg: Double,
                        exactElig: Long, exactDropped: Long,
                        nearElig: Long, nearDropped: Long,
                        delRequested: Long, delVisible: Long,
                        delSearchable: Long, indexLag: Long)
    val cps = scala.collection.mutable.ArrayBuffer[Cp]()
    var windowMs = 0.0; var windowN = 0
    // per-TRIGGER latencies (not just window means): this scenario runs
    // SCHEDULED O(corpus) index retrains INSIDE ordinary triggers, so a
    // mean-of-window slope aliases "which window caught the retrain"
    // (r12 passed at 0.937 because a retrain landed EARLY; r13's faster
    // constant pushed it late and read 1.308 on byte-identical
    // maintenance behavior). Since r14 (VERDICT r13 #6 + ADVICE) the
    // retrain-bearing triggers are tagged MECHANICALLY — maintain()
    // bumps a durable counter at the index path, read back after every
    // trigger — so the flatness gates run over the retrain-EXCLUDED
    // series (median, mean, p90: a regression confined to <50% of
    // triggers can no longer hide behind the median alone) and the
    // retrain cost itself gets its own amortized bound instead of an
    // asserted one.
    val trigMs = scala.collection.mutable.ArrayBuffer[Double]()
    // maintenance tag = retrain OR cell fold (r17): the r17 decade
    // stretch showed untagged O(table) cell folds ([[graft.ext.IvfIndex]]
    // maybeFoldCells, firing every ~10 late-corpus triggers) aliasing
    // into the flatness windows exactly the way untagged retrains did
    // before r14 — both are now durably counted at the index path and
    // tagged by STAMP-PAIR comparison (a retrain swaps in a fresh rung
    // dir whose fold counter restarts, so monotone deltas would miss).
    val trigMaint = scala.collection.mutable.ArrayBuffer[Boolean]()
    val trigRetrain = scala.collection.mutable.ArrayBuffer[Boolean]() // reporting only
    // seed from the path's durable counters, not 0: a pre-existing index
    // with maintains > 0 would otherwise falsely tag trigger 0 as
    // retrain-bearing and exclude it from the flatness windows (ADVICE r14)
    var lastStamp = graft.ext.VectorIndex.maintenanceStamp(idxPath)
    // measured-corpus anchor for the designed-cost normalization
    // (ADVICE r17): dividing by a function of the TRIGGER INDEX assumes
    // the corpus starts empty and grows one slice per trigger — on a
    // resumed/pre-existing corpus (the case the lastStamp seeding above
    // anticipates) that deflates the early window while the real corpus
    // is large, weakening every flatness gate. The estimate starts from
    // the counted pre-run corpus, advances by the slice size (injected
    // dupes are expected-screened, deletions subtract) and RE-ANCHORS
    // to the counted corpus at every checkpoint, so drift stays within
    // one checkpoint window's injections.
    var estRows: Long = frag.read().map(_.count()).getOrElse(0L)
    val trigRows = scala.collection.mutable.ArrayBuffer[Long]()

    def recall(corpusIds: Set[Long],
               pairs: Seq[(Long, Long)]): (Long, Long) = {
      val eligible = pairs.filter(p => corpusIds(p._2))
      (eligible.length.toLong,
        eligible.count(p => !corpusIds(p._1)).toLong)
    }

    def checkpoint(t: Int): Unit = {
      val corpusIds = frag.read().get.select("vec_id").as[Long].collect().toSet
      val (exactElig, exactDropped) = recall(corpusIds, exactPairs.toSeq)
      val (nearElig, nearDropped) = recall(corpusIds, nearPairs.toSeq)
      val delVisible = deletedIds.count(corpusIds).toLong
      val idx = graft.ext.VectorIndex.load(spark, idxPath)
      // sync: every corpus id must be indexed (tombstoned ids count as
      // indexed — the repair-seam rule the sink itself anti-joins by)
      val indexLag = frag.read().get.select("vec_id")
        .join(idx.indexedIds.withColumnRenamed("vec_id", "vec_id"),
          Seq("vec_id"), "left_anti").count()
      // unsearchable: probing the index with a deleted id's OWN vector
      // must never surface that id (any other hit is fine)
      val recent = deletedVecs.takeRight(20)
      val delSearchable = if (recent.isEmpty) 0L else {
        val qdf = recent.toSeq.toDF("vec_id", "embedding")
        idx.search(qdf, k = 1)
          .filter(col("query_id") === col("corpus_id")).count()
      }
      cps += Cp(t, corpusIds.size.toLong, frag.fragmentCount(),
        dirMb(warehouse),
        if (windowN == 0) 0 else math.round(windowMs / windowN * 10) / 10.0,
        exactElig, exactDropped, nearElig, nearDropped,
        deletedRequested, delVisible, delSearchable, indexLag)
      windowMs = 0.0; windowN = 0
      System.gc()
      println(s"[soak-embed] ${cps.last}")
    }

    slices.zipWithIndex.foreach { case (slice, t) =>
      val injected: Seq[(Long, Seq[Float])] = if (t == 0) Nil else {
        val prev = slices(t - 1)
        val exact = prev.take(3).map { case (id, v) =>
          exactPairs += ((ExactBase + id, id)); (ExactBase + id, v)
        }
        val near = prev.slice(3, 6).flatMap { case (id, v) =>
          perturb(v) match {
            case Some((w, cos)) if cos >= 0.996 =>
              nearPairs += ((NearBase + id, id)); Some((NearBase + id, w))
            case _ => None
          }
        }
        (exact ++ near).toSeq
      }
      val t0 = System.nanoTime()
      in.addData(slice.toSeq ++ injected)
      q.processAllAvailable()
      val ms = (System.nanoTime() - t0) / 1e6
      windowMs += ms
      windowN += 1
      trigMs += ms
      estRows += slice.length
      trigRows += estRows
      val st = graft.ext.VectorIndex.maintenanceStamp(idxPath)
      trigMaint += (st != lastStamp)
      trigRetrain += (st._1 != lastStamp._1)
      lastStamp = st
      if (t > 0 && t % deleteEvery == 0) {
        if (delQ.isEmpty) {
          val idx = graft.ext.VectorIndex.load(spark, idxPath)
          delQ = Some(graft.streaming.StreamingOps.keyDeletionFragmentedSink(
            delIn.toDF().toDF("vec_id"), frag, compactEvery = 0L,
            index = Some(idx)).start())
        }
        val victims = slices(t - deleteEvery).take(50)
        delIn.addData(victims.map(_._1).toSeq)
        delQ.get.processAllAvailable()
        deletedIds ++= victims.map(_._1)
        deletedVecs ++= victims
        deletedRequested += victims.length
        estRows -= victims.length
      }
      if ((t + 1) % checkpointEvery == 0 || t == slices.length - 1) {
        checkpoint(t)
        estRows = cps.last.corpusRows
      }
    }
    q.stop(); delQ.foreach(_.stop())

    val FragBound = 20
    val ExactRecallFloor = 0.99
    val NearRecallFloor = 0.95
    val SlopeBound = 1.25
    val P90SlopeBound = 1.5
    val last = cps.last
    val exactRecall =
      if (last.exactElig == 0) 1.0 else last.exactDropped.toDouble / last.exactElig
    val nearRecall =
      if (last.nearElig == 0) 1.0 else last.nearDropped.toDouble / last.nearElig
    val (earlyMs, lateMs, slope) = slopeOf(cps.map(_.ingestMsAvg).toIndexedSeq)
    // Flatness gates (re-derived r17 after the first decade stretch):
    // the IVF rung's DESIGNED per-query probe cost is ∝ √corpus (nlist
    // = √n at every retrain, nprobe fixed → probe reads n·nprobe/nlist
    // = nprobe·√n rows), so raw per-trigger flatness over a ≥10×
    // corpus stretch is unreachable BY DESIGN for this sink — the r17
    // sf4 run measured exactly the predicted √n ramp (median slope
    // 2.115 over ~40× growth from the early window; artifacts in
    // dev/). The gates therefore run on the per-√corpus NORMALIZED
    // series — trigMs(t)/√(t+1), corpus rows being ∝ t at fixed slice
    // size — over the MAINTENANCE-excluded triggers (retrains AND cell
    // folds, both durably counted at the index path since r17). In
    // normalized space the designed probe term is flat and fixed
    // overhead DECAYS (1/√t), so the bounds catch any growth FASTER
    // than the design: a linear-cost bug reads as a √t ramp and fails.
    // Raw slopes stay in the artifact as the honest un-normalized
    // record. Windows: early = positions 10..39 (post-warmup), late =
    // last 30; minimum excluded population keeps the gates non-vacuous
    // (ADVICE r13/r14); three statistics because each catches what the
    // others can't — the median an every-trigger shift, the mean a
    // minority-of-triggers growth term, the p90 a growing tail.
    def median(xs: Seq[Double]): Double =
      if (xs.isEmpty) 0.0 else {
        val s = xs.sorted; val n = s.length
        if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
      }
    def p90(xs: Seq[Double]): Double =
      if (xs.isEmpty) 0.0
      else { val s = xs.sorted; s(math.min(s.length - 1, (s.length * 9) / 10)) }
    val nTrig = trigMs.length
    // normalize by the rung's DESIGNED cost at the corpus size each
    // trigger actually saw (measured rows, re-anchored at checkpoints —
    // ADVICE r17), one model per profile:
    //   balanced/IVF: probe reads nprobe·√n rows (nlist = √n at every
    //     retrain) → divide by √(rows/slice);
    //   serving/HNSW: fan-out ≤ one shard per size tier and beam depth
    //     O(log n) — both logarithmic by the size-tiered merge design →
    //     divide by log2(rows/slice + 1).
    // In normalized space the designed term is flat and fixed overhead
    // decays, so the bounds catch any growth FASTER than the design: a
    // linear-cost bug reads as a ramp on either model and fails.
    val sliceD = sliceSize.toDouble
    def normFactor(rows: Long): Double = profileName match {
      case "serving" =>
        math.max(1.0, math.log(math.max(1.0, rows / sliceD + 1)) / math.log(2.0))
      case _ => math.sqrt(math.max(1.0, rows / sliceD))
    }
    val normLabel = if (profileName == "serving") "log2(corpus)" else "sqrt(corpus)"
    val normMs = trigMs.zip(trigRows).map { case (ms, rows) => ms / normFactor(rows) }
    val idxed = normMs.zip(trigMaint).zipWithIndex
      .map { case ((nm, mt), i) => (i, nm, mt) }
    val earlyExcl = idxed.filter(t => t._1 >= 10 && t._1 < 40 && !t._3).map(_._2).toSeq
    val lateExcl = idxed.filter(t => t._1 >= nTrig - 30 && !t._3).map(_._2).toSeq
    def ratio(l: Double, e: Double) = if (e == 0) 1.0 else l / e
    val slopeMed = ratio(median(lateExcl), median(earlyExcl))
    val slopeMeanExcl = ratio(
      if (lateExcl.isEmpty) 0 else lateExcl.sum / lateExcl.length,
      if (earlyExcl.isEmpty) 0 else earlyExcl.sum / earlyExcl.length)
    val slopeP90 = ratio(p90(lateExcl), p90(earlyExcl))
    // raw (un-normalized) maintenance-excluded slopes — reported, not
    // gated: for a √n-cost rung these are EXPECTED to rise with corpus
    val rawIdxed = trigMs.zip(trigMaint).zipWithIndex
      .map { case ((ms, mt), i) => (i, ms, mt) }
    val rawEarly = rawIdxed.filter(t => t._1 >= 10 && t._1 < 40 && !t._3).map(_._2).toSeq
    val rawLate = rawIdxed.filter(t => t._1 >= nTrig - 30 && !t._3).map(_._2).toSeq
    val rawSlopeMed = ratio(median(rawLate), median(rawEarly))
    // maintenance cost amortized, in NORMALIZED units so the bound
    // scales with the design's own growth: excess (over the excluded
    // median) of maintenance-bearing triggers, per trigger, must stay
    // ≤ 20% of the steady-state per-√corpus cost — an O(table) fold or
    // retrain whose amortized share grows faster than √n fails here
    val medNormExcl = median(idxed.filterNot(_._3).map(_._2).toSeq)
    val maintExcessNorm = idxed.filter(_._3)
      .map(t => math.max(0.0, t._2 - medNormExcl)).sum
    val maintAmortNorm = if (nTrig == 0) 0.0 else maintExcessNorm / nTrig
    val maintAmortBound = 0.2 * medNormExcl
    val nMaint = trigMaint.count(identity)
    val nRetrains = trigRetrain.count(identity)
    val nFolds = nMaint - nRetrains
    val finalKind = graft.ext.VectorIndex.load(spark, idxPath).kind
    val checks: Seq[(String, Boolean, String)] = Seq(
      // the trigger count alone is not enough: if every trigger in a
      // window happened to be maintenance-tagged, the excluded series
      // would be empty, median/mean/p90 would read 0, and the three
      // flatness gates would pass vacuously (ADVICE r14) — so also
      // require a minimum excluded population per window
      ("flat_windows_meaningful",
        nTrig >= 80 && earlyExcl.size >= 10 && lateExcl.size >= 10,
        s"$nTrig triggers >= 80, maintenance-excluded early=${earlyExcl.size} " +
          s"late=${lateExcl.size} both >= 10"),
      ("ingest_flat_mean_excl", slopeMeanExcl <= SlopeBound,
        f"maintenance-excluded per-$normLabel mean late/early = $slopeMeanExcl%.3f " +
          f"<= $SlopeBound ($nMaint maintenance-tagged excluded: $nRetrains retrains + $nFolds folds)"),
      ("ingest_flat_p90", slopeP90 <= P90SlopeBound,
        f"maintenance-excluded per-$normLabel p90 late/early = $slopeP90%.3f <= $P90SlopeBound"),
      ("maintenance_amortized", maintAmortNorm <= maintAmortBound,
        f"$maintAmortNorm%.2f normalized units/trigger excess <= $maintAmortBound%.2f " +
          f"(20%% of per-$normLabel median $medNormExcl%.2f; $nRetrains retrains + $nFolds folds)"),
      ("corpus_frag_bound", cps.forall(_.corpusFrags <= FragBound),
        s"max ${cps.map(_.corpusFrags).max} <= $FragBound"),
      ("exact_recall", exactRecall >= ExactRecallFloor,
        f"$exactRecall%.4f >= $ExactRecallFloor"),
      ("near_recall", nearRecall >= NearRecallFloor,
        f"$nearRecall%.4f >= $NearRecallFloor"),
      ("deletions_invisible", cps.forall(_.delVisible == 0),
        s"max visible ${cps.map(_.delVisible).max}"),
      ("deletions_unsearchable", cps.forall(_.delSearchable == 0),
        s"max searchable ${cps.map(_.delSearchable).max}"),
      ("index_corpus_sync", cps.forall(_.indexLag == 0),
        s"max lag ${cps.map(_.indexLag).max}"),
      ("ingest_flat", slopeMed <= SlopeBound,
        f"maintenance-excluded per-$normLabel median late/early = $slopeMed%.3f " +
          f"<= $SlopeBound (RAW median slope $rawSlopeMed%.3f — expected ~the rung's " +
          f"designed growth; window-mean slope $slope%.3f, " +
          f"late $lateMs%.1f / early $earlyMs%.1f include maintenance triggers)"),
      // the profile must have selected — and kept — the rung this run
      // claims to soak: a serving artifact with an IVF kind (or a
      // balanced one that silently fell to brute) proves nothing about
      // the rung under test
      ("rung_matches_profile", finalKind == expectedKind,
        s"index kind '$finalKind' == '$expectedKind' for profile '$profileName'"))
    val pass = checks.forall(_._2)

    def j(cp: Cp): String =
      s"""{"t":${cp.t},"corpus_rows":${cp.corpusRows},"corpus_frags":${cp.corpusFrags},""" +
      s""""disk_mb":${cp.diskMb},"ingest_ms_avg":${cp.ingestMsAvg},""" +
      s""""exact_eligible":${cp.exactElig},"exact_dropped":${cp.exactDropped},""" +
      s""""near_eligible":${cp.nearElig},"near_dropped":${cp.nearDropped},""" +
      s""""deleted_requested":${cp.delRequested},"deleted_visible":${cp.delVisible},""" +
      s""""deleted_searchable":${cp.delSearchable},"index_lag":${cp.indexLag}}"""
    val json =
      s"""{"soak":"embed_indexed_ingest_sf1","sf_dir":"$sfDir","aqe":${spark.conf.get("spark.sql.adaptive.enabled")},"triggers":${slices.length},""" +
      s""""profile":"$profileName","normalizer":"$normLabel",""" +
      s""""slice_size":$sliceSize,"threshold":$threshold,"index_kind":"$finalKind",""" +
      s""""delete_every":$deleteEvery,"retrain_triggers":$nRetrains,""" +
      s""""fold_triggers":$nFolds,""" +
      f""""maint_amort_norm":$maintAmortNorm%.2f,"raw_slope_med":$rawSlopeMed%.3f,""" +
      f""""pass":$pass,"checks":{${checksJson(checks)}},""" +
      s""""checkpoints":[${cps.map(j).mkString(",")}]}"""
    writeJson(outPath, json)
    graft.runtime.Fs.deleteRecursive(Paths.get(warehouse))
    reportFailures(checks)
    pass
  }

  // ----------------------------------------------------------- quarantine

  /** Dead-letter ingest soak
    * ([[graft.streaming.StreamingOps.corpusIngestQuarantineFragmentedSink]]):
    * every trigger injects rows violating each validity check (null
    * text, empty text) plus exact duplicates. Bounds: every injected
    * invalid row is in the rejects table with exactly the FIRST failing
    * check's name, no invalid row ever reaches the corpus, exact dedup
    * holds, both tables hold fragment bounds, latency flat.
    */
  def quarantine(spark: SparkSession, sfDir: String, outPath: String): Boolean = {
    val nTriggers = sys.env.getOrElse("SPARK_GRAFT_SOAK_TRIGGERS", "100").toInt
    val checkpointEvery = sys.env.getOrElse("SPARK_GRAFT_SOAK_CHECKPOINT", "10").toInt
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val warehouse = Files.createTempDirectory("graft-soak-quar").toString
    val frag = new graft.runtime.FragmentedTable(spark, warehouse, "qcorpus", "doc_id")
    val rej = new graft.runtime.FragmentedTable(spark, warehouse,
      "qcorpus__rejects", "doc_id")
    // the routed sink's fingerprint index — what makes the per-trigger
    // dedup cost ∝ batch (the un-routed sink's Bloom build re-scanned
    // the corpus per trigger: measured 2.9 → 4.0 s over the first 60
    // triggers of this very soak)
    val fpStore = graft.runtime.BucketedFragmentStore(spark, warehouse,
      "qcorpus__fps", "fp", buckets = 4)

    val all = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text")).orderBy("doc_id")
      .as[(Long, String)].collect()
    val sliceSize = math.max(1, math.ceil(all.length.toDouble / nTriggers).toInt)
    val slices = all.grouped(sliceSize).toArray
    println(s"[soak-quar] ${all.length} docs, ${slices.length} triggers of ~$sliceSize")

    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.corpusIngestQuarantineRoutedSink(
      in.toDF().toDF("doc_id", "text"), frag, rej, Seq(
        "text_not_null" -> col("text").isNotNull,
        "text_nonempty" -> (length(col("text")) > 0)),
      fpStore, compactEvery = 8L).start()

    var exactInjected = 0L; var nullInjected = 0L; var emptyInjected = 0L

    final case class Cp(t: Int, corpusRows: Long, corpusFrags: Int,
                        rejectRows: Long, rejectFrags: Int,
                        fpBucketMax: Int, diskMb: Double,
                        ingestMsAvg: Double,
                        exactInj: Long, exactDropped: Long,
                        rejNull: Long, rejEmpty: Long,
                        reasonMismatch: Long, corpusInvalid: Long)
    val cps = scala.collection.mutable.ArrayBuffer[Cp]()
    var windowMs = 0.0; var windowN = 0

    def checkpoint(t: Int): Unit = {
      val corpus = frag.read().get.cache()
      val corpusRows = corpus.count()
      val exactDropped = exactInjected -
        corpus.filter(col("doc_id") >= ExactBase && col("doc_id") < NearBase).count()
      val corpusInvalid = corpus.filter(col("doc_id") >= NullBase).count()
      corpus.unpersist()
      val (rejRows, rejNull, rejEmpty, mismatch) = rej.read() match {
        case None => (0L, 0L, 0L, 0L)
        case Some(r0) =>
          val r = r0.cache()
          val out = (r.count(),
            r.filter(col("doc_id") >= NullBase && col("doc_id") < EmptyBase &&
              col("reject_reason") === "text_not_null").count(),
            r.filter(col("doc_id") >= EmptyBase &&
              col("reject_reason") === "text_nonempty").count(),
            r.filter(col("doc_id") >= NullBase &&
              ((col("doc_id") < EmptyBase && col("reject_reason") =!= "text_not_null") ||
               (col("doc_id") >= EmptyBase && col("reject_reason") =!= "text_nonempty")))
              .count())
          r.unpersist(); out
      }
      cps += Cp(t, corpusRows, frag.fragmentCount(), rejRows,
        rej.fragmentCount(),
        fpStore.fragmentCounts().maxOption.getOrElse(0), dirMb(warehouse),
        if (windowN == 0) 0 else math.round(windowMs / windowN * 10) / 10.0,
        exactInjected, exactDropped, rejNull, rejEmpty, mismatch, corpusInvalid)
      windowMs = 0.0; windowN = 0
      System.gc()
      println(s"[soak-quar] ${cps.last}")
    }

    slices.zipWithIndex.foreach { case (slice, t) =>
      val injected: Seq[(Long, String)] = if (t == 0) Nil else {
        val prev = slices(t - 1)
        val exact = prev.take(3).map { case (id, tx) => (ExactBase + id, tx) }
        val nulls = prev.slice(3, 5).map { case (id, _) =>
          (NullBase + id, null.asInstanceOf[String]) }
        val empties = prev.slice(5, 7).map { case (id, _) => (EmptyBase + id, "") }
        exactInjected += exact.length
        nullInjected += nulls.length
        emptyInjected += empties.length
        (exact ++ nulls ++ empties).toSeq
      }
      val t0 = System.nanoTime()
      in.addData(slice.toSeq ++ injected)
      q.processAllAvailable()
      windowMs += (System.nanoTime() - t0) / 1e6
      windowN += 1
      if ((t + 1) % checkpointEvery == 0 || t == slices.length - 1) checkpoint(t)
    }
    q.stop()

    val FragBound = 20
    val SlopeBound = 1.25
    val last = cps.last
    val exactRecall =
      if (last.exactInj == 0) 1.0 else last.exactDropped.toDouble / last.exactInj
    val (earlyMs, lateMs, slope) = slopeOf(cps.map(_.ingestMsAvg).toIndexedSeq)
    val checks: Seq[(String, Boolean, String)] = Seq(
      ("corpus_frag_bound", cps.forall(_.corpusFrags <= FragBound),
        s"max ${cps.map(_.corpusFrags).max} <= $FragBound"),
      ("rejects_frag_bound", cps.forall(_.rejectFrags <= FragBound),
        s"max ${cps.map(_.rejectFrags).max} <= $FragBound"),
      ("fp_frag_bound", cps.forall(_.fpBucketMax <= 24),
        s"max per-bucket across checkpoints ${cps.map(_.fpBucketMax).max} <= 24"),
      ("rejects_complete",
        last.rejNull == nullInjected && last.rejEmpty == emptyInjected,
        s"null ${last.rejNull}/$nullInjected, empty ${last.rejEmpty}/$emptyInjected"),
      ("reasons_exact", cps.forall(_.reasonMismatch == 0),
        s"max mismatches ${cps.map(_.reasonMismatch).max}"),
      ("corpus_clean", cps.forall(_.corpusInvalid == 0),
        s"max invalid in corpus ${cps.map(_.corpusInvalid).max}"),
      ("exact_recall", exactRecall >= 0.99, f"$exactRecall%.4f >= 0.99"),
      ("ingest_flat", slope <= SlopeBound,
        f"late $lateMs%.1f ms / early $earlyMs%.1f ms = $slope%.3f <= $SlopeBound"))
    val pass = checks.forall(_._2)

    def j(cp: Cp): String =
      s"""{"t":${cp.t},"corpus_rows":${cp.corpusRows},"corpus_frags":${cp.corpusFrags},""" +
      s""""reject_rows":${cp.rejectRows},"reject_frags":${cp.rejectFrags},""" +
      s""""fp_bucket_max":${cp.fpBucketMax},""" +
      s""""disk_mb":${cp.diskMb},"ingest_ms_avg":${cp.ingestMsAvg},""" +
      s""""exact_injected":${cp.exactInj},"exact_dropped":${cp.exactDropped},""" +
      s""""rejects_null":${cp.rejNull},"rejects_empty":${cp.rejEmpty},""" +
      s""""reason_mismatch":${cp.reasonMismatch},"corpus_invalid":${cp.corpusInvalid}}"""
    val json =
      s"""{"soak":"quarantine_ingest_sf1","sf_dir":"$sfDir","aqe":${spark.conf.get("spark.sql.adaptive.enabled")},"triggers":${slices.length},""" +
      s""""slice_size":$sliceSize,"pass":$pass,"checks":{${checksJson(checks)}},""" +
      s""""checkpoints":[${cps.map(j).mkString(",")}]}"""
    writeJson(outPath, json)
    graft.runtime.Fs.deleteRecursive(Paths.get(warehouse))
    reportFailures(checks)
    pass
  }

  // ---------------------------------------------------------------- media

  /** The end-to-end MEDIA ingest sink under sustained triggers
    * (VERDICT r14 task 1's "done" bar):
    * [[graft.streaming.StreamingOps.corpusIngestMediaSink]] fed
    * deterministic per-trigger PNG corpora with injected BMP re-encodes
    * (hamming-0 near-dups the routed band probe must drop), the three
    * quarantine classes (junk magic / NULL payload / truncated WAV —
    * each must land in `__rejects` with its exact first-failing
    * reason), and a [[graft.streaming.StreamingOps.sigBandForget]] cycle
    * every 25 triggers. Enforced: reject exactness, near-dup recall
    * over source-live pairs, deletions invisible in corpus AND band
    * store, fragment bounds, FLAT per-trigger latency (media decode is
    * per-batch work; the probe is corpus-independent).
    */
  def media(spark: SparkSession, sfDir: String, outPath: String): Boolean = {
    val nTriggers = sys.env.getOrElse("SPARK_GRAFT_SOAK_TRIGGERS", "100").toInt
    val checkpointEvery = sys.env.getOrElse("SPARK_GRAFT_SOAK_CHECKPOINT", "10").toInt
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val warehouse = Files.createTempDirectory("graft-soak-media").toString
    val st = SoakMedia.openStores(spark, warehouse)

    val allIds = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long")).orderBy("doc_id").as[Long].collect()
    val sliceSize = math.max(1, math.ceil(allIds.length.toDouble / nTriggers).toInt)
    val slices = allIds.grouped(sliceSize).toArray
    println(s"[soak-media] ${allIds.length} docs, ${slices.length} triggers of ~$sliceSize")

    val in = MemoryStream[(Long, Array[Byte])]
    val q = graft.streaming.StreamingOps.corpusIngestMediaSink(
      in.toDF().toDF("doc_id", "media"), st.frag, st.rej, st.bands,
      maxDist = 6, compactEvery = 8L).start()

    val nearPairs = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val deletedIds = scala.collection.mutable.LinkedHashSet[Long]()
    var junkInjected = 0L; var nullInjected = 0L; var cutInjected = 0L

    final case class Cp(t: Int, corpusRows: Long, corpusFrags: Int,
                        rejectRows: Long, rejectFrags: Int,
                        bandBucketMax: Int, diskMb: Double,
                        ingestMsAvg: Double,
                        nearElig: Long, nearDropped: Long,
                        rejJunk: Long, rejNull: Long, rejCut: Long,
                        reasonMismatch: Long, corpusInvalid: Long,
                        delVisible: Long)
    val cps = scala.collection.mutable.ArrayBuffer[Cp]()
    var windowMs = 0.0; var windowN = 0

    def checkpoint(t: Int): Unit = {
      val corpus = st.frag.read().get.cache()
      val corpusRows = corpus.count()
      val corpusIds = corpus.select("doc_id").as[Long].collect().toSet
      val corpusInvalid = corpus.filter(col("doc_id") >= SoakMedia.JunkBase).count()
      corpus.unpersist()
      val eligible = nearPairs.filter(p => corpusIds(p._2))
      val nearDropped = eligible.count(p => !corpusIds(p._1)).toLong
      val bandDocIds =
        st.bands.read().map(_.select("doc_id").as[Long].collect().toSet)
          .getOrElse(Set.empty)
      val delVisible = deletedIds.count(corpusIds).toLong +
        deletedIds.count(bandDocIds).toLong
      val (rejRows, rejJunk, rejNull, rejCut, mismatch) = st.rej.read() match {
        case None => (0L, 0L, 0L, 0L, 0L)
        case Some(r0) =>
          val r = r0.cache()
          val out = (r.count(),
            r.filter(col("doc_id") >= SoakMedia.JunkBase &&
              col("doc_id") < SoakMedia.NullBase &&
              col("reject_reason") === "known_container").count(),
            r.filter(col("doc_id") >= SoakMedia.NullBase &&
              col("doc_id") < SoakMedia.CutBase &&
              col("reject_reason") === "media_present").count(),
            r.filter(col("doc_id") >= SoakMedia.CutBase &&
              col("reject_reason") === "media_decodes").count(),
            r.filter(col("doc_id") >= SoakMedia.JunkBase &&
              ((col("doc_id") < SoakMedia.NullBase &&
                 col("reject_reason") =!= "known_container") ||
               (col("doc_id") >= SoakMedia.NullBase &&
                 col("doc_id") < SoakMedia.CutBase &&
                 col("reject_reason") =!= "media_present") ||
               (col("doc_id") >= SoakMedia.CutBase &&
                 col("reject_reason") =!= "media_decodes")))
              .count())
          r.unpersist(); out
      }
      cps += Cp(t, corpusRows, st.frag.fragmentCount(), rejRows,
        st.rej.fragmentCount(),
        st.bands.fragmentCounts().maxOption.getOrElse(0), dirMb(warehouse),
        if (windowN == 0) 0 else math.round(windowMs / windowN * 10) / 10.0,
        eligible.length.toLong, nearDropped,
        rejJunk, rejNull, rejCut, mismatch, corpusInvalid, delVisible)
      windowMs = 0.0; windowN = 0
      System.gc()
      println(s"[soak-media] ${cps.last}")
    }

    slices.zipWithIndex.foreach { case (slice, t) =>
      // media generation happens OUTSIDE the timed window (fixture
      // manufacture, not sink work); injection bookkeeping mirrors it
      val base = SoakMedia.pics(spark, slice.toSeq, "png")
      val injected = SoakMedia.injectionsFor(spark, t, slices)
      if (t > 0) {
        nearPairs ++= SoakMedia.nearPairsFor(t, slices)
        // expected reject counts derive from what injectionsFor actually
        // slices out of prev (ADVICE r15): with SPARK_GRAFT_SOAK_TRIGGERS
        // small enough that a slice holds < 8 ids, the defensive
        // prev.slice(...) bounds inject FEWER rows than the old fixed
        // 2/1/2 constants counted, and rejects_complete false-failed
        val prev = slices(t - 1)
        junkInjected += prev.slice(3, 5).length
        nullInjected += prev.slice(5, 6).length
        cutInjected += prev.slice(6, 8).length
      }
      val t0 = System.nanoTime()
      in.addData(base ++ injected)
      q.processAllAvailable()
      windowMs += (System.nanoTime() - t0) / 1e6
      windowN += 1
      val victims = SoakMedia.victimsFor(t, slices)
      if (victims.nonEmpty) {
        graft.streaming.StreamingOps.sigBandForget(st.frag, st.bands,
          victims.toDF("doc_id"))
        deletedIds ++= victims
      }
      if ((t + 1) % checkpointEvery == 0 || t == slices.length - 1) checkpoint(t)
    }
    q.stop()

    val FragBound = 20
    val SideFragBound = 24
    val SlopeBound = 1.25
    val last = cps.last
    val nearRecall =
      if (last.nearElig == 0) 1.0 else last.nearDropped.toDouble / last.nearElig
    val (earlyMs, lateMs, slope) = slopeOf(cps.map(_.ingestMsAvg).toIndexedSeq)
    val checks: Seq[(String, Boolean, String)] = Seq(
      ("corpus_frag_bound", cps.forall(_.corpusFrags <= FragBound),
        s"max ${cps.map(_.corpusFrags).max} <= $FragBound"),
      ("rejects_frag_bound", cps.forall(_.rejectFrags <= FragBound),
        s"max ${cps.map(_.rejectFrags).max} <= $FragBound"),
      ("band_frag_bound", cps.map(_.bandBucketMax).max <= SideFragBound,
        s"max per-bucket ${cps.map(_.bandBucketMax).max} <= $SideFragBound"),
      ("rejects_complete",
        last.rejJunk == junkInjected && last.rejNull == nullInjected &&
          last.rejCut == cutInjected,
        s"junk ${last.rejJunk}/$junkInjected, null ${last.rejNull}/$nullInjected, " +
          s"cut ${last.rejCut}/$cutInjected"),
      ("reasons_exact", cps.forall(_.reasonMismatch == 0),
        s"max mismatches ${cps.map(_.reasonMismatch).max}"),
      ("corpus_clean", cps.forall(_.corpusInvalid == 0),
        s"max invalid in corpus ${cps.map(_.corpusInvalid).max}"),
      ("near_recall", nearRecall >= 0.99,
        f"$nearRecall%.4f >= 0.99 (${last.nearElig} source-live pairs)"),
      ("deletions_invisible", cps.forall(_.delVisible == 0),
        s"max visible (corpus+bands) ${cps.map(_.delVisible).max}"),
      ("ingest_flat", slope <= SlopeBound,
        f"late $lateMs%.1f ms / early $earlyMs%.1f ms = $slope%.3f <= $SlopeBound"))
    val pass = checks.forall(_._2)

    def j(cp: Cp): String =
      s"""{"t":${cp.t},"corpus_rows":${cp.corpusRows},"corpus_frags":${cp.corpusFrags},""" +
      s""""reject_rows":${cp.rejectRows},"reject_frags":${cp.rejectFrags},""" +
      s""""band_bucket_max":${cp.bandBucketMax},"disk_mb":${cp.diskMb},""" +
      s""""ingest_ms_avg":${cp.ingestMsAvg},""" +
      s""""near_elig":${cp.nearElig},"near_dropped":${cp.nearDropped},""" +
      s""""rej_junk":${cp.rejJunk},"rej_null":${cp.rejNull},"rej_cut":${cp.rejCut},""" +
      s""""reason_mismatch":${cp.reasonMismatch},"corpus_invalid":${cp.corpusInvalid},""" +
      s""""del_visible":${cp.delVisible}}"""
    val json =
      s"""{"soak":"media_ingest_sf1","sf_dir":"$sfDir","aqe":${spark.conf.get("spark.sql.adaptive.enabled")},"triggers":${slices.length},""" +
      s""""slice_size":$sliceSize,"delete_every":${SoakMedia.DeleteEvery},""" +
      s""""pass":$pass,"checks":{${checksJson(checks)}},""" +
      s""""checkpoints":[${cps.map(j).mkString(",")}]}"""
    writeJson(outPath, json)
    graft.runtime.Fs.deleteRecursive(Paths.get(warehouse))
    reportFailures(checks)
    pass
  }

  // -------------------------------------------------------------- simhash

  /** Flatness + correctness soak for the SimHash TEXT banded sink
    * (VERDICT r15 task 4 — the media discipline applied to the cheap
    * text rung). Trigger stream over the sfDir documents; each trigger
    * injects whitespace TWINS of previous-slice docs (re-serializations
    * whose distinct-token SimHash is hamming-0 identical to their
    * source, so the drop claim is construction-exact); every
    * DeleteEvery triggers forgets 100 docs via
    * [[graft.streaming.StreamingOps.sigBandForget]]. Bounds enforced:
    * fragment caps, twin drops exact (no twin coexists with its live
    * source), deletions invisible in corpus AND band store, and
    * per-trigger ingest slope ≤ 1.25 — the banded point probe's
    * corpus-independence claim on the 8-bytes-per-doc rung.
    */
  def simhash(spark: SparkSession, sfDir: String, outPath: String): Boolean = {
    val nTriggers = sys.env.getOrElse("SPARK_GRAFT_SOAK_TRIGGERS", "100").toInt
    val checkpointEvery = sys.env.getOrElse("SPARK_GRAFT_SOAK_CHECKPOINT", "10").toInt
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val warehouse = Files.createTempDirectory("graft-soak-simhash").toString
    val st = SoakCrash.openSimHashStores(spark, warehouse)
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text")).orderBy("doc_id")
      .as[(Long, String)].collect()
    val sliceSize = math.max(1, math.ceil(all.length.toDouble / nTriggers).toInt)
    val slices = all.grouped(sliceSize).toArray
    println(s"[soak-simhash] ${all.length} docs, ${slices.length} triggers of ~$sliceSize")

    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.corpusIngestSimHashBandedSink(
      in.toDF().toDF("doc_id", "text"), st.frag, st.bands,
      maxDist = 3, compactEvery = 8L).start()

    val twinPairs = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val deletedIds = scala.collection.mutable.LinkedHashSet[Long]()

    final case class Cp(t: Int, corpusRows: Long, corpusFrags: Int,
                        bandBucketMax: Int, diskMb: Double, ingestMsAvg: Double,
                        twinElig: Long, twinDropped: Long, coexistTwins: Long,
                        delVisible: Long)
    val cps = scala.collection.mutable.ArrayBuffer[Cp]()
    var windowMs = 0.0; var windowN = 0

    def checkpoint(t: Int): Unit = {
      val corpusIds = st.frag.read()
        .map(_.select("doc_id").as[Long].collect().toSet).getOrElse(Set.empty)
      val eligible = twinPairs.filter(p => corpusIds(p._2))
      val dropped = eligible.count(p => !corpusIds(p._1)).toLong
      // the violation is a hamming-0 pair COEXISTING — a twin alone is
      // legitimate (its witness was itself dropped or later forgotten)
      val coexist = corpusIds.count(id =>
        id >= SoakCrash.WsBase && corpusIds(id - SoakCrash.WsBase)).toLong
      val bandDocIds = st.bands.read()
        .map(_.select("doc_id").as[Long].collect().toSet).getOrElse(Set.empty)
      val delVisible = deletedIds.count(corpusIds).toLong +
        deletedIds.count(bandDocIds).toLong
      cps += Cp(t, corpusIds.size.toLong, st.frag.fragmentCount(),
        st.bands.fragmentCounts().maxOption.getOrElse(0), dirMb(warehouse),
        if (windowN == 0) 0 else math.round(windowMs / windowN * 10) / 10.0,
        eligible.length.toLong, dropped, coexist, delVisible)
      windowMs = 0.0; windowN = 0
      System.gc()
      println(s"[soak-simhash] ${cps.last}")
    }

    slices.zipWithIndex.foreach { case (slice, t) =>
      val injected = SoakCrash.simhashInjectionsFor(t, slices)
      if (t > 0) twinPairs ++= slices(t - 1).take(3).filter(_._2 != null)
        .map { case (id, _) => (SoakCrash.WsBase + id, id) }
      val t0 = System.nanoTime()
      in.addData(slice.toSeq ++ injected)
      q.processAllAvailable()
      windowMs += (System.nanoTime() - t0) / 1e6
      windowN += 1
      val victims = SoakCrash.victimsFor(t, slices)
      if (victims.nonEmpty) {
        graft.streaming.StreamingOps.sigBandForget(st.frag, st.bands,
          victims.toDF("doc_id"))
        deletedIds ++= victims
      }
      if ((t + 1) % checkpointEvery == 0 || t == slices.length - 1) checkpoint(t)
    }
    q.stop()

    val FragBound = 20
    val SideFragBound = 24
    val SlopeBound = 1.25
    val last = cps.last
    val twinRecall =
      if (last.twinElig == 0) 1.0 else last.twinDropped.toDouble / last.twinElig
    val (earlyMs, lateMs, slope) = slopeOf(cps.map(_.ingestMsAvg).toIndexedSeq)
    val checks: Seq[(String, Boolean, String)] = Seq(
      ("corpus_frag_bound", cps.forall(_.corpusFrags <= FragBound),
        s"max ${cps.map(_.corpusFrags).max} <= $FragBound"),
      ("band_frag_bound", cps.map(_.bandBucketMax).max <= SideFragBound,
        s"max per-bucket ${cps.map(_.bandBucketMax).max} <= $SideFragBound"),
      ("ws_twin_recall", twinRecall >= 0.999,
        f"$twinRecall%.4f >= 0.999 (${last.twinElig} source-live twins)"),
      ("no_coexisting_twin", cps.forall(_.coexistTwins == 0),
        s"max coexisting twin+source pairs ${cps.map(_.coexistTwins).max}"),
      ("deletions_invisible", cps.forall(_.delVisible == 0),
        s"max visible (corpus+bands) ${cps.map(_.delVisible).max}"),
      ("ingest_flat", slope <= SlopeBound,
        f"late $lateMs%.1f ms / early $earlyMs%.1f ms = $slope%.3f <= $SlopeBound"))
    val pass = checks.forall(_._2)

    def j(cp: Cp): String =
      s"""{"t":${cp.t},"corpus_rows":${cp.corpusRows},"corpus_frags":${cp.corpusFrags},""" +
      s""""band_bucket_max":${cp.bandBucketMax},"disk_mb":${cp.diskMb},""" +
      s""""ingest_ms_avg":${cp.ingestMsAvg},""" +
      s""""twin_elig":${cp.twinElig},"twin_dropped":${cp.twinDropped},""" +
      s""""coexist_twins":${cp.coexistTwins},"del_visible":${cp.delVisible}}"""
    val json =
      s"""{"soak":"simhash_ingest_sf1","sf_dir":"$sfDir","aqe":${spark.conf.get("spark.sql.adaptive.enabled")},"triggers":${slices.length},""" +
      s""""slice_size":$sliceSize,"delete_every":${SoakCrash.DeleteEvery},""" +
      s""""pass":$pass,"checks":{${checksJson(checks)}},""" +
      s""""checkpoints":[${cps.map(j).mkString(",")}]}"""
    writeJson(outPath, json)
    graft.runtime.Fs.deleteRecursive(Paths.get(warehouse))
    reportFailures(checks)
    pass
  }

  // --------------------------------------------------------------- shrink

  /** Grow-then-shrink re-sharding soak (VERDICT r11 task 8): the banded
    * near-dup sink ingests 8k docs under TIGHT per-bucket byte caps so
    * [[graft.runtime.BucketedFragmentStore.maybeRebucket]]'s DOUBLING
    * trigger fires live (phase 1), then forgets ~90% of the corpus
    * while small ingests continue so the HALVING trigger reclaims
    * bucket count live (phase 2). The sink's own cadence plus a
    * per-trigger background maintenance tick (the documented
    * "call it where maybeCompact is called" deployment pattern) drive
    * one drain step at a time, so every probe, recall injection, and
    * deletion check runs MID-MIGRATION. Bounds: both side stores must
    * grow to >= 2x their initial bucket count and end at <= half their
    * peak; recall and deletion honor hold throughout.
    */
  def shrink(spark: SparkSession, sfDir: String, outPath: String): Boolean = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val warehouse = Files.createTempDirectory("graft-soak-shrink").toString
    val frag = new graft.runtime.FragmentedTable(spark, warehouse, "corpus", "doc_id")
    val sigs = graft.runtime.BucketedFragmentStore(spark, warehouse,
      "corpus__sigs", "doc_id", buckets = 2)
    val bandStore = graft.runtime.BucketedFragmentStore(spark, warehouse,
      "corpus__sigbands", "__bk", buckets = 4, routeCol = Some("band_key"))

    // Per-store byte caps sized against PADDED documents (below):
    // un-padded, the sf1 fixture dedups 50k docs to ~3.8k uniques and
    // the side stores stay so small that parquet per-fragment METADATA
    // (~4 KB/fragment) dominates liveBytes — a byte-triggered halving
    // could then never fire (per-bucket bytes floor at the overhead,
    // above any legal min <= max/4). 150 unique pad tokens per doc make
    // every doc unique (~2 KB of toks each), so phase 1's 8k docs put
    // several MB in each store and the data, not the metadata, drives
    // both triggers.
    // measured on this fixture (first r12 shrink run): padded sigs
    // ~0.94 KB/doc, band rows ~0.15 KB/doc — per-store caps so BOTH
    // stores peak >= 8 buckets on phase 1's ~7.5 MB / ~1.2 MB and
    // reclaim after the forget. (A nearly-empty store halves toward 1
    // bucket at startup under any min floor — legitimate, and why the
    // gates judge PEAK and FINAL, not the t=0 count.)
    val SigMax = 512L << 10; val SigMin = 128L << 10
    val BandMax = 128L << 10; val BandMin = 32L << 10

    def padDoc(id: Long, tx: String): String =
      tx + (0 until 150).map(k => s" zpad${id}_$k").mkString
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text")).orderBy("doc_id")
      .as[(Long, String)].collect()
      .map { case (id, tx) => (id, padDoc(id, tx)) }
    require(all.length >= 9000, s"shrink soak needs >= 9000 docs, got ${all.length}")
    val phase1 = all.take(8000).grouped(100).toArray   // 80 triggers
    val phase2 = all.slice(8000, 9000).grouped(25).toArray // 40 triggers
    val forgetQueue = scala.collection.mutable.Queue[Long](all.take(7200).map(_._1): _*)
    println(s"[soak-shrink] phase1 ${phase1.length} triggers of 100, " +
      s"phase2 ${phase2.length} of 25 (+180 forgets each)")

    val in = MemoryStream[(Long, String)]
    // the sink's cadence knob covers both stores; per-store caps ride
    // the background tick below
    val q = graft.streaming.StreamingOps.corpusIngestNearDupBandedSink(
      in.toDF().toDF("doc_id", "text"), frag, sigs, bandStore,
      threshold = 0.9, compactEvery = 2L).start()

    var exactInjected = 0L
    val exactIds = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val nearPairs = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val deletedIds = scala.collection.mutable.LinkedHashSet[Long]()
    var deletedRequested = 0L

    final case class Cp(t: Int, corpusRows: Long, corpusFrags: Int,
                        sigBuckets: Int, bandBuckets: Int,
                        sigMigrating: Boolean, bandMigrating: Boolean,
                        sigKb: Long, bandKb: Long, diskMb: Double,
                        ingestMsAvg: Double,
                        exactElig: Long, exactDropped: Long,
                        nearElig: Long, nearDropped: Long,
                        delRequested: Long, delVisible: Long)
    val cps = scala.collection.mutable.ArrayBuffer[Cp]()
    var windowMs = 0.0; var windowN = 0

    def checkpoint(t: Int): Unit = {
      val corpus = frag.read().get.cache()
      val corpusIds = corpus.select("doc_id").as[Long].collect().toSet
      corpus.unpersist()
      def recallOf(pairs: Seq[(Long, Long)]): (Long, Long) = {
        val eligible = pairs.filter(p => corpusIds(p._2) && !deletedIds(p._2))
        (eligible.length.toLong, eligible.count(p => !corpusIds(p._1)).toLong)
      }
      val (exactElig, exactDropped) = recallOf(exactIds.toSeq)
      val (nearElig, nearDropped) = recallOf(nearPairs.toSeq)
      val delVisible = deletedIds.count(corpusIds).toLong
      cps += Cp(t, corpusIds.size.toLong, frag.fragmentCount(),
        sigs.buckets, bandStore.buckets,
        sigs.migrationOpen, bandStore.migrationOpen,
        sigs.liveBytesTotal() >> 10, bandStore.liveBytesTotal() >> 10,
        dirMb(warehouse),
        if (windowN == 0) 0 else math.round(windowMs / windowN * 10) / 10.0,
        exactElig, exactDropped, nearElig, nearDropped,
        deletedRequested, delVisible)
      windowMs = 0.0; windowN = 0
      System.gc()
      println(s"[soak-shrink] ${cps.last}")
    }

    def runTrigger(t: Int, slice: Array[(Long, String)],
                   prev: Option[Array[(Long, String)]]): Unit = {
      val injected: Seq[(Long, String)] = prev.fold(Seq.empty[(Long, String)]) { p =>
        val exact = p.take(5).map { case (id, tx) =>
          exactIds += ((ExactBase + id, id)); (ExactBase + id, tx) }
        val near = p.slice(5, 10).flatMap { case (id, tx) =>
          val n = tx.trim.split("\\s+").distinct.length
          if (n >= 9) { nearPairs += ((NearBase + id, id)); Some((NearBase + id, tx + s" xqzsoak$id")) }
          else None
        }
        exactInjected += exact.length
        (exact ++ near).toSeq
      }
      val t0 = System.nanoTime()
      in.addData(slice.toSeq ++ injected)
      q.processAllAvailable()
      windowMs += (System.nanoTime() - t0) / 1e6
      windowN += 1
      // background maintenance tick — one drain step per store per
      // trigger, so migrations progress while ingest continues
      sigs.maybeRebucket(SigMax, SigMin)
      bandStore.maybeRebucket(BandMax, BandMin)
      ()
    }

    phase1.zipWithIndex.foreach { case (slice, t) =>
      runTrigger(t, slice, if (t == 0) None else Some(phase1(t - 1)))
      if ((t + 1) % 10 == 0) checkpoint(t)
    }
    phase2.zipWithIndex.foreach { case (slice, i) =>
      val t = phase1.length + i
      runTrigger(t, slice,
        Some(if (i == 0) phase1.last else phase2(i - 1)))
      // the delete-heavy phase: forget 180 older docs per trigger
      val victims = (0 until 180).flatMap(_ =>
        if (forgetQueue.nonEmpty) Some(forgetQueue.dequeue()) else None)
      if (victims.nonEmpty) {
        graft.streaming.StreamingOps.nearDupForget(frag, sigs, bandStore,
          victims.toDF("doc_id"))
        deletedIds ++= victims
        deletedRequested += victims.length
      }
      // scheduled FULL compaction during the delete-heavy phase: the
      // cadence's tiered-first folds keep manifests at <= 2 fragments
      // without ever full-folding, so tombstone-shadowed bytes persist
      // and liveBytes never reflects the deletions (the first r12 run
      // measured sig_kb stuck at ~3.1 MB after a 90% forget — the
      // halving trigger CORRECTLY never fired). Every LSM pairs
      // delete-heavy workloads with scheduled major compaction; this is
      // that, inside the streaming context.
      if ((i + 1) % 10 == 0) { sigs.compact(); bandStore.compact() }
      if ((t + 1) % 5 == 0 || i == phase2.length - 1) checkpoint(t)
    }
    q.stop()
    // major-compact once more, then drain any still-open migration to
    // completion and let the byte triggers finish reclaiming (each call
    // does one bounded step)
    sigs.compact(); bandStore.compact()
    var guard = 0
    while ((sigs.maybeRebucket(SigMax, SigMin) |
            bandStore.maybeRebucket(BandMax, BandMin)) && guard < 200) guard += 1
    checkpoint(phase1.length + phase2.length)

    val last = cps.last
    val sigPeak = cps.map(_.sigBuckets).max
    val bandPeak = cps.map(_.bandBuckets).max
    val exactRecall =
      if (last.exactElig == 0) 1.0 else last.exactDropped.toDouble / last.exactElig
    val nearRecall =
      if (last.nearElig == 0) 1.0 else last.nearDropped.toDouble / last.nearElig
    val checks: Seq[(String, Boolean, String)] = Seq(
      ("sig_grew", sigPeak >= 8, s"peak $sigPeak >= 4x initial 2"),
      ("band_grew", bandPeak >= 8, s"peak $bandPeak >= 2x initial 4"),
      ("sig_shrank", last.sigBuckets <= sigPeak / 2,
        s"final ${last.sigBuckets} <= peak $sigPeak / 2"),
      ("band_shrank", last.bandBuckets <= bandPeak / 2,
        s"final ${last.bandBuckets} <= peak $bandPeak / 2"),
      ("corpus_frag_bound", cps.forall(_.corpusFrags <= 20),
        s"max ${cps.map(_.corpusFrags).max} <= 20"),
      ("exact_recall", exactRecall >= 0.99, f"$exactRecall%.4f >= 0.99"),
      ("near_recall", nearRecall >= 0.95, f"$nearRecall%.4f >= 0.95"),
      ("deletions_invisible", cps.forall(_.delVisible == 0),
        s"max visible ${cps.map(_.delVisible).max}"))
    val pass = checks.forall(_._2)

    def j(cp: Cp): String =
      s"""{"t":${cp.t},"corpus_rows":${cp.corpusRows},"corpus_frags":${cp.corpusFrags},""" +
      s""""sig_buckets":${cp.sigBuckets},"band_buckets":${cp.bandBuckets},""" +
      s""""sig_migrating":${cp.sigMigrating},"band_migrating":${cp.bandMigrating},""" +
      s""""sig_kb":${cp.sigKb},"band_kb":${cp.bandKb},"disk_mb":${cp.diskMb},""" +
      s""""ingest_ms_avg":${cp.ingestMsAvg},""" +
      s""""exact_eligible":${cp.exactElig},"exact_dropped":${cp.exactDropped},""" +
      s""""near_eligible":${cp.nearElig},"near_dropped":${cp.nearDropped},""" +
      s""""deleted_requested":${cp.delRequested},"deleted_visible":${cp.delVisible}}"""
    val json =
      s"""{"soak":"rebucket_grow_shrink_sf1","sf_dir":"$sfDir","aqe":${spark.conf.get("spark.sql.adaptive.enabled")},""" +
      s""""phase1_triggers":${phase1.length},"phase2_triggers":${phase2.length},""" +
      s""""sig_caps_kb":[${SigMax >> 10},${SigMin >> 10}],""" +
      s""""band_caps_kb":[${BandMax >> 10},${BandMin >> 10}],""" +
      s""""pass":$pass,"checks":{${checksJson(checks)}},""" +
      s""""checkpoints":[${cps.map(j).mkString(",")}]}"""
    writeJson(outPath, json)
    graft.runtime.Fs.deleteRecursive(Paths.get(warehouse))
    reportFailures(checks)
    pass
  }
}
