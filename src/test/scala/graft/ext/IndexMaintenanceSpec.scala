package graft.ext

import graft.SparkSpec
import graft.runtime.Sources
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Incremental ANN index maintenance (IvfIndex.append / SqIndex.append):
  * appended vectors become probe-visible WITHOUT a retrain, post-append
  * recall stays within ε of a fresh full retrain, and the drift signals
  * (appended mass / falling best-cell cosine for IVF, clamped-value
  * fraction for SQ8) recommend retrains exactly when they should.
  */
class IndexMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def emb = Sources(spark, dir).embeddings
  private def queries = emb.filter(col("vec_id") < 20)

  private def freshDir(): String =
    Files.createTempDirectory("graft-idx-maint").toString

  private def recallVsBrute(found: DataFrame): Double =
    RecallOps.setRecall("m", SimilarityOps.bruteForceTopK(emb, queries, k = 3),
        found, Seq("query_id", "corpus_id"))
      .select("recall").as[Double].collect().head

  test("IVF append: new vectors probe-visible; recall within ε of a fresh retrain") {
    val base = emb.filter(col("vec_id") >= 100 || col("vec_id") < 20)
    val late = emb.filter(col("vec_id") >= 20 && col("vec_id") < 100)
    val path = freshDir()
    IvfIndex.train(base, nlist = 16).save(path)
    val report = IvfIndex.append(spark, path, late)
    assert(report.appended == late.count())
    assert(report.totalRows == emb.count())
    // in-distribution batch, minority mass: no retrain needed
    assert(!report.retrainRecommended, report.toString)
    val appended = IvfIndex.load(spark, path)
      .topK(queries, k = 3, nprobe = 16) // nprobe = nlist: isolate ASSIGNMENT
    val fresh = IvfIndex.train(emb, nlist = 16)
      .topK(queries, k = 3, nprobe = 16)
    // full probe over all cells is exact regardless of assignment, so
    // both recalls are 1.0 — the appended rows are fully probe-visible
    val (ra, rf) = (recallVsBrute(appended), recallVsBrute(fresh))
    assert(math.abs(ra - rf) <= 0.05, s"append recall $ra vs fresh $rf")
    assert(ra == 1.0, s"nprobe=nlist probe must be exact, got $ra")
    // and at the production operating point the two index layouts agree
    // within ε on the same queries
    val raP = recallVsBrute(IvfIndex.load(spark, path).topK(queries, 3, nprobe = 4))
    val rfP = recallVsBrute(IvfIndex.train(emb, nlist = 16).topK(queries, 3, nprobe = 4))
    assert(math.abs(raP - rfP) <= 0.25, s"probe-point recall drifted: $raP vs $rfP")
  }

  test("IVF cells fold: streaming appends fold back to ~1 file/cell; results identical; crash windows heal") {
    def parquetFiles(p: String): Int = {
      var n = 0
      val w = Files.walk(java.nio.file.Paths.get(p))
      try w.forEach(f => if (f.toString.endsWith(".parquet")) n += 1)
      finally w.close()
      n
    }
    val path = freshDir()
    IvfIndex.train(emb.filter(col("vec_id") < 100), nlist = 4).save(path)
    // many tiny appends: each adds ~1 file per touched cell; past the
    // 16-files/cell bound (8 until r17 — the decade soak measured the
    // fold cadence as the binding amortized maintenance cost) the fold
    // fires inside append and collapses the run (the growth the r12
    // embed soak measured as a latency ramp)
    (0 until 24).foreach { i =>
      IvfIndex.append(spark, path,
        emb.filter(col("vec_id") >= 100 + i * 10 && col("vec_id") < 110 + i * 10))
    }
    assert(parquetFiles(s"$path/cells") <= 16 * 4,
      s"fold must bound the cell-file run, got ${parquetFiles(s"$path/cells")}")
    // the bound above is vacuous unless a fold actually fired — the r17
    // durable counter is also the soak harness's maintenance tag
    assert(IvfIndex.foldCount(path) >= 1,
      s"expected >= 1 completed fold, counter reads ${IvfIndex.foldCount(path)}")
    val before = IvfIndex.load(spark, path).topK(queries, 3, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    // crash window A: live dir retired, fully-written fold not yet in —
    // the writer heals by completing the swap
    val cells = java.nio.file.Paths.get(s"$path/cells")
    val fold = java.nio.file.Paths.get(s"$path/cells__fold")
    Files.move(cells, fold)
    assert(Files.exists(fold.resolve("_SUCCESS")), "fixture needs the marker")
    IvfIndex.append(spark, path, emb.filter(col("vec_id") >= 400 && col("vec_id") < 405))
    assert(Files.exists(cells) && !Files.exists(fold), "heal must complete the swap")
    // crash window B: live dir retired to __old, no complete fold — the
    // writer restores the retired copy
    Files.move(cells, java.nio.file.Paths.get(s"$path/cells__old"))
    IvfIndex.append(spark, path, emb.filter(col("vec_id") >= 405 && col("vec_id") < 410))
    assert(Files.exists(cells), "heal must restore the retired copy")
    // nothing lost through folds + heals: the original top-k rows are
    // all still found (extra appended vectors may only displace ranks)
    val after = IvfIndex.load(spark, path)
    val ids = after.assignments.select("corpus_id").as[Long].collect().toSet
    assert((100 until 340).forall(i => ids(i.toLong)),
      "appended rows must survive every fold/heal")
    assert(before.nonEmpty)
  }

  test("IVF append self-heals a pre-maintenance save (missing meta)") {
    val path = freshDir()
    IvfIndex.train(emb.filter(col("vec_id") < 200), nlist = 8).save(path)
    graft.runtime.Fs.deleteRecursive(java.nio.file.Paths.get(s"$path/meta"))
    val r = IvfIndex.append(spark, path, emb.filter(col("vec_id") >= 480))
    assert(r.appended == 20 && !r.retrainRecommended, r.toString)
    assert(new java.io.File(s"$path/meta").exists(), "self-heal must stamp meta")
  }

  test("HNSW survives a crashed compact (backup fallback) and a crashed params flip") {
    val path = freshDir()
    HnswIndex.train(emb.filter(col("vec_id") < 100), m = 6, nShards = 2).save(path)
    val before = HnswIndex.load(spark, path)
      .topK(queries, 3, ef = 32).count()
    // simulate a crash BETWEEN the two compact renames: live table gone,
    // backup present — load must resolve the backup
    import java.nio.file.{Files, Paths}
    Files.move(Paths.get(s"$path/nodes"), Paths.get(s"$path/nodes__old"))
    assert(HnswIndex.load(spark, path).topK(queries, 3, ef = 32).count() == before)
    Files.move(Paths.get(s"$path/nodes__old"), Paths.get(s"$path/nodes"))
    // simulate a crash between an append's params delete and move
    Files.move(Paths.get(s"$path/params"), Paths.get(s"$path/params__new"))
    assert(HnswIndex.load(spark, path).topK(queries, 3, ef = 32).count() == before)
  }

  test("IVF append drift: majority-appended mass recommends a retrain") {
    val path = freshDir()
    IvfIndex.train(emb.filter(col("vec_id") < 150), nlist = 8).save(path)
    val r = IvfIndex.append(spark, path, emb.filter(col("vec_id") >= 150))
    assert(r.appendedFraction > 0.5, r.toString)
    assert(r.retrainRecommended, s"appended majority must trigger retrain: $r")
  }

  test("IVF append drift: off-manifold batch (falling best-cell cosine) recommends a retrain") {
    // clustered corpus: centroids hug 4 tight clusters (train mean
    // best-cosine ≈ 1), so the signal separates cleanly — a held-out
    // SAME-cluster batch stays near the baseline, an off-manifold
    // (uniform) batch falls several tenths below it
    val all = VectorFixtures.clusteredRows.toDF("vec_id", "embedding")
    val path = freshDir()
    IvfIndex.train(all.filter(col("vec_id") < 160), nlist = 8).save(path)
    val inDist = IvfIndex.append(spark, path,
      all.filter(col("vec_id") >= 160 && col("vec_id") < 180))
    info(s"in-dist: $inDist")
    assert(!inDist.retrainRecommended,
      s"held-out same-cluster batch must not trip the drift gate: $inDist")
    val offManifold = (0 until 20)
      .map(i => (200000L + i, VectorFixtures.synthVec(50000 + i)))
      .toDF("vec_id", "embedding")
    val r = IvfIndex.append(spark, path, offManifold)
    info(s"off-manifold: $r")
    assert(r.batchMeanSim < r.trainMeanSim - 0.15,
      s"uniform batch must score far from the cluster centroids: $r")
    assert(r.retrainRecommended, r.toString)
  }

  test("SQ8 append: new codes probe-visible; refined recall within ε of a fresh retrain") {
    val base = emb.filter(col("vec_id") >= 100 || col("vec_id") < 20)
    val late = emb.filter(col("vec_id") >= 20 && col("vec_id") < 100)
    val path = freshDir()
    SqIndex.train(base).save(path)
    val report = SqIndex.append(spark, path, late)
    assert(report.appended == late.count())
    // the late half is drawn from the same distribution the ranges were
    // trained on: (almost) nothing clamps, no retrain
    assert(!report.retrainRecommended, report.toString)
    val ra = recallVsBrute(
      SqIndex.load(spark, path).topKRefined(queries, emb, k = 3, shortlist = 32))
    val rf = recallVsBrute(
      SqIndex.train(emb).topKRefined(queries, emb, k = 3, shortlist = 32))
    assert(math.abs(ra - rf) <= 0.05, s"append recall $ra vs fresh $rf")
  }

  test("PQ append: codebook-reuse encode; refined recall within ε of a fresh retrain") {
    val base = emb.filter(col("vec_id") >= 100 || col("vec_id") < 20)
    val late = emb.filter(col("vec_id") >= 20 && col("vec_id") < 100)
    val path = freshDir()
    PqIndex.train(base).save(path)
    val r = PqIndex.append(spark, path, late)
    assert(r.appended == late.count())
    // same distribution → error near the training baseline, no retrain
    assert(!r.retrainRecommended, r.toString)
    assert(r.batchMeanQErr <= r.trainMeanQErr * 1.5, r.toString)
    val ra = recallVsBrute(
      PqIndex.load(spark, path).topKRefined(queries, emb, k = 3, shortlist = 64))
    val rf = recallVsBrute(
      PqIndex.train(emb).topKRefined(queries, emb, k = 3, shortlist = 64))
    assert(math.abs(ra - rf) <= 0.15, s"append recall $ra vs fresh $rf")
  }

  test("PQ append drift: off-manifold batch inflates quantization error and recommends retrain") {
    val all = VectorFixtures.clusteredRows.toDF("vec_id", "embedding")
    val path = freshDir()
    PqIndex.train(all).save(path)
    // uniform batch against cluster-fit codebooks: residual energy jumps
    val offManifold = (0 until 20)
      .map(i => (200000L + i, VectorFixtures.synthVec(60000 + i)))
      .toDF("vec_id", "embedding")
    val r = PqIndex.append(spark, path, offManifold)
    info(r.toString)
    assert(r.batchMeanQErr > r.trainMeanQErr * 1.5, r.toString)
    assert(r.retrainRecommended, r.toString)
  }

  test("IVF-PQ append: residual encode into existing cells; recall within ε of fresh") {
    val base = emb.filter(col("vec_id") >= 100 || col("vec_id") < 20)
    val late = emb.filter(col("vec_id") >= 20 && col("vec_id") < 100)
    val path = freshDir()
    IvfPqIndex.train(base).save(path)
    val r = IvfPqIndex.append(spark, path, late)
    assert(r.appended == late.count() && !r.retrainRecommended, r.toString)
    val ra = recallVsBrute(IvfPqIndex.load(spark, path)
      .topKRefined(queries, emb, k = 3, nprobe = 16, shortlist = 64))
    val rf = recallVsBrute(IvfPqIndex.train(emb)
      .topKRefined(queries, emb, k = 3, nprobe = 16, shortlist = 64))
    assert(math.abs(ra - rf) <= 0.15, s"append recall $ra vs fresh $rf")
  }

  test("HNSW append: new segment is searchable; compaction folds fan-out back") {
    val base = emb.filter(col("vec_id") >= 100 || col("vec_id") < 20)
    val late = emb.filter(col("vec_id") >= 20 && col("vec_id") < 100)
    val path = freshDir()
    HnswIndex.train(base, m = 8, nShards = 4).save(path)
    val r = HnswIndex.append(spark, path, late, segmentShards = 1, maxShards = 6)
    assert(r.appended == late.count() && r.totalShards == 5 && !r.compactRecommended,
      r.toString)
    val ra = recallVsBrute(
      HnswIndex.load(spark, path).topK(queries, k = 3, ef = 64))
    val rf = recallVsBrute(
      HnswIndex.train(emb, m = 8, nShards = 4).topK(queries, k = 3, ef = 64))
    assert(math.abs(ra - rf) <= 0.1, s"append recall $ra vs fresh $rf")
    // two more appends pass maxShards → compaction recommended; compact
    // folds back to the base shard count with recall preserved
    HnswIndex.append(spark, path, emb.filter(col("vec_id") === 0)
      .select(($"vec_id" + 300000).as("vec_id"), $"embedding"), maxShards = 6)
    val r3 = HnswIndex.append(spark, path, emb.filter(col("vec_id") === 1)
      .select(($"vec_id" + 300001).as("vec_id"), $"embedding"), maxShards = 6)
    assert(r3.totalShards == 7 && r3.compactRecommended, r3.toString)
    HnswIndex.compact(spark, path, nShards = 4)
    val after = HnswIndex.load(spark, path)
    assert(after.nShards == 4)
    val rc = recallVsBrute(after.topK(queries, k = 3, ef = 64))
    assert(math.abs(rc - rf) <= 0.1, s"post-compact recall $rc vs fresh $rf")
  }

  test("SQ8 append drift: out-of-range values clamp and recommend a retrain") {
    val path = freshDir()
    SqIndex.train(emb).save(path)
    // one-hot vectors: a single coordinate at 1.0, far outside the
    // near-uniform corpus's trained per-dimension ranges
    val oneHot = (0 until 8).map { d =>
      (100000L + d, (0 until 64).map(i => if (i == d) 1.0f else 0.0f))
    }.toDF("vec_id", "embedding")
    val r = SqIndex.append(spark, path, oneHot)
    assert(r.clampedFraction > 0.01,
      s"one-hot batch must clamp its hot dimension: $r")
    assert(r.retrainRecommended, r.toString)
    // the clamped codes are still present (degraded, not lost)
    val ids = SqIndex.load(spark, path).codeTable
      .select("corpus_id").as[Long].collect().toSet
    assert((100000L until 100008L).forall(ids))
  }

  test("IVF append self-heals a PARTIAL meta dir and survives a crashed flip") {
    import java.nio.file.{Files, Paths}
    val path = freshDir()
    IvfIndex.train(emb.filter(col("vec_id") < 200), nlist = 8).save(path)
    // crash mid-write of the old in-place overwrite: the dir exists but
    // holds no readable parquet — append must restamp, not crash
    graft.runtime.Fs.deleteRecursive(Paths.get(s"$path/meta"))
    Files.createDirectories(Paths.get(s"$path/meta"))
    Files.write(Paths.get(s"$path/meta/part-corrupt.parquet"), Array[Byte](1, 2, 3))
    val r = IvfIndex.append(spark, path, emb.filter(col("vec_id") >= 480))
    assert(r.appended == 20 && !r.retrainRecommended, r.toString)
    // crash between the swap's delete and move: only meta__new on disk —
    // the fallback read must find it
    Files.move(Paths.get(s"$path/meta"), Paths.get(s"$path/meta__new"))
    val r2 = IvfIndex.append(spark, path,
      emb.filter(col("vec_id") >= 470 && col("vec_id") < 480)
        .select(($"vec_id" + 500000).as("vec_id"), $"embedding"))
    assert(r2.appended == 10, r2.toString)
    assert(new java.io.File(s"$path/meta").exists(), "flip must land at the live name")
    assert(!new java.io.File(s"$path/meta__new").exists(), "sibling dir must be consumed")
  }

  test("HNSW append sweeps a crashed attempt's orphan shard files: retry leaves no duplicates") {
    val path = freshDir()
    val base = emb.filter(col("vec_id") < 100)
    val late = emb.filter(col("vec_id") >= 100 && col("vec_id") < 120)
    HnswIndex.train(base, m = 6, nShards = 2).save(path)
    // full append, then roll params BACK — the exact state a crash after
    // the edge/node writes but before the params flip leaves behind
    HnswIndex.append(spark, path, late, segmentShards = 1)
    Seq((6, 2)).toDF("m", "n_shards").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/params")
    // retry re-reads n_shards=2 and targets shard 2 again: without the
    // orphan sweep the first attempt's rows would duplicate forever
    val r = HnswIndex.append(spark, path, late, segmentShards = 1)
    assert(r.totalShards == 3, r.toString)
    val nodes = spark.read.parquet(s"$path/nodes")
    assert(nodes.count() == 120, s"orphan rows survived: ${nodes.count()}")
    assert(nodes.select("corpus_id").distinct().count() == 120)
  }

  test("HNSW append does not pin the segment's cached build frame") {
    val path = freshDir()
    HnswIndex.train(emb.filter(col("vec_id") < 80), m = 6, nShards = 2).save(path)
    val before = spark.sparkContext.getPersistentRDDs.size
    HnswIndex.append(spark, path,
      emb.filter(col("vec_id") >= 80 && col("vec_id") < 100))
    assert(spark.sparkContext.getPersistentRDDs.size <= before,
      "append leaked a cached segment build frame")
  }

  test("delete across the facade ladder: tombstones honored, maintain purges, recall floor holds") {
    val d = 64 // embeddings fixture dims
    val base = emb.filter(col("vec_id") < 400)
    val late = emb.filter(col("vec_id") >= 400)
    val nB = base.count()
    val delPred = col("vec_id") % 7 === 3 && col("vec_id") < 400
    val delIds = emb.filter(delPred).select("vec_id").as[Long].collect().toSet
    // one profile per rung; floor = the rung's registered recall floor
    val rungs = Seq(
      (VectorIndex.Brute, IndexProfile.exact, 0.99),
      (VectorIndex.Ivf, IndexProfile(exactFloor = 10L, nprobe = 64), 0.99),
      (VectorIndex.Sq, IndexProfile(exactFloor = 10L,
        memoryBudgetBytes = nB * d * 4), 0.8),
      (VectorIndex.IvfPq, IndexProfile(exactFloor = 10L,
        memoryBudgetBytes = nB * d / 2, nprobe = 64), 0.2),
      (VectorIndex.Hnsw, IndexProfile(serving = true, exactFloor = 10L), 0.5))
    for ((want, prof, floor) <- rungs) {
      val path = freshDir()
      val idx = VectorIndex.build(base, path, prof)
      assert(idx.kind == want, s"expected $want got ${idx.kind}")
      // tombstone O(keys); honored immediately on every surface
      assert(idx.delete(emb.filter(delPred)) == delIds.size)
      def noDeleted(res: org.apache.spark.sql.DataFrame, ctx: String): Unit = {
        val leaked = res.select("corpus_id").as[Long].collect().filter(delIds)
        assert(leaked.isEmpty, s"$want/$ctx surfaced deleted ids: ${leaked.toSeq}")
      }
      noDeleted(idx.search(queries, 3), "post-delete")
      assert(idx.corpusFrame.filter(delPred).count() == 0, s"$want corpusFrame")
      // exact rungs: the post-delete answer IS brute over the survivors
      if (want == VectorIndex.Brute || want == VectorIndex.Ivf) {
        val expect = pairSet(SimilarityOps.bruteForceTopK(
          base.filter(!delPred), queries, 3))
        assert(pairSet(idx.search(queries, 3)) == expect, s"$want exactness")
      }
      val gate = idx.recallGate(queries, 3, floor)
      assert(gate.select("meets_floor").as[Boolean].collect().forall(identity),
        s"$want recall floor after delete")
      // append while tombstones live: fresh ids fine, tombstoned rejected
      idx.append(late)
      noDeleted(idx.search(queries, 3), "post-append")
      intercept[IllegalArgumentException] {
        idx.append(emb.filter(col("vec_id") === delIds.head))
      }
      // maintain = the physical purge: tombstones clear, corpus shrinks
      idx.maintain()
      assert(idx.deletedCount() == 0, s"$want tombstones must purge")
      assert(idx.corpusFrame.count() == emb.count() - delIds.size)
      assert(idx.corpusFrame.filter(delPred).count() == 0)
      noDeleted(idx.search(queries, 3), "post-maintain")
      val gate2 = idx.recallGate(queries, 3, floor)
      assert(gate2.select("meets_floor").as[Boolean].collect().forall(identity),
        s"$want recall floor after maintain")
      // post-purge, a deleted id may re-enter (the forget cycle is over)
      idx.append(emb.filter(col("vec_id") === delIds.head))
      assert(idx.corpusFrame.filter(col("vec_id") === delIds.head).count() == 1,
        s"$want re-append after maintain must resurrect")
    }
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("query_id", "corpus_id").as[(Long, Long)].collect().toSet

  test("Sq/IvfPq maintain stages the retrain: crashed-attempt leftovers consumed, swap window readable") {
    import java.nio.file.{Files, Paths}
    val d = 64
    val base = emb.filter(col("vec_id") < 400)
    val nB = base.count()
    val profiles = Seq(
      (VectorIndex.Sq, IndexProfile(exactFloor = 10L, memoryBudgetBytes = nB * d * 4)),
      (VectorIndex.IvfPq, IndexProfile(exactFloor = 10L,
        memoryBudgetBytes = nB * d / 2, nprobe = 64)))
    for ((want, prof) <- profiles) {
      val path = freshDir()
      val idx = VectorIndex.build(base, path, prof)
      assert(idx.kind == want)
      // a crashed earlier retrain left a partial idx__new: maintain must
      // sweep and replace it, never let resolveLive treat it as live
      Files.createDirectories(Paths.get(s"$path/idx__new"))
      Files.write(Paths.get(s"$path/idx__new/garbage"), Array[Byte](1, 2, 3))
      idx.delete(emb.filter(col("vec_id") === 1L))
      idx.maintain()
      assert(!Files.exists(Paths.get(s"$path/idx__new")),
        s"$want: staged retrain dir must be consumed by the swap")
      assert(Files.exists(Paths.get(s"$path/idx")), s"$want: live idx present")
      val after = idx.search(queries, 3)
      assert(after.filter(col("corpus_id") === 1L).count() == 0, s"$want purge")
      assert(after.groupBy("query_id").count().select("count").as[Long]
        .collect().forall(_ == 3), s"$want: full top-k after staged retrain")
      // the swap's crash window (live renamed away, __new not yet moved
      // in): resolveLive must fall back to the __old backup
      Files.move(Paths.get(s"$path/idx"), Paths.get(s"$path/idx__old"))
      val reopened = VectorIndex.load(spark, path)
      val fallback = pairSet(reopened.search(queries, 3))
      assert(fallback.nonEmpty, s"$want: crash-window search must work from __old")
      Files.move(Paths.get(s"$path/idx__old"), Paths.get(s"$path/idx"))
    }
  }

  test("indexedIds keeps tombstoned ids visible to the repair seam; maintenanceDue tracks pressure") {
    val path = freshDir()
    val idx = VectorIndex.build(emb.filter(col("vec_id") < 100), path,
      IndexProfile.exact)
    assert(!idx.maintenanceDue(), "fresh index has no deletion pressure")
    idx.delete(emb.filter(col("vec_id") < 15))
    // corpusFrame excludes the tombstones; indexedIds does NOT — a
    // corpus-vs-index lag check must see them as present, or a repair
    // append of a tombstoned id would be rejected
    assert(idx.corpusFrame.count() == 85)
    assert(idx.indexedIds.count() == 100)
    assert(idx.maintenanceDue(maxDeletedRatio = 0.1), "15% deleted >= 10% bar")
    assert(!idx.maintenanceDue(maxDeletedRatio = 0.2), "15% deleted < 20% bar")
    idx.maintain()
    assert(!idx.maintenanceDue() && idx.indexedIds.count() == 85)
  }

  test("HNSW search skips dangling edges (node invisible mid-append) instead of throwing") {
    import java.nio.file.{Files, Paths}
    val path = freshDir()
    HnswIndex.train(emb.filter(col("vec_id") < 100), m = 6, nShards = 2).save(path)
    // drop ONE node row but keep every edge referencing it — what a
    // reader sees when a multi-file node append is partially visible,
    // or in compact's nodes-swapped/edges-old crash window
    val victim = 99L
    val pruned = spark.read.parquet(s"$path/nodes")
      .filter(col("corpus_id") =!= victim)
    pruned.write.partitionBy("shard").parquet(s"$path/nodes__tmp")
    graft.runtime.Fs.deleteRecursive(Paths.get(s"$path/nodes"))
    Files.move(Paths.get(s"$path/nodes__tmp"), Paths.get(s"$path/nodes"))
    val got = HnswIndex.load(spark, path).topK(queries, 3, ef = 32)
    assert(got.count() > 0, "search must still answer from the reachable subgraph")
    assert(got.filter(col("corpus_id") === victim).count() == 0)
  }
}
