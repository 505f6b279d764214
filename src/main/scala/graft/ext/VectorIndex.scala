package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Declarative intent for the unified ANN front door
  * ([[VectorIndex.build]] / `Graft.index`) — what the CALLER knows
  * about their workload, not which data structure serves it. The
  * builder measures the corpus (rows × dims) and picks the rung:
  *
  *   - at or under `exactFloor` rows → BRUTE (exact; below this size an
  *     index buys nothing over one broadcast scan)
  *   - `serving = true` → HNSW (graph navigation: per-query latency
  *     O(log N) hops instead of a corpus scan — the point-lookup shape)
  *   - else by `memoryBudgetBytes` against the index's working set:
  *     full vectors (n·d·8) fit → IVF (cid-partitioned full precision,
  *     best batch recall); SQ8 codes (n·d) fit → SQ8 with exact refine;
  *     otherwise → IVF-PQ (coarse cells over ~m-byte codes, the
  *     smallest footprint that still prunes the scan).
  *
  * `nprobe`/`shortlist` are the recall/cost knobs the chosen rung
  * consumes (ignored by rungs without the knob). The profile persists
  * with the index, so `load` + `search` needs no re-tuning at the
  * call site.
  */
final case class IndexProfile(
    memoryBudgetBytes: Long = 4L << 30,
    serving: Boolean = false,
    exactFloor: Long = 50000L,
    nprobe: Int = 4,
    shortlist: Int = 64)

object IndexProfile {
  /** Always exact, any size — the oracle-friendly profile. */
  val exact: IndexProfile = IndexProfile(exactFloor = Long.MaxValue)
  /** The default: exact when small, full-precision IVF when it fits. */
  val balanced: IndexProfile = IndexProfile()
  /** Tight memory: quantized rungs even for mid-size corpora. */
  val compact: IndexProfile = IndexProfile(memoryBudgetBytes = 16L << 20,
    exactFloor = 1000L)
  /** Low-latency point lookups → the graph rung. */
  val serving: IndexProfile = IndexProfile(serving = true, exactFloor = 1000L)
}

/** One persisted ANN index behind a rung-agnostic API: `search`,
  * `append`, `maintain`, `recallGate` — the facade VERDICT r8 asked for
  * over the seven-family ladder (brute / IVF / SQ8 / IVF-PQ / HNSW
  * here; PQ-flat and sign-LSH remain direct-API rungs, each dominated
  * by a facade rung on both axes). All heavy lifting delegates to the
  * per-rung implementations, so every plan shape, bound, and crash
  * guarantee is the one their own specs gate.
  *
  * Layout at `path/`: `kind` (one-line rung + knobs marker, written
  * tmp+atomic-move), `idx/` (the rung's own save dir), and — for rungs
  * whose index does not retain full vectors (brute, SQ8, IVF-PQ) —
  * `corpus/` parquet for exact refine, maintenance retrains, and
  * recall ground truth. IVF keeps vectors in its cells and HNSW in its
  * nodes, so those rungs pay no copy.
  */
final class VectorIndex private (val spark: SparkSession, val path: String,
                                 kind0: String, profile0: IndexProfile) {

  import VectorIndex._

  /** The rung this handle currently dispatches to. Re-read from the
    * kind marker on every use (a one-line file read) rather than
    * pinned at construction: [[maintain]] can MIGRATE the rung when
    * the corpus outgrows the profile's boundary (r18), and a live
    * handle held across that maintain — the streaming sink holds one
    * through a whole trigger — must dispatch its next operation on
    * the rung that now owns the files, not the one it was opened on.
    */
  def kind: String = readKindLine(path).map(_._1).getOrElse(kind0)

  /** Operating knobs, marker-backed like [[kind]]. */
  def profile: IndexProfile = readKindLine(path).map(_._2).getOrElse(profile0)

  // live dir, falling back to a crashed swap's backup (see maintain's
  // two-rename protocol) — the dir stays readable through the swap's
  // crash window
  private def resolveLive(live: String): String =
    if (Files.exists(Paths.get(live))) live
    else if (Files.exists(Paths.get(live + "__old"))) live + "__old"
    else live
  private def idxPath = resolveLive(s"$path/idx")
  private def corpusPath = resolveLive(s"$path/corpus")
  // tombstones are only appended (delete) or cleared whole (maintain's
  // last step) — never swapped, so no fallback resolution is needed,
  // and a crash mid-maintain leaves at worst already-purged tombstones
  // whose anti-joins are no-ops
  private def deletedPath = s"$path/deleted"

  /** Replace `live` with its fully-written `live__new` sibling: old is
    * renamed to `__old` (the readable fallback through the crash
    * window), new moves in, backup is GC'd. `__new` must exist.
    */
  private def swapInNew(liveName: String): Unit = {
    val live = Paths.get(s"$path/$liveName")
    val old = Paths.get(s"$path/${liveName}__old")
    graft.runtime.Fs.deleteRecursive(old)
    if (Files.exists(live)) Files.move(live, old)
    Files.move(Paths.get(s"$path/${liveName}__new"), live)
    graft.runtime.Fs.deleteRecursive(old)
  }

  /** Ids tombstoned by [[delete]] and not yet purged by [[maintain]],
    * as a one-column `vec_id` frame; None when there are none.
    */
  def deletedIds: Option[DataFrame] =
    if (Files.exists(Paths.get(deletedPath)))
      Some(spark.read.parquet(deletedPath).select("vec_id").distinct())
    else None

  /** Number of live tombstones — also [[search]]'s over-fetch width, so
    * a caller letting this grow unbounded should schedule [[maintain]].
    */
  def deletedCount(): Long = deletedIds.map(_.count()).getOrElse(0L)

  private def baseCorpus: DataFrame = kind match {
    case Brute | Sq | IvfPq => spark.read.parquet(corpusPath)
    case Ivf => IvfIndex.load(spark, idxPath).assignments
      .select(col("corpus_id").as("vec_id"), col("cv").as("embedding"))
    case Hnsw => spark.read.parquet(s"$idxPath/nodes")
      .select(col("corpus_id").as("vec_id"), col("v").as("embedding"))
  }

  /** The indexed vectors as (vec_id, embedding) — refine input,
    * retrain input, and the recall gate's ground-truth corpus.
    * Tombstoned ids are excluded, so every consumer (refine, retrain,
    * ground truth) agrees deletion already happened.
    */
  def corpusFrame: DataFrame =
    deletedIds.fold(baseCorpus)(d => baseCorpus.join(d, Seq("vec_id"), "left_anti"))

  /** Every id the rung tables hold, INCLUDING tombstoned-but-unpurged
    * ones — the repair-seam set: a tombstoned id is not "missing from
    * the index" (its bytes are still there and re-appending it before
    * [[maintain]] is rejected), so a corpus-vs-index lag check must
    * anti-join against THIS, not [[corpusFrame]].
    */
  def indexedIds: DataFrame = baseCorpus.select("vec_id")

  /** Deletion-pressure maintenance signal, the tombstone analog of the
    * rungs' drift reports: true once the tombstone set reaches
    * `maxDeletedRatio` of the indexed rows (search over-fetch and
    * anti-join cost grow with it, and purging reclaims the bytes).
    */
  def maintenanceDue(maxDeletedRatio: Double = 0.1): Boolean = {
    val d = deletedCount()
    d > 0 && d >= maxDeletedRatio * baseCorpus.count()
  }

  /** Tombstone `keys` across the ladder in O(keys): one appended
    * tombstone batch, honored immediately by [[search]] /
    * [[corpusFrame]] / [[recallGate]] on every rung, physically purged
    * at the next [[maintain]]. Idempotent; ids the index never held are
    * harmless. Returns the number of distinct keys recorded. A deleted
    * id stays deleted until a post-[[maintain]] re-append — appending a
    * still-tombstoned id is rejected (the rung tables still hold its
    * old row, and two live rows per id would corrupt top-k).
    */
  def delete(keys: DataFrame, idCol: String = "vec_id"): Long = {
    val ks = keys.select(col(idCol).as("vec_id")).distinct()
    val n = ks.count()
    if (n > 0) ks.write.mode("append").parquet(s"$path/deleted")
    n
  }

  /** Top-k per query row as (query_id, corpus_id, sim, rank) — the
    * ladder-wide result contract. Each rung runs its own verified
    * probe shape; quantized rungs refine exactly against the stored
    * corpus (ADC orders the shortlist, true cosine orders the answer).
    *
    * Tombstoned ids never surface: the rung probe over-fetches
    * `k + deletedCount` candidates, the tombstone set anti-joins out,
    * and ranks recompute over the survivors — so an EXACT rung stays
    * exact after deletes (every deleted id above rank k is replaced
    * from the over-fetch), and approximate rungs keep their recall
    * character. The over-fetch width is why unbounded tombstone growth
    * wants a [[maintain]].
    */
  def search(queries: DataFrame, k: Int,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dels = if (kind == Brute) None else deletedIds // brute scans corpusFrame: already filtered
    val dCount = dels.map(_.count()).getOrElse(0L)
    val kRaw = math.min(Int.MaxValue.toLong, k.toLong + dCount).toInt
    val raw = rawSearch(queries, kRaw, idCol, vecCol)
    if (dCount == 0) raw
    else {
      import org.apache.spark.sql.expressions.Window
      raw.join(dels.get.withColumnRenamed("vec_id", "corpus_id"),
          Seq("corpus_id"), "left_anti")
        .withColumn("rank", row_number().over(
          Window.partitionBy("query_id").orderBy(col("sim").desc, col("corpus_id"))))
        .filter(col("rank") <= k)
        .select("query_id", "corpus_id", "sim", "rank")
    }
  }

  private def rawSearch(queries: DataFrame, k: Int,
                        idCol: String, vecCol: String): DataFrame =
    kind match {
      case Brute =>
        SimilarityOps.bruteForceTopK(corpusFrame, queries, k,
          idCol = idCol, vecCol = vecCol)
      case Ivf =>
        IvfIndex.load(spark, idxPath)
          .topK(queries, k, nprobe = profile.nprobe, idCol = idCol, vecCol = vecCol)
      case Sq =>
        SqIndex.load(spark, idxPath).topKRefined(queries, corpusFrame, k,
          shortlist = math.max(profile.shortlist, k), idCol = idCol, vecCol = vecCol)
      case IvfPq =>
        IvfPqIndex.load(spark, idxPath).topKRefined(queries, corpusFrame, k,
          nprobe = profile.nprobe, shortlist = math.max(profile.shortlist, k),
          idCol = idCol, vecCol = vecCol)
      case Hnsw =>
        HnswIndex.load(spark, idxPath).topK(queries, k,
          ef = math.max(profile.shortlist, k), idCol = idCol, vecCol = vecCol)
    }

  /** O(batch) incremental extension through the rung's own `append`
    * (new ids only — every rung's contract). Returns the unified drift
    * summary; when `maintenanceRecommended` fires, schedule
    * [[maintain]] — the same trade every rung documents individually.
    */
  def append(batch: DataFrame,
             idCol: String = "vec_id", vecCol: String = "embedding"): AppendSummary = {
    // a tombstoned id's old row still sits in the rung tables until
    // maintain purges it; letting a re-append through would leave TWO
    // live rows for one id once the tombstone clears — reject instead
    // (re-add after maintain)
    deletedIds.foreach { d =>
      require(batch.select(col(idCol).as("vec_id"))
          .join(d, Seq("vec_id"), "left_semi").isEmpty,
        "batch contains tombstoned ids; run maintain() before re-appending them")
    }
    def keepCorpus(): Unit =
      batch.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
        .write.mode("append").parquet(corpusPath)
    kind match {
      case Brute =>
        val n = batch.count(); keepCorpus(); AppendSummary(n, maintenanceRecommended = false)
      case Ivf =>
        val r = IvfIndex.append(spark, idxPath, batch, idCol, vecCol)
        AppendSummary(r.appended, r.retrainRecommended)
      case Sq =>
        val r = SqIndex.append(spark, idxPath, batch, idCol, vecCol)
        keepCorpus(); AppendSummary(r.appended, r.retrainRecommended)
      case IvfPq =>
        val r = IvfPqIndex.append(spark, idxPath, batch, idCol, vecCol)
        keepCorpus(); AppendSummary(r.appended, r.retrainRecommended)
      case Hnsw =>
        val r = HnswIndex.append(spark, idxPath, batch, idCol = idCol, vecCol = vecCol)
        AppendSummary(r.appended, r.compactRecommended)
    }
  }

  /** The maintenance the rung's drift report asks for: retrain from the
    * indexed corpus (quantized/coarse rungs) or fold segments
    * ([[HnswIndex.compact]]). O(corpus) by nature — scheduled, never
    * per-batch. This is also the PHYSICAL PURGE point for [[delete]]:
    * every rebuild trains from [[corpusFrame]] (tombstones already
    * excluded), corpus-keeping rungs rewrite their corpus dir minus the
    * tombstones (two-rename swap, readable through a crash), and the
    * tombstone set clears LAST — a crash anywhere leaves tombstones
    * whose anti-joins are at worst no-ops, never resurrections.
    */
  def maintain(purge: Boolean = true): Unit = {
    val hadDeletes = deletedCount() > 0
    val k0 = kind
    // SCHEDULED (purge = false) maintenance on the serving rung defers
    // the O(corpus) rebuild (r18, VERDICT r17 task 2): a full compact
    // at the fixed shard-count cadence costs amortized O(n) per
    // trigger, which no bounded-maintenance gate survives at decade
    // growth. The size-tiered merge cascade ([[HnswIndex.mergeOnce]])
    // keeps amortized maintenance AND search fan-out logarithmic; the
    // full compact still runs whenever deletion pressure crosses the
    // ratio bound, or the caller needs the physical purge NOW
    // (resurrection, spec-driven) — purge = true, the default, is
    // exactly the pre-r18 contract on every rung.
    if (!purge && k0 == Hnsw && !maintenanceDue()) {
      // each step's tombstone exclusion physically purges the two
      // shards it touches; the tombstone SET stays (other shards may
      // still hold those ids) and keeps filtering at search
      val ex = deletedIds.map(_.withColumnRenamed("vec_id", "corpus_id"))
      while (HnswIndex.mergeOnce(spark, idxPath, exclude = ex)) ()
      bumpMaintains()
      return
    }
    // FULL maintenance pays an O(corpus) rebuild anyway — so first
    // re-select the rung against the CURRENT corpus (r18, VERDICT r17
    // task 3): a sink-fed index that grows 40× keeps its birth rung
    // forever otherwise, and the r17 decade soak measured the
    // consequence (IVF's designed √n per-trigger growth where the
    // profile would now pick a different rung). If the profile's
    // boundary was crossed, the rebuild IS the migration — same staged
    // dirs + two-rename discipline, committed by a kind-marker flip
    // ([[VectorIndex.commitMigration]], idempotent and re-run by load
    // after a crash anywhere inside it).
    val c = corpusFrame
    val n = c.count()
    val newKind = if (n == 0) k0 else {
      val dims = c.select(size(col("embedding"))).head.getInt(0)
      selectKind(n, dims, profile)
    }
    if (newKind != k0) {
      stageMigration(newKind, c, n)
      commitMigration(path)
      bumpMaintains()
      return
    }
    k0 match {
      case Brute => () // corpus rewrite below is the whole purge
      case Ivf =>
        // IVF's retrain input IS its own cell table: stage the new index
        // to a sibling dir, then two-rename swap (an in-place overwrite
        // would delete the files the training scan is still reading; the
        // __old backup keeps the swap's crash window readable)
        val tmp = s"$path/idx__new"
        graft.runtime.Fs.deleteRecursive(Paths.get(tmp))
        IvfIndex.train(c, nlist = nlistFor(n)).save(tmp)
        swapInNew("idx")
      case Sq =>
        // unlike Ivf the retrain input lives in corpus/, not idx/, but an
        // in-place save still has a crash window where a partial idx dir
        // would resolve as live — and maintain() now runs inline from the
        // streaming sink's purge/resurrection path, so the window recurs;
        // stage + two-rename swap like the other rebuild sites
        val sqTmp = s"$path/idx__new"
        graft.runtime.Fs.deleteRecursive(Paths.get(sqTmp))
        SqIndex.train(c).save(sqTmp)
        swapInNew("idx")
      case IvfPq =>
        val pqTmp = s"$path/idx__new"
        graft.runtime.Fs.deleteRecursive(Paths.get(pqTmp))
        IvfPqIndex.train(c, nlist = nlistFor(n)).save(pqTmp)
        swapInNew("idx")
      case Hnsw =>
        HnswIndex.compact(spark, idxPath, exclude =
          deletedIds.map(_.withColumnRenamed("vec_id", "corpus_id")))
    }
    if (hadDeletes) {
      if (k0 == Brute || k0 == Sq || k0 == IvfPq) {
        // rewrite the refine/ground-truth corpus without the tombstones
        val tmp = s"$path/corpus__new"
        graft.runtime.Fs.deleteRecursive(Paths.get(tmp))
        corpusFrame.write.parquet(tmp)
        swapInNew("corpus")
      }
      graft.runtime.Fs.deleteRecursive(Paths.get(deletedPath))
    }
    bumpMaintains()
  }

  /** Stage a cross-rung rebuild: the new rung's artifacts land fully
    * under `idx__new` / `corpus__new` (built FROM the old rung's live
    * dirs, which stay untouched and readable), then the `kind__new`
    * marker — written LAST — records that staging is complete. The
    * commit ([[VectorIndex.commitMigration]]) is driven entirely by
    * that marker, so a crash before it leaves the old rung intact and
    * a crash after it rolls forward. Package-visible so the spec can
    * crash-test the window between stage and commit.
    */
  private[ext] def stageMigration(newKind: String, c: DataFrame, n: Long): Unit = {
    graft.runtime.Fs.deleteRecursive(Paths.get(s"$path/idx__new"))
    graft.runtime.Fs.deleteRecursive(Paths.get(s"$path/corpus__new"))
    val std = c.select(col("vec_id"), col("embedding"))
    newKind match {
      case Brute => std.write.parquet(s"$path/corpus__new")
      case Ivf => IvfIndex.train(std, nlist = nlistFor(n)).save(s"$path/idx__new")
      case Sq =>
        SqIndex.train(std).save(s"$path/idx__new")
        std.write.parquet(s"$path/corpus__new")
      case IvfPq =>
        IvfPqIndex.train(std, nlist = nlistFor(n)).save(s"$path/idx__new")
        std.write.parquet(s"$path/corpus__new")
      case Hnsw => HnswIndex.train(std).save(s"$path/idx__new")
    }
    writeKindFile(path, "kind__new", newKind, profile)
  }

  /** Durable maintain counter (VERDICT r13 #6): a monotone count of
    * completed maintain() calls, so a harness can MECHANICALLY tag
    * which triggers carried scheduled O(corpus) work instead of
    * inferring it from latency shape. Written atomically (tmp + move),
    * best-effort read (absent file = 0).
    */
  private def bumpMaintains(): Unit = {
    val mp = Paths.get(path, "maintains")
    val next = VectorIndex.maintainCount(path) + 1
    val tmp2 = Paths.get(path, "maintains__tmp_" +
      java.util.UUID.randomUUID().toString.take(8))
    Files.write(tmp2, next.toString.getBytes("UTF-8"))
    Files.move(tmp2, mp, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Driver-gateable measured recall@k vs the exact answer over this
    * index's own corpus ([[RecallOps.recallGate]]: emits `meets_floor`
    * so a wrong-recall regression FAILS the gate, the r8 discipline).
    */
  def recallGate(queries: DataFrame, k: Int, floor: Double,
                 expectExactPairs: Option[Long] = None): DataFrame =
    RecallOps.recallGate(s"auto_$kind",
      SimilarityOps.bruteForceTopK(corpusFrame, queries, k),
      search(queries, k), Seq("query_id", "corpus_id"),
      floor = floor, expectExactPairs = expectExactPairs)
}

object VectorIndex {

  val Brute = "brute"; val Ivf = "ivf"; val Sq = "sq"
  val IvfPq = "ivfpq"; val Hnsw = "hnsw"

  /** Completed [[VectorIndex.maintain]] calls at `path` (0 when none /
    * not yet created) — the mechanical retrain tag for soak harnesses.
    */
  def maintainCount(path: String): Long = {
    val p = Paths.get(path, "maintains")
    if (!Files.exists(p)) 0L
    else scala.util.Try(
      new String(Files.readAllBytes(p), "UTF-8").trim.toLong).getOrElse(0L)
  }

  /** Mechanical maintenance stamp (r17): the (retrains, rung cell
    * folds) pair. A harness tags a trigger as maintenance-bearing when
    * the PAIR changed across it — pair comparison, not monotone delta,
    * because a retrain swaps in a fresh rung dir whose fold counter
    * restarts at 0 (that same trigger bumps `maintains`, so every
    * change is still observable). Folds are the IVF-family cell-table
    * rewrites ([[IvfIndex.foldCount]]); rungs without a fold concept
    * read 0 on that axis.
    */
  def maintenanceStamp(path: String): (Long, Long) = {
    // resolve the rung dir the way every instance read does (ADVICE
    // r17): during a maintain-swap's crash window the live `idx` is
    // momentarily absent and `idx__old` is the readable fallback —
    // reading the live path directly would silently report 0 folds
    // across that window and mis-tag the harness's trigger
    val idxDir =
      if (Files.exists(Paths.get(s"$path/idx"))) s"$path/idx"
      else if (Files.exists(Paths.get(s"$path/idx__old"))) s"$path/idx__old"
      else s"$path/idx"
    (maintainCount(path), IvfIndex.foldCount(idxDir))
  }

  /** Unified drift summary over the per-rung append reports. */
  final case class AppendSummary(appended: Long, maintenanceRecommended: Boolean)

  /** √n coarse-cell count, clamped to the verified operating range —
    * the standard IVF sizing (probe cost n·nprobe/nlist stays ∝ √n).
    */
  private def nlistFor(n: Long): Int =
    math.min(4096, math.max(16, math.sqrt(n.toDouble).toInt))

  /** Pick the rung for (n rows, d dims) under `profile` — pure,
    * spec-gated directly.
    */
  def selectKind(n: Long, dims: Int, profile: IndexProfile): String =
    if (n <= profile.exactFloor) Brute
    else if (profile.serving) Hnsw
    else if (n * dims * 8 <= profile.memoryBudgetBytes) Ivf
    else if (n * dims <= profile.memoryBudgetBytes) Sq
    else IvfPq

  /** Build + persist the profile-selected index at `path`; reopen with
    * [[load]]. Costs one `count` + one first-row peek to measure the
    * corpus, then the chosen rung's own train+save.
    */
  def build(corpus: DataFrame, path: String, profile: IndexProfile,
            idCol: String = "vec_id", vecCol: String = "embedding"): VectorIndex = {
    val n = corpus.count()
    require(n > 0, "cannot index an empty corpus")
    val dims = corpus.select(size(col(vecCol))).head.getInt(0)
    val kind = selectKind(n, dims, profile)
    Files.createDirectories(Paths.get(path))
    val std = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
    kind match {
      case Brute => std.write.mode("overwrite").parquet(s"$path/corpus")
      case Ivf => IvfIndex.train(std, nlist = nlistFor(n)).save(s"$path/idx")
      case Sq =>
        SqIndex.train(std).save(s"$path/idx")
        std.write.mode("overwrite").parquet(s"$path/corpus")
      case IvfPq =>
        IvfPqIndex.train(std, nlist = nlistFor(n)).save(s"$path/idx")
        std.write.mode("overwrite").parquet(s"$path/corpus")
      case Hnsw => HnswIndex.train(std).save(s"$path/idx")
    }
    writeKind(path, kind, profile)
    new VectorIndex(corpus.sparkSession, path, kind, profile)
  }

  /** Reopen a persisted index: the `kind` marker restores the rung and
    * the operating knobs it was built with. A migration that crashed
    * between staging and commit is rolled forward FIRST (the
    * `kind__new` marker proves the staged dirs are complete), so no
    * reader ever dispatches the old rung against the new rung's files.
    */
  def load(spark: SparkSession, path: String): VectorIndex = {
    commitMigration(path)
    val (kind, profile) = readKindLine(path).getOrElse(
      sys.error(s"no readable kind marker at $path — not a VectorIndex dir"))
    new VectorIndex(spark, path, kind, profile)
  }

  /** Parse the one-line kind marker; None when missing/unreadable. */
  private[ext] def readKindLine(path: String): Option[(String, IndexProfile)] =
    scala.util.Try {
      val line = new String(Files.readAllBytes(Paths.get(s"$path/kind")), "UTF-8").trim
      val fields = line.split('\t')
      val kv = fields.drop(1).map { f =>
        val Array(a, b) = f.split('=')
        a -> b
      }.toMap
      (fields.head, IndexProfile(
        memoryBudgetBytes = kv("budget").toLong,
        serving = kv("serving").toBoolean,
        exactFloor = kv("floor").toLong,
        nprobe = kv("nprobe").toInt,
        shortlist = kv("shortlist").toInt))
    }.toOption

  /** Commit a staged rung migration — idempotent roll-forward, driven
    * entirely by the `kind__new` marker (absent ⇒ no-op; present ⇒
    * staging completed, because [[VectorIndex.stageMigration]] writes
    * it last). Steps, each skipped when a prior run already did it:
    * swap `idx__new`/`corpus__new` in (two-rename, old kept as `__old`
    * so a reader of the OLD kind stays consistent until the marker
    * flips), retire a live dir the new rung doesn't use, flip the kind
    * marker atomically (the commit point), GC the backups, and clear
    * the tombstones (the staged build trained from the purged
    * corpus). A crash anywhere re-runs from [[load]].
    */
  private[ext] def commitMigration(path: String): Unit = {
    val marker = Paths.get(s"$path/kind__new")
    if (!Files.exists(marker)) return
    val newKind = new String(Files.readAllBytes(marker), "UTF-8")
      .trim.split('\t').head
    val needsIdx = newKind != Brute
    val needsCorpus = newKind == Brute || newKind == Sq || newKind == IvfPq
    def swap(liveName: String): Unit = {
      val live = Paths.get(s"$path/$liveName")
      val old = Paths.get(s"$path/${liveName}__old")
      graft.runtime.Fs.deleteRecursive(old)
      if (Files.exists(live)) Files.move(live, old)
      Files.move(Paths.get(s"$path/${liveName}__new"), live)
    }
    def retire(liveName: String): Unit = {
      val live = Paths.get(s"$path/$liveName")
      if (Files.exists(live)) {
        val old = Paths.get(s"$path/${liveName}__old")
        graft.runtime.Fs.deleteRecursive(old)
        Files.move(live, old)
      }
    }
    if (Files.exists(Paths.get(s"$path/idx__new"))) swap("idx")
    else if (!needsIdx) retire("idx")
    if (Files.exists(Paths.get(s"$path/corpus__new"))) swap("corpus")
    else if (!needsCorpus) retire("corpus")
    Files.move(marker, Paths.get(s"$path/kind"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    graft.runtime.Fs.deleteRecursive(Paths.get(s"$path/idx__old"))
    graft.runtime.Fs.deleteRecursive(Paths.get(s"$path/corpus__old"))
    graft.runtime.Fs.deleteRecursive(Paths.get(s"$path/deleted"))
  }

  /** Marker flip via tmp + atomic same-dir rename — the manifest
    * discipline everywhere else in the engine (a reader resolves the
    * old or the new marker, never partial bytes).
    */
  private def writeKind(path: String, kind: String, p: IndexProfile): Unit =
    writeKindFile(path, "kind", kind, p)

  private[ext] def writeKindFile(path: String, fileName: String,
                                 kind: String, p: IndexProfile): Unit = {
    val body = s"$kind\tbudget=${p.memoryBudgetBytes}\tserving=${p.serving}" +
      s"\tfloor=${p.exactFloor}\tnprobe=${p.nprobe}\tshortlist=${p.shortlist}\n"
    val tmp = Paths.get(path, s"${fileName}__tmp_" +
      java.util.UUID.randomUUID().toString.replace("-", ""))
    Files.write(tmp, body.getBytes("UTF-8"))
    Files.move(tmp, Paths.get(path, fileName), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
