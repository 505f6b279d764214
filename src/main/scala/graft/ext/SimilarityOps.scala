package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** [EXT] Vector-similarity operators over embedding columns
  * (`embeddings.embedding: array<float>[64]`, FIXTURES.md §B).
  *
  * Brute-force paths are the correctness oracle; the sign-LSH path is
  * the 100 TB design: signatures are map-only, candidates come from
  * equality joins on bucket keys (shuffle by bucket), and only
  * candidates pay the full cosine.
  *
  * Performance shape (measured at sf0.1, 2000 vectors → 2M pairs):
  * higher-order `aggregate`/`zip_with` lambdas are NOT whole-stage
  * codegen'd (interpreted per element — 67 s for the pair scan), and
  * unrolling 64 `element_at` terms bloats the tree until planning +
  * codegen dominate (110 s). Hot paths therefore use the native
  * `VecDot` Catalyst expression (graft.functions) — one primitive loop
  * per pair — and pre-normalize each vector ONCE so every pair costs a
  * single dot product instead of three.
  */
object SimilarityOps {

  /** Sequential-fold dot product for dynamic-width arrays (general form;
    * interpreted — use `dotFast` on hot paths).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Hot-path dot product: the native codegen'd VecDot expression. */
  def dotFast(a: Column, b: Column): Column = VectorFunctions.vecDot(a, b)

  /** Cosine similarity of two array<double> columns (dynamic width). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** (id, v) with v L2-normalized in double — cosine becomes a plain dot
    * product. Normalization is O(n) and off the pairwise hot path.
    */
  private[ext] def normalized(embs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    VectorFunctions.register(embs.sparkSession)
    embs.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v0"))
      .withColumn("nrm", sqrt(dotFast(col("v0"), col("v0"))))
      .select(col("id"), transform(col("v0"), x => x / col("nrm")).as("v"))
  }

  /** All pairs (a < b) with cosine ≥ threshold — exact O(n²) baseline.
    * The right side is broadcast, so the pair generation replicates one
    * side and never shuffles the big side. CONSTRAINT: the whole
    * (normalized) corpus must fit in Spark's broadcast limit (~8 GB hard
    * cap, executor memory in practice — ≈ low millions of 64-dim
    * vectors); this op is the declared oracle baseline for the
    * bucketed paths, not a scale path — at scale use `lshCosinePairs`.
    */
  def cosinePairs(embs: DataFrame, threshold: Double,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val e = normalized(embs, idCol, vecCol)
    e.as("a").join(broadcast(e.as("b")), col("a.id") < col("b.id"))
      .select(col("a.id").as("vec_a"), col("b.id").as("vec_b"),
        dotFast(col("a.v"), col("b.v")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** SemDeDup-style semantic near-dup pairs (Abbas et al. 2023,
    * arXiv:2303.09540): k-means-cluster the embeddings (the IvfIndex
    * quantizer — deterministic driver-side Lloyd on a hash-order
    * sample), then compare pairs ONLY within a cluster. Replaces the
    * O(n²) all-pairs with O(Σ|cell|²) — at 100 TB the cells are the
    * only thing that ever meets itself in a join, and the cell id is
    * the shuffle key, so a balanced quantizer bounds every task.
    * Same (vec_a, vec_b, sim) shape as [[cosinePairs]]; recall is
    * bounded by P(near-dup pair shares a cell) — ≈ 1 for true semantic
    * duplicates (which quantize together by construction), lower for
    * borderline pairs straddling a cell boundary (the accepted
    * SemDeDup trade; raise nlist for cost, lower it for recall).
    */
  def semanticNearDupPairs(embs: DataFrame, threshold: Double, nlist: Int = 16,
                           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cells = IvfIndex.train(embs, nlist, idCol, vecCol).assignments
    cells.as("a").join(cells.as("b"),
        col("a.cid") === col("b.cid") && col("a.corpus_id") < col("b.corpus_id"))
      .select(col("a.corpus_id").as("vec_a"), col("b.corpus_id").as("vec_b"),
        dotFast(col("a.cv"), col("b.cv")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Exact top-k neighbors per query vector (brute force): broadcast the
    * normalized query set against the corpus, window-rank per query.
    * Deterministic tie-break on neighbor id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = normalized(corpus, idCol, vecCol)
      .withColumnRenamed("id", "corpus_id").withColumnRenamed("v", "cv")
    val q = normalized(queries, idCol, vecCol)
      .withColumnRenamed("id", "query_id").withColumnRenamed("v", "qv")
    val scored = c.join(broadcast(q), col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        dotFast(col("qv"), col("cv")).as("sim"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("corpus_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "sim", "rank")
  }

  // ---- sign-random-projection LSH -----------------------------------------

  /** Deterministic pseudo-random hyperplane weight for (table, plane,
    * dim): splitmix64 finalizer over the index — a single LCG multiply
    * is NOT enough here (consecutive indices stay correlated, measured
    * cos ≈ 0.6 between "independent" planes; the two xorshift-multiply
    * rounds decorrelate them).
    */
  private def weight(index: Long): Double = {
    var z = index + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    ((z >>> 11).toDouble / (1L << 53).toDouble) - 0.5
  }

  /** Bucket key for one LSH table: the sign-bit string of
    * `planesPerTable` hyperplane projections. Plane vectors are literal
    * arrays — constant-folded once, then each projection is one VecDot.
    */
  private def bucketKey(v: Column, table: Int, planesPerTable: Int, dims: Int): Column = {
    val bits = (0 until planesPerTable).map { p =>
      val plane = array((0 until dims).map(d =>
        lit(weight((table.toLong * 64 + p) * 1024 + d))): _*)
      when(dotFast(v, plane) >= 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }

  /** Candidate generation + exact verify: pairs sharing a bucket in ANY
    * of `tables` sign-LSH tables, filtered to cosine ≥ threshold.
    * Precision is 1.0 vs `cosinePairs`; recall is 1-(1-p^planes)^tables
    * with p = 1 - angle/π — tune tables/planes to the target similarity
    * band (near-dup bands ≥0.9 are caught with few tables; low bands
    * need more).
    */
  def lshCosinePairs(embs: DataFrame, threshold: Double,
                     tables: Int = 4, planesPerTable: Int = 8, dims: Int = 64,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val e = normalized(embs, idCol, vecCol)
    // Candidate generation runs over (id, bucket) ONLY: the bucket-join
    // shuffle and the dedup shuffle both carry ~16 bytes/row instead of the
    // 64-dim vectors (~1 KB/row); vectors re-attach to the (much smaller)
    // deduped candidate set for the exact verify.
    val keyed = e.select(col("id"),
      explode(array((0 until tables).map(t =>
        concat(lit(s"$t:"), bucketKey(col("v"), t, planesPerTable, dims))): _*)).as("bucket"))
    val candIds = keyed.as("a").join(keyed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("vec_a"), col("b.id").as("vec_b"))
      .distinct()
    candIds
      .join(e.select(col("id").as("vec_a"), col("v").as("va")), "vec_a")
      .join(e.select(col("id").as("vec_b"), col("v").as("vb")), "vec_b")
      .select(col("vec_a"), col("vec_b"), dotFast(col("va"), col("vb")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  // ---- IVF-Flat ------------------------------------------------------------

  /** IVF-Flat approximate top-k, ad-hoc form: trains the coarse
    * quantizer inline and probes immediately — see [[IvfIndex]] for the
    * full lifecycle (train once → persist the cid-partitioned index →
    * probe repeatedly with no corpus reshuffle), which is the 100 TB
    * path. This wrapper exists for one-shot queries and the oracle gate.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    IvfIndex.train(corpus, nlist, idCol, vecCol)
      .topK(queries, k, nprobe, idCol, vecCol)
}
