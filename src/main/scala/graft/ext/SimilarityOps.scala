package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Vector-similarity operators over embedding columns
  * (`embeddings.embedding: array<float>[64]`, FIXTURES.md §B).
  *
  * Brute-force paths are the correctness oracle; the sign-LSH path is
  * the 100 TB design: signatures are map-only, candidates come from
  * equality joins on bucket keys (shuffle by bucket), and only
  * candidates pay the full cosine. Everything is double arithmetic in
  * plain Column expressions (codegen'd; no UDF in the hot path).
  */
object SimilarityOps {

  /** Sequential-fold dot product (matches single-threaded oracle
    * summation order bit-for-bit on doubles).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity of two array<double> columns. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** All pairs (a < b) with cosine ≥ threshold — exact O(n²) baseline.
    * Right side broadcast: the pair generation never shuffles the rows,
    * only replicates one side (usable when one side fits in memory; at
    * scale use `lshCosinePairs`).
    */
  def cosinePairs(embs: DataFrame, threshold: Double,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val e = embs.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    e.as("a").join(broadcast(e.as("b")), col("a.id") < col("b.id"))
      .select(col("a.id").as("vec_a"), col("b.id").as("vec_b"),
        cosine(col("a.v"), col("b.v")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Exact top-k neighbors per query vector (brute force): broadcast the
    * query set against the corpus, window-rank per query. Deterministic
    * tie-break on neighbor id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), asDouble(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("qv"), col("cv")).as("sim"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("corpus_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "sim", "rank")
  }

  // ---- sign-random-projection LSH -----------------------------------------

  /** Deterministic pseudo-random hyperplane weight for (table, plane,
    * dim) — an LCG over the index, no RNG state.
    */
  private def weight(index: Long): Double = {
    val x = index * 6364136223846793005L + 1442695040888963407L
    ((x >>> 11).toDouble / (1L << 53).toDouble) - 0.5
  }

  /** Bucket key for one LSH table: the sign-bit string of
    * `planesPerTable` hyperplane projections.
    */
  private def bucketKey(v: Column, table: Int, planesPerTable: Int, dims: Int): Column = {
    val bits = (0 until planesPerTable).map { p =>
      val plane = array((0 until dims).map(d =>
        lit(weight((table.toLong * 64 + p) * 1024 + d))): _*)
      when(dot(v, plane) >= 0, "1").otherwise("0")
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
    val e = embs.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val keyed = e.select(col("id"), col("v"),
      posexplode(array((0 until tables).map(t =>
        concat(lit(s"$t:"), bucketKey(col("v"), t, planesPerTable, dims))): _*)))
      .withColumnRenamed("col", "bucket")
    val cand = keyed.as("a").join(keyed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("vec_a"), col("b.id").as("vec_b"),
        col("a.v").as("va"), col("b.v").as("vb"))
      .distinct()
    cand.select(col("vec_a"), col("vec_b"), cosine(col("va"), col("vb")).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
