package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] IVF-PQ — the full Jégou et al. 2011 composition and the shape
  * a 100 TB ANN deployment actually runs: IVF's coarse quantizer prunes
  * the SCAN (only nprobe of nlist cells are read, and the cell id is a
  * parquet partition key, so unprobed cells' files are skipped), while
  * PQ compresses what remains — each cell holds m-byte codes of the
  * RESIDUAL v − c(cell), not vectors. Search reads
  * O(N·nprobe/nlist) rows of m small ints; full vectors appear only in
  * the optional shortlist re-rank.
  *
  * Residual encoding (vs [[PqIndex]]'s raw encoding) is what makes the
  * composition pay WHEN the coarse quantizer captures structure: within
  * a tight cell the residuals live in a small ball around the centroid
  * — far less energy than raw vectors — so the same ksub^m code space
  * quantizes much finer (IvfPqSpec measures the reconstruction-error
  * win on clustered data). The honest flip side, also spec-pinned: on
  * STRUCTURELESS (near-uniform) data the cells are wide, ‖v − c‖² ≈
  * 2 − 2·(v·c) can exceed the unit energy of v itself, and raw PQ
  * encodes tighter — residual encoding is a bet on the data having
  * clusters, which real embedding corpora do. The ADC score recombines
  * exactly: cos(q, v) = q·c(cell) + q·r ≈ q·c(cell) + q·r̂, and the
  * q·c(cell) term is ALREADY computed per (query, cell) by the probe
  * selection — it rides along for free.
  *
  * Train reuses both quantizers' deterministic driver-side recipes:
  * [[IvfIndex.train]] for cells, [[PqIndex.lloydBooks]] on a hash-order
  * residual sample for codebooks.
  */
final class IvfPqIndex private (
    @transient private val codes: DataFrame,
    val centroids: Array[(Int, Seq[Double])],
    val codebooks: Array[Array[Array[Double]]],
    val trainMeanQErr: Double) {

  /** Number of coarse cells. */
  def nlist: Int = centroids.length

  /** Subspace count (code bytes per vector). */
  def m: Int = codebooks.length

  private def topPerQuery(scored: DataFrame, k: Int): DataFrame =
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("corpus_id"))))
      .filter(col("rank") <= k)

  /** (query_id, qv, corpus_id, sim): residual-ADC scores over the
    * probed cells only. The probe frame (|Q|·nprobe rows + the running
    * q·centroid term) broadcasts to the cell-partitioned code scan.
    */
  private def adcScores(queries: DataFrame, nprobe: Int,
                        idCol: String, vecCol: String): DataFrame = {
    val q = SimilarityOps.normalized(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("v").as("qv"))
    val probes = q.select(col("query_id"), col("qv"),
        explode(slice(sort_array(
          IvfIndex.cellScores(col("qv"), centroids), asc = false), 1, nprobe)).as("p"))
      .select(col("query_id"), col("qv"),
        col("p.cid").as("cid"), col("p.sim").as("csim"))
    codes.join(broadcast(probes), Seq("cid"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("qv"), col("corpus_id"),
        (col("csim") + PqIndex.adcExpr(col("qv"), col("code"), codebooks)).as("sim"))
  }

  /** Approximate top-k via residual ADC over `nprobe` cells. */
  def topK(queries: DataFrame, k: Int, nprobe: Int,
           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    topPerQuery(adcScores(queries, nprobe, idCol, vecCol), k)
      .select("query_id", "corpus_id", "sim", "rank")

  /** The production pipeline: probe `nprobe` cells, ADC-shortlist from
    * the code scan, exact re-rank of |Q|·shortlist full vectors. At
    * nprobe = nlist with an unbounded shortlist this is EXACT (every
    * candidate re-ranked with the true dot).
    */
  def topKRefined(queries: DataFrame, corpus: DataFrame, k: Int,
                  nprobe: Int, shortlist: Int,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val cand = topPerQuery(adcScores(queries, nprobe, idCol, vecCol), shortlist)
      .select(col("query_id"), col("qv"), col("corpus_id"))
    val cv = SimilarityOps.normalized(corpus, idCol, vecCol)
      .select(col("id").as("corpus_id"), col("v").as("cv"))
    // candidate side is |Q|·shortlist rows by construction — broadcast,
    // except in unbounded-shortlist exact mode (same OOM guard and cap
    // as PqIndex.topKRefined)
    val candSide =
      if (shortlist <= PqIndex.maxBroadcastShortlist) broadcast(cand) else cand
    val exact = cv.join(candSide, Seq("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        SimilarityOps.dotFast(col("qv"), col("cv")).as("sim"))
    topPerQuery(exact, k).select("query_id", "corpus_id", "sim", "rank")
  }

  /** Persist (cid-partitioned codes + centroid + codebook tables);
    * reopen with [[IvfPqIndex.load]]. Partitioning by cell id gives the
    * probe's dynamic partition pruning a file boundary to skip on.
    */
  def save(path: String): Unit = {
    val spark = codes.sparkSession
    codes.write.mode("overwrite").partitionBy("cid").parquet(s"$path/codes")
    import spark.implicits._
    centroids.toSeq.toDF("cid", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    codebooks.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (c, i) => (j, i, c.toSeq) }
    }.toSeq.toDF("subspace", "cidx", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    // maintenance meta: training-sample mean RESIDUAL quantization
    // error — IvfPqIndex.append's drift baseline
    Seq(trainMeanQErr).toDF("train_mean_qerr")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** The code table (cid, corpus_id, code) — diagnostics/spec seam. */
  private[ext] def codeTable: DataFrame = codes
}

object IvfPqIndex {

  /** Train both quantizers off one normalized pass: IVF cells first,
    * then per-subspace Lloyd codebooks on a hash-order sample of the
    * CELL RESIDUALS, then one distributed encode pass.
    */
  def train(corpus: DataFrame, nlist: Int = 16, m: Int = 8, ksub: Int = 16,
            idCol: String = "vec_id", vecCol: String = "embedding",
            lloydIters: Int = 4, trainSampleSize: Int = 2048): IvfPqIndex = {
    val ivf = IvfIndex.train(corpus, nlist, idCol, vecCol)
    // centroid lookup as ONE literal (ordered by cid — train emits
    // consecutive ids 0..nlist-1)
    val centroidLit = typedLit(ivf.centroids.sortBy(_._1).map(_._2))
    val resid = ivf.assignments.withColumn("r",
      zip_with(col("cv"), element_at(centroidLit, col("cid") + 1), (a, b) => a - b))
    val sample: Array[Array[Double]] = resid
      .orderBy(xxhash64(col("corpus_id").cast("string")))
      .limit(math.max(ksub, trainSampleSize))
      .select("r").collect().map(_.getSeq[Double](0).toArray)
    val books = PqIndex.lloydBooks(sample, m, ksub, lloydIters)
    new IvfPqIndex(
      resid.select(col("cid"), col("corpus_id"),
        PqIndex.encodeExpr(col("r"), books).as("code")),
      ivf.centroids, books, PqIndex.sampleMeanQErr(sample, books))
  }

  /** Maintenance report from [[append]]: residual quantization error of
    * the appended batch vs the training baseline, plus the coarse-cell
    * cosine drop [[IvfIndex.append]] also watches — IVF-PQ drifts when
    * EITHER quantizer stops describing the data.
    */
  final case class AppendReport(appended: Long, batchMeanQErr: Double,
      trainMeanQErr: Double, batchMeanCellSim: Double,
      retrainRecommended: Boolean)

  /** Incrementally extend a PERSISTED index: assign `batch` to the
    * existing cells, PQ-encode each vector's residual with the existing
    * codebooks (all map-only, O(batch)), append to the cid-partitioned
    * code table. `retrainRecommended` fires when the batch's mean
    * residual quantization error exceeds `maxQErrGrowth` x the training
    * baseline. Ids unique across index ∪ batch; single-writer per
    * index dir.
    */
  def append(spark: SparkSession, path: String, batch: DataFrame,
             idCol: String = "vec_id", vecCol: String = "embedding",
             maxQErrGrowth: Double = 1.5): AppendReport = {
    val idx = load(spark, path)
    val centroidLit = typedLit(idx.centroids.sortBy(_._1).map(_._2))
    val assigned = SimilarityOps.normalized(batch, idCol, vecCol)
      .withColumn("__best", array_max(IvfIndex.cellScores(col("v"), idx.centroids)))
      .select(col("__best").getField("cid").as("cid"),
        col("id").as("corpus_id"),
        col("__best").getField("sim").as("__csim"),
        zip_with(col("v"), element_at(centroidLit, col("__best").getField("cid") + 1),
          (a, b) => a - b).as("r"))
    assigned.cache()
    try {
      val m = assigned.agg(count(lit(1)).as("n"),
          avg(PqIndex.qErrExpr(col("r"), idx.codebooks)).as("qe"),
          avg(col("__csim")).as("cs"))
        .collect().head
      val appended = m.getLong(0)
      val qe = if (m.isNullAt(1)) 0.0 else m.getDouble(1)
      val cs = if (m.isNullAt(2)) 0.0 else m.getDouble(2)
      if (appended > 0L)
        assigned.select(col("cid"), col("corpus_id"),
            PqIndex.encodeExpr(col("r"), idx.codebooks).as("code"))
          .write.mode("append").partitionBy("cid").parquet(s"$path/codes")
      AppendReport(appended, qe, idx.trainMeanQErr, cs,
        retrainRecommended = appended > 0L && qe > idx.trainMeanQErr * maxQErrGrowth)
    } finally assigned.unpersist()
  }

  /** Reopen a persisted index. */
  def load(spark: SparkSession, path: String): IvfPqIndex = {
    graft.functions.VectorFunctions.register(spark)
    val centroids = spark.read.parquet(s"$path/centroids")
      .collect()
      .map(r => (r.getInt(r.fieldIndex("cid")),
        r.getSeq[Double](r.fieldIndex("centroid"))))
      .sortBy(_._1)
    val books = spark.read.parquet(s"$path/codebooks")
      .collect()
      .map(r => (r.getInt(r.fieldIndex("subspace")), r.getInt(r.fieldIndex("cidx")),
        r.getSeq[Double](r.fieldIndex("centroid"))))
      .groupBy(_._1).toArray.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3.toArray))
    val codes = spark.read.parquet(s"$path/codes")
      .select(col("cid").cast("int").as("cid"), col("corpus_id"), col("code"))
    val baseline =
      try spark.read.parquet(s"$path/meta").collect().head.getDouble(0)
      catch { case _: Exception => Double.NaN }
    new IvfPqIndex(codes, centroids, books, baseline)
  }
}
