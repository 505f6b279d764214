package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Product quantization (Jégou, Douze, Schmid 2011, "Product
  * Quantization for Nearest Neighbor Search", IEEE TPAMI 33(1)) — the
  * memory side of the ANN scale story that IVF's probe pruning doesn't
  * touch: the corpus never holds full vectors at query time, only an
  * m-byte CODE per vector (here m sub-ids in [0, ksub)), so a corpus
  * whose raw embeddings are tens of TB quantizes to a code table a
  * fraction of a percent of that — small enough to keep resident where
  * the flat vectors never could be.
  *
  *   - TRAIN  — split the (L2-normalized) vector into `m` contiguous
  *     subvectors; per subspace, k-means `ksub` sub-centroids on a
  *     driver-side hash-order sample (same determinism recipe as
  *     [[IvfIndex.train]]: sequential driver arithmetic, no distributed
  *     float-sum ordering).
  *   - ENCODE — one distributed map-only pass: each subspace's code is
  *     the argmin-L2 sub-centroid, computed as argmax of
  *     dot(v_j, c) − ½·‖c‖² over literal centroids (codegen-friendly
  *     Column expressions — no UDF, no shuffle).
  *   - SEARCH — asymmetric distance computation: the QUERY keeps its
  *     exact subvectors; each corpus code contributes
  *     Σ_j dot(q_j, codebook[j][code_j]), evaluated from broadcast
  *     literal codebooks against the code column — the corpus-side scan
  *     reads m small ints per row, never the vector. Top-k by the usual
  *     per-query window.
  *
  * Approximation error is the quantization residual; recall is gated in
  * PqIndexSpec against the exact brute-force scorer. Compose with IVF
  * for probe pruning + code-table residency (IVF-PQ) — the cells hold
  * codes instead of `cv`.
  */
final class PqIndex private (
    @transient private val codes: DataFrame,
    val codebooks: Array[Array[Array[Double]]],
    val trainMeanQErr: Double) {

  /** Subspace count (code bytes per vector). */
  def m: Int = codebooks.length

  /** Sub-centroids per subspace. */
  def ksub: Int = codebooks(0).length

  /** (query_id, qv, corpus_id, sim): every query × code ADC score —
    * shared tail of [[topK]] and [[topKRefined]].
    */
  private def adcScores(queries: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val q = SimilarityOps.normalized(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("v").as("qv"))
    codes.join(broadcast(q), col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("qv"), col("corpus_id"),
        PqIndex.adcExpr(col("qv"), col("code"), codebooks).as("sim"))
  }

  private def topPerQuery(scored: DataFrame, k: Int): DataFrame =
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("corpus_id"))))
      .filter(col("rank") <= k)

  /** Approximate top-k neighbors per query vector via ADC alone.
    * Queries stay distributed (broadcast to the code scan); `sim` is
    * the ADC approximation of the cosine dot. Ranking quality is
    * bounded by quantization residual — on near-uniform data (where
    * true neighbors sit barely above the noise floor) use
    * [[topKRefined]].
    */
  def topK(queries: DataFrame, k: Int,
           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    topPerQuery(adcScores(queries, idCol, vecCol), k)
      .select("query_id", "corpus_id", "sim", "rank")

  /** The production PQ pipeline: ADC shortlists `shortlist` candidates
    * per query from the CODE scan, then only those rows are re-ranked
    * with the exact dot against the full vectors. The corpus-wide pass
    * still never touches a vector — the exact join reads
    * |queries|·shortlist full vectors, not N — so the memory story
    * survives while the ranking becomes exact within the shortlist
    * (recall = P(true top-k ⊆ ADC top-shortlist), → 1 as shortlist
    * grows). `corpus` must carry the same ids the index was trained on.
    */
  def topKRefined(queries: DataFrame, corpus: DataFrame, k: Int, shortlist: Int,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val cand = topPerQuery(adcScores(queries, idCol, vecCol), shortlist)
      .select(col("query_id"), col("qv"), col("corpus_id"))
    val cv = SimilarityOps.normalized(corpus, idCol, vecCol)
      .select(col("id").as("corpus_id"), col("v").as("cv"))
    // candidate side is |Q|·shortlist rows BY CONSTRUCTION — broadcast
    // it so the corpus vector lookup is a map-side hash join against the
    // scan, never a corpus-wide shuffle on corpus_id. EXCEPT when the
    // shortlist is effectively unbounded (the exact/oracle mode passes
    // Int.MaxValue): the candidate side is then |Q|·N rows each carrying
    // a full query vector, and forcing THAT broadcast is a driver OOM on
    // a real corpus — drop the hint and let the planner choose.
    val candSide =
      if (shortlist <= PqIndex.maxBroadcastShortlist) broadcast(cand) else cand
    val exact = cv.join(candSide, Seq("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        SimilarityOps.dotFast(col("qv"), col("cv")).as("sim"))
    topPerQuery(exact, k).select("query_id", "corpus_id", "sim", "rank")
  }

  /** The code table (corpus_id, code array<int>) — diagnostics/spec seam. */
  private[ext] def codeTable: DataFrame = codes

  /** Persist the encode (code parquet + codebook table); reopen with
    * [[PqIndex.load]]. The saved code table IS the index at scale —
    * m small ints per corpus row — so probes read it instead of
    * re-encoding the corpus per action.
    */
  def save(path: String): Unit = {
    val spark = codes.sparkSession
    codes.write.mode("overwrite").parquet(s"$path/codes")
    import spark.implicits._
    codebooks.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (c, i) => (j, i, c.toSeq) }
    }.toSeq.toDF("subspace", "cidx", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    // maintenance meta: the training-SAMPLE mean quantization error —
    // the drift baseline PqIndex.append measures against (driver
    // arithmetic over the already-collected sample; no extra job)
    Seq(trainMeanQErr).toDF("train_mean_qerr")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }
}

object PqIndex {

  /** Largest per-query shortlist for which [[PqIndex.topKRefined]] still
    * force-broadcasts the candidate side: beyond this the "small by
    * construction" premise no longer holds (see the join-site comment).
    */
  private[ext] val maxBroadcastShortlist = 4096

  /** argmax_c dot(v_j, c) − ½‖c‖² == argmin_c ‖v_j − c‖² (the ‖v_j‖²
    * term is constant per row); struct ordering compares sim first.
    */
  private def subCode(sub: Column, book: Array[Array[Double]]): Column =
    array_max(array(book.zipWithIndex.map { case (c, i) =>
      val bias = c.map(x => x * x).sum / 2
      // typedLit: one literal node per centroid, not a dsub CreateArray
      struct((SimilarityOps.dotFast(sub, typedLit(c.toSeq)) - lit(bias)).as("sim"),
        lit(i).as("idx"))
    }: _*)).getField("idx")

  /** Per-subspace L2 Lloyd over a driver-side sample → [m][ksub][dsub]
    * codebooks. Shared by [[PqIndex.train]] (raw vectors) and
    * [[IvfPqIndex.train]] (cell residuals). Deterministic: sequential
    * driver arithmetic over a deterministic sample.
    */
  private[ext] def lloydBooks(sample: Array[Array[Double]], m: Int, ksub: Int,
                              lloydIters: Int): Array[Array[Array[Double]]] = {
    require(sample.nonEmpty, "PQ training requires a non-empty sample")
    val dims = sample(0).length
    require(dims % m == 0, s"dims $dims must divide into m=$m subspaces")
    val dsub = dims / m
    (0 until m).toArray.map { j =>
      val subs = sample.map(v => v.slice(j * dsub, (j + 1) * dsub))
      // distinct by CONTENT (Array equality is referential)
      var centers = subs.map(_.toSeq).distinct.map(_.toArray).take(ksub) match {
        // degenerate subspace (fewer distinct subvectors than ksub):
        // pad with the first so every code id stays valid
        case few if few.length < ksub =>
          few ++ Array.fill(ksub - few.length)(few.head)
        case full => full
      }
      for (_ <- 1 to lloydIters) {
        val sums = Array.fill(ksub)(new Array[Double](dsub))
        val counts = new Array[Long](ksub)
        subs.foreach { v =>
          var best = 0; var bestD = Double.MaxValue
          var ci = 0
          while (ci < ksub) {
            val ctr = centers(ci)
            var d = 0.0; var i = 0
            while (i < dsub) { val t = v(i) - ctr(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = ci }
            ci += 1
          }
          val s = sums(best); var i = 0
          while (i < dsub) { s(i) += v(i); i += 1 }
          counts(best) += 1
        }
        centers = centers.zipWithIndex.map { case (old, ci) =>
          if (counts(ci) == 0) old else sums(ci).map(_ / counts(ci))
        }
      }
      centers
    }
  }

  /** The m-subcode encode column for a vector column. */
  private[ext] def encodeExpr(vCol: Column,
                              books: Array[Array[Array[Double]]]): Column = {
    val dsub = books(0)(0).length
    array(books.indices.map { j =>
      subCode(slice(vCol, j * dsub + 1, dsub), books(j))
    }: _*)
  }

  /** Per-row total quantization error Σ_j min_c ‖v_j − c‖², from the
    * same biased sims [[subCode]] ranks on: min‖v_j − c‖² =
    * ‖v_j‖² − 2·max_c(dot − ½‖c‖²). The drift signal [[append]]
    * watches — codebooks that stop describing the data quantize it
    * with visibly more energy.
    */
  private[ext] def qErrExpr(vCol: Column,
                            books: Array[Array[Array[Double]]]): Column = {
    val dsub = books(0)(0).length
    books.indices.map { j =>
      val sub = slice(vCol, j * dsub + 1, dsub)
      val bestBiased = array_max(array(books(j).zipWithIndex.map { case (c, i) =>
        val bias = c.map(x => x * x).sum / 2
        struct((SimilarityOps.dotFast(sub, typedLit(c.toSeq)) - lit(bias)).as("sim"),
          lit(i).as("idx"))
      }: _*)).getField("sim")
      SimilarityOps.dotFast(sub, sub) - lit(2.0) * bestBiased
    }.reduce(_ + _)
  }

  /** Maintenance report from [[append]]: quantization error of the
    * appended batch vs the training-time baseline the save stamped.
    */
  final case class AppendReport(appended: Long, batchMeanQErr: Double,
      trainMeanQErr: Double, retrainRecommended: Boolean)

  /** Incrementally extend a PERSISTED index: encode `batch` with the
    * EXISTING codebooks (map-only, O(batch) — the corpus is never
    * re-encoded) and append the codes. `retrainRecommended` fires when
    * the batch's mean quantization error exceeds `maxQErrGrowth` × the
    * training baseline — the codebooks were fit to a distribution the
    * new data has left. Ids unique across index ∪ batch; single-writer
    * per index dir.
    */
  def append(spark: org.apache.spark.sql.SparkSession, path: String,
             batch: DataFrame,
             idCol: String = "vec_id", vecCol: String = "embedding",
             maxQErrGrowth: Double = 1.5): AppendReport = {
    val idx = load(spark, path)
    val c = SimilarityOps.normalized(batch, idCol, vecCol)
    c.cache()
    try {
      val m = c.agg(count(lit(1)).as("n"),
          avg(qErrExpr(col("v"), idx.codebooks)).as("qe"))
        .collect().head
      val appended = m.getLong(0)
      val qe = if (m.isNullAt(1)) 0.0 else m.getDouble(1)
      if (appended > 0L)
        c.select(col("id").as("corpus_id"),
            encodeExpr(col("v"), idx.codebooks).as("code"))
          .write.mode("append").parquet(s"$path/codes")
      val base = idx.trainMeanQErr
      AppendReport(appended, qe, base,
        retrainRecommended = appended > 0L && qe > base * maxQErrGrowth)
    } finally c.unpersist()
  }

  /** The ADC score column: Σ_j dot(qv_j, book_j[code_j]) for a query
    * vector column against a code column.
    */
  private[ext] def adcExpr(qvCol: Column, codeCol: Column,
                           books: Array[Array[Array[Double]]]): Column = {
    val dsub = books(0)(0).length
    books.indices.map { j =>
      val sub = slice(qvCol, j * dsub + 1, dsub)
      // ONE literal node per codebook (array<array<double>>), not a
      // ksub·dsub CreateArray tree — keeps the ADC expression small
      // enough for whole-stage codegen
      val book = typedLit(books(j).map(_.toSeq).toSeq)
      SimilarityOps.dotFast(sub, element_at(book, codeCol.getItem(j) + 1))
    }.reduce(_ + _)
  }

  /** Train codebooks on a driver-side hash-order sample and encode the
    * corpus in one distributed pass. `dims` must divide evenly into `m`
    * subspaces. Per-subspace k-means is plain L2 Lloyd (PQ quantizes
    * residual energy; the vectors are L2-normalized once up front so ADC
    * dots approximate cosine).
    */
  def train(corpus: DataFrame, m: Int = 8, ksub: Int = 16,
            idCol: String = "vec_id", vecCol: String = "embedding",
            lloydIters: Int = 4, trainSampleSize: Int = 2048): PqIndex = {
    val c = SimilarityOps.normalized(corpus, idCol, vecCol)
    val sample: Array[Array[Double]] = c
      .orderBy(xxhash64(col("id").cast("string")))
      .limit(math.max(ksub, trainSampleSize))
      .collect()
      .map(_.getSeq[Double](1).toArray)
    val codebooks = lloydBooks(sample, m, ksub, lloydIters)
    new PqIndex(
      c.select(col("id").as("corpus_id"),
        encodeExpr(col("v"), codebooks).as("code")), codebooks,
      sampleMeanQErr(sample, codebooks))
  }

  /** Mean Σ_j min_c ‖v_j − c‖² over a driver-side sample — the
    * train-time drift baseline (sequential arithmetic, deterministic).
    */
  private[ext] def sampleMeanQErr(sample: Array[Array[Double]],
                                  books: Array[Array[Array[Double]]]): Double = {
    val dsub = books(0)(0).length
    val per = sample.map { v =>
      books.indices.map { j =>
        val sub = v.slice(j * dsub, (j + 1) * dsub)
        books(j).map { c =>
          var d = 0.0; var i = 0
          while (i < sub.length) { val t = sub(i) - c(i); d += t * t; i += 1 }
          d
        }.min
      }.sum
    }
    if (per.isEmpty) 0.0 else per.sum / per.length
  }

  /** Reopen a persisted index: codebooks are driver-collected (m·ksub
    * rows), the code table is the parquet scan — no re-encode.
    */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): PqIndex = {
    graft.functions.VectorFunctions.register(spark)
    val books = spark.read.parquet(s"$path/codebooks")
      .collect()
      .map(r => (r.getInt(r.fieldIndex("subspace")), r.getInt(r.fieldIndex("cidx")),
        r.getSeq[Double](r.fieldIndex("centroid"))))
      .groupBy(_._1).toArray.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3.toArray))
    // meta is absent on pre-maintenance saves: NaN disables the drift
    // comparison (append still works; retrain never fires on NaN)
    val baseline =
      try spark.read.parquet(s"$path/meta").collect().head.getDouble(0)
      catch { case _: Exception => Double.NaN }
    new PqIndex(spark.read.parquet(s"$path/codes"), books, baseline)
  }
}
