package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Corpus-likelihood quality scoring — the CCNet/KenLM-style
  * filter in miniature: score each document by how typical its
  * character n-grams are of a REFERENCE corpus, and filter the tail.
  * This is the standard "does it look like language X" quality pass a
  * training pipeline runs after rule-based signals (TextOps.qualityScore)
  * and before expensive model-based ones.
  *
  * Model, stated honestly: an add-one-smoothed UNIGRAM model over
  * character trigrams — P(t) = (C(t)+1) / (N+V+1), score = mean ln P
  * over a doc's trigram instances — not a conditional KenLM. The shape
  * of the pipeline (train counts on a slice, broadcast, score the
  * corpus map-side) is identical; swapping in conditional probabilities
  * changes only the count tables.
  *
  * Scale: the model is a (trigram, count) table bounded by charset³ —
  * broadcast; scoring is explode → broadcast join → per-doc mean, one
  * doc-keyed shuffle. The two model scalars (N total instances, V
  * distinct trigrams) are driver-side metadata aggregates (the
  * watermark-read pattern). Trigrams are built from a PRE-PROJECTED
  * normalized column — the lambda-capture rule (see DedupOps.shingles).
  *
  * Determinism: per-doc mean of a few hundred doubles reorders at
  * ~1e-14 relative — far inside the oracle comparator's 1e-9 — and ln
  * differs across engines by ≤ 1 ulp per value; both safe because no
  * ranking depends on float ordering here.
  */
object LmOps {

  private def trigramsOf(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    // trigram exploding is per-row-heavy over a narrow frame; fan a
    // sub-split scan out by doc_id so scoring parallelizes and the
    // per-doc aggregate reuses the exchange (no-op on wide scans)
    graft.runtime.Parallelize.fanOut(
      docs.select(col(idCol).as("doc_id"), TextOps.normalizeWs(col(textCol)).as("__t")),
      col("doc_id"))
      .select(col("doc_id"),
        explode(when(length(col("__t")) >= 3,
            transform(sequence(lit(1), length(col("__t")) - 2),
              i => col("__t").substr(i, lit(3))))
          .otherwise(array().cast("array<string>"))).as("t"))

  /** CONDITIONAL upgrade of [[trigramLogLikelihood]]: score = mean
    * ln P(c₃ | c₁c₂) with P = (C₃(c₁c₂c₃)+1) / (C₂(c₁c₂)+V), where the
    * context counts C₂ are the PREFIX MARGINAL of the trigram table
    * (Σ_c C₃(c₁c₂·) — a proper distribution by construction) and V is
    * the next-char vocabulary (distinct third characters in the
    * reference trigrams). It scores whether a character is LIKELY GIVEN
    * ITS CONTEXT rather than whether a trigram is common overall, so a
    * fluent doc's score approaches ln(1) = 0 — a calibration the unigram
    * form (ceiling ln(c_max/N)) cannot offer — and violating a COMMON
    * context is punished by its full 1/(C₂+V) mass where the unigram
    * form charges every unseen trigram the same flat 1/(N+V+1).
    * (A doc of wholly-unseen contexts decays to the milder 1/V floor —
    * the two forms are complements, not a strict ordering; LmOpsSpec
    * pins both behaviors.)
    *
    * Same broadcast shape as the unigram model: ONE reference collect
    * (charset³-bounded), prefix table and V derived locally from it;
    * scoring is two broadcast joins (trigram + context) on the map side
    * of a single doc-keyed shuffle. Same determinism envelope.
    */
  def conditionalTrigramLogLikelihood(docs: DataFrame, reference: DataFrame,
                                      textCol: String = "text",
                                      idCol: String = "doc_id"): DataFrame = {
    val model: Array[(String, Long)] = trigramsOf(reference, textCol, idCol)
      .groupBy("t").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    require(model.nonEmpty, "reference corpus yields no trigrams")
    // split by CODEPOINTS, not Java chars: the trigrams are 3 codepoints
    // (Spark substr semantics) but 3-6 UTF-16 units — String.substring(0,2)
    // on a supplementary-plane char would key the context as half a
    // surrogate pair and diverge from the scoring side's substr(1, 2)
    def prefixOf(t: String): String = t.substring(0, t.offsetByCodePoints(0, 2))
    def lastOf(t: String): String = t.substring(t.offsetByCodePoints(0, 2))
    val prefixCounts: Seq[(String, Long)] =
      model.groupBy(p => prefixOf(p._1)).view.mapValues(_.map(_._2).sum).toSeq
    val v = model.map(p => lastOf(p._1)).distinct.length.toLong
    val session = docs.sparkSession
    import session.implicits._
    val tri = model.toSeq.toDF("t", "c3")
    val pre = prefixCounts.toDF("p", "cp")
    trigramsOf(docs, textCol, idCol)
      .withColumn("p", col("t").substr(1, 2))
      .join(broadcast(tri), Seq("t"), "left")
      .join(broadcast(pre), Seq("p"), "left")
      .select(col("doc_id"),
        log((coalesce(col("c3"), lit(0L)) + 1).cast("double") /
          (coalesce(col("cp"), lit(0L)) + v)).as("lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"), avg(col("lp")).as("logprob"))
  }

  /** Per-document mean log-likelihood under the reference corpus's
    * trigram distribution: (doc_id, n_trigrams, logprob). Docs shorter
    * than 3 normalized chars have no trigrams and are absent.
    */
  def trigramLogLikelihood(docs: DataFrame, reference: DataFrame,
                           textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // collect the model ONCE (it must fit in a broadcast anyway) and
    // derive N/V locally — computing them with a second aggregate job
    // would re-run the whole reference normalize→explode→count pipeline
    val model: Array[(String, Long)] = trigramsOf(reference, textCol, idCol)
      .groupBy("t").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = model.map(_._2).sum
    val v = model.length.toLong
    val session = docs.sparkSession
    import session.implicits._
    val refCounts = model.toSeq.toDF("t", "c")
    trigramsOf(docs, textCol, idCol)
      .join(broadcast(refCounts), Seq("t"), "left")
      .select(col("doc_id"),
        log((coalesce(col("c"), lit(0L)) + 1).cast("double") / (n + v + 1)).as("lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"), avg(col("lp")).as("logprob"))
  }
}
