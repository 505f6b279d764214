package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Retrieval-quality evaluation: per-query recall@k, MRR@k, and
  * nDCG@k of a ranked retrieval run against a binary relevance set — the
  * measurement layer a similarity-search pipeline tunes its index knobs
  * (nlist/nprobe/shortlist/bands) against. The repo's recall rows
  * (RecallOps) pin single recall floors for the spec gates; this op is
  * the general per-query instrument, DuckDB-oracle-gated.
  *
  * Scale shape: one equi-join of the top-k run (|Q|·k rows) against the
  * relevance set on (query, corpus), then per-query aggregation — both
  * sides are evaluation-sized, nothing corpus-sized appears. The ideal
  * DCG denominator is computed per query from min(k, n_rel) via a
  * sequence aggregate, no join against a numbers table.
  *
  * Metric conventions (binary relevance): recall@k = hits/n_rel (NOT
  * clamped by k — a query with n_rel > k cannot reach 1, which is the
  * honest reading of a top-k run); MRR@k = 1/rank of the first relevant
  * retrieved row, 0 if none; nDCG@k = Σ 1/log2(rank+1) over relevant
  * retrieved rows ÷ Σ_{i≤min(k,n_rel)} 1/log2(i+1). Queries with an
  * empty relevance set are excluded (every metric is 0/0 there).
  */
object EvalOps {

  /** Binary ground truth by exact cosine: every (query, corpus) pair at
    * or above `threshold`, self-pairs excluded — the DEFINITION of
    * relevance for index evaluation, so its cost (queries broadcast into
    * one corpus scan) is the instrument's, not the index's.
    */
  def relevantByCosine(corpus: DataFrame, queries: DataFrame, threshold: Double,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val qv = SimilarityOps.normalized(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("v").as("qv"))
    val cv = SimilarityOps.normalized(corpus, idCol, vecCol)
      .select(col("id").as("corpus_id"), col("v").as("cv"))
    cv.join(broadcast(qv),
        SimilarityOps.dotFast(col("qv"), col("cv")) >= threshold &&
          col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"))
  }

  /** `retrieved`: (query_id, corpus_id, rank) with rank 1-based and
    * unique per query (rows with rank > k are ignored, so a longer run
    * can be evaluated at a smaller k). `relevant`: (query_id, corpus_id)
    * distinct binary relevance pairs.
    */
  def retrievalMetrics(retrieved: DataFrame, relevant: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val rel = relevant.select(col("query_id"), col("corpus_id")).distinct()
    val relCount = rel.groupBy(col("query_id")).agg(count(lit(1)).as("n_rel"))
    val marked = retrieved.filter(col("rank") <= k)
      .join(rel.withColumn("__rel", lit(1)), Seq("query_id", "corpus_id"), "left")
    val perQuery = marked.groupBy(col("query_id")).agg(
      count(col("__rel")).as("n_hits"),
      coalesce(lit(1.0) / min(when(col("__rel").isNotNull, col("rank"))), lit(0.0))
        .as("mrr"),
      coalesce(sum(when(col("__rel").isNotNull, lit(1.0) / log2(col("rank") + 1))),
        lit(0.0)).as("dcg"))
    perQuery.join(relCount, Seq("query_id"))
      .select(
        col("query_id"), col("n_rel"),
        (col("n_hits").cast("double") / col("n_rel")).as("recall_at_k"),
        col("mrr"),
        (col("dcg") / aggregate(sequence(lit(1), least(lit(k), col("n_rel"))),
          lit(0.0), (a, i) => a + lit(1.0) / log2(i + 1))).as("ndcg"))
  }
}
