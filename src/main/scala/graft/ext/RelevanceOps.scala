package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Term-relevance scoring over the documents corpus (charter,
  * SURVEY §0(c) text analysis): per-document top-k characteristic terms
  * by tf·idf-family weighting — the signal a curation pipeline uses for
  * topic bucketing, keyword-based filtering, and cluster labeling.
  *
  * Determinism contract: the oracle-gated scorer uses the SMOOTHED
  * RATIO idf, score = tf · (N+1)/(df+1), not ln-idf. Rationale: the
  * whole score is one integer product and one IEEE-754 division, both
  * correctly-rounded and therefore bit-identical across engines, so the
  * top-k ORDERING (score desc, term asc) can never diverge from the
  * oracle by a libm ulp — `ln` carries no such cross-engine guarantee
  * and ranks identically anyway (ln is monotone in the ratio). The
  * ln-idf variant is available via `logIdf = true` for production score
  * values; it is deliberately not oracle-gated.
  *
  * Scale: tf is one shuffle on (doc, term); df reuses the tf frame with
  * one fan-in shuffle on term (a hot term collapses to one row — no
  * posting-list join); the tf⋈df join shuffles on term (AQE absorbs
  * vocabulary skew); corpus size N is a metadata-count driver scalar
  * (the watermark-read pattern); top-k is a window on doc_id. All
  * linear in corpus size.
  */
object RelevanceOps {

  def topTermsByRarity(docs: DataFrame, k: Int, logIdf: Boolean = false,
                       textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val n = docs.count()
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val ratio = (col("tf") * lit(n + 1)).cast("double") / (col("df") + 1)
    val scored = tf.join(dft, "term")
      .withColumn("score", if (logIdf)
        col("tf") * log(lit(n + 1).cast("double") / (col("df") + 1)) else ratio)
    // each mode ranks by its own score (tf·ln-idf is NOT monotone in the
    // ratio — tf multiplies outside the log); only the ratio mode is
    // oracle-gated, exactly because its ordering is division-exact
    scored
      .withColumn("__rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))))
      .filter(col("__rn") <= k).drop("__rn")
      .select("doc_id", "term", "tf", "df", "score")
  }
}
