package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Corpus drift monitoring: per-language distribution deltas
  * between two corpus snapshots — the instrument a pipeline runs between
  * crawls (or between a corpus and its post-curation survivor set) to
  * catch composition shift before it reaches training: doc-count and
  * mean-length movement, vocabulary Jaccard, token-distribution entropy
  * per side, and the Jensen-Shannon divergence between the two token
  * distributions (0 = identical, 1 bit = disjoint).
  *
  * Scale shape: each side is one tokenize-explode-count aggregation
  * (map-side partials), the two count tables full-outer join on
  * (lang, token) — vocabulary-sized, not corpus-sized — and everything
  * after is per-language arithmetic over exact integer counts. No
  * driver-side state; adding a snapshot costs one scan of that snapshot.
  *
  * Determinism: every probability is a ratio of exact integer counts,
  * entropy/JS sums run over vocabulary-sized term sets (~1e-12 relative
  * accumulation error against the comparator's 1e-9), and zero-count
  * sides contribute exactly their closed-form limit (0 for entropy,
  * p/2·log2(2) for the one-sided JS term) via explicit guards rather
  * than NaN-producing logs.
  */
object DriftOps {

  def corpusDrift(a: DataFrame, b: DataFrame,
                  textCol: String = "text", langCol: String = "lang"): DataFrame = {
    def tokCounts(df: DataFrame, cName: String): DataFrame =
      df.filter(col(textCol).isNotNull)
        .select(col(langCol).as("lang"), explode(TextOps.tokens(col(textCol))).as("t"))
        .groupBy(col("lang"), col("t")).agg(count(lit(1)).as(cName))
    val tot = tokCounts(a, "ca").join(tokCounts(b, "cb"), Seq("lang", "t"), "full_outer")
      .na.fill(0L, Seq("ca", "cb"))
    val sums = tot.groupBy(col("lang")).agg(
      sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
      sum(when(col("ca") > 0 && col("cb") > 0, 1).otherwise(0)).as("n_both"),
      count(lit(1)).as("n_union"))
    val pa = col("ca") / col("na")
    val pb = col("cb") / col("nb")
    val pm = lit(0.5) * pa + lit(0.5) * pb
    val ent = tot.join(sums, Seq("lang")).groupBy(col("lang")).agg(
      (-sum(when(col("ca") > 0, pa * log2(pa)).otherwise(0.0))).as("entropy_a"),
      (-sum(when(col("cb") > 0, pb * log2(pb)).otherwise(0.0))).as("entropy_b"),
      (sum(when(col("ca") > 0, lit(0.5) * pa * log2(pa / pm)).otherwise(0.0)) +
        sum(when(col("cb") > 0, lit(0.5) * pb * log2(pb / pm)).otherwise(0.0)))
        .as("js_divergence"))
    val docs = a.filter(col(textCol).isNotNull)
      .select(col(langCol).as("lang"), col(textCol).as("__t"), lit("a").as("half"))
      .unionByName(b.filter(col(textCol).isNotNull)
        .select(col(langCol).as("lang"), col(textCol).as("__t"), lit("b").as("half")))
      .groupBy(col("lang")).agg(
        count(when(col("half") === "a", 1)).as("docs_a"),
        count(when(col("half") === "b", 1)).as("docs_b"),
        avg(when(col("half") === "a", length(col("__t")))).as("mean_len_a"),
        avg(when(col("half") === "b", length(col("__t")))).as("mean_len_b"))
    docs
      .join(sums.select(col("lang"),
        (col("n_both").cast("double") / col("n_union")).as("vocab_jaccard")), Seq("lang"))
      .join(ent, Seq("lang"))
  }
}
