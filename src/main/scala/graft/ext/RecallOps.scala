package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Measured-recall rows for the approximate dedup/ANN paths.
  *
  * The LSH-family operators (MinHash near-dup, SimHash near-dup, sign-LSH
  * cosine pairs) are approximate BY CONTRACT: their oracle-less registry
  * rows promise "LSH recall at the configured operating point" instead of
  * a hash match. This op turns that promise into a bench-visible NUMBER:
  * a one-row frame comparing the approximate pair set against its exact
  * counterpart on the same input, registered like any other query so the
  * measured recall lands in every verify dump (specs pin the floors).
  *
  * Precision is not measured because every compared operator exactly
  * verifies its candidates — found pairs are a subset of exact pairs by
  * construction.
  */
object RecallOps {

  /** (metric, exact_pairs, found_pairs, recall) — one row. `cols` are
    * the pair-identity columns present in BOTH frames (orientation must
    * already agree; every pair op here emits lo<hi or (query, corpus)
    * consistently). An empty exact set reports recall 1.0 — nothing was
    * missable. Scale shape: distinct + one join on the pair identity,
    * both sides candidate-set-sized (not corpus-sized).
    */
  def setRecall(metric: String, exact: DataFrame, found: DataFrame,
                cols: Seq[String]): DataFrame = {
    val e = exact.select(cols.map(col): _*).distinct()
    val f = found.select(cols.map(col): _*).distinct().withColumn("__hit", lit(1))
    e.join(f, cols, "left")
      .agg(count(lit(1)).as("exact_pairs"),
        coalesce(sum(col("__hit")), lit(0)).cast("long").as("found_pairs"))
      .select(lit(metric).as("metric"), col("exact_pairs"), col("found_pairs"),
        when(col("exact_pairs") === 0, lit(1.0))
          .otherwise(col("found_pairs").cast("double") / col("exact_pairs"))
          .as("recall"))
  }

  /** ORACLE-GATED form of [[setRecall]]: (metric, recall_floor,
    * meets_floor) — the registered recall rows' correctness shape. A
    * raw measured recall is a hash-non-portable double (DuckDB cannot
    * recompute MinHash/SimHash/ANN internals), so the DRIVER-compared
    * frame carries the pinned floor and the boolean verdict instead;
    * the constant-true oracle then flips a whole CORRECTNESS row —
    * not just a spec — the moment a recall collapses. `expectExactPairs`
    * additionally pins the ground-truth set size where it is structural
    * (|queries|·k for the ANN rows); otherwise the gate requires a
    * non-empty exact set, so an exact-side regression (no pairs found
    * to measure against) fails rather than vacuously passing.
    * Measured raw numbers stay spec-pinned (RecallSpec) at fixture SF.
    */
  def recallGate(metric: String, exact: DataFrame, found: DataFrame,
                 cols: Seq[String], floor: Double,
                 expectExactPairs: Option[Long] = None): DataFrame = {
    val base = expectExactPairs match {
      case Some(n) => col("exact_pairs") === n
      case None    => col("exact_pairs") > 0
    }
    setRecall(metric, exact, found, cols)
      .select(col("metric"),
        lit(floor).as("recall_floor"),
        (base && col("found_pairs") <= col("exact_pairs") &&
          col("recall") >= floor).as("meets_floor"))
  }
}
