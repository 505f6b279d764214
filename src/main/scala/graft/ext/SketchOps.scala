package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** [EXT] Mergeable frequency sketches. The HLL distinct-count path
  * (Aggs.dualCountApprox) covers "how many"; this module covers "which
  * ones": bounded-state heavy-hitter summaries whose partials merge, so
  * the map side ships ≤ k counters per partition instead of the full
  * key distribution — the shape that finds hot tokens/domains/keys in
  * one pass over 100 TB without a full group-by.
  */
object SketchOps {

  /** Misra-Gries heavy-hitters summary (Misra & Gries 1982; merge rule
    * per Agarwal et al., "Mergeable Summaries", PODS'12): at most `k`
    * counters; an unseen key either claims a free counter or decrements
    * every existing one (the "pay one from each" step). Merging sums
    * counterparts, then subtracts the (k+1)-th largest count from all
    * and drops non-positives.
    *
    * Guarantee: true frequency f(x) is undercounted by at most N/(k+1),
    * so EVERY key with f(x) > N/(k+1) survives in the summary — no
    * false negatives above the threshold. That asymmetry is what makes
    * the sketch oracle-gateable: re-count the ≤ k candidates exactly and
    * threshold, and the result EQUALS the exhaustive group-by answer.
    *
    * State is O(k) per partial regardless of input size or key
    * cardinality; buffers are immutable maps (fixture-scale honest; a
    * hot path would swap in a mutable open-addressing buffer behind the
    * same Aggregator seam).
    */
  class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k > 0, s"k must be positive: $k")

    def zero: Map[String, Long] = Map.empty

    def reduce(b: Map[String, Long], t: String): Map[String, Long] =
      b.get(t) match {
        case Some(c)            => b.updated(t, c + 1)
        case None if b.size < k => b.updated(t, 1L)
        case None =>
          b.flatMap { case (key, c) => if (c > 1) Some(key -> (c - 1)) else None }
      }

    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val m = b.foldLeft(a) { case (acc, (key, c)) =>
        acc.updated(key, acc.getOrElse(key, 0L) + c)
      }
      if (m.size <= k) m
      else {
        val d = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        m.flatMap { case (key, c) => if (c > d) Some(key -> (c - d)) else None }
      }
    }

    def finish(r: Map[String, Long]): Map[String, Long] = r
    def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
  }

  /** One MG pass over `valueCol`: the ≤ k surviving candidate keys. */
  def heavyHitterCandidates(df: DataFrame, valueCol: Column, k: Int): DataFrame =
    df.select(valueCol.as("t"))
      .agg(udaf(new MisraGries(k)).apply(col("t")).as("sketch"))
      .select(explode(map_keys(col("sketch"))).as("t"))

  /** EXACT heavy hitters through the sketch: keys with true frequency
    * f·(k+1) > N (strict, integer arithmetic — no float threshold), with
    * exact counts. Pass 1 is the MG aggregate (O(k) state, mergeable
    * partials); pass 2 re-counts ONLY the ≤ k candidates via a broadcast
    * semi-join against the value scan — bounded by construction — and
    * the threshold uses a 1-row total broadcast. By the MG no-false-
    * negative guarantee the output equals the exhaustive group-by
    * answer, which is exactly what the oracle checks: a sketch bug that
    * drops a true heavy hitter loses a row and fails the hash.
    */
  def heavyHitters(df: DataFrame, valueCol: Column, k: Int): DataFrame = {
    val vals = df.select(valueCol.as("t"))
    val cand = heavyHitterCandidates(df, valueCol, k)
    val total = vals.agg(count(lit(1)).as("__n"))
    vals.join(broadcast(cand), "t")
      .groupBy("t").agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(total))
      .filter(col("c") * (k + 1) > col("__n"))
      .select(col("t"), col("c"))
  }
}
