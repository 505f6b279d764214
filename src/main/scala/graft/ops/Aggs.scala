package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation operators (SURVEY §2.5 A1/A2/A4).
  *
  * A1/A2 — the reference's one aggregate shape: hash agg over N group keys
  * emitting `COUNT(*) AS total` + `COUNT(DISTINCT user) AS unique`
  * (traffic_daily_agg.sql:51-76, traffic_pages_agg.sql:27-36).
  *
  * Scale notes: for a single distinct column Spark plans a two-STAGE
  * aggregate — partial agg keyed on (group keys, distinct col), a shuffle
  * on that widened key, then a second agg on the group keys alone (the
  * Expand rewrite only appears with multiple distinct columns). The extra
  * stage shuffles near-cardinality(keys × users) rows, which is the
  * 100 TB pain point (SURVEY §2.5): `dualCountApprox` is the HLL-based
  * toggle that collapses it to one partial-aggregable pass
  * (ScaleProfileSpec asserts the fewer-exchanges plan); exact stays the
  * default for oracle parity.
  */
object Aggs {

  /** A1/A2 — count + exact count-distinct per group. */
  def dualCount(df: DataFrame, keys: Seq[Column], distinctOn: Column,
                totalName: String = "total_visits",
                uniqueName: String = "unique_visitors"): DataFrame =
    df.groupBy(keys: _*)
      .agg(count(lit(1)).as(totalName), countDistinct(distinctOn).as(uniqueName))

  /** 100 TB variant: approx_count_distinct (HyperLogLog++, rsd 1%) — single
    * pass, one shuffle, fully partial-aggregable. Not oracle-parity;
    * offered as a config toggle per SURVEY §2.5 [EXT] note.
    */
  def dualCountApprox(df: DataFrame, keys: Seq[Column], distinctOn: Column,
                      totalName: String = "total_visits",
                      uniqueName: String = "unique_visitors",
                      rsd: Double = 0.01): DataFrame =
    df.groupBy(keys: _*)
      .agg(count(lit(1)).as(totalName), approx_count_distinct(distinctOn, rsd).as(uniqueName))

  /** [EXT] Persistable distinct-count sketch table (Datasketches HLL via
    * Spark's `hll_sketch_agg`): one binary sketch per fine-grain key
    * group. Unlike `approx_count_distinct` — whose HLL++ state exists
    * only inside a single aggregation — these sketches are VALUES: write
    * the frame out daily and any later rollup unions the stored bytes
    * instead of re-scanning raw events. That is the 100 TB pattern for
    * distinct counts over sliding horizons: the raw table is read once
    * per partition ever, and a year-over-any-dimension unique-user query
    * touches ~365 sketch rows per group, not the event log.
    */
  def sketchTable(df: DataFrame, keys: Seq[Column], distinctOn: Column,
                  sketchName: String = "sketch", lgK: Int = 12): DataFrame =
    df.groupBy(keys: _*).agg(hll_sketch_agg(distinctOn, lgK).as(sketchName))

  /** Roll a sketch table up to coarser keys: union the stored sketches
    * (`hll_union_agg`) and estimate. Mergeable by construction — partials
    * combine associatively, so the plan is one partial-aggregable shuffle
    * over sketch rows regardless of raw-event cardinality.
    */
  def sketchRollup(sketches: DataFrame, keys: Seq[Column], sketchCol: Column,
                   estimateName: String = "approx_uniques"): DataFrame =
    sketches.groupBy(keys: _*)
      .agg(hll_sketch_estimate(hll_union_agg(sketchCol, lit(false)))
        .as(estimateName))

  /** [EXT] Bounded top-k buffer: top `k` (ord, id) pairs by ord DESC with
    * id ASC tie-break, kept sorted. Both reduce and merge preserve the
    * ≤ k bound, so the map-side partial state is O(k) per key — the
    * property that makes [[Aggs.topKPerKey]] scale where the window form
    * cannot: ROW_NUMBER + filter sorts EVERY row of every key group
    * through the shuffle, while this ships at most k candidates per key
    * per map partition (the same reason k=1 uses [[Dedup.argmax]]).
    */
  final class TopK(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    require(k >= 1, s"k must be positive: $k")
    private val ord = Ordering.by[(Double, Long), (Double, Long)] {
      case (v, id) => (-v, id)
    }
    def zero: Seq[(Double, Long)] = Nil
    def reduce(b: Seq[(Double, Long)], t: (Double, Long)): Seq[(Double, Long)] =
      // bounded insert: skip without allocation when t can't place
      if (b.size >= k && ord.lteq(b.last, t)) b
      else ((b :+ t).sorted(ord)).take(k)
    def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      (a ++ b).sorted(ord).take(k)
    def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
    def bufferEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** [EXT] Top-k rows per key WITHOUT a per-group sort: the [[TopK]]
    * aggregator keeps an O(k) buffer per key, partials merge map-side
    * (ObjectHashAggregate, plan-gated), and only k candidates per key
    * per partition cross the shuffle. Output (keys..., id, ord, rank)
    * with rank 1-based by ord DESC, id ASC on ties — row-identical to
    * the ROW_NUMBER window form (spec-gated), cheaper whenever group
    * size ≫ k. NULL ords are dropped (no total order to rank them in);
    * payload columns beyond the id re-join downstream — top-k ids are
    * broadcast-sized by construction.
    */
  def topKPerKey(df: DataFrame, keys: Seq[Column], ordCol: Column,
                 idCol: Column, k: Int): DataFrame = {
    val tk = udaf(new TopK(k))
    df.filter(ordCol.isNotNull)
      .groupBy(keys: _*)
      .agg(tk(ordCol.cast("double"), idCol.cast("long")).as("__top"))
      .select((keys :+ posexplode(col("__top"))): _*)
      .select((keys ++ Seq(
        col("col").getField("_2").as("id"),
        col("col").getField("_1").as("ord"),
        (col("pos") + 1).cast("long").as("rank"))): _*)
  }
}
