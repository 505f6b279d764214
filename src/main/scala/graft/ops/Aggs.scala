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
}
