package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Long-format metric pivot (SURVEY §2.8 U1/U2).
  *
  * The reference emits the same aggregate twice via UNION ALL — once
  * labeled 'all' carrying total_visits, once labeled 'unique' carrying
  * unique_visitors (traffic_daily_agg.sql:92-130, traffic_pages_agg.sql:38-56).
  *
  * Two implementations:
  *  - `byUnion` — faithful shape (two projections of one cached agg, no
  *    recompute: Spark reuses the aggregate subplan via ReusedExchange).
  *  - `byExplode` — single-pass: explode an inline 2-element
  *    array<struct> — no second scan of the agg output, no union node;
  *    preferred at scale (SURVEY §4 custom-rule candidate (a), done at the
  *    DataFrame layer instead of a Catalyst rule).
  * Both produce identical rows.
  */
object Pivot {

  /** U1/U2 faithful: agg → two relabeled projections → unionByName. */
  def byUnion(agg: DataFrame, keep: Seq[String], labelCol: String, valueCol: String,
              allFrom: String, uniqueFrom: String): DataFrame = {
    val all = agg.select((keep.map(col) :+ lit("all").as(labelCol) :+ col(allFrom).as(valueCol)): _*)
    val uni = agg.select((keep.map(col) :+ lit("unique").as(labelCol) :+ col(uniqueFrom).as(valueCol)): _*)
    all.unionByName(uni)
  }

  /** Single-pass variant: one generator, no union. */
  def byExplode(agg: DataFrame, keep: Seq[String], labelCol: String, valueCol: String,
                allFrom: String, uniqueFrom: String): DataFrame = {
    val pairs = array(
      struct(lit("all").as(labelCol), col(allFrom).as(valueCol)),
      struct(lit("unique").as(labelCol), col(uniqueFrom).as(valueCol)))
    agg.select((keep.map(col) :+ explode(pairs).as("__m")): _*)
      .select((keep.map(col) :+ col(s"__m.$labelCol") :+ col(s"__m.$valueCol")): _*)
  }
}
