package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dedup operators (SURVEY §2.6 W1, §2.5 A3).
  *
  * W1 — top-1-per-key / argmax dedup: the reference's last-paid-touch
  * attribution core (lead_activities_agg.sql:45-55,64-75): ROW_NUMBER over
  * PARTITION BY key ORDER BY <priority>, then rn = 1.
  *
  * Scale notes: one hash shuffle on the partition key; skewed keys (a hot
  * domain_userid) are handled by AQE skew mitigation. For pure argmax
  * (no need for the full sorted run) `maxByStruct` is the cheaper variant —
  * a single-pass partial-aggregable max over a packed struct, no window
  * sort, map-side combine halves the shuffle volume.
  */
object Dedup {

  /** W1 faithful form: row_number + rn=1. `order` must be a total order
    * (include unique tie-breaks) for deterministic results — the reference
    * already does this (ts DESC, event_id DESC, :53-54).
    */
  def topOnePerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame =
    topNPerKey(df, keys, order, 1)

  /** Quota generalization of W1: keep the first `n` rows per key under
    * `order` (per-key cap / top-n). Same single key-shuffle; the rank
    * never leaves the exchange.
    */
  def topNPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], n: Int): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Scale variant of W1: argmax via max(struct(orderKeys..., payload)).
    * Equivalent result when the order is total; partial aggregation
    * (map-side combine) makes it strictly cheaper than the window at high
    * cardinality. Caller maps order columns so that max() picks the
    * desired row (i.e. invert DESC columns beforehand).
    */
  def argmax(df: DataFrame, keys: Seq[Column], orderAsc: Seq[Column]): DataFrame = {
    val ordFields = orderAsc.zipWithIndex.map { case (c, i) => c.as(s"_o$i") }
    val payload = struct(df.columns.map(col).toIndexedSeq: _*).as("_row")
    val packed = struct((ordFields :+ payload): _*)
    df.groupBy(keys: _*).agg(max(packed).as("__p")).select(col("__p._row.*"))
  }
}
