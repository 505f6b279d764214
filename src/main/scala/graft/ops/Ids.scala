package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-id operators (SURVEY §2.6 W2).
  *
  * W2 — the reference's global sequential id: unpartitioned
  * `ROW_NUMBER() OVER (ORDER BY ...)` (traffic_pages_agg.sql:58-67).
  * Faithful replication REQUIRES the single-partition sort (and inherits
  * the id-collision-across-incremental-runs quirk, SURVEY §2.10) — kept
  * for parity, cast to bigint for id stability.
  *
  * `scaleSafeId` is the 100 TB variant: deterministic content hash (F11
  * style), partition-independent, no single-partition shuffle. Models use
  * the faithful form; the variant is what a real deployment should switch
  * to (documented per SURVEY §7 hard-part 1).
  */
object Ids {

  /** W2 faithful: global row_number over a total order. Single-partition
    * shuffle — correct but non-scalable by design (parity).
    */
  def globalRowNumber(df: DataFrame, order: Seq[Column], idCol: String = "id"): DataFrame =
    df.withColumn(idCol, row_number().over(Window.orderBy(order: _*)).cast("bigint"))

  /** Scale-safe alternative: deterministic hash id over the ordering key
    * columns (collision-free in practice at 128-bit via md5; no shuffle).
    */
  def scaleSafeId(df: DataFrame, keyCols: Seq[Column], idCol: String = "id"): DataFrame =
    df.withColumn(idCol, Keys.surrogateKey(keyCols: _*))
}
