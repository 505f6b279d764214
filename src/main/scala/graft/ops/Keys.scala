package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Surrogate-key operator (SURVEY §2.3 F11).
  *
  * Byte-compatible re-implementation of the public dbt_utils 1.1.1
  * `generate_surrogate_key` macro semantics (reference call sites:
  * lead_activities_agg.sql:153-155, traffic_daily_agg.sql:133; dependency
  * declared at packages.yml:2-4): each column is cast to string, NULLs
  * replaced by the sentinel `_dbt_utils_surrogate_key_null`, joined with
  * `-`, md5-hashed to a 32-char lowercase hex string.
  *
  * Pure expression → codegen'd, no shuffle; at 100 TB this is the
  * scale-safe row-id (deterministic, partition-independent), unlike the
  * reference's global ROW_NUMBER id (see Ids.globalRowNumber).
  */
object Keys {
  private val NullSentinel = "_dbt_utils_surrogate_key_null"

  def surrogateKey(cols: Column*): Column =
    md5(concat_ws("-", cols.map(c => coalesce(c.cast("string"), lit(NullSentinel))): _*))
}
