package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** Join shapes (SURVEY §2.4 J1-J3).
  *
  * The reference uses LEFT equi-joins only; the distinctive shapes are:
  *  - J1: constant predicate INSIDE the ON clause
  *    (`... AND et.traffic_type = 'paid'`, traffic_daily_agg.sql:106-109) —
  *    semantically different from a WHERE: it disables the match, not the
  *    row. Organic rows survive with NULL right side.
  *  - J3: expression join key (`LOWER(le.mkt_campaign) = ts.mkt_campaign`,
  *    lead_activities_agg.sql:146-149) with faithful fan-out.
  *
  * Scale notes: every helper takes a `small` flag — when the right side is
  * dimension-sized (the reference's spend tables are tiny vs the event
  * stream) we `broadcast()` it, turning a sort-merge + 2 shuffles into a
  * map-side hash join with zero shuffle of the big side. At 100 TB the
  * event side never moves.
  */
object Joins {

  private def maybeBroadcast(df: DataFrame, small: Boolean): DataFrame =
    if (small) broadcast(df) else df

  /** LEFT join with arbitrary ON condition (J1/J3 shapes). */
  def leftOn(left: DataFrame, right: DataFrame, cond: Column,
             smallRight: Boolean = true): DataFrame =
    left.join(maybeBroadcast(right, smallRight), cond, "left")

  /** J2 — LEFT equi-join on shared key names (one output key column). */
  def leftUsing(left: DataFrame, right: DataFrame, keys: Seq[String],
                smallRight: Boolean = true): DataFrame =
    left.join(maybeBroadcast(right, smallRight), keys, "left")

  /** Skew-mitigated equi-join for when AQE's skew handling isn't enough
    * (one key holds a large share of the big side and the right side is
    * too large to broadcast): the big side scatters each row into one of
    * `salt` buckets by a deterministic row hash, the right side
    * replicates into all buckets, and the join runs on (key, bucket) —
    * splitting each hot key's partition into `salt` even slices.
    * Result is row-identical to `big.join(right, keys, joinType)`.
    * Cost: right side shuffled `salt`×; use only on measured skew.
    */
  def saltedJoin(big: DataFrame, right: DataFrame, keys: Seq[String],
                 joinType: String = "inner", salt: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions.{col, explode, lit, pmod, sequence, struct, xxhash64}
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(salt)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(saltedRight, keys :+ "__salt", joinType).drop("__salt")
  }

  /** LEFT SEMI on an arbitrary condition — SQL EXISTS. Emits left columns
    * only, never duplicates a left row however many right rows match
    * (which is why this is not a join-then-distinct: the semi probe stops
    * at first match and the right side's fan-out never materializes).
    */
  def semiOn(left: DataFrame, right: DataFrame, cond: Column,
             smallRight: Boolean = true): DataFrame =
    left.join(maybeBroadcast(right, smallRight), cond, "left_semi")

  /** LEFT ANTI on an arbitrary condition — SQL NOT EXISTS (equality
    * predicates only here; null-aware NOT IN semantics are deliberately
    * not offered — see the ingest oracle's NOT EXISTS contract).
    */
  def antiOn(left: DataFrame, right: DataFrame, cond: Column,
             smallRight: Boolean = true): DataFrame =
    left.join(maybeBroadcast(right, smallRight), cond, "left_anti")
}
