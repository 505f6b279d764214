package graft.runtime

import org.apache.spark.sql.{Column, DataFrame}

/** The common surface of the LSM fragment layouts — the flat
  * [[FragmentedTable]] and the sharded [[BucketedFragmentStore]] — so a
  * consumer (the streaming ingest sinks, a maintenance cadence) is
  * written once and deploys against either: flat for model-sized
  * corpora, bucketed when manifests/compaction/point-reads need
  * per-shard bounds. All implementations share the semantics the specs
  * pin on the flat store: last-writer-wins upserts, tombstone deletes,
  * zone-map-pruned `readWhere` equal to `read().filter`, tiered
  * partial folds, replay-idempotent writers.
  */
trait KeyedFragmentStore {
  /** The upsert key column. */
  def keyColumn: String
  /** Last-writer-wins merge of the live fragments; None when empty. */
  def read(): Option[DataFrame]
  /** `read().filter(pred)` with storage-level pruning. */
  def readWhere(pred: Column): Option[DataFrame]
  /** Append the batch (at most one row per key) as new fragment(s). */
  def upsert(batch: DataFrame): Unit
  /** [[upsert]] without the zone-map/stats job — the L0 trade for
    * batch-sized high-frequency appends: the fragment lands stat-less
    * (scanned unconditionally until the next fold levels it); the
    * write costs one Spark job. Default: plain upsert.
    */
  def upsertLight(batch: DataFrame): Unit = upsert(batch)
  /** Tombstone the given keys. */
  def deleteKeys(keys: DataFrame): Unit
  /** Tombstone every current row matching `pred`. */
  def deleteWhere(pred: Column): Unit
  /** Fold the newest small-fragment run(s); cheap cadence maintenance. */
  def compactTiered(tierFactor: Double = 4.0): Boolean
  /** Tiered fold, then a full fold only if a manifest still exceeds
    * `maxLive` fragments — the bounded-read-amplification backstop the
    * sink cadences call (per-bucket bound on the sharded layout).
    */
  def maybeCompact(maxLive: Int, tierFactor: Double = 4.0): Boolean
  /** The [[maybeCompact]] backstop WITHOUT the tiered pre-pass: full
    * fold of any manifest still over `maxLive` fragments. For callers
    * that just ran their own [[compactTiered]] — avoids paying the tier
    * policy (and its per-fragment filesystem walk) twice per tick.
    */
  def compactIfOver(maxLive: Int): Boolean
  /** Full fold (purges tombstones). */
  def compact(): Unit
}
