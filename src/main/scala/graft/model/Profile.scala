package graft.model

/** Execution profile for the reference models.
  *
  * The reference SQL contains two constructs that are correct but do not
  * survive a 100× scale-up, and the operator library ships scale-safe
  * variants of both (SURVEY §7 hard-part 1, §2.5). This toggle lets the
  * SAME model builders run either form end-to-end:
  *
  *   - [[Profile.Faithful]] — bit-faithful reference semantics, used by
  *     every oracle gate: the global `ROW_NUMBER()` id (single-partition
  *     sort, `Ids.globalRowNumber`) and exact `COUNT(DISTINCT ...)`
  *     (Expand + double-width shuffle).
  *   - [[Profile.AtScale]] — the 100 TB variants: content-hash ids
  *     (`Ids.scaleSafeId` — deterministic, partition-independent, no
  *     global sort) and HyperLogLog++ `approx_count_distinct` (rsd 1%,
  *     single-pass, fully partial-aggregable).
  *
  * Documented deltas under AtScale, asserted by ScaleProfileSpec:
  * `traffic_pages_agg.id` becomes a 128-bit hex string instead of a
  * dense bigint sequence (values differ, uniqueness and row content
  * hold), and `unique`-typed traffic counts are approximate within the
  * HLL rsd. Everything else is row-identical. The third model
  * (lead_activities_agg) has no in-plan scale-killer — its AtScale run
  * is defined by consuming an AtScale daily input and materializing via
  * `Materializer.materializeByDatePartition` (O(batch) upsert instead of
  * the whole-table anti-join), which the spec runs end-to-end.
  */
sealed trait Profile

object Profile {
  case object Faithful extends Profile
  case object AtScale extends Profile
}
