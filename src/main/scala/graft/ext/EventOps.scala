package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Event-stream analytics over the `events` fixture — the classic
  * web/product-analytics operators the reference's dbt models stop short
  * of (reference `traffic_daily_agg.sql` aggregates raw events by day;
  * sessionization, as-of attribution, funnels, and retention are the
  * next four questions every analytics team asks of the same table).
  *
  * Scale design: every operator is one hash shuffle on the entity key
  * (user) followed by per-key ordered windows or partial-aggregable
  * rollups — no range joins, no self-join blowups, no driver loops. The
  * known caveat for all per-user ordered windows is entity skew: one
  * pathological user's events land in one task. At 100 TB that is
  * handled upstream (bot filtering caps per-user event counts — see
  * CorpusOps.capPerKey); salting is not applicable to ordered
  * carry-forward semantics.
  */
object EventOps {

  private def us(c: Column): Column = unix_micros(c)

  /** Assign a session index to every event: a new session starts when
    * the gap since the user's previous event exceeds `gapMinutes` (the
    * GA-style 30-minute idle timeout). Events are ordered by (ts, id) —
    * the id tiebreak makes the assignment total and deterministic.
    * Emits the input columns plus `session_idx` (1-based per user).
    *
    * One shuffle on the user key; both windows share the same
    * partitioning+ordering, so Catalyst plans a single sort.
    */
  def sessionize(events: DataFrame, gapMinutes: Int,
                 userCol: String = "user_id", tsCol: String = "ts",
                 idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val prev = lag(col(tsCol), 1).over(w)
    val brk = when(prev.isNull ||
      us(col(tsCol)) - us(prev) > gapMinutes * 60L * 1000000L, 1).otherwise(0)
    events
      .withColumn("__brk", brk)
      .withColumn("session_idx",
        sum(col("__brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      .drop("__brk")
  }

  /** Session-level rollup of [[sessionize]]: bounds, size, and purchase
    * count per (user, session). All-integer output (epoch µs, counts),
    * so the DuckDB mirror is exact — no timestamp-rendering or
    * double-accumulation portability risk.
    */
  def sessionSummary(events: DataFrame, gapMinutes: Int,
                     userCol: String = "user_id", tsCol: String = "ts",
                     idCol: String = "event_id",
                     typeCol: String = "event_type"): DataFrame =
    sessionize(events, gapMinutes, userCol, tsCol, idCol)
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        min(us(col(tsCol))).as("session_start_us"),
        max(us(col(tsCol))).as("session_end_us"),
        count(lit(1)).as("n_events"),
        sum(when(col(typeCol) === "purchase", 1L).otherwise(0L)).as("n_purchases"))

  /** Backward as-of join: for each left row, the single right row with
    * the greatest `tsCol` at-or-before the left row's `tsCol` on the same
    * `keyCol` (point-in-time correctness — the join a feature pipeline
    * needs to avoid lookahead leakage). Among right rows tied on ts the
    * greatest `tieCol` wins, which makes the result total and
    * deterministic without pre-deduplicating the right side.
    *
    * Implementation is the union-tag carry-forward, not a range join:
    * both sides are tagged and interleaved into ONE per-key ordered
    * stream (right rows sort before left at equal ts, so "at-or-before"
    * is inclusive), and `last(_, ignoreNulls)` carries the latest right
    * payload forward. One shuffle on the key, rows-frame window state is
    * O(1) per row — no |left|×|right-per-key| candidate explosion, which
    * is what sinks a naive `t1.ts <= t2.ts` theta-join at scale.
    *
    * `rightCols` are carried from the right side and must be disjoint
    * from the left schema; unmatched left rows get nulls.
    */
  def asOfJoin(left: DataFrame, right: DataFrame,
               keyCol: String, tsCol: String, tieCol: String,
               rightCols: Seq[String]): DataFrame = {
    require(rightCols.nonEmpty, "rightCols must name at least one carried column")
    val overlap = rightCols.toSet.intersect(left.columns.toSet)
    require(overlap.isEmpty, s"rightCols collide with left schema: $overlap")

    val lrow = struct(left.columns.map(col): _*)
    val rv = struct(rightCols.map(col): _*)
    val lrowType = left.select(lrow.as("x")).schema("x").dataType
    val rvType = right.select(rv.as("x")).schema("x").dataType

    val tagged = left.select(col(keyCol), col(tsCol), col(tieCol).as("__tie"),
        lit(1).as("__side"), lrow.as("__lrow"), lit(null).cast(rvType).as("__rv"))
      .unionByName(right.select(col(keyCol), col(tsCol), col(tieCol).as("__tie"),
        lit(0).as("__side"), lit(null).cast(lrowType).as("__lrow"), rv.as("__rv")))

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("__carried", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(c => col(s"__lrow.$c").as(c)) ++
        rightCols.map(c => col(s"__carried.$c").as(c)): _*)
  }

  /** Ordered conversion funnel with a per-step conversion window: stage
    * k counts users who performed `stages(k)` strictly after their stage
    * k-1 time and within `windowMicros` of it (first qualifying event
    * becomes the user's stage-k time). Emits (stage_idx, stage, users).
    *
    * Each step is a join of the event scan against the previous stage's
    * per-user times — stage frames shrink monotonically and are at most
    * user-count-sized (unbounded in general, so no forced broadcast:
    * AQE picks a broadcast join when a frame is measured small). Each
    * frame is persisted so stage k reads stage k-1's result instead of
    * recomputing the whole chain — K stages = K passes over the
    * type-pruned event scan, the honest trade for strict sequential
    * semantics without a per-user event-list collect.
    */
  def funnelCounts(events: DataFrame, stages: Seq[String], windowMicros: Long,
                   userCol: String = "user_id", tsCol: String = "ts",
                   typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(us(col(tsCol))).as("__t"))
    val stageFrames = stages.tail.scanLeft(first.persist()) { (prev, stage) =>
      events.filter(col(typeCol) === stage)
        .select(col(userCol), us(col(tsCol)).as("__et"))
        .join(prev.select(col(userCol), col("__t").as("__pt")), userCol)
        .filter(col("__et") > col("__pt") && col("__et") - col("__pt") <= windowMicros)
        .groupBy(col(userCol)).agg(min(col("__et")).as("__t"))
        .persist()
    }
    stageFrames.zip(stages).zipWithIndex.map { case ((frame, stage), i) =>
      frame.agg(count(lit(1)).as("users"))
        .select(lit(i).as("stage_idx"), lit(stage).as("stage"), col("users"))
    }.reduce(_.unionByName(_))
  }

  /** Dense (user × day) activity matrix with zero-fill — the dbt_utils
    * `date_spine` pattern: a calendar spine spanning the table's date
    * range cross-joined with the user dimension, left-joined to the
    * actual daily rollup, absent cells coalesced to 0. Downstream
    * time-series ops (moving averages, churn flags) need the explicit
    * zeros; the raw table omits silent days.
    *
    * Scale: the spine side IS the output (|users|·|days| rows — the
    * caller asked for the dense matrix, there is no smaller form). The
    * day frame is calendar-bounded by construction → broadcast; the
    * daily rollup partial-aggregates before its shuffle; no driver-side
    * date loop (the spine is `sequence()` + `explode`, computed on
    * executors from a 1-row bound aggregate).
    */
  def dailyActivitySpine(events: DataFrame,
                         userCol: String = "user_id", tsCol: String = "ts",
                         typeCol: String = "event_type"): DataFrame = {
    val days = events.agg(min(to_date(col(tsCol))).as("d0"),
        max(to_date(col(tsCol))).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val daily = events.groupBy(col(userCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("__ne"),
        sum(when(col(typeCol) === "purchase", 1L).otherwise(0L)).as("__np"))
    events.select(col(userCol)).distinct()
      .crossJoin(broadcast(days))
      .join(daily, Seq(userCol, "day"), "left")
      .select(col(userCol), col("day"),
        coalesce(col("__ne"), lit(0L)).as("n_events"),
        coalesce(col("__np"), lit(0L)).as("n_purchases"))
  }

  /** [[dailyActivitySpine]] bounded to each user's OWN active span
    * [min day, max day] instead of the platform-global range. The
    * global spine's output is users × platform-days — at the r16 sf1
    * tier (10× users over 10× history) that squared to 100× rows and
    * `q_ext_interpolate` read 80.5 s for 10× input; bounded, the
    * output is Σ per-user spans (∝ input when history grows by adding
    * users-with-their-own-windows, the honest corpus-growth mode) and
    * the rows a user never influences (before first / after last
    * observation, where LOCF emits the default forever and
    * interpolation just extends an edge) are not manufactured at all.
    * Use the global form only when the dense user×day MATRIX is the
    * deliverable (`q_ext_date_spine`); use this for densify-then-fill
    * pipelines. Same output schema.
    */
  def dailyActivitySpineBounded(events: DataFrame,
                                userCol: String = "user_id",
                                tsCol: String = "ts",
                                typeCol: String = "event_type"): DataFrame = {
    val daily = events.groupBy(col(userCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("__ne"),
        sum(when(col(typeCol) === "purchase", 1L).otherwise(0L)).as("__np"))
    // span agg reuses daily's (user, day) exchange: groupBy(user) after
    // groupBy(user, day) is a partial re-aggregation, not a new scan
    val span = daily.groupBy(col(userCol))
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
    span.select(col(userCol),
        explode(sequence(col("__d0"), col("__d1"))).as("day"))
      .join(daily, Seq(userCol, "day"), "left")
      .select(col(userCol), col("day"),
        coalesce(col("__ne"), lit(0L)).as("n_events"),
        coalesce(col("__np"), lit(0L)).as("n_purchases"))
  }

  /** Per-key forward fill (LOCF — last observation carried forward):
    * `filled` is the most recent non-null `valueCol` at-or-before each
    * row in `orderCol` order within its partition, `default` before the
    * first observation. The standard densify step after a spine join:
    * nulls mark missing observations, LOCF rolls the last real one
    * forward. One window over the partition keys — same single-shuffle
    * shape as [[sessionize]].
    */
  def forwardFill(df: DataFrame, partCols: Seq[String], orderCol: String,
                  valueCol: String, default: Column): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("filled",
      coalesce(last(col(valueCol), ignoreNulls = true).over(w), default))
  }

  /** Per-key linear interpolation between observations — LOCF's other
    * half: a missing cell takes the straight line between the nearest
    * observation before and after it (by `posCol` distance); before the
    * first / after the last observation it takes the nearest one. Two
    * mirrored windows (carry-back + carry-forward) over one partition
    * key — Catalyst plans one exchange with two sorts. Emits `interp`
    * (double). The arithmetic per cell is a handful of individually
    * correctly-rounded IEEE ops on exact inputs, so it is bit-portable —
    * no accumulated float state.
    */
  def interpolateLinear(df: DataFrame, partCols: Seq[String], posCol: String,
                        valueCol: String): DataFrame = {
    val back = Window.partitionBy(partCols.map(col): _*).orderBy(col(posCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(partCols.map(col): _*).orderBy(col(posCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsPos = when(col(valueCol).isNotNull, col(posCol))
    val pv = last(col(valueCol), ignoreNulls = true).over(back)
    val pp = last(obsPos, ignoreNulls = true).over(back)
    val nv = first(col(valueCol), ignoreNulls = true).over(fwd)
    val np = first(obsPos, ignoreNulls = true).over(fwd)
    df.withColumn("interp",
      when(col(valueCol).isNotNull, col(valueCol).cast("double"))
        .when(pv.isNull, nv.cast("double"))
        .when(nv.isNull, pv.cast("double"))
        .otherwise(pv.cast("double") +
          (nv.cast("double") - pv.cast("double")) *
            ((col(posCol) - pp).cast("double") / (np - pp).cast("double"))))
  }

  /** Keyless interval-containment join: each point row pairs with every
    * interval containing its timestamp (`startCol <= ts <= endCol`).
    * Written as a BETWEEN theta-join this is a nested-loop/cartesian at
    * any scale; here both sides key on fixed-width time buckets — the
    * point by its bucket, the interval EXPLODED over the buckets it
    * spans — so the planner runs a plain equi-join (shuffle or
    * broadcast) and the residual BETWEEN only filters within-bucket
    * candidates. Each qualifying pair emerges exactly once (a point has
    * exactly one bucket). `intervalCols` are carried from the interval
    * side and must be disjoint from the point schema.
    *
    * Sizing: intervals replicate ceil(span/bucketWidth)+1 ways — pick
    * `bucketWidthUs` near the typical span so replication stays O(1).
    * A burst bucket (many points + many intervals in one window) is the
    * skew-join case AQE splits; the residual filter still bounds output
    * to true containments.
    */
  def intervalJoin(points: DataFrame, ptTsCol: String,
                   intervals: DataFrame, startCol: String, endCol: String,
                   intervalCols: Seq[String], bucketWidthUs: Long): DataFrame = {
    require(bucketWidthUs > 0, s"bucketWidthUs must be positive: $bucketWidthUs")
    val overlap = (intervalCols :+ startCol :+ endCol).toSet.intersect(points.columns.toSet)
    require(overlap.isEmpty, s"interval columns collide with point schema: $overlap")
    val p = points.withColumn("__b", floor(us(col(ptTsCol)) / bucketWidthUs))
    val iv = intervals
      .filter(col(startCol) <= col(endCol))
      .select((intervalCols :+ startCol :+ endCol).map(col): _*)
      .withColumn("__b", explode(sequence(
        floor(us(col(startCol)) / bucketWidthUs),
        floor(us(col(endCol)) / bucketWidthUs))))
    p.join(iv, "__b")
      .filter(col(ptTsCol) >= col(startCol) && col(ptTsCol) <= col(endCol))
      .drop("__b", startCol, endCol)
  }

  /** Weekly retention cohorts: users grouped by first-activity date,
    * counted distinct in each 7-day offset bucket they return in.
    * Emits (cohort_date, week_offset, users). The cohort frame is an
    * aggregate of the same scan hash-partitioned on the user key, so the
    * join reuses that exchange rather than reshuffling it; no broadcast
    * hint — distinct-user counts are unbounded at corpus scale, and AQE
    * downgrades to broadcast when the measured frame is small.
    */
  def retentionCohorts(events: DataFrame,
                       userCol: String = "user_id",
                       tsCol: String = "ts"): DataFrame = {
    val cohorts = events.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("cohort_date"))
    events.select(col(userCol), to_date(col(tsCol)).as("__d"))
      .join(cohorts, userCol)
      .groupBy(col("cohort_date"),
        floor(datediff(col("__d"), col("cohort_date")) / 7).as("week_offset"))
      .agg(countDistinct(col(userCol)).as("users"))
  }
}
