package graft.runtime

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, Expression, In, Literal, Murmur3Hash}
import org.apache.spark.sql.types.DataType
import java.nio.file.{Files, Paths, StandardCopyOption}

import FragmentedTable.{DeletedCol, FragEntry, PruneReport, ZoneMap}

/** Hash-bucketed [[FragmentedTable]]: the sharding layer a 100 TB
  * fragment store needs. One flat table keeps a single manifest whose
  * line count grows with every upsert between folds, whose compactions
  * rewrite the whole table, and whose point lookups probe every
  * fragment. Bucketing by `pmod(hash(key), buckets)` fixes all three
  * structurally:
  *
  *  - each bucket has its OWN manifest and fragment set → metadata per
  *    bucket stays bounded and compaction parallelizes per bucket with
  *    per-bucket I/O (a bucket fold rewrites 1/buckets of the data);
  *  - a key-equality probe hashes the literal ON THE DRIVER and reads
  *    exactly one bucket (an IN-list: one bucket per value) — zone maps
  *    then prune WITHIN the bucket;
  *  - an upsert stays TWO Spark jobs regardless of bucket count: the
  *    batch is written once `partitionBy` bucket to a staging dir, zone
  *    maps for every bucket come from one grouped aggregate over the
  *    staging output, and each bucket then ADOPTS its partition dir by
  *    rename + manifest flip (no per-bucket slice scans).
  *
  * Atomicity contract: WITHIN a bucket, the [[FragmentedTable]] manifest
  * protocol holds unchanged (readers see whole fragments or nothing).
  * ACROSS buckets an upsert is not one atomic commit — a crash mid-adopt
  * leaves some buckets with the new fragment and others without. That
  * torn state is readable (each bucket is internally consistent) and
  * CONVERGES on replay: re-upserting the same batch lands identical rows
  * per key, last-writer-wins absorbs them, and compaction folds the
  * duplicate fragment — the same replay-idempotence the streaming sinks
  * already rely on. Unadopted staging dirs are swept at the next write.
  *
  * == Re-sharding ==
  *
  * A store that outgrows its bucket count calls [[rebucket]] (run to
  * completion) or [[rebucketStart]] + [[rebucketStep]] (one OLD bucket
  * per step — the incremental background shape). Migration is
  * GENERATIONAL: new-generation bucket tables (`table__g<G>b<b>`) fill
  * one old bucket at a time, each step re-partitioning ONLY that
  * bucket's live merge into the new layout (I/O per step ∝ 1/buckets of
  * the data; the old generation is never rewritten, just drained).
  * While a migration is open:
  *
  *  - every key lives in exactly ONE place — drained old buckets route
  *    to the new generation, undrained ones keep routing to the old —
  *    so reads union disjoint key sets and upserts/deletes land next to
  *    the history they must shadow;
  *  - a journal (`table.rebucket`, atomic tmp+rename per step) records
  *    the drained set; a crash replays the in-flight bucket (duplicate
  *    identical rows that last-writer-wins absorbs — the store's usual
  *    convergence) and [[apply]]/[[open]] resume from the journal;
  *  - the bucket-count meta flips to the new layout only at the END
  *    (atomic rename), so a reader that never saw the journal still
  *    resolves a consistent pre-migration view of undrained buckets.
  *
  * The bucket function hashes the key column AS TYPED IN THE BATCH;
  * producers must keep the key's type stable across upserts (a key
  * ingested as INT and probed as LONG hashes differently). Driver-side
  * bucket pruning therefore only fires when the predicate literal's
  * type exactly matches the stored key type, declining to a full-bucket
  * probe otherwise — mismatch can cost I/O, never correctness.
  *
  * == Routing column ==
  *
  * By default buckets route on `uniqueKey`. A store may instead declare
  * a separate `routeCol` — the inverted-index shape: rows stay
  * last-writer-wins-unique on `uniqueKey` WITHIN their bucket, but the
  * bucket is `pmod(hash(routeCol), buckets)` and key-equality pruning
  * (and [[readRouted]] point probes) fire on `routeCol` literals. The
  * producer contract: a given `uniqueKey`'s `routeCol` value is
  * IMMUTABLE (a re-upsert that changed it would land in a different
  * bucket and leave the old version live), every upsert batch carries
  * the column, and [[deleteKeys]] frames must carry it too (a tombstone
  * must land in the bucket holding its victim). The route column is
  * pinned in the store meta, so reopen validates it like the bucket
  * count. This is what lets an LSH band index route per-trigger probes
  * to only the buckets a batch's band keys hash into.
  */
final class BucketedFragmentStore private (spark: SparkSession, baseDir: String,
    table: String, uniqueKey: String, val routeCol: String,
    initialBuckets: Int, initialGen: Int,
    initialMigration: Option[BucketedFragmentStore.Migration])
    extends KeyedFragmentStore {

  import BucketedFragmentStore.{BucketCol, BucketReport, Layout, Migration}

  private val lock = BucketedFragmentStore.lockFor(
    s"${java.nio.file.Paths.get(baseDir).toAbsolutePath}#$table")

  // committed layout + open migration as ONE volatile value: readers
  // snapshot it once per operation, so a concurrent commitMigration can
  // never be observed half-applied (three separate fields would let a
  // reader see the new count with the migration still "open" and union
  // the new generation twice). Mutations under `lock`.
  @volatile private var layout: Layout =
    Layout(initialBuckets, initialGen, initialMigration)

  /** The committed bucket count (pre-migration count while one is open). */
  def buckets: Int = layout.buckets

  /** Whether a re-sharding migration is currently open (drain steps
    * pending) — observability for maintenance cadences and soaks.
    */
  def migrationOpen: Boolean = layout.migration.isDefined

  /** Total on-disk bytes of the live fragments across buckets (fs
    * metadata only) — the volume signal [[maybeRebucket]] triggers on,
    * exposed for cadence observability.
    */
  def liveBytesTotal(): Long = liveTables(layout).map(_._2.liveBytes()).sum

  /** Open migration's (targetCount, drained old buckets), if any. */
  def migrationStatus: Option[(Int, Set[Int])] =
    layout.migration.map(m => (m.newCount, m.done))

  private def tableNameFor(gen: Int, b: Int): String =
    if (gen == 0) s"${table}__b$b" else s"${table}__g${gen}b$b"

  private def bucketTable(gen: Int, b: Int): FragmentedTable =
    new FragmentedTable(spark, baseDir, tableNameFor(gen, b), uniqueKey)

  /** Per-bucket stores of the COMMITTED generation (visible for
    * maintenance/inspection); during a migration [[liveTables]] is the
    * complete picture.
    */
  def bucketTables: IndexedSeq[FragmentedTable] = {
    val st = layout
    (0 until st.buckets).map(b => bucketTable(st.gen, b))
  }

  /** Every (gen, bucket) table that can currently hold keys under the
    * given layout snapshot: undrained old buckets plus — during a
    * migration — all new-generation buckets.
    */
  private def liveTables(st: Layout): Seq[((Int, Int), FragmentedTable)] =
    st.migration match {
      case None =>
        (0 until st.buckets).map(b => (st.gen, b) -> bucketTable(st.gen, b))
      case Some(m) =>
        (0 until st.buckets).filterNot(m.done)
          .map(b => (st.gen, b) -> bucketTable(st.gen, b)) ++
          (0 until m.newCount).map(b => (m.newGen, b) -> bucketTable(m.newGen, b))
    }

  private def bucketExprFor(count: Int): Column =
    pmod(hash(FragmentedTable.qcol(routeCol)), lit(count))

  /** Stage once partitioned by bucket, zone-map in one grouped pass,
    * adopt per bucket — into the given generation/count.
    */
  private def stageAndAdoptInto(df: DataFrame, gen: Int, count: Int,
                                light: Boolean = false): Unit = {
    sweepStaging()
    val staging = Paths.get(baseDir,
      s"${table}__staging_" + java.util.UUID.randomUUID().toString.replace("-", ""))
    df.withColumn(BucketCol, bucketExprFor(count))
      .write.partitionBy(BucketCol).parquet(staging.toString)
    // an empty frame stages no partition dirs (just _SUCCESS): nothing
    // to adopt, and reading the empty dir would fail schema inference
    val stagedDirs = Option(staging.toFile.list()).toSeq.flatten
      .filter(_.startsWith(s"$BucketCol="))
    if (stagedDirs.isEmpty) { Fs.deleteRecursive(staging); return }
    val fragSchema = FragmentedTable.relaxNullable(df.schema)
    if (light) {
      // LIGHT adopt (the L0 trade — see FragmentedTable.upsertLight):
      // buckets come from the staging DIRECTORY listing, stats defer to
      // the next fold; the whole upsert costs one Spark job
      stagedDirs.foreach { d =>
        val b = d.stripPrefix(s"$BucketCol=").toInt
        bucketTable(gen, b).adopt(staging.resolve(d), None, Some(fragSchema))
      }
      Fs.deleteRecursive(staging)
      return
    }
    // read back under the writer's schema + the bucket partition column
    // (nullability relaxed — see FragmentedTable.relaxNullable): skips
    // the partitioned-dir footer inference job per upsert
    val backSchema = org.apache.spark.sql.types.StructType(
      fragSchema.fields :+
        org.apache.spark.sql.types.StructField(BucketCol,
          org.apache.spark.sql.types.IntegerType, nullable = true))
    val back = spark.read.schema(backSchema).parquet(staging.toString)
    val (tracked, aggs) = ZoneMap.aggPlan(back.schema, exclude = Set(BucketCol))
    val statRows = back.groupBy(col(BucketCol)).agg(aggs.head, aggs.tail: _*).collect()
    statRows.foreach { r =>
      // partition values read back as Int or (inference off) String —
      // parse, don't cast
      val b = r.get(r.fieldIndex(BucketCol)).toString.toInt
      bucketTable(gen, b).adopt(staging.resolve(s"$BucketCol=$b"),
        Some(ZoneMap.fromRow(r, tracked)), Some(fragSchema))
    }
    Fs.deleteRecursive(staging) // _SUCCESS + any empty remainder
  }

  /** Write path during a migration: split the batch by whether each
    * key's OLD bucket has drained — drained keys land in the new
    * generation (next to any post-drain history), undrained keys in the
    * old (so the coming drain carries them over in order).
    */
  private def routeWrite(df: DataFrame, light: Boolean = false): Unit =
    lock.synchronized {
    val st = layout
    st.migration match {
      case None => stageAndAdoptInto(df, st.gen, st.buckets, light)
      case Some(m) if m.done.isEmpty =>
        stageAndAdoptInto(df, st.gen, st.buckets, light)
      case Some(m) if m.done.size == st.buckets =>
        stageAndAdoptInto(df, m.newGen, m.newCount, light)
      case Some(m) =>
        // The split evaluates the batch TWICE (complementary filters); a
        // nondeterministic upstream frame (sampling, uuid(), rand-derived
        // columns) re-evaluated per branch could route a row into both
        // generations or neither. Pin one materialized evaluation first —
        // batch-sized, not corpus-sized, so the checkpoint cost is ∝ the
        // trigger. Lost-executor recompute of a localCheckpoint fails the
        // job rather than silently re-rolling the dice; the store's
        // replay-idempotence absorbs the retried write.
        val pinned = df.localCheckpoint(true)
        val oldB = bucketExprFor(st.buckets)
        val drained = m.done.toSeq
        stageAndAdoptInto(pinned.filter(oldB.isin(drained: _*)),
          m.newGen, m.newCount, light)
        stageAndAdoptInto(pinned.filter(!oldB.isin(drained: _*)),
          st.gen, st.buckets, light)
    }
  }

  /** Orphan staging dirs from a crashed write — single-writer topology,
    * so anything still present at our write is dead.
    */
  private def sweepStaging(): Unit =
    Option(new java.io.File(baseDir).list()).toSeq.flatten
      .filter(_.startsWith(s"${table}__staging_"))
      .foreach(n => Fs.deleteRecursive(Paths.get(baseDir, n)))

  def upsert(batch: DataFrame): Unit = {
    require(!batch.columns.contains(DeletedCol),
      s"$DeletedCol is reserved for tombstone fragments")
    require(!batch.columns.contains(BucketCol),
      s"$BucketCol is reserved for bucket routing")
    require(batch.columns.contains(routeCol),
      s"batch must carry the routing column '$routeCol'")
    routeWrite(batch)
  }

  /** [[upsert]] minus the per-bucket stats job — the batch-sized L0
    * trade ([[FragmentedTable.upsertLight]]): fragments land stat-less
    * (kept in every scan set until the next fold levels them) and the
    * whole routed write costs exactly one Spark job.
    */
  override def upsertLight(batch: DataFrame): Unit = {
    require(!batch.columns.contains(DeletedCol),
      s"$DeletedCol is reserved for tombstone fragments")
    require(!batch.columns.contains(BucketCol),
      s"$BucketCol is reserved for bucket routing")
    require(batch.columns.contains(routeCol),
      s"batch must carry the routing column '$routeCol'")
    routeWrite(batch, light = true)
  }

  def deleteKeys(keys: DataFrame): Unit = {
    // a tombstone must land in the bucket holding its victim: routing
    // by a non-key column therefore needs the route VALUE alongside the
    // key (the caller knows it — route values are immutable per key)
    require(keys.columns.contains(routeCol),
      s"deleteKeys frame must carry the routing column '$routeCol'")
    val cols =
      if (routeCol == uniqueKey) Seq(FragmentedTable.qcol(uniqueKey))
      else Seq(FragmentedTable.qcol(uniqueKey), FragmentedTable.qcol(routeCol))
    routeWrite(keys.select(cols: _*).distinct()
      .withColumn(DeletedCol, lit(true)))
  }

  def keyColumn: String = uniqueKey

  def deleteWhere(pred: Column): Unit =
    read().foreach { df =>
      val cols =
        if (routeCol == uniqueKey) Seq(FragmentedTable.qcol(uniqueKey))
        else Seq(FragmentedTable.qcol(uniqueKey), FragmentedTable.qcol(routeCol))
      deleteKeys(df.filter(pred).select(cols: _*))
    }

  /** During a migration, a key LEGITIMATELY lives in the new generation
    * iff its OLD bucket has drained — anything else there is a
    * crash-window copy (a drain whose adopt landed but whose journal
    * mark was lost; the old bucket remains authoritative and will
    * re-drain, tombstones included). Filtering new-generation reads by
    * this rule keeps the window invisible: no double-counted keys, and
    * a delete issued in the window (routed to the authoritative old
    * bucket) is honored immediately.
    */
  private def newGenAuthority(st: Layout, m: Migration): Column = {
    val drained = m.done.toSeq
    if (drained.isEmpty) lit(false)
    else bucketExprFor(st.buckets).isin(drained: _*)
  }

  private def authoritativeFrames(st: Layout): Seq[DataFrame] =
    liveTables(st).flatMap { case ((gen, _), t) =>
      (t.read(), st.migration) match {
        case (Some(df), Some(m)) if gen == m.newGen =>
          Some(df.filter(newGenAuthority(st, m)))
        case (f, _) => f
      }
    }

  def read(): Option[DataFrame] = {
    val parts = authoritativeFrames(layout)
    if (parts.isEmpty) None
    else Some(parts.reduce(_.unionByName(_, allowMissingColumns = true)))
  }

  /** `read().filter(pred)` with TWO pruning levels: bucket routing from
    * key-equality literals (driver-side hash — exact type match only),
    * then each probed bucket's own zone-map skipping.
    */
  def readWhere(pred: Column): Option[DataFrame] = readWhereReport(pred)._1

  def readWhereReport(pred: Column): (Option[DataFrame], BucketReport) = {
    val st = layout
    val live = liveTables(st)
    val targets = keyTargets(st, pred).getOrElse(live.map(_._1).toSet)
    val probed = live.filter(t => targets(t._1))
    val results = probed.map { case (gb, t) =>
      // new-generation probes carry the crash-window authority guard
      // (see newGenAuthority); an opaque extra conjunct costs no key
      // pruning — the bridge declines it and pred's own conjuncts
      // still prune
      val p = st.migration match {
        case Some(m) if gb._1 == m.newGen => pred && newGenAuthority(st, m)
        case _ => pred
      }
      gb -> t.readWhereReport(p)
    }
    val frames = results.flatMap(_._2._1)
    // report keys are (gen, bucket): mid-migration both generations can
    // probe the same bucket INDEX, and a bare-index map would collapse
    // them and under-report scanned I/O
    val report = BucketReport(live.size, probed.map(_._1).sorted,
      results.map { case (gb, (_, r)) => gb -> r }.toMap)
    if (frames.nonEmpty)
      (Some(frames.reduce(_.unionByName(_, allowMissingColumns = true))), report)
    else unionSchema() match {
      // the probed buckets are empty but the STORE is not: the contract
      // is read().filter(pred), so hand back an empty frame with the
      // union schema rather than None
      case Some(schema) =>
        val empty = spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        (Some(empty.filter(pred)), report)
      case None => (None, report)
    }
  }

  /** First-wins union schema across the buckets; None on an empty store. */
  private def unionSchema(): Option[org.apache.spark.sql.types.StructType] = {
    val parts = liveTables(layout).flatMap(_._2.tableSchema())
    if (parts.isEmpty) None
    else {
      val seen = scala.collection.mutable.LinkedHashMap[String,
        org.apache.spark.sql.types.StructField]()
      parts.foreach(_.fields.foreach(f =>
        if (!seen.contains(f.name)) seen(f.name) = f))
      Some(org.apache.spark.sql.types.StructType(seen.values.toSeq))
    }
  }

  /** (gen, bucket) targets that can hold a key satisfying some
    * route-equality conjunct of `pred`; None = no usable conjunct (probe
    * everything). Uses the FIRST route-equality/IN conjunct — any row
    * satisfying the whole predicate satisfies each conjunct, so its
    * route value hashes into that conjunct's bucket set. During a
    * migration each literal routes by its old bucket's drain state —
    * exactly the write path's routing, so probe and data can't disagree.
    */
  private def keyTargets(st: Layout, pred: Column): Option[Set[(Int, Int)]] = {
    val keyType = storedRouteType(st).getOrElse(return None)
    org.apache.spark.sql.GraftColumnBridge.predicateConjuncts(pred)
      .flatten.flatMap(literalSet(_, keyType)).headOption
      .map(_.map(routeOfLiteral(st, _)))
  }

  private def isKey(e: Expression): Boolean =
    FragmentedTable.ZoneProbe.refsOnly(e, routeCol)

  /** The key-equality/IN literals of one conjunct, or None. */
  private def literalSet(c: Expression, keyType: DataType): Option[Set[Literal]] = c match {
    case EqualTo(a, l @ Literal(_, dt)) if isKey(a) && dt == keyType => Some(Set(l))
    case EqualTo(l @ Literal(_, dt), a) if isKey(a) && dt == keyType => Some(Set(l))
    case EqualNullSafe(a, l @ Literal(_, dt)) if isKey(a) && dt == keyType => Some(Set(l))
    case EqualNullSafe(l @ Literal(_, dt), a) if isKey(a) && dt == keyType => Some(Set(l))
    case In(a, vs) if isKey(a) && vs.nonEmpty && vs.forall {
        case Literal(_, dt) => dt == keyType
        case _              => false
      } =>
      Some(vs.map { case l: Literal => l }.toSet)
    case _ => None
  }

  /** Where a key with this literal value lives under the snapshot. */
  private def routeOfLiteral(st: Layout, l: Literal): (Int, Int) = st.migration match {
    case None => (st.gen, bucketOfLiteral(l, st.buckets))
    case Some(m) =>
      val old = bucketOfLiteral(l, st.buckets)
      if (m.done(old)) (m.newGen, bucketOfLiteral(l, m.newCount)) else (st.gen, old)
  }

  /** Driver-side replica of `pmod(hash(key), count)` — Murmur3 with
    * Spark's default seed, evaluated on the literal.
    */
  private def bucketOfLiteral(l: Literal, count: Int): Int = {
    val h = Murmur3Hash(Seq(l), 42).eval(null).asInstanceOf[Int]
    math.floorMod(h, count)
  }

  /** The route column's stored DataType, from the first bucket fragment
    * that has one (single footer read); None on an empty store (nothing
    * to prune then anyway).
    */
  private def storedRouteType(st: Layout): Option[DataType] =
    liveTables(st).iterator.map(_._2)
      .flatMap(_.columnDataType(routeCol)).nextOption()

  /** Point-probe by ROUTE VALUES: the union of exactly the buckets any
    * of `routeValues` can live in — the inverted-index read path
    * ([[readWhere]] with a giant IN would push the same bucket set but
    * also a giant parquet filter; this returns the raw bucket union and
    * lets the caller's own equi-join do the matching, the cheaper shape
    * when the values number thousands). Values must match the stored
    * route type exactly, else the probe declines to a full [[read]]
    * (I/O, never correctness). Returns None only on an empty store.
    *
    * Scale contract: probed buckets ≤ min(distinct values, bucket
    * count), and with a [[maybeRebucket]] cadence keeping per-bucket
    * bytes bounded, probe I/O is ∝ the value count — independent of
    * store size.
    */
  def readRouted(routeValues: Seq[Any]): Option[DataFrame] =
    readRoutedImpl(routeValues, exact = true)

  /** [[readRouted]] with the per-bucket last-writer-wins merge SKIPPED
    * ([[FragmentedTable.readSuperset]]): the raw fragment union minus
    * tombstone marker rows, so superseded versions, tombstone-shadowed
    * rows, and mid-migration duplicate copies all RESURFACE. Zero
    * shuffles — no per-bucket window — which makes it the right probe
    * for an LSH INDEX read whose contract is already "a superset is
    * fine" (the banded ingest: every candidate id is re-verified against
    * the exactly-merged signature store, so an extra stale candidate
    * costs one verify row, never a wrong survivor). Never correct for a
    * caller that treats rows as current truth.
    */
  def readRoutedSuperset(routeValues: Seq[Any]): Option[DataFrame] =
    readRoutedImpl(routeValues, exact = false)

  private def readRoutedImpl(routeValues: Seq[Any],
                             exact: Boolean): Option[DataFrame] = {
    val st = layout
    if (routeValues.isEmpty)
      return unionSchema().map(s => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s))
    val targets = storedRouteType(st) match {
      case None => None // empty store or typeless: fall through to read()
      case Some(dt) =>
        val lits = routeValues.map(Literal(_))
        if (lits.exists(_.dataType != dt)) None
        else Some(lits.map(routeOfLiteral(st, _)).toSet)
    }
    targets match {
      case None if exact => read()
      case None =>
        val frames = liveTables(st).flatMap(_._2.readSuperset())
        if (frames.nonEmpty)
          Some(frames.reduce(_.unionByName(_, allowMissingColumns = true)))
        else unionSchema().map(s => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s))
      case Some(ts) if exact => readTargets(st, ts)
      case Some(ts) =>
        // superset mode needs no generation-authority filter either:
        // a crash-window duplicate copy is just one more superset row
        val frames = liveTables(st).filter(t => ts(t._1))
          .flatMap { case (_, t) => t.readSuperset() }
        if (frames.nonEmpty)
          Some(frames.reduce(_.unionByName(_, allowMissingColumns = true)))
        else unionSchema().map(s => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s))
    }
  }

  /** Exact merged read of a (gen, bucket) target set — the tail shared
    * by [[readRouted]]'s literal path and [[readRoutedFrame]]'s
    * frame-derived path.
    */
  private def readTargets(st: Layout, ts: Set[(Int, Int)]): Option[DataFrame] = {
    val frames = liveTables(st).filter(t => ts(t._1)).flatMap {
      case ((gen, _), t) =>
        (t.read(), st.migration) match {
          case (Some(df), Some(m)) if gen == m.newGen =>
            Some(df.filter(newGenAuthority(st, m)))
          case (f, _) => f
        }
    }
    if (frames.nonEmpty)
      Some(frames.reduce(_.unionByName(_, allowMissingColumns = true)))
    else unionSchema().map(s => spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s))
  }

  /** [[readRouted]] without a driver-side value list (VERDICT r16 task
    * 2): the (gen, bucket) targets are derived DISTRIBUTIVELY from the
    * FIRST column of `keys` with the same `pmod(hash(route), count)`
    * expression the write path stages by, so the only collect is the
    * distinct target-pair set — bounded by the bucket count, never the
    * key count. This is the over-threshold forget probe: a 10⁷-key
    * forget frame reads only the buckets its keys hash into while the
    * driver holds at most `buckets` rows; the caller still owns row
    * matching (semi-join against its frame), exactly [[readRouted]]'s
    * contract. During a migration each key routes by its old bucket's
    * drain state via the same rule as [[routeOfLiteral]], expressed as
    * a `when` over the drained-bucket set, so probe and data cannot
    * disagree mid-drain. A type mismatch between the frame's column
    * and the stored route type declines to a full [[read]] — hash(INT)
    * ≠ hash(LONG), so pruning on a mistyped frame would miss buckets
    * (I/O cost, never correctness). NULL route values hash like the
    * write path hashes them (seed bucket), so a NULL-keyed row is
    * probed from the bucket it was staged into.
    */
  def readRoutedFrame(keys: DataFrame): Option[DataFrame] = {
    val st = layout
    val field = keys.schema.fields.headOption.getOrElse(
      throw new IllegalArgumentException("readRoutedFrame: keys frame has no columns"))
    storedRouteType(st) match {
      case Some(dt) if field.dataType == dt =>
        val c = FragmentedTable.qcol(field.name)
        val oldB = pmod(hash(c), lit(st.buckets))
        val gb: Column = st.migration match {
          case None => struct(lit(st.gen).as("g"), oldB.as("b"))
          case Some(m) =>
            val drained =
              if (m.done.isEmpty) lit(false)
              else oldB.isInCollection(m.done.toSeq)
            struct(
              when(drained, lit(m.newGen)).otherwise(lit(st.gen)).as("g"),
              when(drained, pmod(hash(c), lit(m.newCount))).otherwise(oldB).as("b"))
        }
        val ts = keys.select(gb.as("gb")).distinct().collect()
          .map { r => val s = r.getStruct(0); (s.getInt(0), s.getInt(1)) }.toSet
        if (ts.isEmpty)
          unionSchema().map(s => spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s))
        else readTargets(st, ts)
      case _ => read() // empty store or type mismatch: probe everything
    }
  }

  def fragmentCounts(): IndexedSeq[Int] =
    liveTables(layout).map(_._2.fragmentCount()).toIndexedSeq

  def compact(): Unit = liveTables(layout).foreach(_._2.compact())

  def compactTiered(tierFactor: Double = 4.0): Boolean =
    liveTables(layout).map(_._2.compactTiered(tierFactor)).exists(identity)

  /** Bound read amplification PER BUCKET — each bucket folds its own
    * run, so maintenance I/O is ∝ the hot buckets' recent batches.
    */
  def maybeCompact(maxLivePerBucket: Int, tierFactor: Double = 4.0): Boolean =
    liveTables(layout).map(_._2.maybeCompact(maxLivePerBucket, tierFactor)).exists(identity)

  def compactIfOver(maxLivePerBucket: Int): Boolean =
    liveTables(layout).map(_._2.compactIfOver(maxLivePerBucket)).exists(identity)

  // ---- re-sharding ----------------------------------------------------

  private def journalPath = Paths.get(baseDir, s"$table.rebucket")
  private def metaPath = Paths.get(baseDir, s"$table.buckets")

  private def writeJournal(m: Migration): Unit = {
    val body = s"${m.newCount} ${m.newGen} ${m.done.toSeq.sorted.mkString(",")}\n"
    val tmp = Paths.get(baseDir, s"$table.rebucket__tmp_" +
      java.util.UUID.randomUUID().toString.replace("-", ""))
    Files.write(tmp, body.getBytes("UTF-8"))
    Files.move(tmp, journalPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Open a migration to `newCount` buckets (no data moves yet). A
    * journal already targeting `newCount` resumes instead; any other
    * open migration must finish first.
    */
  def rebucketStart(newCount: Int): Unit = lock.synchronized {
    require(newCount > 0, "bucket count must be positive")
    val st = layout
    st.migration match {
      case Some(m) =>
        require(m.newCount == newCount,
          s"a migration to ${m.newCount} buckets is already open; finish it first")
      case None =>
        require(newCount != st.buckets, s"store already has $newCount buckets")
        val m = Migration(newCount, st.gen + 1, Set.empty)
        writeJournal(m)
        layout = st.copy(migration = Some(m))
    }
  }

  /** Drain ONE undrained old bucket into the new generation; returns
    * true while more remain (the background-cadence contract: call
    * until false). I/O per step ∝ that bucket's live rows. The final
    * step commits the new layout (meta flip) and GCs the old
    * generation. Crash-safe at every point: the journal marks a bucket
    * drained only AFTER its rows are adopted, so a replayed step
    * re-adopts identical rows that last-writer-wins absorbs — and the
    * drain carries TOMBSTONE winners along
    * ([[FragmentedTable.readKeepTombstones]]), so a delete that landed
    * in the replay window still shadows the earlier attempt's adopted
    * copy instead of being resurrected by it. A drained bucket's FILES
    * are kept until [[commitMigration]]: a lazy frame handed out by
    * read()/readWhere() before the drain stays executable for the whole
    * migration (one generation of grace, like compact's readerGrace),
    * which matters because cadence-driven [[maybeRebucket]] makes drain
    * steps recur on every maintenance tick. Only the final meta flip
    * drops the old generation.
    */
  def rebucketStep(): Boolean = lock.synchronized {
    val st = layout
    val m = st.migration.getOrElse(return false)
    (0 until st.buckets).find(b => !m.done(b)) match {
      case Some(b) =>
        val src = bucketTable(st.gen, b)
        src.readKeepTombstones()
          .foreach(rows => stageAndAdoptInto(rows, m.newGen, m.newCount))
        val m2 = m.copy(done = m.done + b)
        writeJournal(m2)
        layout = st.copy(migration = Some(m2))
        if (m2.done.size < st.buckets) true else { commitMigration(st, m2); false }
      case None => commitMigration(st, m); false
    }
  }

  /** Run a full migration to `newCount` (start or resume, then drain
    * every bucket). Routing, reads, and writes stay correct throughout,
    * so this can interleave with live upserts/deletes.
    */
  def rebucket(newCount: Int): Unit = {
    rebucketStart(newCount)
    while (rebucketStep()) ()
  }

  /** Background re-sharding driver for a maintenance cadence: while a
    * migration is open, drains ONE bucket per call (bounded work per
    * tick); otherwise opens a DOUBLING migration once the average live
    * bucket's on-disk bytes (fs metadata only, no data read) exceed
    * `maxBytesPerBucket`, or — when a floor is given — a HALVING
    * migration once they fall below `minBytesPerBucket` (the inverse
    * trigger: a table that shrank after a large deleteWhere reclaims
    * its bucket count instead of keeping it forever). Both run through
    * the same drain/journal protocol. Returns true when it did
    * migration work — call it where `maybeCompact` is called and the
    * table re-shards itself incrementally in either direction.
    *
    * Hysteresis: the floor must sit at ≤ maxBytesPerBucket/4 so a
    * just-halved store (whose average doubles) cannot immediately
    * re-trip the doubling bound — enforced, not advised.
    */
  def maybeRebucket(maxBytesPerBucket: Long,
                    minBytesPerBucket: Long = 0L): Boolean = lock.synchronized {
    require(maxBytesPerBucket > 0, "maxBytesPerBucket must be positive")
    require(minBytesPerBucket >= 0 &&
      (minBytesPerBucket == 0L || minBytesPerBucket * 4 <= maxBytesPerBucket),
      "minBytesPerBucket must be 0 (disabled) or <= maxBytesPerBucket/4")
    val st = layout
    st.migration match {
      case Some(_) => rebucketStep(); true
      case None =>
        val total = liveTables(st).map(_._2.liveBytes()).sum
        if (total > maxBytesPerBucket * st.buckets) {
          rebucketStart(st.buckets * 2)
          rebucketStep()
          true
        } else if (minBytesPerBucket > 0 && st.buckets > 1 &&
            total < minBytesPerBucket * st.buckets) {
          rebucketStart(st.buckets / 2)
          rebucketStep()
          true
        } else false
    }
  }

  private def commitMigration(st: Layout, m: Migration): Unit = {
    // the ONE place drained old-generation files are GC'd: per-step
    // drops would invalidate lazy frames handed out pre-drain (see
    // rebucketStep), so the whole old generation rides along until the
    // layout flips here
    (0 until st.buckets).filter(m.done).foreach(b => dropBucketTable(st.gen, b))
    val tmp = Paths.get(baseDir, s"$table.buckets__tmp_" +
      java.util.UUID.randomUUID().toString.replace("-", ""))
    val routeSuffix = if (routeCol == uniqueKey) "" else s" $routeCol"
    Files.write(tmp, s"${m.newCount} ${m.newGen}$routeSuffix\n".getBytes("UTF-8"))
    Files.move(tmp, metaPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // ONE write: count, generation, and migration-closed flip together
    layout = Layout(m.newCount, m.newGen, None)
    Files.deleteIfExists(journalPath)
  }

  /** Remove every artifact of one bucket's [[FragmentedTable]]: its
    * manifest, retired-list sidecar, and fragment dirs.
    */
  private def dropBucketTable(gen: Int, b: Int): Unit = {
    val name = tableNameFor(gen, b)
    Files.deleteIfExists(Paths.get(baseDir, s"$name.fragments"))
    Files.deleteIfExists(Paths.get(baseDir, s"$name.retired"))
    Option(new java.io.File(baseDir).list()).toSeq.flatten
      .filter(_.startsWith(s"${name}__frag_"))
      .foreach(n => Fs.deleteRecursive(Paths.get(baseDir, n)))
  }
}

object BucketedFragmentStore {

  // JVM-global writer serialization per (warehouse, table): staging
  // sweep + adopt must not interleave with another in-JVM writer
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(key: String): Object =
    locks.computeIfAbsent(key, _ => new Object)

  /** Probe report keyed by (generation, bucket) — the pair is the
    * stable identity mid-migration, where both generations can carry
    * the same bucket index.
    */
  final case class BucketReport(totalBuckets: Int, probed: Seq[(Int, Int)],
                                perBucket: Map[(Int, Int), PruneReport]) {
    def fragmentsScanned: Int = perBucket.valuesIterator.map(_.scanned).sum
  }

  /** Open re-shard: target layout plus the drained OLD buckets. */
  private[runtime] final case class Migration(newCount: Int, newGen: Int,
                                              done: Set[Int])

  /** One-snapshot view of the store's layout: committed bucket count +
    * generation, plus the open migration if any.
    */
  private[runtime] final case class Layout(buckets: Int, gen: Int,
                                           migration: Option[Migration])

  private[runtime] val BucketCol = "__graft_bucket"

  /** Meta format: `<buckets>` (generation 0, the original layout),
    * `<buckets> <gen>` after a completed [[rebucket]], with an optional
    * third token naming a non-default routing column (pinned for the
    * store's lifetime, like the count).
    */
  private def parseMeta(s: String): (Int, Int, Option[String]) =
    s.trim.split("\\s+") match {
      case Array(b)       => (b.toInt, 0, None)
      case Array(b, g)    => (b.toInt, g.toInt, None)
      case Array(b, g, r) => (b.toInt, g.toInt, Some(r))
      case other          => sys.error(s"unreadable bucket meta: '$s'")
    }

  private def readJournal(baseDir: String, table: String,
                          metaGen: Int): Option[Migration] = {
    val p = Paths.get(baseDir, s"$table.rebucket")
    if (!Files.exists(p)) return None
    val parts = new String(Files.readAllBytes(p), "UTF-8").trim.split("\\s+")
    val (nc, ng) = (parts(0).toInt, parts(1).toInt)
    if (ng <= metaGen) {
      // stale journal from a migration whose meta flip already landed
      // (crash between commit's rename and journal delete): sweep it
      Files.deleteIfExists(p)
      None
    } else {
      val done = if (parts.length > 2 && parts(2).nonEmpty)
        parts(2).split(',').map(_.toInt).toSet else Set.empty[Int]
      Some(Migration(nc, ng, done))
    }
  }

  /** Create (writing the bucket-count meta) or open (validating it).
    * The meta check/write runs under the per-table writer lock and
    * creates with CREATE_NEW, so two concurrent creators can never both
    * write: the loser re-validates against whatever actually landed.
    * An interrupted [[rebucket]]'s journal is resumed, not discarded.
    * `routeCol` declares a non-default routing column (see the class
    * doc's routing-column contract); it is pinned in the meta.
    */
  def apply(spark: SparkSession, baseDir: String, table: String,
            uniqueKey: String, buckets: Int = 16,
            routeCol: Option[String] = None): BucketedFragmentStore = {
    require(buckets > 0, "buckets must be positive")
    val route = routeCol.getOrElse(uniqueKey)
    require(!route.exists(_.isWhitespace),
      s"routing column name must not contain whitespace: '$route'")
    Files.createDirectories(Paths.get(baseDir))
    val meta = Paths.get(baseDir, s"$table.buckets")
    lockFor(s"${Paths.get(baseDir).toAbsolutePath}#$table").synchronized {
      def validateAndOpen(): BucketedFragmentStore = {
        val (storedB, storedG, storedR) = parseMeta(
          new String(Files.readAllBytes(meta), "UTF-8"))
        require(storedB == buckets,
          s"$table was created with $storedB buckets; call rebucket to change")
        require(storedR.getOrElse(uniqueKey) == route,
          s"$table was created routing on '${storedR.getOrElse(uniqueKey)}', not '$route'")
        new BucketedFragmentStore(spark, baseDir, table, uniqueKey, route,
          storedB, storedG, readJournal(baseDir, table, storedG))
      }
      if (Files.exists(meta)) validateAndOpen()
      else try {
        val routeSuffix = if (route == uniqueKey) "" else s" 0 $route"
        Files.write(meta, s"$buckets$routeSuffix\n".getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        new BucketedFragmentStore(spark, baseDir, table, uniqueKey, route,
          buckets, 0, None)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => validateAndOpen()
      }
    }
  }

  /** Open an existing store, reading the bucket count (and generation,
    * routing column, plus any in-flight migration journal) from its meta.
    */
  def open(spark: SparkSession, baseDir: String, table: String,
           uniqueKey: String): BucketedFragmentStore = {
    val meta = Paths.get(baseDir, s"$table.buckets")
    require(Files.exists(meta), s"no bucketed store named $table at $baseDir")
    val (storedB, storedG, storedR) = parseMeta(
      new String(Files.readAllBytes(meta), "UTF-8"))
    new BucketedFragmentStore(spark, baseDir, table, uniqueKey,
      storedR.getOrElse(uniqueKey),
      storedB, storedG, readJournal(baseDir, table, storedG))
  }
}
