package graft.runtime

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, Expression, In, Literal, Murmur3Hash}
import org.apache.spark.sql.types.DataType
import java.nio.file.{Files, Paths}

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
  * The bucket function hashes the key column AS TYPED IN THE BATCH;
  * producers must keep the key's type stable across upserts (a key
  * ingested as INT and probed as LONG hashes differently). Driver-side
  * bucket pruning therefore only fires when the predicate literal's
  * type exactly matches the stored key type, declining to a full-bucket
  * probe otherwise — mismatch can cost I/O, never correctness.
  */
final class BucketedFragmentStore private (spark: SparkSession, baseDir: String,
    table: String, uniqueKey: String, val buckets: Int)
    extends KeyedFragmentStore {

  import BucketedFragmentStore.{BucketCol, BucketReport}

  private val lock = BucketedFragmentStore.lockFor(
    s"${java.nio.file.Paths.get(baseDir).toAbsolutePath}#$table")

  /** Per-bucket stores (visible for maintenance/inspection). */
  val bucketTables: IndexedSeq[FragmentedTable] =
    (0 until buckets).map(b =>
      new FragmentedTable(spark, baseDir, s"${table}__b$b", uniqueKey))

  private def bucketExpr: Column = pmod(hash(col(s"`$uniqueKey`")), lit(buckets))

  /** Stage once partitioned by bucket, zone-map in one grouped pass,
    * adopt per bucket. Two Spark jobs total.
    */
  private def stageAndAdopt(df: DataFrame): Unit = lock.synchronized {
    sweepStaging()
    val staging = Paths.get(baseDir,
      s"${table}__staging_" + java.util.UUID.randomUUID().toString.replace("-", ""))
    df.withColumn(BucketCol, bucketExpr)
      .write.partitionBy(BucketCol).parquet(staging.toString)
    // an empty frame stages no partition dirs (just _SUCCESS): nothing
    // to adopt, and reading the empty dir would fail schema inference
    val staged = Option(staging.toFile.list()).toSeq.flatten
      .exists(_.startsWith(s"$BucketCol="))
    if (!staged) { Fs.deleteRecursive(staging); return }
    val back = spark.read.parquet(staging.toString)
    val (tracked, aggs) = ZoneMap.aggPlan(back.schema, exclude = Set(BucketCol))
    val statRows = back.groupBy(col(BucketCol)).agg(aggs.head, aggs.tail: _*).collect()
    val fragSchema = org.apache.spark.sql.types.StructType(
      back.schema.fields.filterNot(_.name == BucketCol))
    statRows.foreach { r =>
      // partition values read back as Int or (inference off) String —
      // parse, don't cast
      val b = r.get(r.fieldIndex(BucketCol)).toString.toInt
      bucketTables(b).adopt(staging.resolve(s"$BucketCol=$b"),
        Some(ZoneMap.fromRow(r, tracked)), Some(fragSchema))
    }
    Fs.deleteRecursive(staging) // _SUCCESS + any empty remainder
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
    stageAndAdopt(batch)
  }

  def deleteKeys(keys: DataFrame): Unit =
    stageAndAdopt(keys.select(col(s"`$uniqueKey`")).distinct()
      .withColumn(DeletedCol, lit(true)))

  def keyColumn: String = uniqueKey

  def deleteWhere(pred: Column): Unit =
    read().foreach(df => deleteKeys(df.filter(pred).select(s"`$uniqueKey`")))

  def read(): Option[DataFrame] = {
    val parts = bucketTables.flatMap(_.read())
    if (parts.isEmpty) None
    else Some(parts.reduce(_.unionByName(_, allowMissingColumns = true)))
  }

  /** `read().filter(pred)` with TWO pruning levels: bucket routing from
    * key-equality literals (driver-side hash — exact type match only),
    * then each probed bucket's own zone-map skipping.
    */
  def readWhere(pred: Column): Option[DataFrame] = readWhereReport(pred)._1

  def readWhereReport(pred: Column): (Option[DataFrame], BucketReport) = {
    val targets = keyBuckets(pred).getOrElse((0 until buckets).toSet)
    val probed = targets.toSeq.sorted
    val results = probed.map(b => b -> bucketTables(b).readWhereReport(pred))
    val frames = results.flatMap(_._2._1)
    val report = BucketReport(buckets, probed,
      results.map { case (b, (_, r)) => b -> r }.toMap)
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
    val parts = bucketTables.flatMap(_.tableSchema())
    if (parts.isEmpty) None
    else {
      val seen = scala.collection.mutable.LinkedHashMap[String,
        org.apache.spark.sql.types.StructField]()
      parts.foreach(_.fields.foreach(f =>
        if (!seen.contains(f.name)) seen(f.name) = f))
      Some(org.apache.spark.sql.types.StructType(seen.values.toSeq))
    }
  }

  /** Buckets that can hold a key satisfying some key-equality conjunct
    * of `pred`; None = no usable conjunct (probe everything). Uses the
    * FIRST key-equality/IN conjunct — any row satisfying the whole
    * predicate satisfies each conjunct, so its key hashes into that
    * conjunct's bucket set.
    */
  private def keyBuckets(pred: Column): Option[Set[Int]] = {
    val keyType = storedKeyType().getOrElse(return None)
    org.apache.spark.sql.GraftColumnBridge.predicateConjuncts(pred)
      .flatten.flatMap(bucketSet(_, keyType)).headOption
  }

  private def isKey(e: Expression): Boolean =
    FragmentedTable.ZoneProbe.refsOnly(e, uniqueKey)

  private def bucketSet(c: Expression, keyType: DataType): Option[Set[Int]] = c match {
    case EqualTo(a, l @ Literal(_, dt)) if isKey(a) && dt == keyType =>
      Some(Set(bucketOfLiteral(l)))
    case EqualTo(l @ Literal(_, dt), a) if isKey(a) && dt == keyType =>
      Some(Set(bucketOfLiteral(l)))
    case EqualNullSafe(a, l @ Literal(_, dt)) if isKey(a) && dt == keyType =>
      Some(Set(bucketOfLiteral(l)))
    case EqualNullSafe(l @ Literal(_, dt), a) if isKey(a) && dt == keyType =>
      Some(Set(bucketOfLiteral(l)))
    case In(a, vs) if isKey(a) && vs.nonEmpty && vs.forall {
        case Literal(_, dt) => dt == keyType
        case _              => false
      } =>
      Some(vs.map { case l: Literal => bucketOfLiteral(l) }.toSet)
    case _ => None
  }

  /** Driver-side replica of `pmod(hash(key), buckets)` — Murmur3 with
    * Spark's default seed, evaluated on the literal.
    */
  private def bucketOfLiteral(l: Literal): Int = {
    val h = Murmur3Hash(Seq(l), 42).eval(null).asInstanceOf[Int]
    math.floorMod(h, buckets)
  }

  /** The key's stored DataType, from the first bucket fragment that has
    * one (single footer read); None on an empty store (nothing to prune
    * then anyway).
    */
  private def storedKeyType(): Option[DataType] =
    bucketTables.iterator.flatMap(_.keyDataType()).nextOption()

  def fragmentCounts(): IndexedSeq[Int] = bucketTables.map(_.fragmentCount())

  def compact(): Unit = bucketTables.foreach(_.compact())

  def compactTiered(tierFactor: Double = 4.0): Boolean =
    bucketTables.map(_.compactTiered(tierFactor)).exists(identity)

  /** Bound read amplification PER BUCKET — each bucket folds its own
    * run, so maintenance I/O is ∝ the hot buckets' recent batches.
    */
  def maybeCompact(maxLivePerBucket: Int, tierFactor: Double = 4.0): Boolean =
    bucketTables.map(_.maybeCompact(maxLivePerBucket, tierFactor)).exists(identity)

  def compactIfOver(maxLivePerBucket: Int): Boolean =
    bucketTables.map(_.compactIfOver(maxLivePerBucket)).exists(identity)
}

object BucketedFragmentStore {

  // JVM-global writer serialization per (warehouse, table): staging
  // sweep + adopt must not interleave with another in-JVM writer
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(key: String): Object =
    locks.computeIfAbsent(key, _ => new Object)

  final case class BucketReport(totalBuckets: Int, probed: Seq[Int],
                                perBucket: Map[Int, PruneReport]) {
    def fragmentsScanned: Int = perBucket.valuesIterator.map(_.scanned).sum
  }

  private[runtime] val BucketCol = "__graft_bucket"

  /** Create (writing the bucket-count meta) or open (validating it).
    * The meta check/write runs under the per-table writer lock and
    * creates with CREATE_NEW, so two concurrent creators can never both
    * write: the loser re-validates against whatever actually landed.
    */
  def apply(spark: SparkSession, baseDir: String, table: String,
            uniqueKey: String, buckets: Int = 16): BucketedFragmentStore = {
    require(buckets > 0, "buckets must be positive")
    Files.createDirectories(Paths.get(baseDir))
    val meta = Paths.get(baseDir, s"$table.buckets")
    lockFor(s"${Paths.get(baseDir).toAbsolutePath}#$table").synchronized {
      def validate(): Unit = {
        val stored = new String(Files.readAllBytes(meta), "UTF-8").trim.toInt
        require(stored == buckets,
          s"$table was created with $stored buckets; call rebucket to change")
      }
      if (Files.exists(meta)) validate()
      else try
        Files.write(meta, s"$buckets\n".getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW)
      catch { case _: java.nio.file.FileAlreadyExistsException => validate() }
    }
    new BucketedFragmentStore(spark, baseDir, table, uniqueKey, buckets)
  }

  /** Open an existing store, reading the bucket count from its meta. */
  def open(spark: SparkSession, baseDir: String, table: String,
           uniqueKey: String): BucketedFragmentStore = {
    val meta = Paths.get(baseDir, s"$table.buckets")
    require(Files.exists(meta), s"no bucketed store named $table at $baseDir")
    val stored = new String(Files.readAllBytes(meta), "UTF-8").trim.toInt
    new BucketedFragmentStore(spark, baseDir, table, uniqueKey, stored)
  }
}
