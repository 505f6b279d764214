package graft.runtime

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cost-based-optimizer wiring (ANALYZE TABLE → Catalyst CBO). Spark's
  * CBO — stats-driven join reordering and build-side selection — only
  * fires on CATALOG tables carrying computed statistics; a path-based
  * `spark.read.parquet` exposes nothing but size-on-disk, so every join
  * of path reads is planned from declaration order and byte estimates.
  * At warehouse scale the difference is structural: a star join whose
  * most selective dimension is named LAST still wants probing FIRST,
  * and a filtered fact slice whose post-filter cardinality is tiny
  * should broadcast — decisions that need row counts and column
  * histograms, not file sizes. AQE recovers some of this at RUNTIME
  * from shuffle statistics; CBO gets the plan right BEFORE the first
  * shuffle executes, which is the difference between avoiding a 100 TB
  * exchange and re-planning after one.
  *
  * [[registerAndAnalyze]] is the `dbt run-operation`-style maintenance
  * step: register the warehouse parquet as external catalog tables and
  * compute table + column stats. ANALYZE costs one scan per table —
  * amortized across every query planned from the catalog after it.
  */
object Stats {

  /** Database holding the analyzed catalog tables. Qualified two-part
    * names are immune to temp-view shadowing: a session temp view named
    * `lineitem` hijacks the bare name `lineitem` for every later
    * single-part lookup, but can never capture `graft_stats.lineitem`.
    */
  val Database = "graft_stats"

  /** Register each `name` as an external parquet table over
    * `dir/name.parquet` in [[Database]] and compute table + all-column
    * statistics. Idempotent (re-registering refreshes the stats).
    * Returns the analyzed row counts keyed by QUALIFIED table name,
    * read back from the catalog — the caller's evidence the stats
    * actually landed.
    */
  def registerAndAnalyze(spark: SparkSession, dir: String,
                         tables: Seq[String],
                         reuseExisting: Boolean = false): Map[String, BigInt] = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $Database")
    tables.map { t =>
      val qt = s"$Database.$t"
      val reused = if (reuseExisting) existingStats(spark, t, dir) else None
      val rc = reused.getOrElse {
        spark.sql(s"DROP TABLE IF EXISTS $qt")
        spark.sql(s"CREATE TABLE $qt USING parquet LOCATION '$dir/$t.parquet'")
        spark.sql(s"ALTER TABLE $qt SET TBLPROPERTIES " +
          s"('$TokenProp' = '${freshnessToken(s"$dir/$t.parquet")}')")
        spark.sql(s"ANALYZE TABLE $qt COMPUTE STATISTICS FOR ALL COLUMNS")
        // read the row count from the CATALOG metadata, not a plan: plan
        // stats only surface rowCount when CBO is on, and a plan lookup by
        // bare name is hijackable by session temp views anyway
        spark.sessionState.catalog
          .getTableMetadata(
            org.apache.spark.sql.catalyst.TableIdentifier(t, Some(Database)))
          .stats.flatMap(_.rowCount)
          .getOrElse(sys.error(s"ANALYZE left no rowCount for $qt"))
      }
      qt -> rc
    }.toMap
  }

  /** Table property carrying the file-level freshness token the stats
    * were computed over.
    */
  private val TokenProp = "graft.stats.token"

  /** Cheap content token for a parquet location: an md5 over every
    * file's (relative path, size, mtime), sorted by path. Changes
    * whenever the fixture is regenerated — even at the same path — so
    * stale-stats reuse self-invalidates. Per-file records (not the
    * older count/total-bytes/newest-mtime triple) so two regenerations
    * that happen to agree on aggregate count + byte total within one
    * mtime granule — plausible for deterministic generators on
    * coarse-mtime filesystems — still produce different tokens as long
    * as ANY file's own (size, mtime) moved.
    */
  private[runtime] def freshnessToken(path: String): String = {
    val root = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(root)) "absent"
    else {
      val walk = java.nio.file.Files.walk(root)
      try {
        val records = scala.collection.mutable.ArrayBuffer[String]()
        walk.forEach { p =>
          if (java.nio.file.Files.isRegularFile(p)) {
            records += s"${root.relativize(p)}:${java.nio.file.Files.size(p)}:" +
              s"${java.nio.file.Files.getLastModifiedTime(p).toMillis}"
          }
        }
        val md = java.security.MessageDigest.getInstance("MD5")
        records.sorted.foreach(r => md.update((r + "\n").getBytes("UTF-8")))
        records.size + ":" + md.digest().map("%02x".format(_)).mkString
      } finally walk.close()
    }
  }

  /** ANALYZE is a one-scan-per-table maintenance cost amortized across
    * every query planned after it; `reuseExisting = true` models that
    * steady state by accepting catalog stats that already exist FOR THE
    * SAME LOCATION **and whose recorded freshness token still matches
    * the files** — a fixture regenerated at the same path (new bytes or
    * mtimes) invalidates the reuse and pays a fresh ANALYZE.
    */
  private def existingStats(spark: SparkSession, t: String,
                            dir: String): Option[BigInt] =
    scala.util.Try {
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(t, Some(Database)))
      val loc = java.nio.file.Paths.get(meta.location).toAbsolutePath.toString
      val want = java.nio.file.Paths.get(dir, s"$t.parquet").toAbsolutePath.toString
      meta.stats
        .filter(_ => loc == want)
        .filter(_ => meta.properties.get(TokenProp).contains(freshnessToken(want)))
        .filter(_.colStats.nonEmpty)
        .flatMap(_.rowCount)
    }.toOption.flatten

  /** Catalog-stats slice the engine's own decisions consume: table
    * bytes, row count, and per-column distinct counts — read back from
    * the ANALYZEd catalog metadata ([[registerAndAnalyze]]'s output),
    * never estimated from file sizes.
    */
  final case class TableStats(sizeInBytes: BigInt, rowCount: BigInt,
      ndv: Map[String, BigInt])

  def tableStats(spark: SparkSession, table: String): TableStats = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table, Some(Database)))
    val st = meta.stats.getOrElse(
      sys.error(s"no statistics for $Database.$table — run registerAndAnalyze first"))
    TableStats(st.sizeInBytes,
      st.rowCount.getOrElse(sys.error(s"no rowCount for $Database.$table")),
      st.colStats.flatMap { case (c, cs) => cs.distinctCount.map(c -> _) })
  }

  /** The engine's OWN stats consumption (not just a CBO toggle): what a
    * join of `left ⋈ right` should physically do, decided from ANALYZE
    * numbers BEFORE any shuffle runs. `broadcastRight` when the right
    * side's measured bytes fit the broadcast budget (the decision AQE
    * can only make after the first shuffle already materialized);
    * otherwise `salt` fires when the left key's rows-per-distinct-value
    * exceeds `skewFactor` × the even-partition share — the NDV-derived
    * signature of a key set that hash-partitioning will concentrate
    * into straggler partitions. Salt width = how many even shares one
    * average key spans, clamped to [2, 32] (each extra unit replicates
    * the right side once — [[graft.ops.Joins.saltedJoin]]'s documented
    * cost).
    */
  final case class JoinDecision(broadcastRight: Boolean, salt: Option[Int],
      reason: String)

  def decideJoin(leftRows: BigInt, leftKeyNdv: BigInt, rightBytes: BigInt,
                 parallelism: Int, broadcastBytes: Long = 10L << 20,
                 skewFactor: Double = 4.0): JoinDecision = {
    require(parallelism > 0 && leftRows >= 0)
    if (rightBytes <= broadcastBytes)
      JoinDecision(broadcastRight = true, salt = None,
        s"right ${rightBytes}B <= broadcast budget ${broadcastBytes}B")
    else {
      val rowsPerKey = (leftRows / leftKeyNdv.max(1)).toDouble
      val rowsPerPartition = math.max(1.0, leftRows.toDouble / parallelism)
      if (rowsPerKey >= skewFactor * rowsPerPartition) {
        val width = math.min(32, math.max(2,
          math.ceil(rowsPerKey / rowsPerPartition).toInt))
        JoinDecision(broadcastRight = false, salt = Some(width),
          f"avg $rowsPerKey%.0f rows/key >= $skewFactor×$rowsPerPartition%.0f/partition")
      } else JoinDecision(broadcastRight = false, salt = None,
        f"avg $rowsPerKey%.0f rows/key under the skew bar; plain shuffle join")
    }
  }

  /** Stats-planned equi-join over two ANALYZEd catalog tables: reads
    * both sides' [[tableStats]], takes [[decideJoin]]'s verdict, and
    * emits the corresponding physical shape — `broadcast(right)`,
    * [[graft.ops.Joins.saltedJoin]], or the plain shuffle join. Result
    * rows are identical across all three shapes (spec-gated); only the
    * exchange topology differs.
    */
  def statsJoin(spark: SparkSession, leftTable: String, rightTable: String,
                keys: Seq[String], joinType: String = "inner",
                broadcastBytes: Long = 10L << 20,
                skewFactor: Double = 4.0): DataFrame =
    statsJoinOn(spark, leftTable, rightTable, keys.map(k => k -> k),
      joinType, broadcastBytes, skewFactor)

  /** [[statsJoin]] for sides whose key COLUMNS are named differently
    * (every star-schema catalog: `l_orderkey` = `o_orderkey`). Each
    * pair is (left column, right column); NDV comes from the left
    * side's columns, and the salted shape aligns the right names to the
    * left before [[graft.ops.Joins.saltedJoin]]'s shared-name contract
    * (output carries the LEFT key names once, the usual USING shape).
    */
  def statsJoinOn(spark: SparkSession, leftTable: String, rightTable: String,
                  keyPairs: Seq[(String, String)], joinType: String = "inner",
                  broadcastBytes: Long = 10L << 20,
                  skewFactor: Double = 4.0): DataFrame = {
    require(keyPairs.nonEmpty, "statsJoin needs at least one equi-key")
    val ls = tableStats(spark, leftTable)
    val rs = tableStats(spark, rightTable)
    val keyNdv = keyPairs.flatMap(p => ls.ndv.get(p._1)).minOption.getOrElse(
      sys.error(s"no NDV for ${keyPairs.map(_._1).mkString(",")} on $Database.$leftTable"))
    val d = decideJoin(ls.rowCount, keyNdv, rs.sizeInBytes,
      spark.conf.get("spark.sql.shuffle.partitions").toInt,
      broadcastBytes, skewFactor)
    val left = spark.table(s"$Database.$leftTable")
    // align the right key names to the left's so every shape below is
    // a USING join (single key column out, no ambiguous references)
    val right = keyPairs.foldLeft(spark.table(s"$Database.$rightTable")) {
      case (df, (l, r)) => if (l == r) df else df.withColumnRenamed(r, l)
    }
    val keys = keyPairs.map(_._1)
    if (d.broadcastRight)
      left.join(org.apache.spark.sql.functions.broadcast(right), keys, joinType)
    else d.salt match {
      case Some(w) => graft.ops.Joins.saltedJoin(left, right, keys, joinType, w)
      case None    => left.join(right, keys, joinType)
    }
  }

  /** Run `body` with CBO + stats-based join reordering enabled,
    * restoring the previous confs after (session-shared test hygiene).
    */
  def withCbo[T](spark: SparkSession)(body: => T): T = {
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val old = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "true"))
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
