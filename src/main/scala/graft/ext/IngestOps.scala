package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Incremental corpus ingest: dedup a NEW batch against the
  * already-materialized corpus without ever shuffling the corpus.
  *
  * The naive shape — anti-join incoming against 100 TB of existing
  * fingerprints — hash-repartitions the full corpus per ingest. This op
  * spends one map-side corpus SCAN instead:
  *
  *   1. within-batch exact dedup (keep-lowest, [[DedupOps.dedupExact]]);
  *   2. a Bloom filter over the existing fingerprints (built by a
  *      map-side sketch aggregate — partition sketches OR together, no
  *      shuffle, deterministic) is broadcast to the batch; rows the
  *      filter misses are DEFINITELY new (no false negatives) and pass
  *      through with zero join work;
  *   3. the ~fpp sliver of bloom-positive rows is exactly verified:
  *      their distinct fingerprints broadcast to the corpus scan
  *      (map-side inner join → the small set of fingerprints that
  *      really exist), and a broadcast anti-join against THAT set
  *      clears the false positives.
  *
  * Output is therefore EXACTLY the anti-join result — the Bloom filter
  * only routes work — which is what lets the gate be a DuckDB oracle
  * rather than a recall bound. The probe is a Scala UDF by necessity:
  * Catalyst exposes no public Column surface for sketch membership.
  */
object IngestOps {

  /** The literal-list regime threshold shared by every point-probe site:
    * below it, driver-known key sets embed as `isin` literals (cheapest
    * plan at micro-batch scale — pushes into the parquet scan, no join
    * operator); above it, plans must carry NO literal list (broadcast
    * semi/anti joins, routed bucket unions) because a 10⁵-literal
    * expression tree bloats analysis/codegen time and a same-sized
    * driver collect of payload columns bloats driver memory.
    */
  val DefaultMaxIsin: Int = 10000

  /** The documents-table schema, declared EXPLICITLY for raw-format
    * drops: schema inference is a full extra pass over the data and
    * type-unstable across drops (one file of all-numeric "text" flips
    * the column), so the ingest front door always states its contract.
    */
  val DocumentsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType)))

  /** The FIRST failing check's name as a Column, NULL when every check
    * holds — the dead-letter `reject_reason` rule shared by every
    * quarantine sink and the batch validation rows. A NULL predicate
    * result counts as FAILING (the dbt-test convention: a check that
    * cannot evaluate has not passed).
    */
  def rejectReason(checks: Seq[(String, org.apache.spark.sql.Column)]): org.apache.spark.sql.Column = {
    require(checks.nonEmpty, "at least one validity check required")
    val fails = checks.map { case (n, p) => (n, not(coalesce(p, lit(false)))) }
    fails.tail
      .foldLeft(when(fails.head._2, lit(fails.head._1))) {
        case (acc, (n, f)) => acc.when(f, lit(n))
      }.otherwise(lit(null).cast("string"))
  }

  /** Read a JSONL document drop — the interchange format corpus dumps
    * arrive in. PERMISSIVE mode: a malformed line becomes a row of
    * nulls (filterable, countable) instead of failing a 100 TB job;
    * splittable line format, so parallelism is file-block-shaped.
    */
  def readDocumentsJsonl(spark: org.apache.spark.sql.SparkSession,
                         path: String): DataFrame =
    spark.read.schema(DocumentsSchema).json(path)

  /** CSV variant (header expected, quoted fields). Same explicit-schema
    * and permissive-corruption contract as [[readDocumentsJsonl]].
    * `escape = "` selects RFC-4180 doubled-quote escaping — Spark's
    * default is backslash escaping, which silently mangles standard
    * CSV exports containing quotes.
    */
  def readDocumentsCsv(spark: org.apache.spark.sql.SparkSession,
                       path: String): DataFrame =
    spark.read.schema(DocumentsSchema)
      .option("header", "true").option("mode", "PERMISSIVE")
      .option("escape", "\"").csv(path)

  /** ORC variant — the columnar interchange format Hive-era pipelines
    * export. Schema is still declared (a drop whose writer reordered or
    * widened columns resolves BY NAME against the contract instead of
    * silently shifting positions); unlike the line formats there is no
    * corrupt-row mode — ORC stripes are checksummed, a torn file fails
    * loudly, which is the right behavior for a binary format.
    */
  def readDocumentsOrc(spark: org.apache.spark.sql.SparkSession,
                       path: String): DataFrame =
    spark.read.schema(DocumentsSchema).orc(path)

  /** (doc_id, toks, sig) MinHash signature frame over a document frame —
    * the persistable LSH index of a corpus. This is what the streaming
    * ingest sink materializes as its `<model>__sigs` side-table
    * ([[graft.streaming.StreamingOps.corpusIngestNearDupSink]]) so each
    * micro-batch checks candidates against STORED signatures instead of
    * re-signaturing the corpus text. `hotShingles` is a PINNED stopword
    * list (see [[appendDedupNearDup]]'s `maxDocFreqRatio` for the
    * derived-per-ingest form): stored signatures bake the list in, so an
    * index and every batch checked against it must share one list.
    */
  def minHashSigsOf(docs: DataFrame, numHashes: Int = 32, shingleK: Int = 1,
                    textCol: String = "text", idCol: String = "doc_id",
                    hotShingles: Seq[String] = Nil): DataFrame =
    DedupOps.minHashSigFrame(docs, numHashes, shingleK, textCol, idCol, hotShingles)

  /** [[appendDedupNearDup]] against a PRE-BUILT signature frame
    * ([[minHashSigsOf]] output — live, or re-read from a persisted
    * side-table). Takes no corpus document frame at all: candidates,
    * verify tokens, and the drop set all derive from `existingSigs`, so
    * the corpus text is — by construction, not by optimization — never
    * re-tokenized or re-hashed per ingest. Per-batch cost is the batch's
    * own signatures plus one map-side SCAN of the signature frame.
    */
  def appendDedupNearDupIndexed(existingSigs: DataFrame, incoming: DataFrame,
                                threshold: Double,
                                numHashes: Int = 32, bands: Int = 8, shingleK: Int = 1,
                                textCol: String = "text", idCol: String = "doc_id",
                                hotShingles: Seq[String] = Nil): DataFrame =
    appendDedupNearDupIndexedSigned(existingSigs, incoming, threshold,
      numHashes, bands, shingleK, textCol, idCol, hotShingles)._1

  private def appendDedupNearDupIndexedSigned(
                                existingSigs: DataFrame, incoming: DataFrame,
                                threshold: Double,
                                numHashes: Int, bands: Int, shingleK: Int,
                                textCol: String, idCol: String,
                                hotShingles: Seq[String]): (DataFrame, DataFrame) = {
    val rows = numHashes / bands
    // drop signature-less rows (empty toks — the streaming side-table's
    // convergence TOMBSTONES, see corpusIngestNearDupSink): they carry no
    // dedup signal, and a degenerate empty-set signature would collide in
    // every band
    val exSigs = existingSigs.filter(size(col("toks")) > 0)
    val exact = DedupOps.dedupExact(incoming, textCol, idCol)
    // one signature pass serves both the within-batch pair search and the
    // corpus check: survivors' sig rows are semi-joined out afterwards
    val inAll = DedupOps.minHashSigFrame(exact, numHashes, shingleK, textCol, idCol,
      hotShingles)
    val batch = DedupOps.removeNearDups(exact,
      DedupOps.pairsOfSigFrame(inAll, bands, rows, threshold), idCol)
    val inS = inAll.join(broadcast(batch.select(col(idCol).as("doc_id"))),
      Seq("doc_id"), "left_semi")
    val cand = DedupOps.lshBands(exSigs, "sig", bands, rows).as("x")
      .join(broadcast(DedupOps.lshBands(inS, "sig", bands, rows).as("y")),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key"))
      .select(col("x.doc_id").as("ex_id"), col("y.doc_id").as("in_id"))
      .distinct()
    val drops = exSigs.select(col("doc_id").as("ex_id"), col("toks").as("ex_toks"))
      .join(broadcast(cand), Seq("ex_id"))
      .join(broadcast(inS.select(col("doc_id").as("in_id"), col("toks").as("in_toks"))),
        Seq("in_id"))
      .filter(size(array_intersect(col("ex_toks"), col("in_toks"))).cast("double") /
        size(array_union(col("ex_toks"), col("in_toks"))) >= threshold)
      // no distinct: the drop set only feeds a broadcast anti-join,
      // where duplicate ids are harmless — the dedup exchange was one
      // more synchronous stage (the RoutedCounted lesson)
      .select(col("in_id").as(idCol))
    (batch.join(broadcast(drops), Seq(idCol), "left_anti"),
      exSigs.unionByName(inAll))
  }

  /** [[appendDedupNearDup]]'s result PLUS the pool signature frame the
    * pipeline already computed — `poolSigs` keyed by `doc_id` (the
    * [[graft.ext.DedupOps.minHashSigFrame]] schema: doc_id, toks, sig),
    * covering the existing corpus ∪ the incoming batch's exact-dedup
    * representatives (every distinct pool TEXT with a nonempty token
    * set; an exact-dup shadow shares its kept twin's tokens). A
    * verification gate over this ingest
    * ([[graft.ext.StructGate.ingestNearDupGate]]'s `poolToks`) reuses
    * it instead of re-tokenizing the pool — with shingleK = 1 and no
    * hot-shingle list, `toks` is exactly `TextOps.distinctTokens(text)`.
    * With a hot list or k > 1 the toks are the PRUNED shingle sets —
    * only pass them to a consumer whose metric is defined over the
    * same sets.
    *
    * Both frames come back PINNED and MATERIALIZED, each stage executed
    * exactly once — the lazy [[appendDedupNearDupIndexed]] plan embeds
    * the exact-dedup/signature subtrees three-plus times (Spark does no
    * cross-join common-subexpression elimination), which an A/B at
    * sf0.1 measured as ~2× the single-execution cost. The CALLER must
    * `unpersist()` both frames once consumed ([[SignedIngest
    * .unpersistAll]]) — same contract as [[RoutedAppend]].
    */
  final case class SignedIngest(survivors: DataFrame, poolSigs: DataFrame) {
    def unpersistAll(): Unit = {
      poolSigs.unpersist(false); survivors.unpersist(false); ()
    }
  }

  def appendDedupNearDupSigned(existing: DataFrame, incoming: DataFrame,
                               threshold: Double,
                               numHashes: Int = 32, bands: Int = 8, shingleK: Int = 1,
                               textCol: String = "text", idCol: String = "doc_id",
                               maxDocFreqRatio: Option[Double] = None): SignedIngest = {
    val rows = numHashes / bands
    val hot = maxDocFreqRatio
      .map(r => DedupOps.hotShinglesOf(existing, r, shingleK, textCol, idCol))
      .getOrElse(Nil)
    // the RoutedCounted pinning discipline, applied to the full-frame
    // corpus side: every stage materializes once, fans out from cache
    val exSigs = DedupOps.minHashSigFrame(existing, numHashes, shingleK,
      textCol, idCol, hot).persist()
    val exact = DedupOps.dedupExact(incoming, textCol, idCol).persist()
    val inAll = DedupOps.minHashSigFrame(exact, numHashes, shingleK, textCol,
      idCol, hot).persist()
    val batch = DedupOps.removeNearDups(exact,
      DedupOps.pairsOfSigFrame(inAll, bands, rows, threshold), idCol).persist()
    val inS = inAll.join(broadcast(batch.select(col(idCol).as("doc_id"))),
      Seq("doc_id"), "left_semi")
    val cand = DedupOps.lshBands(exSigs, "sig", bands, rows).as("x")
      .join(broadcast(DedupOps.lshBands(inS, "sig", bands, rows).as("y")),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key"))
      .select(col("x.doc_id").as("ex_id"), col("y.doc_id").as("in_id"))
      .distinct()
    val drops = exSigs.select(col("doc_id").as("ex_id"), col("toks").as("ex_toks"))
      .join(broadcast(cand), Seq("ex_id"))
      .join(broadcast(inS.select(col("doc_id").as("in_id"), col("toks").as("in_toks"))),
        Seq("in_id"))
      .filter(size(array_intersect(col("ex_toks"), col("in_toks"))).cast("double") /
        size(array_union(col("ex_toks"), col("in_toks"))) >= threshold)
      .select(col("in_id").as(idCol)) // no distinct: broadcast anti-join tolerates dups
    val survivors = batch.join(broadcast(drops), Seq(idCol), "left_anti").persist()
    survivors.count()
    val poolSigs = exSigs.unionByName(inAll).persist()
    poolSigs.count() // materialize BEFORE the sources release
    exSigs.unpersist(false); exact.unpersist(false)
    inAll.unpersist(false); batch.unpersist(false)
    SignedIngest(survivors, poolSigs)
  }

  /** The PERSISTED band rows of a signature frame — one row per (doc,
    * band): `(__bk, band_key, band, doc_id)` with `__bk` = "band:doc" as
    * the unique row key and `band_key` the LSH bucket hash. This is the
    * inverted index the banded streaming sink materializes through a
    * route-by-`band_key` [[graft.runtime.BucketedFragmentStore]], so a
    * trigger's probe reads only the buckets its batch's band keys hash
    * into instead of re-banding the whole corpus signature table.
    * Banding is computed ONCE here, at sign time, never again at probe
    * time. Signature-less rows (empty toks — the side-table's
    * convergence tombstones) produce no band rows.
    */
  def bandRowsOf(sigs: DataFrame, bands: Int, rows: Int,
                 idCol: String = "doc_id"): DataFrame =
    DedupOps.lshBands(sigs.filter(size(col("toks")) > 0), "sig", bands, rows)
      .select(concat_ws(":", col("band"), col("doc_id")).as("__bk"),
        col("band_key"), col("band"), col("doc_id").as(idCol))

  /** [[appendDedupNearDupIndexed]] with the corpus side behind two
    * POINT-PROBE closures instead of a full signature frame — the
    * corpus-independent per-trigger shape:
    *
    *   - `bandProbe(keys)`: the stored band rows (schema ⊇ (doc_id,
    *     band, band_key)) that MAY match any of the batch's band-key
    *     hashes — a route-by-band-key bucketed read
    *     ([[graft.runtime.BucketedFragmentStore.readRouted]]); a
    *     superset is fine (the candidate equi-join filters), None means
    *     an empty corpus.
    *   - `toksProbe(ids)`: stored signature rows (schema ⊇ (doc_id,
    *     toks)) for the candidate ids — a key-routed point read;
    *     again a superset is fine.
    *
    * Candidate pairs are collected to the driver once (the SAME
    * boundedness assumption as the indexed path, which broadcasts them)
    * so the verify join never re-executes the band probe. Output is
    * identical to [[appendDedupNearDupIndexed]] over the signatures the
    * stores hold — the LSH operating point, hot-shingle list, and
    * verified-Jaccard metric are unchanged.
    *
    * The returned frame is PINNED (persist + materialize): the
    * per-trigger pipeline runs each stage exactly once — the un-pinned
    * form re-executed the batch prep three times (keys collect,
    * candidate collect, final assembly) and re-ran the store probes per
    * consumer action, which dominated trigger latency at small batch
    * sizes. Intermediates unpersist before return; the CALLER must
    * `unpersist()` the returned frame once consumed, or a long-running
    * sink accumulates a block per trigger (persist keeps lineage, so a
    * post-unpersist action merely recomputes — never breaks).
    */
  def appendDedupNearDupRouted(bandProbe: Seq[Long] => Option[DataFrame],
                               toksProbe: Seq[Any] => Option[DataFrame],
                               incoming: DataFrame, threshold: Double,
                               numHashes: Int = 32, bands: Int = 8, shingleK: Int = 1,
                               textCol: String = "text", idCol: String = "doc_id",
                               hotShingles: Seq[String] = Nil): DataFrame = {
    val (survivors, sigs) = appendDedupNearDupRoutedSigned(bandProbe, toksProbe,
      incoming, threshold, numHashes, bands, shingleK, textCol, idCol, hotShingles)
    sigs.unpersist(false)
    survivors
  }

  /** [[appendDedupNearDupRoutedSigned]]'s result with the row counts
    * the pinning already computed: a sink consuming both frames can
    * branch on emptiness and the tombstone condition (`nSigs ==
    * nSurvivors`) without re-running count jobs against the persisted
    * blocks — three driver round-trips per trigger that add up at
    * high trigger rates.
    */
  final case class RoutedAppend(survivors: DataFrame, sigs: DataFrame,
                                nSurvivors: Long, nSigs: Long,
                                driverVerify: Boolean = true) {
    def unpersistAll(): Unit = {
      sigs.unpersist(false); survivors.unpersist(false); ()
    }
  }

  /** [[appendDedupNearDupRouted]] that ALSO returns the survivors'
    * signature frame ([[minHashSigsOf]] schema: doc_id, toks, sig) —
    * both PINNED — plus the counts the materialization already paid
    * for. The probe already signed every batch row; a sink that
    * persists signatures (the banded sink's sig/band side stores)
    * reuses them instead of re-tokenizing + re-hashing the survivors,
    * cutting one full signature pass per trigger. Survivors with no
    * signature (all-hot-shingle docs) are absent from the frame,
    * exactly as [[minHashSigsOf]] omits them. The CALLER must
    * `unpersist()` both returned frames once consumed
    * ([[RoutedAppend.unpersistAll]]).
    */
  def appendDedupNearDupRoutedCounted(bandProbe: Seq[Long] => Option[DataFrame],
                               toksProbe: Seq[Any] => Option[DataFrame],
                               incoming: DataFrame, threshold: Double,
                               numHashes: Int = 32, bands: Int = 8, shingleK: Int = 1,
                               textCol: String = "text", idCol: String = "doc_id",
                               hotShingles: Seq[String] = Nil,
                               maxDriverVerifyDocs: Int = DefaultMaxIsin): RoutedAppend = {
    val rows = numHashes / bands
    val spark = incoming.sparkSession
    // each stage pins before fan-out; everything downstream is a cheap
    // map/collect over batch-sized pinned data
    val exact = DedupOps.dedupExact(incoming, textCol, idCol).persist()
    val inAll = DedupOps.minHashSigFrame(exact, numHashes, shingleK, textCol, idCol,
      hotShingles).persist()
    val batch = DedupOps.removeNearDups(exact,
      DedupOps.pairsOfSigFrame(inAll, bands, rows, threshold), idCol)
      .persist()
    val inS = inAll.join(broadcast(batch.select(col(idCol).as("doc_id"))),
      Seq("doc_id"), "left_semi")
    // ONE collect lands the whole batch-side working set on the driver:
    // per surviving-batch doc its id, its token set (the verify's
    // in-side), and its `bands` LSH keys (computed by the SAME Spark
    // xxhash64 expression the stored band rows were written with —
    // reproducing that hash driver-side would be a portability trap).
    // Driver memory ∝ batch — and that contract is now MECHANICALLY
    // GUARDED (VERDICT r13 #2): the collect is LIMIT-bounded at
    // `maxDriverVerifyDocs` + 1, so a 10⁵-doc trigger × kB token sets
    // can never land a multi-GB working set on the driver. At or under
    // the threshold this is the r13 job-count move: the verify runs IN
    // SCALA over these rows, so the three cluster-side broadcast/join
    // jobs it used to cost are gone; every local frame broadcasts
    // job-free (LocalTableScan collects without a Spark job). Over the
    // threshold the truncated probe is DISCARDED and the verify falls
    // back to the cluster-side join shape (see below) — same metric,
    // same survivor set, spec-gated equivalence.
    val inSPacked = inS.select(col("doc_id"), col("toks"),
        transform(sequence(lit(0), lit(bands - 1)), b =>
          xxhash64(concat_ws(",",
            transform(slice(col("sig"), b * rows + 1, lit(rows)),
              x => x.cast("string"))))).as("__bks"))
    val probe = inSPacked.limit(
      math.min(maxDriverVerifyDocs.toLong + 1, Int.MaxValue.toLong).toInt).collect()
    if (probe.length > maxDriverVerifyDocs)
      return routedCountedClusterVerify(bandProbe, toksProbe,
        exact, inAll, batch, inS, threshold, bands, rows, idCol)
    val packed = probe
    val inToks: Map[Any, Set[String]] = packed.map(r =>
      r.get(0) -> r.getSeq[String](1).toSet).toMap
    val keys = packed.flatMap(_.getSeq[Long](2)).distinct.toSeq
    val dropIds: Seq[Any] = bandProbe(keys) match {
      case None => Nil
      case Some(exBands) =>
        // (band, band_key) equi-join against the LOCAL batch bands —
        // candidates collect once, bounded by the documented assumption
        val inBandRows = packed.flatMap(r =>
          r.getSeq[Long](2).zipWithIndex.map { case (bk, b) =>
            org.apache.spark.sql.Row(r.get(0), b, bk) })
        val inBandsLocal = spark.createDataFrame(
          java.util.Arrays.asList(inBandRows: _*),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("in_id",
              inS.schema("doc_id").dataType),
            org.apache.spark.sql.types.StructField("band",
              org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("band_key",
              org.apache.spark.sql.types.LongType))))
        val candRows = exBands
          .select(col("doc_id").as("ex_id"), col("band"), col("band_key"))
          .join(broadcast(inBandsLocal), Seq("band", "band_key"))
          .select("ex_id", "in_id").distinct().collect()
        if (candRows.isEmpty) Nil
        else {
          val exIds = candRows.map(_.get(0)).distinct.toSeq
          toksProbe(exIds) match {
            case None => Nil
            case Some(exSigRows) =>
              // exact verified Jaccard, computed on the driver over the
              // candidate-bounded token sets — the METRIC is unchanged
              // (toks are array_distinct'd sets on both sides; IEEE
              // double division; >= threshold), equivalence spec-gated
              // against the unbanded sink
              val exToks: Map[Any, Set[String]] = exSigRows
                .filter(size(col("toks")) > 0)
                .select(col("doc_id"), col("toks")).collect()
                .map(r => r.get(0) -> r.getSeq[String](1).toSet).toMap
              candRows.iterator.flatMap { cr =>
                (exToks.get(cr.get(0)), inToks.get(cr.get(1))) match {
                  case (Some(a), Some(b)) =>
                    val inter = a.intersect(b).size
                    val union = a.size + b.size - inter
                    if (union > 0 && inter.toDouble / union >= threshold)
                      Some(cr.get(1))
                    else None
                  case _ => None
                }
              }.toSeq.distinct
          }
        }
    }
    // pinned + materialized: survivors/sigs derive from LOCAL id sets,
    // so their plans carry no cluster-side join machinery at all
    val survivorIdsLocal = packed.map(_.get(0)).filterNot(dropIds.toSet)
    def idFrame(ids: Seq[Any], name: String): DataFrame =
      spark.createDataFrame(
        java.util.Arrays.asList(ids.map(org.apache.spark.sql.Row(_)): _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(name,
            inS.schema("doc_id").dataType))))
    val survivors = (
      if (dropIds.isEmpty) batch
      else batch.join(broadcast(idFrame(dropIds, idCol)), Seq(idCol), "left_anti")
    ).persist()
    // survivors' signatures, pinned BEFORE inAll is released (the sig
    // lineage reaches through inS into inAll; materializing now means
    // the unpersist below frees blocks without forcing a recompute)
    val survivorSigs = inS.join(
      broadcast(idFrame(survivorIdsLocal.toIndexedSeq, "doc_id")),
      Seq("doc_id"), "left_semi").persist()
    // ONE job materializes BOTH pins and returns both counts (was two
    // count jobs — each a ~300 ms fixed cost per trigger)
    val cm = survivors.select(lit(1).as("__side"))
      .union(survivorSigs.select(lit(2).as("__side")))
      .groupBy("__side").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    exact.unpersist(false); inAll.unpersist(false); batch.unpersist(false)
    RoutedAppend(survivors, survivorSigs,
      cm.getOrElse(1, 0L), cm.getOrElse(2, 0L))
  }

  /** The LARGE-BATCH verify regime of [[appendDedupNearDupRoutedCounted]]
    * (VERDICT r13 #2 — the `maxIsinFps` pattern applied to the driver-
    * side verify): when a trigger exceeds `maxDriverVerifyDocs`, token
    * sets NEVER collect to the driver. The batch's band rows stay
    * distributed, only the band-key hashes (8 longs/doc) and the
    * candidate ex-ids (bounded by banding collisions, ids only) make
    * the driver round-trips the probe closures require, and the
    * verified-Jaccard filter runs as cluster-side joins — the
    * [[appendDedupNearDupIndexedSigned]] shape against probed stores.
    * Metric, LSH operating point, and survivor set are identical to the
    * driver regime (spec-gated equivalence + regime flip).
    */
  private def routedCountedClusterVerify(bandProbe: Seq[Long] => Option[DataFrame],
                               toksProbe: Seq[Any] => Option[DataFrame],
                               exact: DataFrame, inAll: DataFrame,
                               batch: DataFrame, inS: DataFrame,
                               threshold: Double, bands: Int, rows: Int,
                               idCol: String): RoutedAppend = {
    val inBands = DedupOps.lshBands(inS, "sig", bands, rows)
      .select(col("doc_id").as("in_id"), col("band"), col("band_key"))
      .persist()
    val keys = inBands.select("band_key").distinct()
      .collect().map(_.getLong(0)).toSeq
    var cand: DataFrame = null
    val drops: Option[DataFrame] = bandProbe(keys) match {
      case None => None
      case Some(exBands) =>
        cand = exBands
          .select(col("doc_id").as("ex_id"), col("band"), col("band_key"))
          .join(inBands, Seq("band", "band_key"))
          .select("ex_id", "in_id").distinct().persist()
        val exIds = cand.select("ex_id").distinct()
          .collect().map(_.get(0)).toSeq
        if (exIds.isEmpty) None
        else toksProbe(exIds) match {
          case None => None
          case Some(exSigRows) =>
            // exact verified Jaccard over the candidate-bounded token
            // sets, computed WHERE THE DATA IS — same metric as the
            // driver regime (array_distinct'd sets both sides, IEEE
            // double division, >= threshold)
            Some(exSigRows.filter(size(col("toks")) > 0)
              .select(col("doc_id").as("ex_id"), col("toks").as("ex_toks"))
              .join(cand, Seq("ex_id"))
              .join(inS.select(col("doc_id").as("in_id"),
                col("toks").as("in_toks")), Seq("in_id"))
              .filter(size(array_intersect(col("ex_toks"), col("in_toks"))).cast("double") /
                size(array_union(col("ex_toks"), col("in_toks"))) >= threshold)
              .select(col("in_id")).distinct().persist())
        }
    }
    val survivors = (drops match {
      case None    => batch
      case Some(d) => batch.join(d.withColumnRenamed("in_id", idCol),
        Seq(idCol), "left_anti")
    }).persist()
    val survivorSigs = (drops match {
      case None    => inS
      case Some(d) => inS.join(d.withColumnRenamed("in_id", "doc_id"),
        Seq("doc_id"), "left_anti")
    }).persist()
    val cm = survivors.select(lit(1).as("__side"))
      .union(survivorSigs.select(lit(2).as("__side")))
      .groupBy("__side").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    drops.foreach(_.unpersist(false))
    if (cand != null) cand.unpersist(false)
    inBands.unpersist(false)
    exact.unpersist(false); inAll.unpersist(false); batch.unpersist(false)
    RoutedAppend(survivors, survivorSigs,
      cm.getOrElse(1, 0L), cm.getOrElse(2, 0L), driverVerify = false)
  }

  /** [[appendDedupNearDupRoutedCounted]] without the counts — kept for
    * callers that only consume the frames.
    */
  def appendDedupNearDupRoutedSigned(bandProbe: Seq[Long] => Option[DataFrame],
                               toksProbe: Seq[Any] => Option[DataFrame],
                               incoming: DataFrame, threshold: Double,
                               numHashes: Int = 32, bands: Int = 8, shingleK: Int = 1,
                               textCol: String = "text", idCol: String = "doc_id",
                               hotShingles: Seq[String] = Nil): (DataFrame, DataFrame) = {
    val r = appendDedupNearDupRoutedCounted(bandProbe, toksProbe, incoming,
      threshold, numHashes, bands, shingleK, textCol, idCol, hotShingles)
    (r.survivors, r.sigs)
  }

  /** Near-dup-aware incremental ingest — the production recipe for "new
    * crawl vs existing corpus": within-batch exact + greedy near-dup
    * removal first, then every surviving incoming doc is LSH-checked
    * against the materialized corpus and dropped if a verified
    * near-duplicate already exists.
    *
    * Scale shape: the corpus side is SCANNED (signature + bands are
    * map-only over it), never repartitioned — the incoming batch's band
    * keys broadcast into the corpus band stream, candidate ids
    * broadcast back into the corpus token fetch, and the final drop is
    * a broadcast anti-join. Corpus cost per ingest is two map-side
    * scans; nothing corpus-sized ever shuffles. Recall is LSH recall at
    * the configured (numHashes, bands) operating point — the same
    * contract as [[DedupOps.minHashNearDupPairs]], spec-gated.
    * Doc ids are assumed unique across existing ∪ incoming.
    *
    * `maxDocFreqRatio` prunes hot shingles exactly as the batch dedup
    * paths do: the hot list is derived from the EXISTING corpus (df >
    * ratio·|existing| — the statistically meaningful side) and applied
    * to BOTH sides before hashing, so a corpus-wide boilerplate shingle
    * can neither flood the band join with |ex|×|in| candidates nor
    * shift the verified metric between sides. Repeated ingests should
    * prefer [[appendDedupNearDupIndexed]] with a PINNED list: a
    * per-ingest derived list drifts as the corpus grows, and pruning
    * must match whatever signatures it is compared against.
    */
  /** [[appendDedupNearDup]] with the LSH candidate stage replaced by an
    * EXHAUSTIVE inverted-index pair search: every within-batch and
    * cross-corpus pair sharing ≥1 token is exactly verified, so the
    * output is a pure function of the verified-Jaccard metric — no LSH
    * recall term — and the row takes a plain SQL oracle (the
    * `*_exactmode` pattern that gates the PQ/IVF-PQ compositions). An
    * oracle mode, not a production path: its candidate cost is the full
    * all-pairs index join the LSH composition exists to avoid.
    */
  def appendDedupNearDupExhaustive(existing: DataFrame, incoming: DataFrame,
                                   threshold: Double, shingleK: Int = 1,
                                   textCol: String = "text",
                                   idCol: String = "doc_id"): DataFrame = {
    val exact = DedupOps.dedupExact(incoming, textCol, idCol)
    val batch = DedupOps.removeNearDups(exact,
      DedupOps.shingleJaccardPairs(exact, threshold, shingleK, textCol, idCol), idCol)
    // same shingle sets the LSH path verifies over (tokens projected
    // before the shingle lambda — see DedupOps.shingles PERF NOTE)
    def tokFrame(df: DataFrame, idAs: String, toksAs: String): DataFrame =
      df.select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
        .select(col(idCol).as(idAs),
          array_distinct(DedupOps.shinglesOfTokens(col("__toks"), shingleK)).as(toksAs))
        .filter(size(col(toksAs)) > 0)
    val exT = tokFrame(existing, "ex_id", "ex_toks")
    val inT = tokFrame(batch, "in_id", "in_toks")
    val cand = exT.select(col("ex_id"), explode(col("ex_toks")).as("t"))
      .join(inT.select(col("in_id"), explode(col("in_toks")).as("t")), Seq("t"))
      .select("ex_id", "in_id").distinct()
    val drops = cand.join(exT, Seq("ex_id")).join(inT, Seq("in_id"))
      .filter(size(array_intersect(col("ex_toks"), col("in_toks"))).cast("double") /
        size(array_union(col("ex_toks"), col("in_toks"))) >= threshold)
      .select(col("in_id").as(idCol)).distinct()
    batch.join(broadcast(drops), Seq(idCol), "left_anti")
  }

  def appendDedupNearDup(existing: DataFrame, incoming: DataFrame, threshold: Double,
                         numHashes: Int = 32, bands: Int = 8, shingleK: Int = 1,
                         textCol: String = "text", idCol: String = "doc_id",
                         maxDocFreqRatio: Option[Double] = None): DataFrame = {
    val hot = maxDocFreqRatio
      .map(r => DedupOps.hotShinglesOf(existing, r, shingleK, textCol, idCol))
      .getOrElse(Nil)
    appendDedupNearDupIndexed(
      DedupOps.minHashSigFrame(existing, numHashes, shingleK, textCol, idCol, hot),
      incoming, threshold, numHashes, bands, shingleK, textCol, idCol, hot)
  }

  /** The PERSISTED hamming band rows of a 64-bit perceptual-signature
    * frame ([[MultimodalOps.perceptualHash]]'s `phash`,
    * [[MultimodalOps.audioWindowSig]]'s `sig`,
    * [[graft.ext.DedupOps.simHash]]) — the media analog of
    * [[bandRowsOf]]: one row per (doc, chunk) with
    * `(__bk "chunk:doc", band_key, doc_id, sig)`. The band key encodes
    * BOTH the chunk index and its bit value
    * (`chunk · 2^width + chunkValue`), so probes equi-join on one
    * column, and the FULL signature rides along so the hamming verify
    * needs no second store read (it is 8 bytes — the reason the text
    * path's separate toks store has no analog here). NULL-signature
    * rows (undecodable media) produce no band rows.
    */
  def bandRowsOfSigs(sigs: DataFrame, bands: Int,
                     idCol: String = "doc_id",
                     sigCol: String = "sig"): DataFrame = {
    require(bands >= 2 && 64 % bands == 0,
      s"bands must divide 64 and be >= 2, got $bands")
    val width = 64 / bands
    val mask = (1L << width) - 1L
    sigs.filter(col(sigCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(sigCol).as("sig"),
        posexplode(array((0 until bands).map(i =>
          lit(i.toLong * (mask + 1)) +
            shiftrightunsigned(col(sigCol), i * width).bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "band_key")
      .select(concat_ws(":", col("chunk"), col("doc_id")).as("__bk"),
        col("band_key"), col("doc_id"), col("sig"))
  }

  /** Perceptual-signature incremental ingest with the corpus behind a
    * band-key POINT PROBE — [[appendDedupNearDupRouted]]'s shape for
    * the MEDIA modality (images via dHash, audio via the window
    * envelope, any 64-bit SimHash-style signature): within-batch
    * hamming collapse first ([[DedupOps.hammingNearDupPairsFromSigs]] +
    * keep-lowest), then every surviving signed doc is band-probed
    * against the stored [[bandRowsOfSigs]] rows and dropped when any
    * stored signature verifies within `maxDist` (exact
    * `bit_count(xor)`, the same metric the batch collapse used).
    * Pigeonhole recall is 1.0 for `maxDist <= bands - 1` — a true
    * near-dup ALWAYS shares at least one unchanged chunk. NULL-sig
    * rows (undecodable media) ride through: they carry no dedup
    * signal, and dropping them silently would un-count corrupt blobs.
    *
    * `bandProbe(keys)` must be an EXACT routed read
    * ([[graft.runtime.BucketedFragmentStore.readRouted]], LWW-merged) —
    * unlike the text path, the verify reads the signature FROM the
    * band row, so a stale superset row could re-assert a deleted doc's
    * signature and wrongly drop its re-ingest. Per-trigger cost:
    * batch-side banding, one id-sized keys collect (8 longs/doc), one
    * routed probe whose I/O is ∝ matching band values, a
    * candidate-bounded verify join — corpus never rescans. The
    * returned frame is PINNED; the caller must `unpersist()` it.
    */
  def appendDedupHammingRouted(bandProbe: Seq[Long] => Option[DataFrame],
                               incoming: DataFrame, maxDist: Int,
                               bands: Int = 8,
                               idCol: String = "doc_id",
                               sigCol: String = "sig"): DataFrame = {
    val r = appendDedupHammingRoutedCounted(bandProbe, incoming, maxDist,
      bands, idCol, sigCol)
    // legacy single-frame contract: release the intermediate pins now.
    // NOTE (measured, r15): unpersisting an ancestor pin cascades into
    // dependents' cached data, so the returned frame RECOMPUTES on each
    // later action — fine for one-shot consumers (the registry rows);
    // sinks that commit the survivors to multiple stores must use the
    // Counted variant and release via unpersistAll() AFTER the commits.
    r.pins.filterNot(_ eq r.survivors).foreach(_.unpersist(false))
    r.survivors
  }

  /** [[appendDedupHammingRouted]]'s result with its pinned lineage held
    * open: `survivors` stays cache-backed (decode/probe work is never
    * re-paid) until the caller finishes committing and calls
    * [[HammingRoutedResult.unpersistAll]].
    */
  final case class HammingRoutedResult(survivors: DataFrame,
                                       pins: Seq[DataFrame]) {
    def unpersistAll(): Unit = pins.foreach(_.unpersist(false))
  }

  def appendDedupHammingRoutedCounted(bandProbe: Seq[Long] => Option[DataFrame],
                                      incoming: DataFrame, maxDist: Int,
                                      bands: Int = 8,
                                      idCol: String = "doc_id",
                                      sigCol: String = "sig"): HammingRoutedResult = {
    require(bands > 0 && 64 % bands == 0, s"bands must divide 64, got $bands")
    require(maxDist <= bands - 1,
      s"$bands-chunk pigeonhole only guarantees recall for maxDist <= ${bands - 1}")
    val batch = DedupOps.removeNearDups(incoming,
      DedupOps.hammingNearDupPairsFromSigs(incoming, maxDist, bands, idCol, sigCol),
      idCol).persist()
    batch.count()
    val inBands = bandRowsOfSigs(batch, bands, idCol, sigCol)
      .select(col("band_key"), col("doc_id").as("in_id"), col("sig").as("in_sig"))
      .persist()
    val keys = inBands.select("band_key").distinct()
      .collect().map(_.getLong(0)).toSeq
    val out = (if (keys.isEmpty) None else bandProbe(keys)) match {
      case None => batch
      case Some(ex) =>
        val drops = ex
          .select(col("band_key"), col("sig").as("ex_sig"))
          .join(inBands, Seq("band_key"))
          .filter(bit_count(col("ex_sig").bitwiseXOR(col("in_sig"))) <= maxDist)
          .select(col("in_id").as(idCol)).distinct()
        batch.join(broadcast(drops), Seq(idCol), "left_anti")
    }
    val pinned = out.persist()
    pinned.count()
    HammingRoutedResult(pinned, Seq(pinned, inBands, batch))
  }

  /** Cheap-signature routed TEXT tier (VERDICT r14 task 5): SimHash the
    * batch (64 bits over the distinct-token set — [[DedupOps.simHash]]'s
    * exact expression) and point-probe a persisted [[bandRowsOfSigs]]
    * store through [[appendDedupHammingRouted]] — the toks-store-free
    * ingest shape the media path uses, now on text. 8 bytes of state
    * per corpus doc (vs the MinHash path's full token arrays + 32-hash
    * signatures), pigeonhole recall 1.0 at `maxDist ≤ bands−1`,
    * hamming-0 on any whitespace re-serialization (tokens are
    * whitespace-split and de-duplicated, so spacing never moves a bit).
    *
    * WHICH RUNG: this is the standard cheap FIRST rung for crawl-scale
    * text — near-free state, catches re-crawls/re-serializations and
    * small token edits (maxDist ≈ 3). Its miss class is REORDER-heavy
    * and paraphrase-ish duplication (SimHash is token-set-based but
    * weight-blind): corpora needing Jaccard-verified resemblance keep
    * the MinHash/toks-store path ([[appendDedupNearDupRouted]]) as the
    * second rung — precise threshold semantics at ~40× the per-doc
    * state. Run the SimHash rung first; route its survivors into the
    * MinHash rung only where the corpus's duplication profile needs it.
    *
    * Output keeps the computed `sig` column (the corpus stores it, so
    * band-row repair after a crash re-bands without re-tokenizing).
    */
  def appendDedupSimHashRouted(bandProbe: Seq[Long] => Option[DataFrame],
                               incoming: DataFrame, maxDist: Int = 3,
                               bands: Int = 8,
                               textCol: String = "text",
                               idCol: String = "doc_id"): DataFrame = {
    val r = appendDedupSimHashRoutedCounted(bandProbe, incoming, maxDist,
      bands, textCol, idCol)
    r.pins.filterNot(_ eq r.survivors).foreach(_.unpersist(false))
    r.survivors
  }

  /** [[appendDedupSimHashRouted]] with the pinned lineage held open —
    * the sink form ([[graft.streaming.StreamingOps.corpusIngestSimHashBandedSink]]
    * commits survivors to two stores; the Counted result keeps the
    * probe's work cache-backed across both commits, released by ONE
    * `unpersistAll()` after).
    */
  def appendDedupSimHashRoutedCounted(bandProbe: Seq[Long] => Option[DataFrame],
                                      incoming: DataFrame, maxDist: Int = 3,
                                      bands: Int = 8,
                                      textCol: String = "text",
                                      idCol: String = "doc_id"): HammingRoutedResult = {
    val signed = incoming.withColumn("sig",
      DedupOps.simhash64(transform(
        TextOps.distinctTokens(col(textCol)), t => xxhash64(t))))
    appendDedupHammingRoutedCounted(bandProbe, signed, maxDist, bands, idCol)
  }

  /** The media ingest composition, ONE batch: quarantine →
    * hamming-routed near-dup → (rejects, survivors) — the per-trigger
    * core of [[graft.streaming.StreamingOps.corpusIngestMediaSink]],
    * factored out so the oracle-gated batch row and the streaming sink
    * run the SAME code (survivor equivalence is by construction, not by
    * spec). One decode per row, mechanically: the
    * [[MultimodalOps.mediaValidateAndSig]] pass (validation verdicts +
    * perceptual signature from a single codec decode) is PINNED before
    * the split, so the rejects write, the dedup probe, and the corpus
    * commit all read the cached verdicts instead of re-running the UDF
    * per action (the r14 "decodes every valid blob twice" finding,
    * closed).
    *
    * Checks, in first-failing order (the quarantine convention):
    * `media_present` (non-null, non-empty payload), `known_container`
    * (some codec's magic claims it), `media_decodes` (the claimed codec
    * really demuxes/decodes — [[MultimodalOps.mediaChecks]] semantics).
    * Valid rows with NULL signatures (decodable but signal-less) ride
    * into the survivor set undeduped — [[appendDedupHammingRouted]]'s
    * contract.
    *
    * Returns a [[MediaIngestResult]] whose `rejects`/`survivors` are
    * pinned and materialized with their whole lineage held open (an
    * ancestor unpersist cascades into dependents' cached data —
    * measured: releasing the validate pin re-decoded 3× per downstream
    * action); the caller commits both frames, then releases every pin
    * with ONE `unpersistAll()`. Survivor schema = input columns +
    * `media_category` + `sig` (the corpus stores the signature so
    * band-row repair after a crash needs no re-decode).
    */
  def mediaIngestBatch(bandProbe: Seq[Long] => Option[DataFrame],
                       batch: DataFrame, maxDist: Int,
                       bands: Int = 8,
                       mediaCol: String = "media",
                       idCol: String = "doc_id"): MediaIngestResult = {
    val marked = MultimodalOps.mediaValidateAndSig(batch, mediaCol)
      .withColumn("reject_reason", rejectReason(Seq(
        ("media_present",
          col(mediaCol).isNotNull && length(col(mediaCol)) > 0),
        ("known_container", col("media_category").isNotNull),
        ("media_decodes", col("media_ok")))))
      .persist()
    marked.count() // decode happens HERE, exactly once per row
    val rejects = marked.filter(col("reject_reason").isNotNull)
      .select(col(idCol), col(mediaCol), col("reject_reason"))
      .persist()
    rejects.count()
    val valid = marked.filter(col("reject_reason").isNull)
      .drop("reject_reason", "media_ok")
    val r = appendDedupHammingRoutedCounted(bandProbe, valid, maxDist,
      bands, idCol)
    MediaIngestResult(rejects, r.survivors, Seq(rejects, marked) ++ r.pins)
  }

  /** [[mediaIngestBatch]]'s commit set, lineage pinned end-to-end. */
  final case class MediaIngestResult(rejects: DataFrame,
                                     survivors: DataFrame,
                                     pins: Seq[DataFrame]) {
    def unpersistAll(): Unit = pins.foreach(_.unpersist(false))
  }

  /** Embedding-modality incremental ingest: drop every incoming vector
    * whose cosine similarity to ANY materialized vector reaches the
    * threshold (within-batch greedy removal first, lowest id wins).
    * The incoming batch broadcasts into the corpus scan — a
    * nested-loop pass over |corpus|·|batch| pairs, which is the honest
    * cost of exact cosine screening and still never shuffles the
    * corpus; swap the screen for an IVF/PQ probe when the batch itself
    * is large. Vector ids are assumed unique across existing ∪ incoming.
    */
  def appendDedupEmbeddings(existing: DataFrame, incoming: DataFrame, threshold: Double,
                            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val batch = DedupOps.removeNearDups(incoming,
      SimilarityOps.cosinePairs(incoming, threshold, idCol, vecCol),
      idCol, dropCol = "vec_b")
    val exV = SimilarityOps.normalized(existing, idCol, vecCol)
      .select(col("v").as("ex_v"))
    val inV = SimilarityOps.normalized(batch, idCol, vecCol)
      .select(col("id").as("in_id"), col("v").as("in_v"))
    val drops = exV.join(broadcast(inV),
        SimilarityOps.dotFast(col("ex_v"), col("in_v")) >= threshold)
      .select(col("in_id").as(idCol)).distinct()
    batch.join(broadcast(drops), Seq(idCol), "left_anti")
  }

  def appendDedupExact(existing: DataFrame, incoming: DataFrame,
                       textCol: String = "text", idCol: String = "doc_id",
                       expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val fpOf = TextOps.fingerprint(col(textCol))
    val batch = DedupOps.dedupExact(incoming, textCol, idCol)
      .withColumn("__fp", fpOf)
    // null-text rows have a null fingerprint: SQL join semantics never
    // match null keys, so the anti-join contract KEEPS them — drop them
    // from the existing side (they can't dedup anything) and route them
    // through the not-contained path below
    val exFp = existing.select(fpOf.as("__fp")).na.drop()
    // Spark's sketch aggregate returns a null buffer on an empty frame
    // (NPE in BloomFilter.readFrom) — and a corpus with no non-null
    // fingerprints dedups nothing. Guard on exFp, not existing: an
    // all-null-text corpus is non-empty but still yields an empty
    // sketch input.
    if (exFp.isEmpty) return batch.drop("__fp")
    val bloom = exFp.stat.bloomFilter("__fp", expectedItems, fpp)
    val bc = existing.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((s: String) => s != null && bc.value.mightContainString(s))
    // fingerprints that REALLY exist: broadcast the (tiny) bloom-positive
    // set into the corpus scan — map-side, corpus never repartitions —
    // then one broadcast anti-join clears exactly the true dups. Single
    // split point (no clear/suspect branch pair), so the deduped-batch
    // subplan is evaluated twice, not three times.
    val suspectFps = batch.filter(mightContain(col("__fp")))
      .select("__fp").distinct()
    val confirmedDup = exFp.join(broadcast(suspectFps), Seq("__fp")).distinct()
    batch.join(broadcast(confirmedDup), Seq("__fp"), "left_anti").drop("__fp")
  }

  /** [[appendDedupExact]] with the corpus side behind a FINGERPRINT
    * POINT-PROBE instead of a full corpus scan — the corpus-independent
    * per-trigger shape for exact dedup (the banding move applied to the
    * exact path): [[appendDedupExact]] re-scans the whole corpus every
    * call to build its Bloom filter, an O(corpus) map-side cost per
    * trigger that a 100 TB ingest cannot pay (measured as a 2.9 → 4.0 s
    * latency ramp over the first 60 quarantine-soak triggers at sf1).
    *
    * `fpProbe(fps)` returns the stored fingerprint rows (schema ⊇
    * (`fp`)) that MAY match the batch's fingerprints — a key-routed
    * point read ([[graft.runtime.BucketedFragmentStore.readWhere]] with
    * an IN over the batch's fps: bucket routing + the key-pushdown scan
    * make its I/O ∝ batch, not store). A superset is fine; None means
    * an empty store. The intersection is collected to the driver —
    * bounded by the batch size — and applied as a literal filter.
    * Within-batch dedup (lowest id per fingerprint) happens first,
    * exactly as [[appendDedupExact]]. Null-text rows carry a null
    * fingerprint and are KEPT (SQL join semantics never match null
    * keys — the same contract as the Bloom path). The returned frame is
    * PINNED (persist + materialize) so multi-store consumers run the
    * probe once; the CALLER must `unpersist()` it once consumed.
    *
    * Two filter regimes, switched at `maxIsinFps` (VERDICT r12 #5):
    * micro-batches apply the probe intersection as `isin` literal
    * lists (the cheapest plan at 250-doc triggers — no exchange, no
    * join operator), but a 10⁵-row batch's literal list bloats the
    * expression tree and plan-compile time, so above the threshold the
    * intersection stays DISTRIBUTED: the batch's fingerprint frame
    * broadcast-semi-joins the probe result and the hits broadcast-
    * anti-join the batch (null fingerprints match nothing in an
    * anti-join, so the null-keep contract holds by SQL semantics on
    * both sides). Survivors are identical across regimes — spec-gated.
    */
  def appendDedupExactRouted(fpProbe: Seq[Any] => Option[DataFrame],
                             incoming: DataFrame,
                             textCol: String = "text",
                             idCol: String = "doc_id",
                             maxIsinFps: Int = DefaultMaxIsin): DataFrame = {
    val batch = DedupOps.dedupExact(incoming, textCol, idCol)
      .withColumn("__fp", TextOps.fingerprint(col(textCol))).persist()
    batch.count()
    val fps = batch.select("__fp").na.drop().distinct()
      .collect().map(_.getString(0)).toSeq
    val out =
      if (fps.isEmpty) batch.drop("__fp")
      else fpProbe(fps) match {
        case None => batch.drop("__fp")
        case Some(ex) if fps.size <= maxIsinFps =>
          val hits = ex.select(col("fp"))
            .filter(col("fp").isin(fps: _*))
            .distinct().collect().map(_.getString(0)).toSeq
          if (hits.isEmpty) batch.drop("__fp")
          else batch.filter(col("__fp").isNull || !col("__fp").isin(hits: _*))
            .drop("__fp")
        case Some(ex) =>
          // large-batch regime: no literal lists, no driver round-trip
          // for the hit set — the batch is already pinned, so the
          // broadcast sides rebuild from cached blocks, and the probe
          // result executes once into the pin below
          val batchFps = batch.select(col("__fp").as("fp")).na.drop().distinct()
          val hitFrame = ex.select(col("fp"))
            .join(broadcast(batchFps), Seq("fp"), "left_semi")
            .distinct().withColumnRenamed("fp", "__fp")
          batch.join(broadcast(hitFrame), Seq("__fp"), "left_anti")
            .drop("__fp")
      }
    val pinned = out.persist()
    pinned.count()
    batch.unpersist(false)
    pinned
  }
}
