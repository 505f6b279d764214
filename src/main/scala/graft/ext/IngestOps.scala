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
    */
  def appendDedupNearDup(existing: DataFrame, incoming: DataFrame, threshold: Double,
                         numHashes: Int = 32, bands: Int = 8, shingleK: Int = 1,
                         textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val rows = numHashes / bands
    val exact = DedupOps.dedupExact(incoming, textCol, idCol)
    val batch = DedupOps.removeNearDups(exact,
      DedupOps.minHashNearDupPairs(exact, threshold, numHashes, bands, shingleK,
        textCol, idCol),
      idCol)
    val exS = DedupOps.minHashSigFrame(existing, numHashes, shingleK, textCol, idCol)
    val inS = DedupOps.minHashSigFrame(batch, numHashes, shingleK, textCol, idCol)
    val cand = DedupOps.lshBands(exS, "sig", bands, rows).as("x")
      .join(broadcast(DedupOps.lshBands(inS, "sig", bands, rows).as("y")),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key"))
      .select(col("x.doc_id").as("ex_id"), col("y.doc_id").as("in_id"))
      .distinct()
    val drops = exS.select(col("doc_id").as("ex_id"), col("toks").as("ex_toks"))
      .join(broadcast(cand), Seq("ex_id"))
      .join(broadcast(inS.select(col("doc_id").as("in_id"), col("toks").as("in_toks"))),
        Seq("in_id"))
      .filter(size(array_intersect(col("ex_toks"), col("in_toks"))).cast("double") /
        size(array_union(col("ex_toks"), col("in_toks"))) >= threshold)
      .select(col("in_id").as(idCol)).distinct()
    batch.join(broadcast(drops), Seq(idCol), "left_anti")
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
}
