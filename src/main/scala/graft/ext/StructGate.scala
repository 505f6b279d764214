package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Structural (invariant) oracles for the approximate rows whose raw
  * output the DuckDB driver cannot reproduce — banded near-dup pair
  * sets and approximate ANN neighbor sets. The *_exactmode twins and
  * measured-recall gates already cross-check those families; what was
  * still missing (VERDICT r9 §missing-3) is a driver-checked gate ON
  * THE PRODUCTION ROW ITSELF. The pattern here mirrors
  * [[RecallOps.recallGate]]: the registered row runs the full
  * production computation, then projects it to columns whose correct
  * values the oracle KNOWS — per-(query, rank) verification flags for
  * top-k rows, whole-frame verification flags for pair rows — so any
  * violated invariant (wrong row count, id outside the corpus, a
  * fabricated similarity, an unverified pair, a self-match) flips a
  * value the driver hash-compares.
  *
  * Every flag is verified EXACTLY (re-derived similarities, re-derived
  * signatures, portable token sets), so a `true` is a theorem about the
  * emitted result, not a tautology.
  */
object StructGate {

  import SimilarityOps.{dotFast, normalized}

  /** Per-(query, rank) structural verification of a top-k result frame
    * in the ladder contract shape (query_id, corpus_id, sim, rank).
    * Output: one row per RESULT row — (query_id, rank, id_ok, no_self,
    * sim_exact, order_ok) — plus, through the exact (query, rank) key
    * set, the two global facts the oracle pins: every query answers
    * EXACTLY k rows and ranks are exactly 1..k.
    *
    *  - id_ok:     corpus_id exists in the corpus frame
    *  - no_self:   corpus_id != query_id
    *  - sim_exact: reported sim equals the re-derived exact cosine of
    *               the (query, corpus) embedding pair
    *  - order_ok:  sim is non-increasing in rank within the query
    */
  def topKGate(result: DataFrame, queries: DataFrame, corpus: DataFrame,
               idCol: String = "vec_id", vecCol: String = "embedding",
               tolerance: Double = 1e-6): DataFrame = {
    val c = normalized(corpus, idCol, vecCol)
      .select(col("id").as("corpus_id"), col("v").as("__cv"))
    val q = normalized(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("v").as("__qv"))
    val w = Window.partitionBy("query_id").orderBy("rank")
    result
      .join(c, Seq("corpus_id"), "left")
      .join(broadcast(q), Seq("query_id"), "left")
      .withColumn("__next_sim", lead(col("sim"), 1).over(w))
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("__cv").isNotNull.as("id_ok"),
        (col("corpus_id") =!= col("query_id")).as("no_self"),
        (col("__cv").isNotNull && col("__qv").isNotNull &&
          abs(col("sim") - dotFast(col("__qv"), col("__cv"))) <= tolerance)
          .as("sim_exact"),
        (col("__next_sim").isNull || col("sim") >= col("__next_sim"))
          .as("order_ok"))
  }

  /** The ANSI oracle for [[topKGate]] over the standard embeddings
    * fixture: every query under `maxQueryId` must answer ranks 1..k
    * with every flag true.
    */
  def topKGateOracle(k: Int, maxQueryId: Int): String =
    s"""SELECT e.vec_id AS query_id, CAST(r.range + 1 AS BIGINT) AS rank,
       |  true AS id_ok, true AS no_self, true AS sim_exact, true AS order_ok
       |FROM embeddings e CROSS JOIN range($k) r
       |WHERE e.vec_id < $maxQueryId""".stripMargin

  /** Whole-frame structural verification of a cosine near-dup pair
    * frame (vec_a, vec_b, sim): ids resolve in the corpus, pairs are
    * lower-id-first and distinct, the reported sim is the re-derived
    * exact cosine, and every pair clears the threshold. One output row
    * of flags (plus nonempty — an empty result trivially satisfies
    * everything, so the gate also pins that the row found anything at
    * all).
    */
  def cosinePairGate(pairs: DataFrame, embs: DataFrame, threshold: Double,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     tolerance: Double = 1e-6): DataFrame = {
    val e = normalized(embs, idCol, vecCol)
    val joined = pairs
      .join(e.select(col("id").as("vec_a"), col("v").as("__va")), Seq("vec_a"), "left")
      .join(e.select(col("id").as("vec_b"), col("v").as("__vb")), Seq("vec_b"), "left")
      .withColumn("__exact", dotFast(col("__va"), col("__vb")))
    gateRow(joined,
      "ordered_ok" -> (col("vec_a") < col("vec_b")),
      "ids_ok" -> (col("__va").isNotNull && col("__vb").isNotNull),
      "sim_exact" -> (abs(col("sim") - col("__exact")) <= tolerance),
      "threshold_ok" -> (col("sim") >= threshold))
      .crossJoin(pairDistinctness(pairs, "vec_a", "vec_b"))
      .select(col("nonempty"), col("ordered_ok"), col("ids_ok"),
        col("sim_exact"), col("threshold_ok"), col("pairs_distinct"))
  }

  /** Whole-frame verification of a verified-Jaccard pair frame
    * (doc_a, doc_b, jaccard) against portable distinct-token sets:
    * the reported jaccard is re-derived exactly and clears the
    * threshold; ordering/ids/distinctness as in [[cosinePairGate]].
    * `tokensOf` must reproduce the token sets the producer verified
    * with (e.g. distinct whitespace tokens for shingleK = 1).
    */
  def jaccardPairGate(pairs: DataFrame, docs: DataFrame, threshold: Double,
                      tokensOf: Column => Column,
                      idCol: String = "doc_id", textCol: String = "text",
                      tolerance: Double = 1e-9): DataFrame = {
    val t = docs.select(col(idCol).as("__id"), tokensOf(col(textCol)).as("__toks"))
    val joined = pairs
      .join(t.select(col("__id").as("doc_a"), col("__toks").as("__ta")), Seq("doc_a"), "left")
      .join(t.select(col("__id").as("doc_b"), col("__toks").as("__tb")), Seq("doc_b"), "left")
      .withColumn("__exact",
        size(array_intersect(col("__ta"), col("__tb"))).cast("double") /
          size(array_union(col("__ta"), col("__tb"))))
    gateRow(joined,
      "ordered_ok" -> (col("doc_a") < col("doc_b")),
      "ids_ok" -> (col("__ta").isNotNull && col("__tb").isNotNull),
      "jaccard_exact" -> (abs(col("jaccard") - col("__exact")) <= tolerance),
      "threshold_ok" -> (col("jaccard") >= threshold))
      .crossJoin(pairDistinctness(pairs, "doc_a", "doc_b"))
      .select(col("nonempty"), col("ordered_ok"), col("ids_ok"),
        col("jaccard_exact"), col("threshold_ok"), col("pairs_distinct"))
  }

  /** Whole-frame verification of a SimHash pair frame
    * (doc_a, doc_b, hamming): the reported hamming distance is
    * re-derived from freshly computed signatures and is within
    * `maxDist`; ordering/ids/distinctness as above. The signature
    * recomputation shares [[DedupOps.simHash]] — the gate proves the
    * BANDED candidate stage emitted only true-signature pairs, which is
    * exactly the seam the chunk join could get wrong.
    */
  def hammingPairGate(pairs: DataFrame, docs: DataFrame, maxDist: Int,
                      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sigs = DedupOps.simHash(docs, textCol, idCol)
    val joined = pairs
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("__sa")), Seq("doc_a"), "left")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("__sb")), Seq("doc_b"), "left")
      .withColumn("__exact", bit_count(col("__sa").bitwiseXOR(col("__sb"))))
    gateRow(joined,
      "ordered_ok" -> (col("doc_a") < col("doc_b")),
      "ids_ok" -> (col("__sa").isNotNull && col("__sb").isNotNull),
      "hamming_exact" -> (col("hamming") === col("__exact")),
      "maxdist_ok" -> (col("hamming") <= maxDist))
      .crossJoin(pairDistinctness(pairs, "doc_a", "doc_b"))
      .select(col("nonempty"), col("ordered_ok"), col("ids_ok"),
        col("hamming_exact"), col("maxdist_ok"), col("pairs_distinct"))
  }

  /** Whole-frame verification of a greedy semantic-dedup result
    * against the pair frame that drove it: the kept set is a distinct
    * subset of the corpus, the dropped set is EXACTLY the pairs'
    * higher-id side (the greedy policy's definition — nothing dropped
    * without a pair, nothing pair-named left undropped), and every
    * pair is TRUE (lower-id-first, ids resolve, sim re-derived exact
    * at `threshold`) — so every drop has a re-verified witness.
    * Cost is O(kept + pairs), the same shuffle class as the dedup
    * itself; an all-pairs witness search would verify the identical
    * theorem at O(dropped·corpus) and was measured 4× the production
    * row at the sf1 tier. Cell-boundary recall (which pairs were
    * FOUND) rides the exactmode twin; this gate proves the emitted
    * decision is faithful to verified pairs.
    */
  def semanticDedupGate(kept: DataFrame, corpus: DataFrame, pairs: DataFrame,
                        threshold: Double,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding",
                        tolerance: Double = 1e-6): DataFrame = {
    val ids = corpus.select(col(idCol))
    val droppedIds = ids.join(kept.select(col(idCol)), Seq(idCol), "left_anti")
    val pairDrops = pairs.select(col("vec_b").as(idCol)).distinct()
    val e = normalized(corpus, idCol, vecCol)
    val pairCheck = pairs
      .join(e.select(col("id").as("vec_a"), col("v").as("__va")), Seq("vec_a"), "left")
      .join(e.select(col("id").as("vec_b"), col("v").as("__vb")), Seq("vec_b"), "left")
      // inner coalesce: a null-field pair (null sim, null id) must FAIL
      // the vote, not be skipped by bool_and's null handling
      .agg(coalesce(bool_and(coalesce(
        col("vec_a") < col("vec_b") &&
          col("__va").isNotNull && col("__vb").isNotNull &&
          abs(col("sim") - dotFast(col("__va"), col("__vb"))) <= tolerance &&
          col("sim") >= threshold, lit(false))), lit(true)).as("pairs_verified"))
    kept.agg((count(lit(1)) > 0).as("kept_nonempty"),
        (count(lit(1)) === countDistinct(col(idCol))).as("kept_ids_distinct"))
      .crossJoin(kept.join(ids, Seq(idCol), "left_anti")
        .agg((count(lit(1)) === 0).as("kept_in_corpus")))
      .crossJoin(droppedIds.unionByName(pairDrops)
        .groupBy(idCol).agg(count(lit(1)).as("__n"))
        .agg(coalesce(bool_and(col("__n") === 2), lit(true))
          .as("drops_match_pairs")))
      .crossJoin(pairCheck)
  }

  /** Whole-frame verification of a near-dup-aware ingest: survivors
    * come only from the incoming batch and have pairwise-distinct
    * texts (the exact-dedup leg), and every REJECTED incoming doc has
    * a re-derived exact-Jaccard witness at `threshold` somewhere in
    * the pool (existing corpus ∪ incoming) — every drop was earned,
    * whether by the exact leg (jaccard 1) or a verified near-dup.
    * LSH recall (drops that were MISSED) rides the exactmode twin.
    *
    * `poolToks` (schema ⊇ (idCol, toks)) lets a caller REUSE token
    * work the production pipeline already paid for — e.g. the
    * signature frames of [[graft.ext.IngestOps.appendDedupNearDupSigned]]
    * or a RoutedAppend's `sigs` — instead of the gate re-tokenizing
    * the whole pool (VERDICT r12 #3: at sf0.1 the re-tokenization was
    * ~2.5× the row's production cost). CONTRACT: each row's `toks`
    * must equal `tokensOf(text)` for that pool doc (true for
    * shingleK=1 sig frames with no hot-shingle list), and the frame
    * must cover every pool doc with a nonempty token set OR an
    * identical-text twin of it (exact-dup shadows witness through
    * their kept twin at Jaccard 1). Empty-token pool docs are
    * witness-inert either way: intersection 0 over a nonempty union
    * is 0 < threshold, and 0/0 compares null — never a witness.
    */
  def ingestNearDupGate(survivors: DataFrame, pool: DataFrame,
                        incoming: DataFrame, threshold: Double,
                        tokensOf: Column => Column,
                        idCol: String = "doc_id",
                        textCol: String = "text",
                        poolToks: Option[DataFrame] = None): DataFrame = {
    def t(d: DataFrame) =
      d.select(col(idCol).as("__id"), tokensOf(col(textCol)).as("__toks"))
    // PIN the gate's subject: the flag row references the survivor set
    // from five subtrees (two survivor aggregates, the dropped
    // anti-join, and the witness search's prefix + verify legs), and
    // `survivors` is the FULL production ingest pipeline — un-pinned,
    // one gate evaluation re-ran it ~5×, measured as ~2.5× the whole
    // row's production cost at sf0.1. MEMORY_AND_DISK persist; the
    // gate evaluates EAGERLY below and unpersists before returning, so
    // repeated calls in a long-lived session leak no cached blocks
    // (ADVICE r11 #2 — cleanup must not depend on Bench's hygiene).
    val sv = survivors.persist()
    val dropped = incoming
      .join(sv.select(col(idCol)), Seq(idCol), "left_anti").persist()
    // ONE-SIDED PREFIX witness search. Pigeonhole: Jaccard(x,y) ≥ t
    // forces |x∩y| ≥ ⌈t·|x|⌉, so ANY p = n − ⌈t·n⌉ + 1 tokens of a
    // dropped doc x must contain a shared token (the complement has
    // only ⌈t·n⌉ − 1 slots) — prefixing ONLY the dropped side is
    // lossless, no ordering consistency with the pool needed. The
    // pool side therefore never shuffles or rank-windows (an earlier
    // two-sided form rank-windowed every pool posting — measured 2×
    // the whole row's cost at sf0.1): one pool df aggregate picks the
    // RAREST p tokens per dropped doc (pure fan-out heuristic — a
    // Zipf-head token lands in a prefix only when a doc has almost no
    // rare tokens), and pool postings stream map-side into a broadcast
    // join with the (batch-sized) dropped prefixes. Tokens absent from
    // the pool can be excluded from the ranking outright: a pool
    // witness cannot share them, and if fewer than p pool-present
    // tokens remain the prefix is all of them (still lossless).
    // Candidates verify with exact full-set Jaccard — the theorem
    // proved is unchanged.
    // PIN the gate's working frames too (VERDICT r12 #3): dT feeds two
    // subtrees (prefix ranking, verify) and pT three (df ranking, the
    // candidate postings, verify) — un-pinned, the pool tokenized three
    // times per gate evaluation. Both are released with the eager
    // collect below, same discipline as sv/dropped.
    val dT = t(dropped).withColumn("__n", size(col("__toks"))).persist()
    val pT = poolToks
      .map(_.select(col(idCol).as("__id"), col("toks").as("__toks")))
      .getOrElse(t(pool))
      .persist()
    val dfRank = pT.select(explode(col("__toks")).as("__t"))
      .groupBy("__t").agg(count(lit(1)).as("__df"))
    // exact-decimal ⌈t·n⌉ (see DedupOps.prefixCandidatesOf): double
    // rounding may only LENGTHEN the prefix, never shorten it
    val tDec = new java.math.BigDecimal(threshold)
      .setScale(18, java.math.RoundingMode.DOWN)
    val dPrefix = dT
      .select(col("__id"), col("__n"), explode(col("__toks")).as("__t"))
      .join(dfRank, Seq("__t"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__id").orderBy(col("__df"), col("__t"))))
      .filter(col("__rn") <= col("__n") - ceil(col("__n") * lit(tDec)) + 1)
      .select(col("__id").as("__d"), col("__t"))
    val cand = pT.select(col("__id").as("__p"), explode(col("__toks")).as("__t"))
      .join(broadcast(dPrefix), Seq("__t"))
      .filter(col("__d") =!= col("__p"))
      .select("__d", "__p").distinct()
    // no distinct on the witness set: it only feeds the left_anti
    // below, where duplicate ids are harmless — the dedup exchange was
    // one more stage per evaluation (the drops-side lesson from the
    // routed ingest, applied to the gate)
    val witnessed = cand
      .join(dT.select(col("__id").as("__d"), col("__toks").as("__dt")), Seq("__d"))
      .join(pT.select(col("__id").as("__p"), col("__toks").as("__pt")), Seq("__p"))
      .filter(size(array_intersect(col("__dt"), col("__pt"))).cast("double") /
        size(array_union(col("__dt"), col("__pt"))) >= threshold)
      .select(col("__d").as(idCol))
    // ONE aggregate serves all three survivor flags (was three
    // crossJoined subtrees — each its own broadcast + job chain): the
    // membership anti-join folds into a broadcast left join against the
    // (distinct, batch-sized) incoming ids, so `survivors_from_incoming`
    // is a bool_and over the same pass that counts and distinct-hashes.
    // Distinct incoming ids keep the join key unique — the row count
    // the first two flags aggregate is exactly sv's.
    val inIds = incoming.select(col(idCol)).distinct()
      .withColumn("__from_in", lit(true))
    val gate = sv.join(broadcast(inIds), Seq(idCol), "left")
      .agg((count(lit(1)) > 0).as("survivors_nonempty"),
        (count(lit(1)) === countDistinct(md5(col(textCol))))
          .as("survivors_distinct_text"),
        coalesce(bool_and(col("__from_in").isNotNull), lit(true))
          .as("survivors_from_incoming"))
      .crossJoin(dropped.select(col(idCol)).join(witnessed, Seq(idCol), "left_anti")
        .agg((count(lit(1)) === 0).as("dropped_have_witness")))
    // evaluate now (1 flag row) so the pins release with the call
    if (devLazyGateR11) return gate // A/B reproduction arm ONLY
    val rows = gate.collect()
    val out = sv.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), gate.schema)
    sv.unpersist()
    dropped.unpersist()
    dT.unpersist()
    pT.unpersist()
    out
  }

  /** DEV-ONLY (graft.dev.GateAbSub): reproduce the r11 pre-ADVICE-fix
    * gate — return the flag row LAZILY with every pin leaked, so a
    * min-of-N timing loop's later passes read pass 1's cached blocks
    * (the measurement r12's adjudication corrected). Never set outside
    * the A/B harness; production semantics require the eager path.
    */
  @volatile private[graft] var devLazyGateR11: Boolean = false

  /** Constant-true one-row oracle matching the pair gates' column set. */
  def pairGateOracle(metricFlag: String,
                     boundFlag: String = "threshold_ok"): String =
    s"""SELECT true AS nonempty, true AS ordered_ok, true AS ids_ok,
       |  true AS $metricFlag, true AS $boundFlag, true AS pairs_distinct"""
      .stripMargin

  /** bool_and-fold the flag expressions over `rows` into one gate row,
    * plus a nonempty witness. Each per-row verdict is NULL-hardened
    * BEFORE the fold: bool_and SKIPS nulls, so a row whose fields are
    * null (e.g. a producer emitting a null-sim pair — a degenerate
    * fabrication this gate exists to catch) must count as FAILED, not
    * vanish from the vote. The outer coalesce handles only the
    * empty-frame case (vacuously true; `nonempty` is the guard).
    */
  private def gateRow(rows: DataFrame, flags: (String, Column)*): DataFrame =
    rows.agg(
      (count(lit(1)) > 0).as("nonempty"),
      flags.map { case (n, c) =>
        coalesce(bool_and(coalesce(c, lit(false))), lit(true)).as(n)
      }: _*)

  private def pairDistinctness(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    pairs.agg((count(lit(1)) ===
      countDistinct(col(aCol), col(bCol))).as("pairs_distinct"))
}
