package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Deduplication operators for LLM training-data pipelines
  * (charter, SURVEY §0(c)): exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design (the 100 TB story):
  *  - exact dedup: one hash shuffle on a 128-bit fingerprint — optimal.
  *  - Jaccard: inverted-index self-join on tokens (shuffle by token) —
  *    the standard all-pairs shape; integer arithmetic until the final
  *    division so results are engine-exact. NB the fixture corpus has a
  *    ~60-word vocabulary, the worst case for a token index (every doc
  *    collides with every doc) — real corpora have Zipfian vocab, and
  *    the hot-token skew is absorbed by DOCUMENT-FREQUENCY PRUNING
  *    (`maxDocFreqRatio`): a token in more than that fraction of the
  *    corpus is a stopword for dedup purposes — it contributes no
  *    discriminating signal but fans out quadratically within its
  *    posting list — so it is dropped from the index (the C4/RefinedWeb
  *    recipe) BEFORE the self-join, bounding any one token's pair
  *    fan-out at (ratio·N)². AQE skew-join remains the absorber for
  *    skew below the bound.
  *  - MinHash+LSH: per-doc signature (map-only) → band keys → shuffle by
  *    band key → pairs only within buckets → exact-Jaccard verify of the
  *    candidates. Replaces the O(n²) all-pairs with O(candidates).
  *  - SimHash: 64-bit signature; near-dups must share one of four 16-bit
  *    chunks (pigeonhole: hamming ≤ 3 ⇒ some chunk equal), so the join
  *    key-space is 4 exact-match joins — no n² anywhere.
  */
object DedupOps {

  /** Exact dedup groups: canonical (min) id + multiplicity per content
    * fingerprint. `n > 1` rows are the duplicate clusters.
    */
  def exactDupGroups(docs: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame =
    docs.groupBy(TextOps.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n"))

  /** The deduplicated CORPUS — what a training pipeline actually feeds
    * downstream: one representative row (lowest id) per content
    * fingerprint, schema unchanged. One shuffle (hash on the
    * fingerprint); the per-group argmin rides the same exchange via the
    * window, no second join back.
    */
  def dedupExact(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame =
    graft.ops.Dedup.topOnePerKey(
      docs.withColumn("__fp", TextOps.fingerprint(col(textCol))),
      keys = Seq(col("__fp")), order = Seq(col(idCol)))
      .drop("__fp")

  /** Greedy near-dup removal (the one-pass C4-style policy): drop every
    * row that appears as the HIGHER id of any near-dup pair, keep the
    * rest. Deterministic and single-pass — no iteration to a fixed point,
    * so a chain a~b~c keeps only `a` even if a≁c (over-removal is the
    * accepted trade at corpus scale; connected-components is the
    * iterative alternative). `pairs` is any (lo, hi) pair frame —
    * jaccardPairs/minHash/simHash emit `doc_b` (the default `dropCol`);
    * pass `dropCol = "vec_b"` for cosinePairs/lshCosinePairs output.
    */
  def removeNearDups(docs: DataFrame, pairs: DataFrame,
                     idCol: String = "doc_id", dropCol: String = "doc_b"): DataFrame =
    docs.join(pairs.select(col(dropCol).as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** [[removeNearDups]] for BATCH-BOUNDED pair frames (the streaming
    * sinks' within-batch leg): the drop set broadcasts un-deduped into
    * the anti-join — duplicates are harmless there, and skipping the
    * distinct exchange + the sort-merge plan saves two stages per
    * trigger. Never for corpus-scale pair frames (unbounded broadcast).
    */
  private[ext] def removeNearDupsBroadcast(docs: DataFrame, pairs: DataFrame,
                     idCol: String = "doc_id", dropCol: String = "doc_b"): DataFrame =
    docs.join(broadcast(pairs.select(col(dropCol).as(idCol))),
      Seq(idCol), "left_anti")

  /** Connected components over a near-dup pair frame: iterative min-label
    * propagation to a fixed point. Returns `(node, root)` for every node
    * that appears in a pair, where `root` is the smallest id in the
    * node's component.
    *
    * Each iteration is one join (labels along edges) + one min-agg; the
    * frontier is `localCheckpoint`ed so the loop's lineage stays flat.
    * Labels only ever DECREASE, so the fixpoint test is a scalar: the
    * exact (decimal, overflow-free) sum of labels is strictly monotone
    * down until convergence — one O(nodes) aggregate over the already
    * checkpointed frontier instead of a per-round change-detection join.
    * Each round ends with a POINTER JUMP (`root := root's root`, the
    * path-halving trick of the Kiveris et al. MapReduce CC family):
    * jumping halves the remaining label-chain depth every round, so a
    * diameter-d chain converges in O(log d) rounds instead of O(d) —
    * measured 7 → 4 rounds on the fixture's near-dup graph. The jump
    * is sound because label(root) ≤ root under monotone min-labels, and
    * root is always a node of the same component.
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "doc_a",
                          bCol: String = "doc_b", maxIters: Int = 50): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct().localCheckpoint()
    // seeding with min(self, min neighbor) is the first propagate round
    // for the price of the node-distinct shuffle the init pays anyway
    var labels = edges.groupBy(col("src").as("node"))
      .agg(least(min(col("dst")), col("src")).as("root")).localCheckpoint()
    if (labels.isEmpty) return labels  // no pairs → no components
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("root").cast("decimal(38,0)"))).head.getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val msgs = edges.join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .select(col("src").as("node"), col("root"))
      // checkpointed so the jump self-join reads the propagate result
      // once instead of recomputing the subtree on both join inputs
      val propagated = labels.union(msgs).groupBy("node").agg(min("root").as("root"))
        .localCheckpoint()
      val rootsOf = propagated.select(col("node").as("jroot"), col("root").as("jump"))
      val next = propagated
        .join(rootsOf, propagated("root") === rootsOf("jroot"), "left")
        .select(propagated("node"),
          least(propagated("root"), coalesce(col("jump"), propagated("root"))).as("root"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIters iterations")
    labels
  }

  /** Cluster-representative near-dup policy: keep exactly ONE document
    * (the lowest id) per connected component of the near-dup graph, and
    * every document that has no near-dup at all. The iterative
    * alternative to greedy [[removeNearDups]]: where greedy can keep
    * several locally-minimal docs from one transitive cluster (e.g. the
    * pair set {(1,3),(2,3)} keeps both 1 and 2), the CC policy keeps
    * exactly the component minimum.
    */
  def dedupNearDupsCC(docs: DataFrame, pairs: DataFrame,
                      idCol: String = "doc_id"): DataFrame = {
    val comp = connectedComponents(pairs)
    docs.join(comp, docs(idCol) === comp("node"), "left")
      .filter(col("root").isNull || col("root") === docs(idCol))
      .drop("node", "root")
  }

  /** (id, token) inverted index over an arbitrary distinct-token-array
    * column (words, shingles, …).
    */
  private def tokenIndexOf(docs: DataFrame, tokensCol: Column, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), explode(tokensCol).as("t"))

  /** sizes + shared-count + final division over any (doc_id, t) index —
    * the shared tail of every set-Jaccard variant.
    */
  private def pairsFromIndex(tok: DataFrame, threshold: Double): DataFrame = {
    val sizes = tok.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val shared = tok.as("a").join(tok.as("b"),
        col("a.t") === col("b.t") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("shared").cast("double") /
          (col("sa.n") + col("sb.n") - col("shared"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Order-SENSITIVE n-gram Jaccard: the same inverted-index shape as
    * [[jaccardPairs]] but over k-token shingle sets, so shuffled word
    * order scores near zero where the token-set metric scores 1.0 —
    * the usual web-dedup setting (k 2-5). Short docs (< k tokens)
    * contribute their whole token run as a single shingle, mirroring
    * [[shingles]].
    *
    * `maxDocFreqRatio` prunes hot SHINGLES exactly as [[jaccardPairs]]
    * prunes hot words (same floor(ratio · N) bound, Jaccard exact over
    * the pruned shingle sets) — on the web this is the knob that stops a
    * boilerplate header k-gram repeated corpus-wide from becoming a
    * quadratic join key.
    */
  def shingleJaccardPairs(docs: DataFrame, threshold: Double, k: Int,
                          textCol: String = "text", idCol: String = "doc_id",
                          maxDocFreqRatio: Option[Double] = None): DataFrame =
    pairsFromIndex(
      prunedIndexOf(withToks(docs, textCol, idCol),
        array_distinct(shinglesOfTokens(col("__toks"), k)), idCol,
        maxDocFreqRatio), threshold)

  /** Drop tokens whose posting list exceeds `maxDf` docs. The hot set is
    * tiny by definition (heavy hitters), so it broadcasts and the prune
    * is a map-side anti-join — no extra shuffle on the index itself
    * beyond the one df-count aggregation.
    */
  private[ext] def pruneHotTokens(tok: DataFrame, maxDf: Long): DataFrame = {
    val hot = tok.groupBy("t").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("t")
    tok.join(broadcast(hot), Seq("t"), "left_anti")
  }

  /** Inverted index with optional document-frequency pruning — the
    * shared head of every set-Jaccard variant (word tokens and shingles
    * alike). None = full index; Some(r) drops tokens with df >
    * floor(r · N), the same bound the DuckDB oracles compute.
    */
  private def prunedIndexOf(docs: DataFrame, tokensCol: Column, idCol: String,
                            maxDocFreqRatio: Option[Double]): DataFrame =
    maxDocFreqRatio match {
      case None => tokenIndexOf(docs, tokensCol, idCol)
      case Some(r) =>
        require(r > 0 && r <= 1, s"maxDocFreqRatio must be in (0,1]: $r")
        // one O(1)-result count job to fix the absolute bound; the same
        // floor(ratio · N) the DuckDB oracle computes
        val maxDf = math.floor(r * docs.count()).toLong
        pruneHotTokens(tokenIndexOf(docs, tokensCol, idCol), maxDf)
    }

  /** All-pairs token-set Jaccard ≥ threshold via inverted-index join.
    * Integer shared/size counts; single double division at the end.
    *
    * `maxDocFreqRatio` (0,1]: document-frequency pruning — tokens
    * appearing in more than `ratio · |docs|` documents are dropped from
    * the index before the self-join, and the Jaccard is computed over
    * the PRUNED token sets (sizes and shared counts both post-prune, so
    * the score is exact for the pruned metric). This is the knob that
    * keeps one stopword-ish token at 100 TB from becoming a quadratic
    * hot key. None = unpruned exact token-set Jaccard.
    */
  def jaccardPairs(docs: DataFrame, threshold: Double,
                   textCol: String = "text", idCol: String = "doc_id",
                   maxDocFreqRatio: Option[Double] = None): DataFrame =
    pairsFromIndex(
      prunedIndexOf(docs, TextOps.distinctTokens(col(textCol)), idCol,
        maxDocFreqRatio), threshold)

  /** Prefix-token candidate pairs under a global rarity order (seam for
    * [[jaccardPairsPrefix]] and its reduction spec): each doc
    * contributes only its p = n − ⌈t·n⌉ + 1 globally-rarest tokens to
    * the inverted index. `tokensCol` is any distinct-token-array column
    * (words or shingles — the lemma only needs ONE global order over
    * whatever the set elements are).
    */
  private[ext] def prefixCandidatesOf(docs: DataFrame, threshold: Double,
                                      tokensCol: Column, idCol: String): DataFrame = {
    val tok = tokenIndexOf(docs, tokensCol, idCol)
    val dfRank = tok.groupBy("t").agg(count(lit(1)).as("df"))
    val ranked = tok.join(dfRank, Seq("t"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("df"), col("t"))))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
    // ⌈t·n⌉ in EXACT decimal arithmetic: a double `n * t` can overshoot
    // an exact integer product (0.07 * 100 = 7.000…001 → ceil 8) and
    // silently shorten the prefix below the lemma's bound. Rounding the
    // threshold DOWN to 18 decimal digits only lengthens the prefix
    // (conservative), never shortens it.
    val tDec = new java.math.BigDecimal(threshold)
      .setScale(18, java.math.RoundingMode.DOWN)
    val prefix = ranked
      .filter(col("rn") <= col("n") - ceil(col("n") * lit(tDec)) + 1)
      .select("doc_id", "t")
    prefix.as("a").join(prefix.as("b"),
        col("a.t") === col("b.t") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** EXACT all-pairs token-set Jaccard ≥ threshold with PREFIX FILTERING
    * (Bayardo et al., "Scaling Up All Pairs Similarity Search", WWW'07;
    * Xiao et al., ppjoin): byte-identical output to [[jaccardPairs]] —
    * it shares the same oracle — from a fraction of the candidate pairs.
    *
    * Sort every doc's tokens by one GLOBAL rarity order (ascending df,
    * token as tiebreak) and index only the first p = n − ⌈t·n⌉ + 1 of
    * them. If two sets with Jaccard ≥ t shared no prefix token, all
    * their shared tokens would sit in the suffixes of length ⌈t·n⌉ − 1,
    * capping the overlap below what Jaccard ≥ t requires — so joining
    * prefixes loses no true pair (the standard prefix-filter lemma).
    * Candidates are then verified with exact intersection sizes.
    *
    * The 100 TB property: each doc indexes its RAREST tokens, so the
    * hot head of the Zipf curve never enters the join at all — the
    * worst-case per-token fan-out collapses WITHOUT the lossy metric
    * trade of `maxDocFreqRatio` (this path stays exact). Cost: one df
    * aggregation and a per-doc (not global) rank window, both one
    * shuffle; the verify joins full token arrays to the (small)
    * candidate set only.
    */
  def jaccardPairsPrefix(docs: DataFrame, threshold: Double,
                         textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    prefixFilteredPairsOf(docs, threshold, TextOps.distinctTokens(col(textCol)), idCol)

  /** EXACT order-sensitive shingle Jaccard with prefix filtering:
    * byte-identical output to [[shingleJaccardPairs]] (no pruning) —
    * same lemma, applied to the k-gram set. This is the scale path for
    * web dedup: the boilerplate head of the shingle df-distribution
    * never enters the join, with no metric change.
    */
  def shingleJaccardPairsPrefix(docs: DataFrame, threshold: Double, k: Int,
                                textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    prefixFilteredPairsOf(withToks(docs, textCol, idCol), threshold,
      array_distinct(shinglesOfTokens(col("__toks"), k)), idCol)

  /** Prefix-filtered candidates → exact intersection/union verify —
    * the shared tail of both prefix variants.
    */
  private def prefixFilteredPairsOf(docs: DataFrame, threshold: Double,
                                    tokensCol: Column, idCol: String): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold must be in (0,1]: $threshold")
    val cand = prefixCandidatesOf(docs, threshold, tokensCol, idCol)
    val tokSets = docs.select(col(idCol).as("doc_id"), tokensCol.as("toks"))
    cand
      .join(tokSets.as("ta"), col("doc_a") === col("ta.doc_id"))
      .join(tokSets.as("tb"), col("doc_b") === col("tb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("ta.toks"), col("tb.toks"))).cast("double") /
          size(array_union(col("ta.toks"), col("tb.toks")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Benchmark decontamination check (the n-gram overlap test every
    * serious training pipeline runs against its eval suites): for each
    * corpus document, the number of DISTINCT k-gram shingles it shares
    * with ANY benchmark document. Downstream policy filters or flags
    * rows with `shared_kgrams` above a tolerance.
    *
    * Scale shape: eval suites are MBs against a 100 TB corpus, so the
    * benchmark's distinct-gram set is broadcast and the check is a
    * map-side semi-join on the corpus scan — no corpus shuffle beyond
    * the per-doc count, which partial-aggregates. Docs sharing nothing
    * are absent from the output (it's a flag list, not a corpus map).
    */
  def contaminationCheck(docs: DataFrame, benchmark: DataFrame, k: Int,
                         textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val grams = array_distinct(shinglesOfTokens(col("__toks"), k))
    val benchGrams = withToks(benchmark, textCol, idCol)
      .select(explode(grams).as("t")).distinct()
    withToks(docs, textCol, idCol)
      .select(col(idCol).as("doc_id"), explode(grams).as("t"))
      .join(broadcast(benchGrams), Seq("t"))
      .groupBy("doc_id").agg(count(lit(1)).as("shared_kgrams"))
  }

  // ---- winnowing document fingerprints -------------------------------------

  /** Winnowing fingerprints (Schleimer, Wilkerson, Aiken: "Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD 2003 — the
    * MOSS algorithm): hash every character k-gram of the normalized
    * text, slide a window of w consecutive hashes, select each window's
    * MINIMUM — the classic rolling-hash fingerprinting robustness
    * guarantee: any substring two documents share of length ≥ k+w-1
    * contributes at least one COMMON selected fingerprint, while the
    * selected density stays ≈ 2/(w+1) of all grams. Output is one
    * (doc_id, fp) row per distinct selected fingerprint.
    *
    * The k-gram hash defaults to md5 over char k-grams (portable — the
    * DuckDB oracle selects the identical fingerprints) with selection as
    * an interpreted Column program; `fastHash = true` switches to the
    * codegen'd [[graft.functions.WinnowSig]] kernel — a Rabin-Karp
    * ROLLING hash over byte k-grams with in-loop window minima. The
    * guarantee is hash-agnostic (any injective map under any FIXED total
    * order selects a common fingerprint from a shared run ≥ k+w-1), and
    * the interpreted per-gram lambdas are the measured hot cost at
    * sf0.1 — so fast is the production mode and md5 the oracle mode,
    * the same split as the *_exactmode ANN rows. Docs shorter than k
    * normalized chars have no grams and are absent; docs with fewer
    * than w hashes winnow a single whole-run window. Map-side only.
    */
  def winnowFingerprints(docs: DataFrame, k: Int = 5, w: Int = 4,
                         textCol: String = "text", idCol: String = "doc_id",
                         fastHash: Boolean = false): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be positive: k=$k w=$w")
    // per-gram hashing below is per-row-HEAVY over a narrow frame: fan a
    // sub-split scan out by the downstream grouping key (doc_id) so the
    // md5/winnow work parallelizes and the caller's groupBy(doc_id)
    // reuses this exchange (Parallelize.fanOut is a no-op on wide scans)
    val d = graft.runtime.Parallelize.fanOut(
      docs.select(col(idCol).as("doc_id"),
          TextOps.normalizeWs(col(textCol)).as("__t"))
        .filter(length(col("__t")) >= k), col("doc_id"))
    if (fastHash) {
      graft.functions.VectorFunctions.register(docs.sparkSession)
      return d.select(col("doc_id"), explode(array_distinct(
          graft.functions.VectorFunctions.winnowSig(col("__t"), k, w))).as("__s"))
        .select(col("doc_id"), col("__s").cast("string").as("fp"))
    }
    val gd = d.select(col("doc_id"),
      transform(sequence(lit(1), length(col("__t")) - (k - 1)),
        i => md5(col("__t").substr(i, lit(k)))).as("__h"))
    val sel = when(size(col("__h")) <= w, array(array_min(col("__h"))))
      .otherwise(transform(sequence(lit(1), size(col("__h")) - (w - 1)),
        i => array_min(slice(col("__h"), i, lit(w)))))
    gd.select(col("doc_id"), explode(array_distinct(sel)).as("fp"))
  }

  /** Near-dup candidate pairs by winnowing-fingerprint overlap: docs
    * sharing at least `minShared` selected fingerprints. The fourth
    * dedup family — unlike MinHash/SimHash this one is fully
    * oracle-portable (md5 fingerprints), and unlike full-text Jaccard
    * the index holds only the winnowed ≈ 2/(w+1) fraction of grams.
    * Same inverted-index shuffle shape as [[jaccardPairs]];
    * `maxDocFreqRatio` prunes corpus-wide boilerplate fingerprints
    * before the self-join with the same floor(ratio·N) bound.
    */
  def winnowNearDupPairs(docs: DataFrame, minShared: Int = 5, k: Int = 5, w: Int = 4,
                         textCol: String = "text", idCol: String = "doc_id",
                         maxDocFreqRatio: Option[Double] = None,
                         fastHash: Boolean = false): DataFrame = {
    val fps = winnowFingerprints(docs, k, w, textCol, idCol, fastHash)
      .withColumnRenamed("fp", "t")
    val idx = maxDocFreqRatio match {
      case None => fps
      case Some(r) =>
        require(r > 0 && r <= 1, s"maxDocFreqRatio must be in (0,1]: $r")
        pruneHotTokens(fps, math.floor(r * docs.count()).toLong)
    }
    idx.as("a").join(idx.as("b"),
        col("a.t") === col("b.t") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }

  // ---- MinHash + LSH -------------------------------------------------------

  /** Prime modulus for the universal-hash family (fits min-hash values in
    * 31 bits so a*h+b stays well inside Long).
    */
  private val P = 2038074743L

  /** Token k-shingles as strings; documents shorter than k tokens yield
    * their whole token run as a single shingle.
    *
    * PERF NOTE: the lambda body re-evaluates its captured `toks`
    * subtree per element (subexpression elimination does not reach into
    * HigherOrderFunction lambdas), so passing the raw split here costs
    * O(len²) regex work per doc. DataFrame-level callers should project
    * the tokens into a column first and use [[shinglesOfTokens]] — the
    * attribute reference is free. This text-column form remains for
    * one-shot Column contexts.
    */
  def shingles(textCol: Column, k: Int): Column =
    shinglesOfTokens(TextOps.tokens(textCol), k)

  /** [[shingles]] over a PRE-PROJECTED token-array column. */
  def shinglesOfTokens(toks: Column, k: Int): Column = {
    if (k == 1) toks
    else when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        j => concat_ws(" ", slice(toks, j, lit(k)))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** (idCol, __toks) projection: tokenize once per row so downstream
    * shingle lambdas reference a cheap attribute (see [[shingles]]).
    */
  private def withToks(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))

  /** MinHash signature (array<long> of length numHashes) over a shingle
    * array, via the universal family h_i(x) = (2i+1)·x + i·c mod P on
    * xxhash64'd shingles. One codegen'd pass (graft.functions.MinHashSig)
    * — the nested-transform Column form pays numHashes interpreted
    * passes per row. Map-side only.
    */
  def minHashSignature(shingleCol: Column, numHashes: Int): Column =
    graft.functions.VectorFunctions.minHashSig(
      transform(shingleCol, s => xxhash64(s)), numHashes)

  /** LSH banding: (doc_id, band, band_key) rows; docs agreeing on any
    * band's key are candidate pairs. bands*rows must equal the signature
    * length.
    */
  def lshBands(docs: DataFrame, sigCol: String, bands: Int, rows: Int,
               idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
          xxhash64(concat_ws(",",
            transform(slice(col(sigCol), b * rows + 1, lit(rows)), x => x.cast("string")))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")

  /** Near-duplicate pairs by MinHash+LSH, verified with exact Jaccard ≥
    * threshold over the SAME k-shingle sets the signatures hash (so
    * precision is 1.0 relative to jaccardPairs on that metric; recall is
    * the LSH probability curve 1-(1-s^rows)^bands — 0.999 at s=0.9 with
    * 8×4). shingleK=1 compares token sets (order-insensitive, matches
    * jaccardPairs); shingleK≥2 compares k-gram sets (order-sensitive,
    * the usual web-dedup setting).
    */
  /** (doc_id, toks, sig) MinHash signature frame — the map-only head of
    * the LSH pipeline, shared by [[minHashNearDupPairs]] and the
    * incremental-ingest near-dup path (IngestOps). Docs whose shingle
    * set is empty are excluded (no dedup signal; see the NaN note in
    * [[minHashNearDupPairs]]). `hot` is a pinned stopword-shingle list
    * removed BEFORE hashing (array_except literal), so hot shingles can
    * neither flood LSH buckets nor inflate the verify's intersection —
    * every frame that will be COMPARED (banded or verified) against
    * another must be built with the same list, or the metric silently
    * shifts between sides.
    */
  private[ext] def minHashSigFrame(docs: DataFrame, numHashes: Int, shingleK: Int,
                                   textCol: String, idCol: String,
                                   hot: Seq[String] = Nil): DataFrame = {
    graft.functions.VectorFunctions.register(docs.sparkSession)
    val d = withToks(docs, textCol, idCol)
    val sh0 = array_distinct(shinglesOfTokens(col("__toks"), shingleK))
    val sh = if (hot.isEmpty) sh0 else array_except(sh0, typedLit(hot))
    // A doc whose EVERY shingle is hot prunes to an empty set: all such
    // docs would share one degenerate signature, collide in every band,
    // and verify at 0/0 = NaN — which Spark orders ABOVE the threshold,
    // reporting unrelated all-stopword docs as near-dups. An empty set
    // carries no dedup signal, so those docs are excluded outright.
    d.select(col(idCol).as("doc_id"), sh.as("toks"),
        minHashSignature(sh, numHashes).as("sig"))
      .filter(size(col("toks")) > 0)
  }

  /** Shingles whose document frequency exceeds `ratio · |docs|`,
    * collected to the driver — safe by construction: tokens with df >
    * r·N number fewer than (total postings)/(r·N) = avgDocLen/r, a
    * bound independent of corpus size.
    */
  private[ext] def hotShinglesOf(docs: DataFrame, ratio: Double, shingleK: Int,
                                 textCol: String, idCol: String): Seq[String] = {
    require(ratio > 0 && ratio <= 1, s"maxDocFreqRatio must be in (0,1]: $ratio")
    val d = withToks(docs, textCol, idCol)
    val sh0 = array_distinct(shinglesOfTokens(col("__toks"), shingleK))
    val maxDf = math.floor(ratio * d.count()).toLong
    d.select(explode(sh0).as("t"))
      .groupBy("t").agg(count(lit(1)).as("df")).filter(col("df") > maxDf)
      .select("t").collect().map(_.getString(0)).toSeq
  }

  /** LSH candidate pairs + exact-Jaccard verify over a signature frame —
    * the shared tail of [[minHashNearDupPairs]] and the within-batch leg
    * of the incremental ingest (IngestOps).
    */
  private[ext] def pairsOfSigFrame(sigs: DataFrame, bands: Int, rows: Int,
                                   threshold: Double): DataFrame = {
    val bandsDf = lshBands(sigs, "sig", bands, rows)
    val cand = bandsDf.as("x").join(bandsDf.as("y"),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val toks = sigs.select(col("doc_id"), col("toks"))
    cand
      .join(toks.as("ta"), col("doc_a") === col("ta.doc_id"))
      .join(toks.as("tb"), col("doc_b") === col("tb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("ta.toks"), col("tb.toks"))).cast("double") /
          size(array_union(col("ta.toks"), col("tb.toks")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  def minHashNearDupPairs(docs: DataFrame, threshold: Double,
                          numHashes: Int = 32, bands: Int = 8, shingleK: Int = 1,
                          textCol: String = "text", idCol: String = "doc_id",
                          maxDocFreqRatio: Option[Double] = None): DataFrame = {
    val rows = numHashes / bands
    // Document-frequency pruning for the signature path: hot shingles are
    // removed BEFORE hashing (see minHashSigFrame's contract note).
    val hot = maxDocFreqRatio
      .map(r => hotShinglesOf(docs, r, shingleK, textCol, idCol)).getOrElse(Nil)
    pairsOfSigFrame(
      minHashSigFrame(docs, numHashes, shingleK, textCol, idCol, hot),
      bands, rows, threshold)
  }

  // ---- SimHash -------------------------------------------------------------

  /** 64-bit SimHash over a token-hash array: bit j of the result is set
    * iff the majority of token hashes have bit j set. Implemented as a
    * Scala UDF (a 64×|tokens| expression tree defeats codegen; the UDF
    * is a tight primitive loop).
    */
  val simhash64 = udf { hashes: Seq[Long] =>
    val acc = new Array[Int](64)
    hashes.foreach { h =>
      var j = 0
      while (j < 64) { if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1; j += 1 }
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (acc(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** Per-doc SimHash signature column. */
  def simHash(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      simhash64(transform(TextOps.distinctTokens(col(textCol)), t => xxhash64(t))).as("sig"))

  /** EXHAUSTIVE SimHash pairs: all (a < b) with hamming ≤ maxDist, no
    * chunk-candidate stage — the O(n²) baseline [[simHashNearDupPairs]]
    * is measured against (RecallOps; the pigeonhole argument says the
    * chunked path's recall is exactly 1.0 for maxDist ≤ 3, and the
    * registered recall row keeps that claim measured, not assumed).
    */
  def simHashNearDupPairsExhaustive(docs: DataFrame, maxDist: Int = 3,
                                    textCol: String = "text",
                                    idCol: String = "doc_id"): DataFrame = {
    val sigs = simHash(docs, textCol, idCol)
    sigs.as("x").join(sigs.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  /** Edit-distance near-dup pairs via length-band blocking: documents
    * block on (lang, n_chars div blockChars); candidate pairs form ONLY
    * within a block (an equi-join, never a theta/cartesian), then each
    * candidate is verified with Spark's THRESHOLD Levenshtein kernel —
    * `levenshtein(a, b, maxDist)` early-exits the DP band at O(len·k)
    * and returns -1 past the bound, so a blatantly-different pair costs
    * k band cells, not len² — the verify stage a blocking dedup needs at
    * corpus scale (candidate count is Σ|block|², bounded by the blocking
    * key's selectivity; per-pair cost bounded by the threshold).
    *
    * Recall contract (documented, spec-pinned): a true near-dup pair
    * whose lengths straddle a block boundary is MISSED — single-key
    * blocking trades that edge for the equi-join shape. The repo's other
    * dedup families (MinHash/SimHash/winnow/Jaccard) are length-band
    * agnostic and cover the straddle; this op is the cheap high-precision
    * verifier, not the recall path.
    */
  def editDistancePairs(docs: DataFrame, maxDist: Int, blockChars: Int = 32,
                        textCol: String = "text", langCol: String = "lang",
                        idCol: String = "doc_id"): DataFrame = {
    val d = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(textCol).as("__t"), col(langCol).as("__lang"),
        floor(length(col(textCol)) / blockChars).as("__blk"))
    // PERF, two measured fixes (44 s → ~1 s at sf0.1):
    //  1. Catalyst pushes the dist filter INTO the join condition, so the
    //     verify kernel runs inside the join stage — whose parallelism is
    //     the (tiny, single-file) doc scan's, not the Σ|block|² pair
    //     fan-out's. An EXPLICIT-numPartitions repartition of the probe
    //     side (exempt from AQE coalescing — AQE sizes stages by bytes
    //     and would collapse this compute-dense stage to one task)
    //     spreads the verify across the session's shuffle parallelism.
    //  2. The built-in thresholded levenshtein re-steps UTF-8 bytes
    //     inside the DP (~1.2 ms per ~300-char pair, band no faster than
    //     full); the codegen'd LevKernel band over a decoded codepoint
    //     array is ~40× cheaper with identical semantics (parity
    //     spec-gated incl. non-ASCII).
    graft.functions.VectorFunctions.register(docs.sparkSession)
    val n = docs.sparkSession.sessionState.conf.numShufflePartitions
    d.repartition(n, col("doc_id")).as("a").join(d.as("b"),
        col("a.__lang") === col("b.__lang") && col("a.__blk") === col("b.__blk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        graft.functions.VectorFunctions.levBand(col("a.__t"), col("b.__t"), maxDist)
          .cast("long").as("dist"))
      .filter(col("dist") =!= -1L)
  }

  /** Near-dup pairs with hamming(sig_a, sig_b) ≤ maxDist (≤ 3): any such
    * pair shares at least one of four 16-bit chunks (pigeonhole), so
    * candidates come from 4 equality joins, then exact hamming verify.
    */
  def simHashNearDupPairs(docs: DataFrame, maxDist: Int = 3,
                          textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    hammingNearDupPairsFromSigs(simHash(docs, textCol, idCol), maxDist, bands = 4)

  /** The banded hamming search itself, generalized over ANY 64-bit
    * signature frame — SimHash above and the perceptual image hash
    * ([[graft.ext.MultimodalOps.perceptualHash]]) share this one shape.
    * The signature splits into `bands` disjoint (64/bands)-bit chunks;
    * two signatures within hamming `maxDist` differ in at most maxDist
    * chunks, so with maxDist ≤ bands−1 they MUST agree on one
    * (pigeonhole — recall 1.0 by construction, enforced here). Chunk
    * agreement is an equi-join on (chunk index, chunk value) — never an
    * all-pairs comparison — then candidates verify with exact
    * `bit_count(xor)`. At 100 TB the chunk join shuffles 8-byte keys ∝
    * corpus·bands; the quadratic term is confined to true hash-bucket
    * collisions, the same contract as MinHash-LSH banding.
    *
    * NULL signatures (e.g. undecodable images) are excluded from pair
    * generation — a row that cannot be hashed can neither witness nor
    * be dropped.
    */
  def hammingNearDupPairsFromSigs(sigs: DataFrame, maxDist: Int, bands: Int,
                                  idCol: String = "doc_id",
                                  sigCol: String = "sig"): DataFrame = {
    require(bands > 0 && 64 % bands == 0, s"bands must divide 64, got $bands")
    require(maxDist <= bands - 1,
      s"$bands-chunk pigeonhole only guarantees recall for maxDist <= ${bands - 1}")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1L
    val s = sigs.filter(col(sigCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(sigCol).as("sig"))
    val chunks = s.select(col("doc_id"), col("sig"),
        posexplode(array((0 until bands).map(i =>
          shiftrightunsigned(col("sig"), i * width).bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_key")
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.chunk_key") === col("y.chunk_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** [[hammingNearDupPairsFromSigs]] lifted to MULTI-FRAME signatures
    * (`sigCol: array<bigint>` — one 64-bit perceptual hash per sampled
    * frame, in sample order; [[graft.ext.MultimodalOps.videoFrameHashes]]
    * produces them). Pair semantics: two docs match when their
    * signatures have the SAME length and EVERY aligned frame pair is
    * within hamming `maxDist` — re-encodes of one animation align
    * exactly (same container frame count ⇒ same sampled indices), while
    * videos of different lengths or with any divergent sampled frame
    * never pair. Candidates come from an equi-join on (sample rank,
    * chunk index, chunk value): per rank the single-hash pigeonhole
    * applies unchanged (≤ maxDist differing bits touch ≤ maxDist of the
    * `bands` chunks, so one chunk must agree — recall 1.0 for the
    * all-frames-within-radius criterion, already via rank 0 alone;
    * every rank is banded so a candidate also surfaces when ANY aligned
    * frame matches, keeping the band index useful for weaker
    * composite policies). Verify is exact: max aligned
    * `bit_count(xor)` over the zipped arrays. At 100 TB the shuffle
    * carries (rank, chunk) keys ∝ corpus·n·bands — same contract as
    * the single-hash banding, scaled by the (small, pinned) sample
    * count n, never all-pairs.
    */
  def frameSigNearDupPairs(sigs: DataFrame, maxDist: Int, bands: Int,
                           idCol: String = "doc_id",
                           sigCol: String = "sig"): DataFrame = {
    require(bands > 0 && 64 % bands == 0, s"bands must divide 64, got $bands")
    require(maxDist <= bands - 1,
      s"$bands-chunk pigeonhole only guarantees recall for maxDist <= ${bands - 1}")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1L
    val s = sigs.filter(col(sigCol).isNotNull && size(col(sigCol)) > 0)
      .select(col(idCol).as("doc_id"), col(sigCol).as("sig"))
    val chunks = s
      .select(col("doc_id"), col("sig"), posexplode(col("sig")))
      .withColumnRenamed("pos", "rank").withColumnRenamed("col", "fsig")
      .select(col("doc_id"), col("sig"), col("rank"),
        posexplode(array((0 until bands).map(i =>
          shiftrightunsigned(col("fsig"), i * width).bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_key")
    chunks.as("x").join(chunks.as("y"),
        col("x.rank") === col("y.rank") && col("x.chunk") === col("y.chunk") &&
          col("x.chunk_key") === col("y.chunk_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.sig").as("__sa"), col("y.sig").as("__sb"))
      .distinct()
      .filter(size(col("__sa")) === size(col("__sb")))
      .withColumn("hamming_max", array_max(
        zip_with(col("__sa"), col("__sb"), (a, b) => bit_count(a.bitwiseXOR(b)))))
      .filter(col("hamming_max") <= maxDist)
      .select("doc_a", "doc_b", "hamming_max")
  }

  // ───── duplicated-SPAN family (substring-level dedup; Lee et al. 2022,
  // "Deduplicating Training Data Makes Language Models Better",
  // arXiv:2107.06499) — document-level dedup above misses the long
  // boilerplate span repeated INSIDE otherwise-distinct documents; this
  // family finds and removes those spans, reduced to plain joins instead
  // of the paper's suffix array (which is a single-machine structure —
  // the gram index is the shuffle-native equivalent at n-gram
  // granularity).

  /** Positional n-gram instances: one row per gram OCCURRENCE —
    * (doc_id, i, g) with 0-based start index `i` and the gram keyed by
    * its 128-bit md5 fingerprint, the repo's exact-dedup convention
    * ([[exactDupGroups]]): the corpus-wide count shuffles fixed-width
    * keys, never n-token strings. NO array_distinct — self-repetition
    * inside one doc is precisely what the span pass must see. Docs
    * shorter than n tokens emit nothing.
    */
  private def gramInstancesOf(docs: DataFrame, n: Int,
                              textCol: String, idCol: String): DataFrame = {
    require(n >= 1, s"gram size must be >= 1, got $n")
    // tokenize in a SEPARATE projection so the regex split runs once per
    // document — inlined, the `toks` subtree is re-evaluated inside the
    // per-gram lambda (subexpression elimination does not reach into
    // HigherOrderFunction lambda bodies), turning an O(len) split into
    // O(len²) work per doc
    val toks = col("__toks")
    // per-gram md5 is the dominant cost (compute-bound, not byte-bound):
    // repair scan parallelism on the narrow (id, tokens) frame before the
    // heavy projection (guide §2.5; no-op on wide scans)
    graft.runtime.Parallelize.fanOut(
        docs.select(col(idCol).as("doc_id"),
          TextOps.tokens(col(textCol)).as("__toks")),
        col("doc_id"))
      .select(col("doc_id"),
        posexplode(when(size(toks) >= n,
            transform(sequence(lit(0), size(toks) - n),
              j => md5(concat_ws(" ", slice(toks, j + 1, lit(n))))))
          .otherwise(array().cast("array<string>"))))
      .withColumnRenamed("pos", "i").withColumnRenamed("col", "g")
  }

  /** Per-document duplicated-span statistics: `n_grams` positional
    * n-gram instances, of which `dup_grams` occur more than once
    * CORPUS-WIDE (a second copy in another doc, or in the same doc —
    * self-repetition counts, matching what the scrub removes). The
    * instances-over-threshold ratio is the curation signal the span
    * paper thresholds on. Integer-exact output; docs with < n tokens
    * are absent (they have no spans).
    *
    * Scale: instances collapse to (gram, doc) counts first (one shuffle
    * on the md5 key — bounded by doc length, never pairwise), the
    * corpus-wide total rides a window over the gram key (second
    * shuffle), and the rollup is one more on doc_id. A boilerplate gram
    * repeated corpus-wide fans IN to one count row — no posting-list
    * self-join anywhere, so there is no quadratic hot-key failure mode
    * to prune (contrast [[jaccardPairs]]).
    */
  def dupSpanStats(docs: DataFrame, n: Int = 5, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val perDocGram = gramInstancesOf(docs, n, textCol, idCol)
      .groupBy("g", "doc_id").agg(count(lit(1)).as("m"))
    perDocGram
      .withColumn("tot", sum(col("m")).over(Window.partitionBy("g")))
      .groupBy("doc_id")
      .agg(sum(col("m")).as("n_grams"),
        sum(when(col("tot") > 1, col("m")).otherwise(0L)).as("dup_grams"))
  }

  /** Remove duplicated spans from the corpus (the Lee et al. scrub):
    * every token position covered by ANY n-gram instance that occurs
    * more than once corpus-wide is dropped; the survivors are rejoined
    * in order. Output (doc_id, clean_text) keeps EVERY input doc —
    * fully-boilerplate docs come back as the empty string (the
    * downstream length filter's job to drop), and docs shorter than n
    * tokens pass through whitespace-normalized but uncut. Overlapping
    * dup spans coalesce via the DISTINCT covered-position set.
    *
    * Scale: dup instances come from a count-window over the gram key
    * (fan-in, as [[dupSpanStats]]); covered positions explode to at
    * most n rows per dup instance and dedup on (doc, position); the
    * rebuild is an anti-join on (doc, position) — the same key both
    * sides just shuffled on — plus one collect_list per doc, bounded by
    * doc length. Nothing pairwise, nothing driver-side.
    */
  def scrubDupSpans(docs: DataFrame, n: Int = 5, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val dupInst = gramInstancesOf(docs, n, textCol, idCol)
      .withColumn("tot", count(lit(1)).over(Window.partitionBy("g")))
      .filter(col("tot") > 1)
    val covered = dupInst
      .select(col("doc_id"), explode(sequence(col("i"), col("i") + (n - 1))).as("p"))
      .distinct()
    val pos = docs.select(col(idCol).as("doc_id"),
        posexplode(TextOps.tokens(col(textCol))))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "w")
    val rebuilt = pos.join(covered, Seq("doc_id", "p"), "left_anti")
      .groupBy("doc_id")
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("p"), col("w")))),
          s => s.getField("w"))).as("clean_text"))
    docs.select(col(idCol).as("doc_id"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
