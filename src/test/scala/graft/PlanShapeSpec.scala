package graft

/** Physical-plan regression gates for the scale properties the engine
  * depends on (SURVEY §4): predicate pushdown and column pruning reaching
  * the parquet scan, map-side partial aggregation ahead of the single
  * shuffle, and dimension joins staying broadcast (never sort-merge or
  * cartesian). Complements the IVF no-reshuffle assertion in ExtOpsSpec
  * and the no-global-sort assertion in ScaleProfileSpec — a future edit
  * that silently degrades one of these shapes fails here, not in a
  * benchmark diff two rounds later.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("pricing summary: date filter pushed to the scan, columns pruned") {
    val p = plan("q_rel_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"shipdate predicate not pushed to parquet:\n$p")
    assert(!p.contains("l_orderkey") && !p.contains("l_comment"),
      s"scan reads columns the query never uses:\n$p")
    assert(p.contains("partial_sum"), s"no map-side partial aggregation:\n$p")
  }

  test("exact dedup: one shuffle, partial agg before it, two-column scan") {
    val p = plan("q_ext_exact_dedup")
    assert("Exchange".r.findAllIn(p).size == 1, s"expected exactly one shuffle:\n$p")
    assert(p.contains("partial_min"), s"no map-side partial aggregation:\n$p")
    assert(!p.contains("lang") && !p.contains("embedding"),
      s"scan reads columns beyond (doc_id, text):\n$p")
  }

  test("daily model: spend join broadcast, never sort-merge or cartesian") {
    val p = plan("q_model_daily")
    assert(p.contains("BroadcastHashJoin"), s"spend join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"scale-hostile join strategy appeared:\n$p")
  }

  test("pruned jaccard: hot-token prune is a broadcast anti-join, never a shuffled one") {
    val p = plan("q_ext_jaccard_pairs_pruned")
    // the heavy-hitter set is tiny by definition — if this regresses to a
    // SortMergeJoin LeftAnti, the prune itself shuffles the full index
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"hot-token prune not a broadcast anti-join:\n$p")
    // plan lines read "SortMergeJoin [keys], [keys], LeftAnti" — match
    // across the key lists, not the adjacent-words form (never occurs)
    assert("SortMergeJoin[^\\n]*LeftAnti".r.findFirstIn(p).isEmpty,
      s"prune shuffles the token index:\n$p")
  }

  test("corpus stats: two-column scan feeding a partial-aggregated rollup") {
    val p = plan("q_ext_corpus_stats")
    assert(!p.contains("doc_id") && !p.contains("source"),
      s"scan reads columns beyond (lang, text):\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"no map-side partial aggregation:\n$p")
  }

  test("contamination: benchmark gram set broadcasts, corpus side never sort-merges") {
    val p = plan("q_ext_contamination")
    // the eval suite is MBs against the corpus — a SortMergeJoin here
    // would shuffle every corpus shingle by gram
    assert(p.contains("BroadcastHashJoin"), s"benchmark grams not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus shingles shuffled for the semi-join:\n$p")
    assert(p.contains("partial_count"), s"per-doc count not partial-aggregated:\n$p")
  }

  test("stratified sample: pure map-side filter, zero shuffles") {
    val p = plan("q_ext_sample_stratified")
    assert(!p.contains("Exchange"), s"a content-hash filter must not shuffle:\n$p")
    assert(!p.contains("embedding") && !p.contains("source"),
      s"scan reads columns beyond (doc_id, lang, text):\n$p")
  }

  test("repetition signals: both aggs partial, shuffle carries type counts not tokens") {
    val p = plan("q_ext_quality_repetition")
    assert(p.contains("partial_count"), s"token-type count not partial-aggregated:\n$p")
    // (doc_id, token) grouping then doc_id grouping: the second agg's
    // input is already one row per (doc, type) — ≤ 2 exchanges total
    assert("Exchange".r.findAllIn(p).size <= 2, s"extra shuffles appeared:\n$p")
  }

  test("span stats: fan-in counts only — no pairwise join anywhere") {
    val p = plan("q_ext_dup_span_stats")
    // the whole point vs the Jaccard family: a hot gram must collapse
    // into a count, never expand into a posting-list self-join
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
      !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"span stats must be join-free (agg + window only):\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"gram counts not partial-aggregated before the shuffle:\n$p")
    assert(!p.contains("lang") && !p.contains("source"),
      s"scan reads columns beyond (doc_id, text):\n$p")
  }

  test("span scrub: covered positions anti-join; no pairwise or nested-loop join") {
    val p = plan("q_ext_scrub_dup_spans")
    assert(p.contains("LeftAnti"), s"position rebuild lost its anti-join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"scale-hostile join strategy appeared:\n$p")
  }

  test("top terms: df side fans in and broadcasts; tf partial-aggregated") {
    val p = plan("q_ext_top_terms")
    // the df frame is (term, count) — vocabulary-sized, compact — and
    // must BROADCAST to the tf side; a SortMergeJoin here would shuffle
    // every (doc, term) row by term, putting a hot term's whole posting
    // list through one task's sort. (The tf subtree appears under both
    // branches in the initial plan; AQE's exchange reuse collapses the
    // duplicate at runtime, so scan count is not asserted.)
    assert(p.contains("BroadcastHashJoin"), s"df join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"tf shuffled by term for the df join:\n$p")
    assert(p.contains("partial_count"), s"tf not partial-aggregated:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"scale-hostile join strategy appeared:\n$p")
  }

  test("ingest dedup: the existing corpus is scanned, never repartitioned") {
    val p = plan("q_ext_ingest_dedup")
    // the whole point of the bloom routing: every join in the plan
    // broadcasts the small side — a SortMergeJoin would shuffle the
    // existing fingerprints per ingest
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"existing corpus repartitioned for the ingest join:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"verify join not broadcast:\n$p")
  }

  test("near-dup ingest composition: candidate and verify joins broadcast, no blowup joins") {
    // plan the PRODUCTION composition directly: the registered row now
    // wraps it in StructGate.ingestNearDupGate, whose 1-row flag
    // aggregates legitimately combine via single-row nested-loop cross
    // joins that the blowup assertions below would misread
    val docs = graft.runtime.Sources(spark, "/root/testdata/sf0.001").documents
      .filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0)
    val p = graft.ext.IngestOps.appendDedupNearDup(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 20 === 0),
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 20 =!= 0),
        threshold = 0.9)
      .queryExecution.executedPlan.toString
    // the corpus-side band stream meets the batch's band keys via
    // broadcast; the drop set applies as a broadcast anti-join. The
    // within-BATCH lsh self-join may legitimately shuffle (batch-sized);
    // what must never appear is a cartesian/nested-loop pair expansion.
    assert(p.contains("BroadcastHashJoin"), s"ingest candidate joins not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"scale-hostile join strategy appeared:\n$p")
  }

  test("winnow pairs: overlap counts partial-aggregated, no pair blowup beyond the index join") {
    val p = plan("q_ext_winnow_neardup")
    // the fingerprint index self-join shuffles by fp (the declared
    // inverted-index shape, same as jaccard); the overlap count must
    // partial-aggregate on the map side and nothing may expand pairs
    // via cartesian/nested-loop
    assert(p.contains("partial_count"), s"overlap count not partial-aggregated:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"scale-hostile join strategy appeared:\n$p")
    assert(!p.contains("lang") && !p.contains("source"),
      s"scan reads columns beyond (doc_id, text):\n$p")
  }

  test("LM quality scoring: model table broadcasts, corpus never shuffled by trigram") {
    val p = plan("q_ext_lm_quality")
    // the model is charset³-bounded and must broadcast; a SortMergeJoin
    // here would shuffle every (doc, trigram) instance by trigram —
    // a hot trigram's whole posting through one task's sort
    assert(p.contains("BroadcastHashJoin"), s"model join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled by trigram:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_avg") || p.contains("partial_sum"),
      s"per-doc rollup not partial-aggregated:\n$p")
    assert(!p.contains("lang") && !p.contains("source"),
      s"scan reads columns beyond (doc_id, text):\n$p")
  }

  test("IVF-PQ production row: probes broadcast to the code scan, never sort-merged") {
    val p = plan("q_ext_knn_ivfpq")
    // the probe frame (|Q|·nprobe rows) and the refine shortlist both
    // broadcast; the cid-partitioned code scan and the corpus vector
    // scan must never be hash-repartitioned for a join
    assert("Exchange hashpartitioning\\([^\\n]*(corpus_id|vec_id)".r.findFirstIn(p).isEmpty,
      s"corpus hash-repartitioned for an IVF-PQ join:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"scale-hostile join strategy appeared:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"probe/refine joins not broadcast:\n$p")
  }

  test("PQ production row: corpus-side scan feeds ADC via broadcast, never shuffled") {
    val p = plan("q_ext_knn_pq")
    // the query side broadcasts to the code scan (ADC) and the refine
    // join's shortlist side is |Q|·shortlist rows — the corpus may be
    // scanned for codes and for the shortlist's exact vectors, but must
    // never be hash-repartitioned for a join: the only corpus-keyed
    // exchanges allowed are the top-k windows' query_id partitionings
    assert("Exchange hashpartitioning\\([^\\n]*(corpus_id|vec_id)".r.findFirstIn(p).isEmpty,
      s"corpus hash-repartitioned for a PQ join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"PQ refine sort-merges the corpus:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"refine join not broadcast:\n$p")
  }

  test("as-of join: union carry-forward — no join operator, one shuffle") {
    val p = plan("q_ext_asof_attrib")
    // the whole point of the union-tag shape: point-in-time matching
    // WITHOUT a range join — a regression to any join operator means the
    // |left|×|right-per-key| candidate explosion is back
    assert(!p.contains("Join"), s"as-of regressed to a join operator:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly one hash shuffle (user key):\n$p")
  }

  test("interval join: bucketed equi-join — never nested-loop or cartesian") {
    val p = plan("q_ext_interval_join")
    // a BETWEEN theta-join plans as BroadcastNestedLoopJoin (or worse);
    // the bucket key must turn it into a plain equi-join with the
    // containment as a residual within-bucket filter
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"interval join regressed to a scan-by-scan candidate sweep:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"no equi-join on the bucket key found:\n$p")
  }

  test("heavy hitters: sketch partials merge map-side, candidates broadcast") {
    val p = plan("q_ext_heavy_hitters")
    // the whole point of a mergeable sketch: a partial MG per partition,
    // merged at the final ObjectHashAggregate — losing the partial means
    // every raw token rides the shuffle
    assert(p.contains("partial_misragries"),
      s"MG sketch lost its map-side partial:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"candidate re-count join not broadcast (candidates are <= k rows):\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"token scan shuffled for the candidate join:\n$p")
  }

  test("date spine: calendar side broadcasts; daily rollup partial-aggs") {
    val p = plan("q_ext_date_spine")
    // the user x days cross join must ride the broadcast calendar frame
    // (bounded by construction), never a real cartesian shuffle
    assert(p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"spine cross join regressed to a cartesian:\n$p")
    assert(p.contains("partial_count"),
      s"daily rollup lost map-side partial aggregation:\n$p")
  }

  test("edit-distance pairs: blocked equi-join — never cartesian or nested-loop") {
    val p = plan("q_ext_edit_distance")
    // the blocking key must carry the join; the doc_id < and the
    // threshold levenshtein are residual filters on an equi-join
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"blocked pair join regressed to a pair blowup:\n$p")
    assert(!p.contains("source") && !p.contains("n_chars"),
      s"scan reads columns the blocker never uses:\n$p")
  }

  test("sketch rollup: HLL partials merge map-side on both levels") {
    val p = plan("q_a9_sketch_rollup")
    // both the daily sketch build and the union rollup must show partial
    // (ObjectHashAggregate) stages — a sketch that only aggregates final
    // would ship raw user ids through the shuffle
    assert(p.contains("partial_hll_sketch_agg"),
      s"daily sketch stage lost map-side partials:\n$p")
    assert(p.contains("partial_hll_union_agg"),
      s"rollup union stage lost map-side partials:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"exact-vs-estimate gate join should broadcast (5 rows each):\n$p")
  }

  test("subqueries decorrelate: EXISTS/NOT EXISTS become semi/anti joins, never per-row plans") {
    // a correlated subquery that survives to execution re-runs its inner
    // plan per outer row — the 100 TB failure mode Catalyst's
    // RewritePredicateSubquery exists to prevent; these gates pin the
    // rewrite happening at all
    val ex = plan("q_sub_exists")
    assert(ex.contains("LeftSemi"), s"EXISTS did not become a semi join:\n$ex")
    val nex = plan("q_sub_not_exists")
    assert(nex.contains("LeftAnti"), s"NOT EXISTS did not become an anti join:\n$nex")
    // NOT IN must keep three-valued-logic semantics via the null-aware
    // anti join form, not a plain anti join
    val nin = plan("q_sub_not_in")
    assert(nin.contains("LeftAnti"), s"NOT IN did not become an anti join:\n$nin")
  }

  test("correlated scalar subquery decorrelates to one per-key aggregate, joined back") {
    val p = plan("q_sub_scalar_corr")
    // the inner avg must run ONCE as a grouped aggregate over lineitem
    // (partial+final over l_partkey), then join — not re-scan per row
    assert(p.contains("partial_avg"), s"inner avg not a grouped partial aggregate:\n$p")
    assert(!p.toLowerCase.contains("scalarsubquery"),
      s"scalar subquery survived to the physical plan (per-row re-eval):\n$p")
  }

  test("lateral top-k per region: decorrelated window/limit, never a nested-loop re-scan") {
    val p = plan("q_sub_lateral")
    assert(!p.contains("CartesianProduct"),
      s"lateral regressed to a cartesian re-scan:\n$p")
  }

  test("corpus drift: three-column scans, vocabulary join partial-aggregated") {
    val p = plan("q_ext_corpus_drift")
    // the instrument reads (doc_id for the halves split, lang, text) and
    // nothing else; token counting partial-aggregates before any shuffle
    assert(!p.contains("embedding") && !p.contains("source") && !p.contains("n_chars"),
      s"drift scan reads columns the metrics never use:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"token counting lost map-side partials:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"vocabulary join regressed to a cross product:\n$p")
  }

  test("weighted sample: filter-only plan, no shuffle, no extra columns") {
    val p = plan("q_ext_sample_weighted")
    assert(!"Exchange".r.findAllIn(p).exists(_ => true),
      s"a pure per-row filter should not shuffle:\n$p")
    assert(!p.contains("embedding") && !p.contains("n_chars"),
      s"scan reads columns the sampler never uses:\n$p")
  }

  test("multi-distinct aggregates plan through one Expand, partial-aggregated") {
    val p = plan("q_a12_filter_distinct")
    // three distinct columns → Expand fans each row once per distinct
    // group; losing it would mean N separate scans or a wrong plan
    assert(p.contains("Expand"), s"multi-distinct lost its Expand:\n$p")
    assert(p.contains("partial_"), s"no map-side partials under the distinct expand:\n$p")
  }

  test("topKPerKey: bounded buffers merge map-side, no per-group window sort") {
    val p = plan("q_w5_topk_agg")
    // the point of the aggregator form: ObjectHashAggregate partials ship
    // <= k candidates per key per partition; a Window node would mean the
    // full per-group sort came back
    assert(p.contains("ObjectHashAggregate") && p.contains("partial_topk"),
      s"top-k lost its map-side partial aggregation:\n$p")
    assert(!p.contains("Window"), s"top-k regressed to the window sort:\n$p")
  }

  test("sessionize: both windows share one user-key sort; rollup partial-aggs") {
    val p = plan("q_ext_sessionize")
    // lag() and the running sum() use identical partitioning+ordering —
    // a second Sort means the windows stopped sharing their exchange
    assert("\\bSort \\[".r.findAllIn(p).size == 1,
      s"session windows no longer share one sort:\n$p")
    assert(p.contains("partial_min") || p.contains("partial_count"),
      s"session rollup lost map-side partial aggregation:\n$p")
    assert(!p.contains("props") && !p.contains("value"),
      s"scan reads columns the sessionizer never uses:\n$p")
  }
}
