package graft.ext

import graft.SparkSpec
import graft.runtime.Sources
import org.apache.spark.sql.functions._

/** Floors for the measured-recall surface (RecallOps): the numbers the
  * approximate no-oracle contracts promise, pinned on the sf0.001
  * fixture. Since r8 the REGISTERED q_ext_recall_* rows are oracle-gated
  * (metric, recall_floor, meets_floor vs a constant-true DuckDB oracle);
  * this spec pins the TIGHTER measured floors on the raw setRecall
  * numbers, and asserts every registered gate row answers true on the
  * fixture. Planted-twin recall for the ≥0.9 similarity band (which the
  * fixture's flat sim distribution cannot exhibit) stays in ExtOpsSpec.
  */
class RecallSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def docsSub = Sources(spark, dir).documents.filter(col("doc_id") < 2000)
  private def embeddings = Sources(spark, dir).embeddings

  private def one(df: org.apache.spark.sql.DataFrame): (Long, Long, Double) = {
    val r = df.selectExpr("exact_pairs", "found_pairs", "recall")
      .as[(Long, Long, Double)].collect()
    assert(r.length == 1); r.head
  }

  test("minhash near-dup recall on the fixture stays above its spec'd floor") {
    val (e, f, r) = one(RecallOps.setRecall("minhash",
      DedupOps.jaccardPairs(docsSub, 0.9),
      DedupOps.minHashNearDupPairs(docsSub, 0.9), Seq("doc_a", "doc_b")))
    assert(e > 0, "fixture must contain exact near-dup pairs")
    assert(f <= e, s"precision must be 1.0 by construction ($f/$e)")
    assert(r >= 0.95, s"minhash recall $r below 0.95 ($f/$e)")
  }

  test("simhash chunked recall is EXACTLY 1.0 (the pigeonhole guarantee, measured)") {
    val (e, f, r) = one(RecallOps.setRecall("simhash",
      DedupOps.simHashNearDupPairsExhaustive(docsSub, maxDist = 3),
      DedupOps.simHashNearDupPairs(docsSub, maxDist = 3), Seq("doc_a", "doc_b")))
    assert(e > 0, "fixture must contain hamming<=3 pairs")
    assert(r == 1.0, s"maxDist<=3 must share a 16-bit chunk — recall $r ($f/$e)")
  }

  test("ANN probe recall@3 on the near-uniform fixture stays off the floor") {
    // the fixture embeddings are near-uniform — the ADVERSARIAL case for
    // cell/quantization pruning, where true neighbors sit barely above
    // the noise floor (clustered-corpus recall >= 0.8/0.9 is pinned on
    // planted twins in ExtOpsSpec/PqIndexSpec/IvfPqSpec). These floors
    // catch a collapse to ~0, not the easy-case contract; measured at
    // r7: ivf_probe 0.53, pq 0.75, ivfpq 0.42.
    val e = embeddings
    val q = e.filter(col("vec_id") < 20)
    val brute = SimilarityOps.bruteForceTopK(e, q, k = 3)
    val ivf = graft.registry.ExtQueries.ivfIndex(spark, dir)
    val (ie, _, ir) = one(RecallOps.setRecall("ivf", brute,
      ivf.topK(q, k = 3, nprobe = 4), Seq("query_id", "corpus_id")))
    assert(ie == 60 && ir >= 0.3, s"ivf probe recall collapsed: $ir")
    val pq = graft.registry.ExtQueries.pqIndex(spark, dir)
    val (pe, _, pr) = one(RecallOps.setRecall("pq", brute,
      pq.topKRefined(q, e, k = 3, shortlist = 64), Seq("query_id", "corpus_id")))
    assert(pe == 60 && pr >= 0.5, s"pq recall collapsed: $pr")
    val ivfpq = graft.registry.ExtQueries.ivfPqIndex(spark, dir)
    val (qe, _, qr) = one(RecallOps.setRecall("ivfpq", brute,
      ivfpq.topKRefined(q, e, k = 3, nprobe = 4, shortlist = 32),
      Seq("query_id", "corpus_id")))
    assert(qe == 60 && qr >= 0.25, s"ivfpq recall collapsed: $qr")
    val sq = graft.registry.ExtQueries.sqIndex(spark, dir)
    val (se, _, sr) = one(RecallOps.setRecall("sq", brute,
      sq.topKRefined(q, e, k = 3, shortlist = 32), Seq("query_id", "corpus_id")))
    assert(se == 60 && sr >= 0.9, s"sq8 refined recall collapsed: $sr")
  }

  test("sign-LSH cosine recall matches its operating-point curve, not zero") {
    val e = embeddings
    val found = SimilarityOps.lshCosinePairs(e, 0.35)
    val (ep, fp, r) = one(RecallOps.setRecall("lsh",
      SimilarityOps.cosinePairs(e, 0.35), found, Seq("vec_a", "vec_b")))
    assert(ep > 0 && fp > 0, s"LSH found nothing at all ($fp/$ep)")
    // the whole >=0.35 band is dominated by near-threshold pairs the 4x8
    // point trades away; theory gives ~0.08 at sim = 0.35 — pin that it
    // stays on-curve (subset property keeps the ceiling at 1.0)
    assert(r >= 0.04 && r <= 1.0, s"full-band recall off-curve: $r ($fp/$ep)")
    val (e45, f45, _) = one(RecallOps.setRecall("lsh45",
      SimilarityOps.cosinePairs(e, 0.45), found.filter(col("sim") >= 0.45),
      Seq("vec_a", "vec_b")))
    assert(f45 <= e45, s"high-band precision must hold ($f45/$e45)")
  }

  test("every registered recall-gate row answers meets_floor=true on the fixture") {
    for (name <- Seq("q_ext_recall_minhash", "q_ext_recall_simhash",
        "q_ext_recall_knn_lsh", "q_ext_recall_knn_ivf_probe",
        "q_ext_recall_knn_pq", "q_ext_recall_knn_ivfpq", "q_ext_recall_knn_sq",
        "q_ext_recall_knn_hnsw")) {
      val rows = graft.SparkEntry.queries(name)(spark, dir)
        .select("metric", "meets_floor").as[(String, Boolean)].collect()
      assert(rows.nonEmpty && rows.forall(_._2),
        s"$name gate flipped: ${rows.mkString(", ")}")
    }
  }
}
