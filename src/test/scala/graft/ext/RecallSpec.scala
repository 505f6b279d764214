package graft.ext

import graft.SparkSpec

/** Floors for the REGISTERED measured-recall rows (RecallOps): the
  * numbers the approximate no-oracle contracts promise, pinned on the
  * sf0.001 fixture. Planted-twin recall for the ≥0.9 similarity band
  * (which the fixture's flat sim distribution cannot exhibit) stays in
  * ExtOpsSpec.
  */
class RecallSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String): Map[String, (Long, Long, Double)] =
    graft.SparkEntry.queries(name)(spark, dir)
      .selectExpr("metric", "exact_pairs", "found_pairs", "recall")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("minhash near-dup recall on the fixture stays above its spec'd floor") {
    val (e, f, r) = rows("q_ext_recall_minhash")("minhash_lsh_j0.9_32x8")
    assert(e > 0, "fixture must contain exact near-dup pairs")
    assert(f <= e, s"precision must be 1.0 by construction ($f/$e)")
    assert(r >= 0.95, s"minhash recall $r below 0.95 ($f/$e)")
  }

  test("simhash chunked recall is EXACTLY 1.0 (the pigeonhole guarantee, measured)") {
    val (e, f, r) = rows("q_ext_recall_simhash")("simhash_h3_4x16")
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
    val (ie, _, ir) = rows("q_ext_recall_knn_ivf_probe")("ivf_k3_probe4of16")
    assert(ie == 60 && ir >= 0.3, s"ivf probe recall collapsed: $ir")
    val (pe, _, pr) = rows("q_ext_recall_knn_pq")("pq_refine_k3_shortlist64")
    assert(pe == 60 && pr >= 0.5, s"pq recall collapsed: $pr")
    val (qe, _, qr) = rows("q_ext_recall_knn_ivfpq")("ivfpq_k3_probe4of16_shortlist32")
    assert(qe == 60 && qr >= 0.25, s"ivfpq recall collapsed: $qr")
  }

  test("sign-LSH cosine recall matches its operating-point curve, not zero") {
    val m = rows("q_ext_recall_knn_lsh")
    val (e, f, r) = m("sign_lsh_cos0.35_4x8")
    assert(e > 0 && f > 0, s"LSH found nothing at all ($f/$e)")
    // the whole >=0.35 band is dominated by near-threshold pairs the 4x8
    // point trades away; theory gives ~0.08 at sim = 0.35 — pin that it
    // stays on-curve (subset property keeps the ceiling at 1.0)
    assert(r >= 0.04 && r <= 1.0, s"full-band recall off-curve: $r ($f/$e)")
    val (e45, f45, _) = m("sign_lsh_cos0.35_4x8_band0.45")
    assert(f45 <= e45, s"high-band precision must hold ($f45/$e45)")
  }
}
