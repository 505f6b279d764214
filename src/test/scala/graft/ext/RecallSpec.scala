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
