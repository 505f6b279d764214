package graft.ext

import graft.SparkSpec

/** Hand-computed drift gates: tiny corpora whose entropies and JS
  * divergences have closed forms (the oracle row covers fixture-scale
  * parity).
  */
class DriftOpsSpec extends SparkSpec {
  import spark.implicits._

  test("drift metrics: shared-vocab shift and disjoint-vocab extremes, by hand") {
    // lang x: A tokens {a:2, b:1}, B tokens {a:1, b:2} — mirrored shift:
    //   entropy both = H(2/3) = 0.9183, jaccard 1,
    //   JS = 2/3·log2(4/3) + 1/3·log2(2/3) ≈ 0.0817
    // lang y: A {p:2}, B {q:1} — disjoint: entropies 0, jaccard 0, JS = 1
    val a = Seq((0L, "a a b", "x"), (2L, "p p", "y")).toDF("doc_id", "text", "lang")
    val b = Seq((1L, "a b b", "x"), (3L, "q", "y")).toDF("doc_id", "text", "lang")
    val got = DriftOps.corpusDrift(a, b)
      .select("lang", "docs_a", "docs_b", "vocab_jaccard",
        "entropy_a", "entropy_b", "js_divergence")
      .as[(String, Long, Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val h23 = -(2.0 / 3 * log2(2.0 / 3) + 1.0 / 3 * log2(1.0 / 3))
    val jsX = 2.0 / 3 * log2(4.0 / 3) + 1.0 / 3 * log2(2.0 / 3)
    val (_, da, db, jac, ea, eb, js) = got("x")
    assert(da == 1 && db == 1 && jac == 1.0)
    assert(math.abs(ea - h23) < 1e-12 && math.abs(eb - h23) < 1e-12, s"$ea $eb != $h23")
    assert(math.abs(js - jsX) < 1e-12, s"JS $js != $jsX")
    val (_, _, _, jacY, eaY, ebY, jsY) = got("y")
    assert(jacY == 0.0 && eaY == 0.0 && ebY == 0.0)
    assert(math.abs(jsY - 1.0) < 1e-12, s"disjoint JS $jsY != 1")
  }

  private def log2(x: Double): Double = math.log(x) / math.log(2)
}
