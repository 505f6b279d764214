package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for scalar quantization (SqIndex): code validity, the per-step
  * reconstruction-error bound (SQ8's defining guarantee, which PQ does
  * not have), train determinism, save/load, and recall vs the exact
  * scorer — including the adversarial near-uniform fixture, where SQ8's
  * gentle per-dimension error should hold rankings PQ's codebook
  * residual visibly scrambles.
  */
class SqIndexSpec extends SparkSpec {
  import spark.implicits._

  import VectorFixtures.clusteredRows

  test("codes are structurally valid: dims entries, all in [0, 255]") {
    val embs = clusteredRows.toDF("vec_id", "embedding")
    val idx = SqIndex.train(embs)
    val codes = idx.codeTable.select("code").as[Seq[Int]].collect()
    assert(codes.length == 200)
    assert(codes.forall(c => c.length == idx.dims && c.forall(x => x >= 0 && x <= 255)))
    // both rails are hit somewhere: min/max train values encode 0 / 255
    assert(codes.exists(_.contains(0)) && codes.exists(_.contains(255)))
  }

  test("reconstruction error is bounded by half a quantization step per dimension") {
    val embs = clusteredRows.toDF("vec_id", "embedding")
    val idx = SqIndex.train(embs)
    val orig = SimilarityOps.normalized(embs, "vec_id", "embedding")
      .as[(Long, Seq[Double])].collect().toMap
    idx.codeTable.as[(Long, Seq[Int])].collect().foreach { case (id, code) =>
      val v = orig(id)
      code.indices.foreach { d =>
        val rec = idx.vmin(d) + code(d) * idx.step(d)
        val bound = idx.step(d) / 2 + 1e-9
        assert(math.abs(rec - v(d)) <= bound,
          s"vec $id dim $d: |${rec - v(d)}| > $bound")
      }
    }
  }

  test("training is deterministic and sample-free: exact params, identical codes") {
    val embs = clusteredRows.toDF("vec_id", "embedding")
    def idx() = SqIndex.train(embs)
    val (a, b) = (idx(), idx())
    assert(a.vmin.sameElements(b.vmin) && a.vmax.sameElements(b.vmax))
    assert(a.codeTable.as[(Long, Seq[Int])].collect().toMap ==
      b.codeTable.as[(Long, Seq[Int])].collect().toMap)
  }

  test("save/load round-trip: persisted index answers identically") {
    val embs = clusteredRows.toDF("vec_id", "embedding")
    val queries = clusteredRows.take(10).toDF("vec_id", "embedding")
    val trained = SqIndex.train(embs)
    val p = java.nio.file.Files.createTempDirectory("sq_spec_").toString
    try {
      trained.save(p)
      val loaded = SqIndex.load(spark, p)
      assert(loaded.dims == trained.dims &&
        loaded.vmin.sameElements(trained.vmin))
      def key(idx: SqIndex) = idx.topK(queries, k = 3)
        .select("query_id", "corpus_id", "rank").as[(Long, Long, Int)].collect().toSet
      assert(key(loaded) == key(trained))
    } finally graft.runtime.Fs.deleteRecursive(java.nio.file.Paths.get(p))
  }

  test("clustered recall: ADC alone preserves cluster membership") {
    val embs = clusteredRows.toDF("vec_id", "embedding")
    val got = SqIndex.train(embs).topK(embs, k = 1)
      .select("query_id", "corpus_id").as[(Long, Long)].collect()
    val recall = got.count { case (q, c) => q % 4 == c % 4 }.toDouble / got.length
    assert(recall >= 0.95, s"clustered recall $recall below 0.95")
  }

  test("fixture recall vs exact brute force: near-exact even on adversarial near-uniform data") {
    val dir = "/root/testdata/sf0.001"
    val embs = graft.runtime.Sources(spark, dir).embeddings
    val queries = embs.filter(col("vec_id") < 20)
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val brute = keys(SimilarityOps.bruteForceTopK(embs, queries, k = 3))
    val idx = SqIndex.train(embs)
    // per-dim error ≤ step/2 ≈ (range/255)/2 barely moves dot products —
    // ADC alone should stay near-exact where PQ needs its refine stage
    val adc = keys(idx.topK(queries, k = 3))
    val adcRecall = (brute & adc).size.toDouble / brute.size
    assert(adcRecall >= 0.9, s"SQ8 ADC recall $adcRecall below 0.9")
    // a modest exact refine closes the gap entirely
    val refined = keys(idx.topKRefined(queries, embs, k = 3, shortlist = 32))
    assert((brute & refined).size.toDouble / brute.size >= 0.99,
      "refined SQ8 should be effectively exact at shortlist 32")
    // unbounded shortlist ≡ brute force exactly (the exactmode contract)
    val exact = keys(idx.topKRefined(queries, embs, k = 3, shortlist = Int.MaxValue))
    assert(exact == brute)
  }
}
