package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for product quantization (PqIndex): structural contract, code
  * validity, train determinism, and recall against the exact scorer on
  * both the adversarial near-uniform fixture and realistic clustered
  * data. PQ is approximate by design — no DuckDB oracle by contract
  * (the SURVEY §5.2 pattern, as for LSH/IVF-approx).
  */
class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  import VectorFixtures.clusteredRows

  test("codes are structurally valid: m entries, all in [0, ksub)") {
    val embs = clusteredRows.toDF("vec_id", "embedding")
    val idx = PqIndex.train(embs, m = 8, ksub = 16)
    val codes = idx.codeTable.select("code").as[Seq[Int]].collect()
    assert(codes.length == 200)
    assert(codes.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)),
      codes.take(3).toString)
  }

  test("training is deterministic: identical code table across runs") {
    val embs = clusteredRows.toDF("vec_id", "embedding")
    def table() = PqIndex.train(embs, m = 8, ksub = 16)
      .codeTable.as[(Long, Seq[Int])].collect().toMap
    assert(table() == table())
  }

  test("save/load round-trip: persisted index answers identically") {
    val embs = clusteredRows.toDF("vec_id", "embedding")
    val queries = clusteredRows.take(10).toDF("vec_id", "embedding")
    val trained = PqIndex.train(embs, m = 8, ksub = 16)
    val p = java.nio.file.Files.createTempDirectory("pq_spec_").toString
    try {
      trained.save(p)
      val loaded = PqIndex.load(spark, p)
      assert(loaded.m == trained.m && loaded.ksub == trained.ksub)
      def key(idx: PqIndex) = idx.topK(queries, k = 3)
        .select("query_id", "corpus_id", "rank").as[(Long, Long, Int)].collect().toSet
      assert(key(loaded) == key(trained))
    } finally graft.runtime.Fs.deleteRecursive(java.nio.file.Paths.get(p))
  }

  test("ADC top-k answers every query with exactly k non-self rows") {
    val embs = clusteredRows.toDF("vec_id", "embedding")
    val queries = clusteredRows.take(20).toDF("vec_id", "embedding")
    val got = PqIndex.train(embs, m = 8, ksub = 16).topK(queries, k = 3)
      .select("query_id", "corpus_id").as[(Long, Long)].collect()
    val byQuery = got.groupBy(_._1)
    assert(byQuery.size == 20 && byQuery.values.forall(_.length == 3), byQuery.view.mapValues(_.length).toMap.toString)
    assert(got.forall { case (q, c) => q != c }, "self-neighbor returned")
  }

  test("clustered recall: ADC finds same-cluster neighbors") {
    // the realistic corpus shape: quantization error is small next to
    // inter-cluster distance, so the approximate ranking preserves
    // cluster membership
    val embs = clusteredRows.toDF("vec_id", "embedding")
    val got = PqIndex.train(embs, m = 8, ksub = 16).topK(embs, k = 1)
      .select("query_id", "corpus_id").as[(Long, Long)].collect()
    val sameCluster = got.count { case (q, c) => q % 4 == c % 4 }
    val recall = sameCluster.toDouble / got.length
    assert(recall >= 0.95, s"clustered recall $recall below 0.95")
  }

  test("fixture recall vs exact brute force (adversarial near-uniform data)") {
    val dir = "/root/testdata/sf0.001"
    val embs = graft.runtime.Sources(spark, dir).embeddings
    val queries = embs.filter(col("vec_id") < 20)
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val brute = keys(SimilarityOps.bruteForceTopK(embs, queries, k = 3))
    val idx = PqIndex.train(embs, m = 8, ksub = 16)
    // Raw ADC on near-uniform random vectors is the worst case for
    // quantization — true neighbors sit barely above the noise floor
    // (max pairwise cos ≈ 0.5), so residual error reorders aggressively;
    // measured ≈ 0.13 here vs ≥ 0.95 on clustered data above. The
    // assert pins the floor, not the selling point…
    val adc = keys(idx.topK(queries, k = 3))
    val adcRecall = (adc intersect brute).size.toDouble / brute.size
    assert(adcRecall >= 0.05, s"raw ADC fixture recall $adcRecall below 0.05")
    // …the selling point is the refined pipeline: ADC shortlist from
    // the code scan, exact re-rank of |Q|·shortlist rows. Even on this
    // adversarial corpus a 64-of-500 shortlist recovers most of the
    // true top-3.
    val refined = keys(idx.topKRefined(queries, embs, k = 3, shortlist = 64))
    val refRecall = (refined intersect brute).size.toDouble / brute.size
    assert(refRecall >= 0.7, s"refined fixture recall $refRecall below 0.7")
  }
}
