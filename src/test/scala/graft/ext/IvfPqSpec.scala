package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for the IVF-PQ composition: exactness at full probe +
  * unbounded refine, clustered recall on the pruned probe, save/load
  * round-trip, and the residual-encoding advantage over raw PQ.
  */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  import VectorFixtures.clusteredRows

  test("full probe + unbounded refine is exact: equals brute force") {
    val dir = "/root/testdata/sf0.001"
    val embs = graft.runtime.Sources(spark, dir).embeddings
    val queries = embs.filter(col("vec_id") < 20)
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "corpus_id", "rank").as[(Long, Long, Int)].collect().toSet
    val brute = keys(SimilarityOps.bruteForceTopK(embs, queries, k = 3))
    val idx = IvfPqIndex.train(embs)
    val exact = keys(idx.topKRefined(queries, embs, k = 3,
      nprobe = idx.nlist, shortlist = Int.MaxValue))
    assert(exact == brute, s"missing: ${(brute diff exact).take(5)}")
  }

  test("residual codes reconstruct similarities tighter than raw codes on clustered data") {
    // the encoding bet, measured: same code budget (m=8, ksub=16), same
    // full-probe candidate set — the ONLY difference is residual vs raw
    // encoding. On clustered data the cells are tight, so residual
    // energy ≪ unit energy and the ADC approximation error collapses.
    // (On structureless uniform data the inequality REVERSES — wide
    // cells make ‖v − c‖ exceed ‖v‖ — which is why this gate runs on
    // the clustered corpus and the class doc calls the trade out.)
    val embs = clusteredRows.toDF("vec_id", "embedding")
    val queries = clusteredRows.take(10).toDF("vec_id", "embedding")
    def simsOf(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
      df.select("query_id", "corpus_id", "sim").as[(Long, Long, Double)]
        .collect().map(r => (r._1, r._2) -> r._3).toMap
    val exact = simsOf(SimilarityOps.bruteForceTopK(embs, queries, k = 200))
    val ivfpq = IvfPqIndex.train(embs)
    val res = simsOf(ivfpq.topK(queries, k = 200, nprobe = ivfpq.nlist))
    val raw = simsOf(PqIndex.train(embs).topK(queries, k = 200))
    def mae(approx: Map[(Long, Long), Double]): Double = {
      val shared = exact.keySet intersect approx.keySet
      shared.toSeq.map(k => math.abs(approx(k) - exact(k))).sum / shared.size
    }
    val (mRes, mRaw) = (mae(res), mae(raw))
    assert(mRes < mRaw,
      s"residual ADC error $mRes not below raw-PQ error $mRaw")
    assert(mRes < 0.05, s"residual ADC error $mRes above 0.05")
  }

  test("clustered recall: pruned probe (4 of 16) + small refine finds cluster twins") {
    val embs = clusteredRows.toDF("vec_id", "embedding")
    val idx = IvfPqIndex.train(embs)
    val got = idx.topKRefined(embs, embs, k = 1, nprobe = 4, shortlist = 8)
      .select("query_id", "corpus_id").as[(Long, Long)].collect()
    val sameCluster = got.count { case (q, c) => q % 4 == c % 4 }
    val recall = sameCluster.toDouble / got.length
    assert(recall >= 0.9, s"clustered recall $recall below 0.9")
  }

  test("save/load round-trip answers identically") {
    val embs = clusteredRows.toDF("vec_id", "embedding")
    val queries = clusteredRows.take(10).toDF("vec_id", "embedding")
    val trained = IvfPqIndex.train(embs)
    val p = java.nio.file.Files.createTempDirectory("ivfpq_spec_").toString
    try {
      trained.save(p)
      val loaded = IvfPqIndex.load(spark, p)
      assert(loaded.nlist == trained.nlist && loaded.m == trained.m)
      def key(idx: IvfPqIndex) = idx.topK(queries, k = 3, nprobe = 4)
        .select("query_id", "corpus_id", "rank").as[(Long, Long, Int)].collect().toSet
      assert(key(loaded) == key(trained))
    } finally graft.runtime.Fs.deleteRecursive(java.nio.file.Paths.get(p))
  }
}
