package graft.ext

import graft.SparkSpec
import graft.runtime.Sources
import org.apache.spark.sql.functions._

/** Gates for the HNSW graph rung (HnswIndex): structural degree caps,
  * build determinism, save/load, clustered (planted-twin) recall, and
  * the adversarial near-uniform fixture floor — the same gate ladder
  * the quantized indexes carry.
  */
class HnswIndexSpec extends SparkSpec {
  import spark.implicits._

  import VectorFixtures.{clusteredRows, synthVec}

  private val dir = "/root/testdata/sf0.001"

  test("graph structure: per-level out-degree respects the M / 2M caps") {
    val idx = HnswIndex.train(clusteredRows.toDF("vec_id", "embedding"),
      m = 6, nShards = 2)
    val stats = idx.degreeStats().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(stats.nonEmpty)
    stats.foreach { case (lvl, maxDeg) =>
      val cap = if (lvl == 0) 2 * 6 else 6
      assert(maxDeg <= cap, s"level $lvl max degree $maxDeg exceeds cap $cap")
    }
  }

  test("build is deterministic: same corpus, same graph, same answers") {
    val embs = clusteredRows.toDF("vec_id", "embedding")
    val q = embs.filter($"vec_id" < 10)
    def run() = HnswIndex.train(embs, m = 6, nShards = 2)
      .topK(q, k = 3, ef = 32)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(run() == run())
  }

  test("save/load round-trip: persisted graph answers identically") {
    val embs = clusteredRows.toDF("vec_id", "embedding")
    val q = embs.filter($"vec_id" < 10)
    val idx = HnswIndex.train(embs, m = 6, nShards = 2)
    val live = idx.topK(q, 3, ef = 32)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val path = java.nio.file.Files.createTempDirectory("graft-hnsw").toString
    idx.save(path)
    val re = HnswIndex.load(spark, path).topK(q, 3, ef = 32)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(re == live)
  }

  test("clustered recall: the beam stays in the query's planted cluster") {
    val embs = clusteredRows.toDF("vec_id", "embedding")
    val q = embs.filter($"vec_id" < 8)
    val got = HnswIndex.train(embs, m = 8, nShards = 2).topK(q, 3, ef = 48)
      .select("query_id", "corpus_id").as[(Long, Long)].collect()
    assert(got.nonEmpty)
    val inCluster = got.count { case (qid, cid) => qid % 4 == cid % 4 }
    assert(inCluster.toDouble / got.length >= 0.95,
      s"cluster recall ${inCluster.toDouble / got.length} below 0.95")
  }

  test("large query sets chunk automatically: chunked equals one-shot, and the old hard cap is gone") {
    val embs = clusteredRows.toDF("vec_id", "embedding")
    val idx = HnswIndex.train(embs, m = 6, nShards = 2)
    val q = embs.filter($"vec_id" < 40)
    def collectSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val one = collectSet(idx.topK(q, 3, ef = 32))
    // 6 chunks of 7: per-chunk broadcasts, one merged rank window
    assert(collectSet(idx.topK(q, 3, ef = 32, chunkSize = 7)) == one)
    // a query set larger than maxBroadcastQueries (the r8 hard-error
    // cap) now completes: 70,001 queries → two bounded broadcasts
    val big = spark.range(70001).select(
      (col("id") + 1000000L).as("vec_id"),
      expr("transform(sequence(0, 63), d -> " +
        "cast(pmod(xxhash64(cast(id * 64 + d as string)), 1000) as double) " +
        "/ 1000.0 - 0.5)").as("embedding"))
    val res = idx.topK(big, k = 2, ef = 8)
    assert(res.count() == 70001L * 2, "every query must get its top-k")
  }

  test("topKJoin (cogrouped query frame) equals topK (broadcast) — one kernel, two shapes") {
    val embs = clusteredRows.toDF("vec_id", "embedding")
    val idx = HnswIndex.train(embs, m = 6, nShards = 2)
    val q = embs.filter($"vec_id" < 40)
    def collectRows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "corpus_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(collectRows(idx.topKJoin(q, 3, ef = 32)) ==
      collectRows(idx.topK(q, 3, ef = 32)))
    // and the join shape survives a persisted reload (the batch path
    // reads the shard-partitioned parquet directly)
    val path = java.nio.file.Files.createTempDirectory("graft-hnsw-join").toString
    idx.save(path)
    assert(collectRows(HnswIndex.load(spark, path).topKJoin(q, 3, ef = 32)) ==
      collectRows(idx.topK(q, 3, ef = 32)))
  }

  test("fixture recall@3 vs brute force stays off the floor on near-uniform data") {
    val e = Sources(spark, dir).embeddings
    val q = e.filter(col("vec_id") < 20)
    val brute = SimilarityOps.bruteForceTopK(e, q, k = 3)
    val found = HnswIndex.train(e, m = 8, efConstruction = 64, nShards = 4)
      .topK(q, k = 3, ef = 64)
    val (ep, fp, r) = RecallOps.setRecall("hnsw", brute, found,
        Seq("query_id", "corpus_id"))
      .selectExpr("exact_pairs", "found_pairs", "recall")
      .as[(Long, Long, Double)].collect().head
    assert(ep == 60, s"ground truth must be |Q|*k: $ep")
    info(s"hnsw fixture recall@3 = $r ($fp/$ep)")
    assert(r >= 0.5, s"hnsw recall collapsed: $r")
  }
}
