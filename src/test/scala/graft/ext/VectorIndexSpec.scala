package graft.ext

import graft.SparkSpec
import graft.runtime.Sources
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The unified ANN front door (Graft.index / VectorIndex): profile →
  * rung selection is pure and pinned; each facade-built rung answers
  * IDENTICALLY to the direct API it routes to (parity, not
  * re-implementation); the handle persists/reloads; append + maintain
  * delegate to the rung's own verified paths; and a catalog index
  * resolves through Sources.index.
  */
class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def emb = Sources(spark, dir).embeddings
  private def queries = emb.filter(col("vec_id") < 20)
  private def freshDir(): String =
    Files.createTempDirectory("graft-vecindex").toString

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("query_id").cast("long"), col("corpus_id").cast("long"))
      .as[(Long, Long)].collect().toSet

  test("rung selection is pure and pinned across the profile space") {
    import VectorIndex._
    // at or under the exact floor: always brute, whatever else says
    assert(selectKind(50000, 64, IndexProfile()) == Brute)
    assert(selectKind(1000000, 64, IndexProfile.exact) == Brute)
    // serving beats the memory ladder
    assert(selectKind(1000000, 64, IndexProfile(serving = true)) == Hnsw)
    // memory ladder: full vectors fit → IVF; SQ8 codes fit → SQ8;
    // neither → IVF-PQ
    val n = 1000000L; val d = 64
    assert(selectKind(n, d, IndexProfile(memoryBudgetBytes = n * d * 8)) == Ivf)
    assert(selectKind(n, d, IndexProfile(memoryBudgetBytes = n * d * 8 - 1)) == Sq)
    assert(selectKind(n, d, IndexProfile(memoryBudgetBytes = n * d - 1)) == IvfPq)
  }

  test("exact profile = the brute rung; search parity with bruteForceTopK; oracle columns") {
    val idx = VectorIndex.build(emb, freshDir(), IndexProfile.exact)
    assert(idx.kind == VectorIndex.Brute)
    val got = idx.search(queries, k = 3)
    assert(got.columns.toSeq == Seq("query_id", "corpus_id", "sim", "rank"))
    assert(pairs(got) == pairs(SimilarityOps.bruteForceTopK(emb, queries, 3)))
  }

  test("serving profile = the HNSW rung; parity with the direct graph API; reload answers identically") {
    val path = freshDir()
    val built = VectorIndex.build(emb, path,
      IndexProfile(serving = true, exactFloor = 100L))
    assert(built.kind == VectorIndex.Hnsw)
    val direct = HnswIndex.train(
        emb.select(col("vec_id"), col("embedding")))
      .topK(queries, k = 3, ef = 64)
    assert(pairs(built.search(queries, 3)) == pairs(direct))
    // the persisted handle restores rung + knobs and answers the same
    val re = VectorIndex.load(spark, path)
    assert(re.kind == VectorIndex.Hnsw && re.profile.serving)
    assert(pairs(re.search(queries, 3)) == pairs(direct))
  }

  test("tight budget = the SQ8 rung; refined-search parity with the direct API") {
    // 500 × 64 dims: full vectors 256000 B > budget ≥ 32000 B codes → SQ8
    val idx = VectorIndex.build(emb, freshDir(),
      IndexProfile(memoryBudgetBytes = 100000L, exactFloor = 100L))
    assert(idx.kind == VectorIndex.Sq)
    val direct = SqIndex.train(emb).topKRefined(queries, emb, k = 3, shortlist = 64)
    assert(pairs(idx.search(queries, 3)) == pairs(direct))
  }

  test("default budget = full-precision IVF with √n cells; append extends it O(batch); maintain retrains") {
    val base = emb.filter(col("vec_id") < 400)
    val late = emb.filter(col("vec_id") >= 400)
    val idx = VectorIndex.build(base, freshDir(),
      IndexProfile(exactFloor = 100L))
    assert(idx.kind == VectorIndex.Ivf)
    val r = idx.append(late)
    assert(r.appended == late.count())
    // appended ids are probe-visible through the SAME handle
    val found = idx.search(queries, k = 3)
    assert(pairs(found).nonEmpty)
    val corpusIds = idx.corpusFrame.select("vec_id").as[Long].collect().toSet
    assert(corpusIds == emb.select("vec_id").as[Long].collect().toSet)
    // maintenance retrains from the indexed corpus without changing ids
    idx.maintain()
    assert(idx.corpusFrame.count() == emb.count())
    assert(pairs(idx.search(queries, k = 3)).nonEmpty)
  }

  test("facade recall gate reports meets_floor=true at the serving operating point") {
    val idx = VectorIndex.build(emb, freshDir(),
      IndexProfile(serving = true, exactFloor = 100L))
    val row = idx.recallGate(queries, k = 3, floor = 0.5,
        expectExactPairs = Some(60L))
      .as[(String, Double, Boolean)].collect().head
    assert(row == (("auto_hnsw", 0.5, true)), row.toString)
  }

  test("a catalog-registered index resolves through Sources.index") {
    val catalog = freshDir()
    // a writable catalog: copy the embeddings fixture in, register an index
    spark.read.parquet(s"$dir/embeddings.parquet")
      .write.parquet(s"$catalog/embeddings.parquet")
    val src = Sources(spark, catalog)
    graft.Graft.index(src.embeddings, s"$catalog/emb_ann.vecindex",
      IndexProfile(serving = true, exactFloor = 100L))
    val got = src.index("emb_ann")
      .search(src.embeddings.filter(col("vec_id") < 5), k = 3)
    assert(got.count() == 15, "3 neighbors for each of 5 queries")
  }
}
