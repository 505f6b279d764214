package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for SemDeDup-style semantic dedup
  * (SimilarityOps.semanticNearDupPairs): cluster-local pair generation
  * must find what global all-pairs finds whenever the quantizer's cells
  * align with the data's clusters, and exact twins must NEVER be missed
  * (identical vectors quantize identically by construction). Approximate
  * by contract — no DuckDB oracle (SURVEY §5.2 pattern).
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  import VectorFixtures.clusteredRows

  test("exact twins are always paired (identical vectors share a cell)") {
    // 3 planted twins on top of the clustered corpus, ids 500+
    val base = clusteredRows
    val twins = Seq(0L, 50L, 100L).zipWithIndex.map { case (src, i) =>
      (500L + i, base(src.toInt)._2)
    }
    val embs = (base ++ twins).toDF("vec_id", "embedding")
    val pairs = SimilarityOps.semanticNearDupPairs(embs, threshold = 0.9999)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(Set((0L, 500L), (50L, 501L), (100L, 502L)).subsetOf(pairs), pairs.toString)
  }

  test("cluster-local pairs: exact at nlist=1, subset + recall floor at nlist=4") {
    val embs = clusteredRows.toDF("vec_id", "embedding")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    // threshold 0.9 only matches same-cluster pairs (jitter 5% → cos
    // ≈ 0.99 within, ≲ 0.3 across)
    val global = key(SimilarityOps.cosinePairs(embs, 0.9))
    assert(global.nonEmpty, "fixture produced no same-cluster pairs")
    // nlist = 1 degenerates to ONE cell: the cluster-local join must
    // reproduce the global all-pairs EXACTLY — proves the pair/score
    // seam is identical and only the candidate set ever differs
    val one = key(SimilarityOps.semanticNearDupPairs(embs, 0.9, nlist = 1))
    assert(one == global,
      s"missing: ${(global diff one).take(5)}; extra: ${(one diff global).take(5)}")
    // nlist = 4: k-means may SPLIT a true cluster when two hash-order
    // seeds land in it (a classic local optimum) — lost pairs are the
    // documented boundary trade — but it can never fabricate one:
    // every cell-local pair is a genuine cosine pair
    val local = key(SimilarityOps.semanticNearDupPairs(embs, 0.9, nlist = 4))
    assert(local.subsetOf(global), s"fabricated pairs: ${(local diff global).take(5)}")
    val recall = local.size.toDouble / global.size
    assert(recall >= 0.4, s"nlist=4 recall $recall below 0.4")
  }

  test("corpus composition: one survivor per twin group via removeNearDups") {
    val base = clusteredRows
    val embs = (base ++ Seq((500L, base(0)._2), (501L, base(0)._2)))
      .toDF("vec_id", "embedding")
    val pairs = SimilarityOps.semanticNearDupPairs(embs, threshold = 0.9999)
    val kept = DedupOps.removeNearDups(embs, pairs, idCol = "vec_id", dropCol = "vec_b")
      .select("vec_id").as[Long].collect().toSet
    assert(kept.contains(0L) && !kept.contains(500L) && !kept.contains(501L),
      s"twin group not collapsed to its lowest id: ${kept.filter(_ >= 500)}")
  }
}
