package graft.ext

import graft.SparkSpec

/** Hand-computed gates for the retrieval-metric math (the oracle row
  * covers fixture-scale parity; these pin each branch on numbers small
  * enough to check by hand).
  */
class EvalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("recall/MRR/nDCG: hand-computed per-query metrics, every branch") {
    // q1: rel {a,b,c,d}; retrieved 1=a(rel) 2=x 3=b(rel)
    //   recall = 2/4, mrr = 1/1, dcg = 1/log2(2)+1/log2(4) = 1.5,
    //   idcg(min(3,4)=3) = 1 + 1/log2(3) + 0.5, ndcg = 1.5/idcg
    // q2: rel {z}; retrieved none relevant → recall 0, mrr 0, ndcg 0
    // q3: empty relevance set → EXCLUDED from the output
    val retrieved = Seq(
      (1L, "a", 1), (1L, "x", 2), (1L, "b", 3),
      (2L, "p", 1), (2L, "q", 2), (2L, "r", 3),
      (3L, "a", 1), (3L, "b", 2), (3L, "c", 3))
      .toDF("query_id", "corpus_id", "rank")
    val relevant = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"), (1L, "d"),
      (2L, "z"))
      .toDF("query_id", "corpus_id")
    val got = EvalOps.retrievalMetrics(retrieved, relevant, k = 3)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got.keySet == Set(1L, 2L), s"empty-relevance query leaked in: $got")
    val (n1, rec1, mrr1, ndcg1) = got(1L)
    assert(n1 == 4 && rec1 == 0.5 && mrr1 == 1.0)
    val idcg1 = 1.0 + 1.0 / (math.log(3) / math.log(2)) + 0.5
    assert(math.abs(ndcg1 - 1.5 / idcg1) < 1e-12, s"ndcg $ndcg1 != ${1.5 / idcg1}")
    assert(got(2L) == ((1L, 0.0, 0.0, 0.0)), s"no-hit query metrics: ${got(2L)}")
  }

  test("rank > k rows are ignored and a short relevance set caps the ideal DCG") {
    // rel {a}; run of length 5 with the only relevant doc at rank 2;
    // evaluated at k=2: idcg = 1/log2(2) (min(k, n_rel) = 1), so ndcg =
    // (1/log2(3)) / 1; the rank-4 relevant duplicate is outside k and
    // must not count
    val retrieved = Seq(
      (1L, "x", 1), (1L, "a", 2), (1L, "y", 3), (1L, "a", 4), (1L, "z", 5))
      .toDF("query_id", "corpus_id", "rank")
    val relevant = Seq((1L, "a")).toDF("query_id", "corpus_id")
    val got = EvalOps.retrievalMetrics(retrieved, relevant, k = 2)
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(got._2 == 1 && got._3 == 1.0 && got._4 == 0.5)
    val expected = (1.0 / (math.log(3) / math.log(2))) / 1.0
    assert(math.abs(got._5 - expected) < 1e-12, s"ndcg ${got._5} != $expected")
  }
}
