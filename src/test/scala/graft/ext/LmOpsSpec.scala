package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed gates for the trigram log-likelihood scorer: the
  * add-one arithmetic, normalization seam, short-doc absence, and the
  * ordering property the filter relies on (reference-like text scores
  * above alien text).
  */
class LmOpsSpec extends SparkSpec {
  import spark.implicits._

  private def score(ref: Seq[(Long, String)], docs: Seq[(Long, String)]): Map[Long, (Long, Double)] =
    LmOps.trigramLogLikelihood(
        docs.toDF("doc_id", "text"), ref.toDF("doc_id", "text"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("add-one arithmetic, hand-traced") {
    // reference "abcd" → trigrams {abc:1, bcd:1}, N=2, V=2 → denom 5
    val ref = Seq((100L, "abcd"))
    val got = score(ref, Seq(
      (1L, "abc"),   // ln(2/5)
      (2L, "xyz"),   // unseen: ln(1/5)
      (3L, "abcd"),  // mean(ln(2/5), ln(2/5))
      (4L, "ab")))   // < 3 chars → absent
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(math.abs(got(1L)._2 - math.log(2.0 / 5)) < 1e-12, got(1L).toString)
    assert(math.abs(got(2L)._2 - math.log(1.0 / 5)) < 1e-12, got(2L).toString)
    assert(got(3L) == (2L, got(1L)._2), got(3L).toString)
  }

  test("normalization: case and whitespace variants score identically") {
    val ref = Seq((100L, "the cat sat"))
    val got = score(ref, Seq((1L, "THE  cat   sat"), (2L, "the cat sat")))
    assert(got(1L) == got(2L), got.toString)
  }

  test("reference-like text outscores alien text (the filtering property)") {
    val ref = (0L until 20L).map(i => (i, s"the quick brown fox jumps over the lazy dog $i"))
    val got = score(ref, Seq(
      (1L, "the quick brown fox jumps again"),
      (2L, "zzqx wvvk pqzt mmnn xxyy qqww")))
    assert(got(1L)._2 > got(2L)._2,
      s"in-distribution doc did not outscore alien doc: $got")
  }
}
