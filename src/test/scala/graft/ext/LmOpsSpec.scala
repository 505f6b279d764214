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

  private def scoreCond(ref: Seq[(Long, String)],
                        docs: Seq[(Long, String)]): Map[Long, (Long, Double)] =
    LmOps.conditionalTrigramLogLikelihood(
        docs.toDF("doc_id", "text"), ref.toDF("doc_id", "text"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("conditional add-one arithmetic, hand-traced") {
    // reference "abcd" → trigrams {abc:1, bcd:1}; contexts {ab:1, bc:1};
    // third-char vocab {c, d} → V = 2
    val ref = Seq((100L, "abcd"))
    val got = scoreCond(ref, Seq(
      (1L, "abc"),   // seen trigram, seen context: ln((1+1)/(1+2))
      (2L, "xyz"),   // unseen both: ln(1/(0+2))
      (3L, "abq")))  // seen context ab, unseen trigram: ln(1/(1+2))
    assert(math.abs(got(1L)._2 - math.log(2.0 / 3)) < 1e-12, got(1L).toString)
    assert(math.abs(got(2L)._2 - math.log(1.0 / 2)) < 1e-12, got(2L).toString)
    assert(math.abs(got(3L)._2 - math.log(1.0 / 3)) < 1e-12, got(3L).toString)
  }

  test("conditional model: in-distribution outscores alien text, near-zero when fluent") {
    val ref = (0L until 40L).map(i =>
      (i, s"the quick brown fox jumps over the lazy dog and the cat sat on the mat $i"))
    val cond = scoreCond(ref, Seq(
      (1L, "the brown cat jumps over the lazy fox"),
      (2L, "eht kciuq nworb xof spmuj revo eht yzal god")))
    assert(cond(1L)._2 > cond(2L)._2,
      s"conditional: in-distribution did not outscore alien: $cond")
    // the conditional model's distinguishing property: a fluent doc's
    // score approaches ln(1) = 0 (each char near-certain given its
    // context), unlike the unigram form whose ceiling is ln(c_max/N) —
    // deeply negative however fluent the text. That calibration is what
    // makes a single filter threshold portable across reference sizes.
    assert(cond(1L)._2 > -2.0,
      s"fluent in-distribution text should score near 0: ${cond(1L)}")
  }

  test("conditional model: non-BMP reference chars key contexts by codepoint, not UTF-16 unit") {
    // "😀ab" is 3 codepoints / 4 Java chars: the context must be 😀a and
    // the vocab {b} — a UTF-16-unit split would key the context as the
    // bare surrogate-pair emoji and miss every lookup
    val ref = Seq((100L, "😀ab"))
    val got = scoreCond(ref, Seq(
      (1L, "😀ab"),   // seen trigram, seen context: ln((1+1)/(1+1)) = 0
      (2L, "😀aq")))  // seen context, unseen next: ln(1/(1+1))
    assert(math.abs(got(1L)._2 - 0.0) < 1e-12, got(1L).toString)
    assert(math.abs(got(2L)._2 - math.log(1.0 / 2)) < 1e-12, got(2L).toString)
  }

  test("conditional model punishes seen-context/unseen-continuation transitions") {
    // "th" is the most common context in the reference; following it
    // with q gets the full 1/(C2(th)+V) penalty — heavier than the
    // unigram's flat unseen-trigram penalty precisely because the
    // context is common. (An alien doc of wholly-unseen CONTEXTS decays
    // to the mild 1/V floor instead — the conditional and unigram forms
    // are complements, not a strict ordering.)
    val ref = (0L until 40L).map(i => (i, s"the thin thorn then there this that $i"))
    val cond = scoreCond(ref, Seq((1L, "the"), (2L, "thq")))
    // doc 1: P(e|th) is high; doc 2: P(q|th) = 1/(C2(th)+V)
    assert(cond(1L)._2 > cond(2L)._2 + 2.0,
      s"common-context violation must be sharply punished: $cond")
  }
}
