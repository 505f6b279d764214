package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed gates for the REAL byte-pair-encoding merge loop
  * (TextOps.bpeTokenCount): each case traces the greedy lowest-rank
  * merge sequence by hand against TextOps.DemoBpeMerges
  * (t+h=0, th+e=1, i+n=2, a+n=3, an+d=4, e+r=5, o+n=6, r+e=7, o+r=8,
  * e+n=9, a+t=10, o+u=11, i+s=12, e+s=13, t+o=14).
  * No DuckDB oracle by contract — iterative merging isn't portable SQL —
  * so this spec IS the correctness gate (SURVEY §5.2 pattern).
  */
class TextBpeSpec extends SparkSpec {
  import spark.implicits._

  private def counts(texts: (Long, String)*): Map[Long, Long] =
    texts.toSeq.toDF("doc_id", "text")
      .select(col("doc_id"),
        TextOps.bpeTokenCount(col("text"), TextOps.DemoBpeMerges).as("n"))
      .as[(Long, Long)].collect().toMap

  test("single words follow the ranked merge sequence exactly") {
    val got = counts(
      // t h e → (t+h, rank 0) th e → (th+e, rank 1) the : 1 symbol
      (1L, "the"),
      // t h e n → th e n → the n : no (the,n) pair → 2 symbols
      (2L, "then"),
      // a n d → (a+n, rank 3) an d → (an+d, rank 4) and : 1 symbol
      (3L, "and"),
      // r a t: no (r,a); (a+t, rank 10) → r at : 2 symbols
      (4L, "rat"),
      // x y z: no pair in the table → 3 symbols
      (5L, "xyz"),
      // t h o r n: (t+h, 0) → th o r n; no (th,o); (o+r, 8) → th or n :
      // 3 symbols — lowest-rank-first, NOT leftmost-pair-first ((o+r)
      // outranks nothing here, but (t+h) had to beat (o+r) to rank)
      (6L, "thorn"))
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 2L, 5L -> 3L, 6L -> 3L), got.toString)
  }

  test("lowest rank wins over leftmost position") {
    // i s a n: pairs present are (i+s, rank 12) and (a+n, rank 3) —
    // (a+n) merges FIRST despite sitting right of (i+s); then (i+s).
    // Both merge to 2 symbols regardless of order here, so pin the
    // order-sensitive case too: o n e → (o+n, 6) on e — NOT e+n,
    // because (o,n) at rank 6 beats (n,e) which isn't in the table.
    val got = counts((1L, "isan"), (2L, "one"))
    assert(got == Map(1L -> 2L, 2L -> 2L), got.toString)
  }

  test("a merge round rewrites ALL occurrences of the chosen pair") {
    // t h t h: one (t+h) round merges BOTH occurrences → th th → 2
    // symbols ((th,th) is not a table pair)
    val got = counts((1L, "thth"))
    assert(got == Map(1L -> 2L), got.toString)
  }

  test("whitespace pre-tokenization sums per-word counts; edge inputs") {
    val got = counts(
      (1L, "the and"),      // 1 + 1
      (2L, "  the   rat "), // trim + split: 1 + 2
      (3L, "a"),            // single char, no merges
      (4L, ""))             // empty text → 0 tokens
    assert(got == Map(1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 0L), got.toString)
  }

  test("null text counts 0") {
    val got = Seq((1L, Option.empty[String]), (2L, Some("the")))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextOps.bpeTokenCount(col("text"), TextOps.DemoBpeMerges).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L), got.toString)
  }
}
