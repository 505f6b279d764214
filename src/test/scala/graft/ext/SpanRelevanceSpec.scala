package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed gates for the duplicated-span family (DedupOps
  * dupSpanStats / scrubDupSpans) and the term-relevance scorer
  * (RelevanceOps.topTermsByRarity). The oracle rows prove fixture-scale
  * parity; these pin the semantics on traceable inputs — overlapping
  * spans, self-repetition, short-doc passthrough, score ties.
  */
class SpanRelevanceSpec extends SparkSpec {
  import spark.implicits._

  // 3-grams over: doc1 "a b c d e f", doc2 "x a b c d e", doc3 self-rep,
  // doc4 shorter than n.
  private val spanDocs = Seq(
    (1L, "a b c d e f"),
    (2L, "x a b c d e"),
    (3L, "p q p q p q"),
    (4L, "q r")).toDF("doc_id", "text")

  test("dupSpanStats: cross-doc shares, self-repetition, short-doc absence") {
    val got = DedupOps.dupSpanStats(spanDocs, n = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // doc1 grams: [abc bcd cde def]; doc2: [xab abc bcd cde] → shared
    // abc/bcd/cde have corpus count 2 → 3 dup instances each side.
    // doc3 grams: [pqp qpq pqp qpq] → every instance's gram occurs
    // twice IN THE SAME DOC → all 4 are dup (self-repetition counts).
    // doc4: 2 tokens < n → absent.
    assert(got == Map(1L -> (4L, 3L), 2L -> (4L, 3L), 3L -> (4L, 4L)), got.toString)
  }

  test("scrubDupSpans: overlapping covered spans coalesce; all docs kept") {
    val got = DedupOps.scrubDupSpans(spanDocs, n = 3)
      .as[(Long, String)].collect().toMap
    // doc1 dup instances start at 0,1,2 → positions 0-4 covered → "f"
    // doc2 dup instances start at 1,2,3 → positions 1-5 covered → "x"
    // doc3 all instances dup → everything covered → ""
    // doc4 has no grams → passes through (ws-normalized)
    assert(got == Map(1L -> "f", 2L -> "x", 3L -> "", 4L -> "q r"), got.toString)
  }

  test("scrubDupSpans leaves a corpus with no repeated grams untouched") {
    val docs = Seq((1L, "a b c d"), (2L, "e f g h")).toDF("doc_id", "text")
    val got = DedupOps.scrubDupSpans(docs, n = 3).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a b c d", 2L -> "e f g h"), got.toString)
  }

  test("topTermsByRarity: hand-computed smoothed-ratio scores and ordering") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "durian durian durian")).toDF("doc_id", "text")
    // N=3. df: apple 1, banana 2, cherry 1, durian 1.
    // scores: doc1 apple 2*4/2=4, banana 1*4/3=1.333…;
    //         doc2 cherry 1*4/2=2, banana 1.333…; doc3 durian 3*4/2=6.
    val got = RelevanceOps.topTermsByRarity(docs, k = 2)
      .select("doc_id", "term", "score")
      .as[(Long, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(-_._3).map(r => (r._2, r._3)).toSeq).toMap
    assert(got(1L) == Seq(("apple", 4.0), ("banana", 4.0 / 3)), got(1L).toString)
    assert(got(2L) == Seq(("cherry", 2.0), ("banana", 4.0 / 3)), got(2L).toString)
    assert(got(3L) == Seq(("durian", 6.0)), got(3L).toString)
  }

  test("topTermsByRarity: equal scores tie-break on term ascending") {
    // both terms unique to the doc with tf 1 → identical scores; k=1
    // must deterministically keep the lexicographically first
    val docs = Seq((1L, "zebra aardvark")).toDF("doc_id", "text")
    val got = RelevanceOps.topTermsByRarity(docs, k = 1)
      .select("term").as[String].collect().toSeq
    assert(got == Seq("aardvark"), got.toString)
  }

  test("topTermsByRarity logIdf mode ranks by tf·ln-idf, not the ratio") {
    // doc2-4 pad df. doc1: "rare" tf=1 df=1; "common" tf=3 df=4.
    // N=4: ratio(common)=3·5/5=3 > ratio(rare)=5/2=2.5, but
    // ln-idf: common 3·ln(5/5)=0 < rare ln(5/2)≈0.916 — the modes
    // must order the two terms OPPOSITELY.
    val docs = Seq(
      (1L, "rare common common common"),
      (2L, "common x"), (3L, "common y"), (4L, "common z"))
      .toDF("doc_id", "text")
    def top(logIdf: Boolean) = RelevanceOps.topTermsByRarity(docs, k = 1, logIdf = logIdf)
      .filter(col("doc_id") === 1).select("term").as[String].collect().head
    assert(top(logIdf = false) == "common")
    assert(top(logIdf = true) == "rare")
  }
}
