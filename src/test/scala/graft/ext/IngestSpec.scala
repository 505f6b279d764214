package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for Bloom-routed incremental ingest dedup
  * (IngestOps.appendDedupExact): output must EQUAL the naive anti-join
  * on every input — planted cross-batch dups, within-batch dups, and a
  * deliberately saturated filter that shoves everything through the
  * exact-verify path.
  */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def naive(existing: org.apache.spark.sql.DataFrame,
                    incoming: org.apache.spark.sql.DataFrame): Set[Long] = {
    val exFp = existing.select(md5(col("text")).as("fp"))
    DedupOps.dedupExact(incoming)
      .join(exFp, md5(col("text")) === col("fp"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
  }

  private val existing = Seq(
    (0L, "shared doc alpha"), (2L, "only in corpus"), (4L, "another old one"))
    .toDF("doc_id", "text")
  // 11/13 duplicate each other (keep 11); 15 duplicates existing 0; 17 new
  private val incoming = Seq(
    (11L, "fresh doc one"), (13L, "fresh doc one"),
    (15L, "shared doc alpha"), (17L, "genuinely new"))
    .toDF("doc_id", "text")

  test("bloom-routed result equals the naive anti-join (planted dups)") {
    val got = IngestOps.appendDedupExact(existing, incoming)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(11L, 17L))
    assert(got == naive(existing, incoming))
  }

  test("a saturated bloom (tiny capacity, high fpp) cannot change the result") {
    // expectedItems=1 over 3 existing rows: nearly every probe collides,
    // so nearly every incoming row routes through exact-verify — the
    // output must be identical
    val got = IngestOps.appendDedupExact(existing, incoming, expectedItems = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(11L, 17L))
  }

  test("empty corpus: everything new survives (within-batch dedup still applies)") {
    val none = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val got = IngestOps.appendDedupExact(none, incoming)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(11L, 15L, 17L))
  }

  test("fixture halves: bloom-routed equals naive at corpus scale") {
    val docs = graft.runtime.Sources(spark, "/root/testdata/sf0.001").documents
    val ex = docs.filter(col("doc_id") % 2 === 0)
    val inc = docs.filter(col("doc_id") % 2 === 1)
    val got = IngestOps.appendDedupExact(ex, inc, expectedItems = 64)
      .select("doc_id").as[Long].collect().toSet
    assert(got == naive(ex, inc))
    assert(got.nonEmpty)
  }
}
