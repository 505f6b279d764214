package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge-case gates for the corpus-curation ops (the oracle rows cover
  * fixture-scale parity; these pin the semantics the fixture can't
  * reach).
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("repetition signals: hand-computed fractions") {
    val docs = Seq(
      (1L, "a a a b"),          // top = 3/4, dup = 3/4
      (2L, "a b c d"),          // no repetition: top = 1/4, dup = 0
      (3L, "x x y y"))          // top = 2/4, dup = 4/4
      .toDF("doc_id", "text")
    val got = CorpusOps.repetitionSignals(docs)
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == (0.75, 0.75), got.toString)
    assert(got(2L) == (0.25, 0.0), got.toString)
    assert(got(3L) == (0.5, 1.0), got.toString)
  }

  test("PII redaction replaces emails and phones, leaves clean text alone") {
    val docs = Seq(
      (1L, "mail me at alice.smith+spam@sub.example.org today"),
      (2L, "call 555-123-4567 or 555.987.6543 now"),
      (3L, "no pii here, just words"),
      (4L, "both bob@ex.co and 111-222-3333"))
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"), TextOps.redactPii(col("text")).as("r"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "mail me at <EMAIL> today", got(1L))
    assert(got(2L) == "call <PHONE> or <PHONE> now", got(2L))
    assert(got(3L) == "no pii here, just words", got(3L))
    assert(got(4L) == "both <EMAIL> and <PHONE>", got(4L))
  }

  test("stratified hash sample: content-determined, stratum-scoped, absent stratum drops") {
    val docs = (0 until 200).map(i =>
      (i.toLong, if (i % 2 == 0) "en" else "xx", s"doc number $i body")).toDF("doc_id", "lang", "text")
    val cuts = Map("en" -> "7f")   // ~50% of the en stratum
    val s1 = CorpusOps.stratifiedHashSample(docs, cuts).select("doc_id").as[Long].collect().toSet
    val s2 = CorpusOps.stratifiedHashSample(docs, cuts).select("doc_id").as[Long].collect().toSet
    assert(s1 == s2, "hash sampling must be deterministic across runs")
    assert(s1.forall(_ % 2 == 0), "absent stratum (xx) must be dropped entirely")
    assert(s1.nonEmpty && s1.size < 100, s"en stratum should thin out: ${s1.size}/100")
    // the decision is a pure function of CONTENT: repartitioning the
    // input cannot change the selection
    val s3 = CorpusOps.stratifiedHashSample(docs.repartition(7), cuts)
      .select("doc_id").as[Long].collect().toSet
    assert(s3 == s1, "selection must be partitioning-invariant")
    intercept[IllegalArgumentException] {
      CorpusOps.stratifiedHashSample(docs, Map("en" -> "XY"))
    }
  }

  test("per-key cap keeps exactly n rows per key under the total order") {
    val docs = (0 until 30).map(i => (i.toLong, s"k${i % 3}", s"${"w " * (i + 1)}"))
      .toDF("doc_id", "lang", "text")
    val got = CorpusOps.capPerKey(docs,
        keys = Seq(col("lang")),
        order = Seq(TextOps.tokenCount(col("text")).desc, col("doc_id")), n = 2)
      .select("doc_id", "lang").as[(Long, String)].collect()
    assert(got.length == 6, s"3 keys × cap 2: ${got.toSeq}")
    // per key the two LONGEST docs are ids 27/24 (k0), 28/25 (k1), 29/26 (k2)
    val byKey = got.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byKey == Map("k0" -> Set(27L, 24L), "k1" -> Set(28L, 25L), "k2" -> Set(29L, 26L)),
      byKey.toString)
  }

  test("budget sample: integer-exact proportional quotas, md5-order take, deterministic") {
    // counts a:2, b:6, budget 4 → quotas (4·2) DIV 8 = 1, (4·6) DIV 8 = 3
    val docs = (Seq((1L, "a"), (2L, "a")) ++ (10L until 16L).map((_, "b")))
      .map { case (id, k) => (id, k, s"text body $id") }
      .toDF("doc_id", "lang", "text")
    val got = CorpusOps.budgetSample(docs, budget = 4)
      .select("doc_id", "lang").as[(Long, String)].collect()
    assert(got.count(_._2 == "a") == 1 && got.count(_._2 == "b") == 3, got.toSeq.toString)
    // pure content function: rerun and repartition select the identical subset
    val again = CorpusOps.budgetSample(docs.repartition(7), budget = 4)
      .select("doc_id", "lang").as[(Long, String)].collect()
    assert(got.toSet == again.toSet, s"sample not deterministic: ${got.toSeq} vs ${again.toSeq}")
  }

  test("temperature quotas: perfect-square counts make the XLM-R arithmetic exact") {
    // counts 4/9/16, α = 0.5 → weights 2/3/4 (sum 9); budget 9 → quotas
    // 2/3/4 exactly — low-resource lang a holds 2/9 of the budget vs
    // 4/29 of the corpus (upweighted), c drops from 16/29 to 4/9
    val docs = ((0L until 4L).map((_, "a")) ++ (10L until 19L).map((_, "b")) ++
      (20L until 36L).map((_, "c")))
      .map { case (id, k) => (id, k, s"text body $id") }
      .toDF("doc_id", "lang", "text")
    val quotas = CorpusOps.temperatureQuotas(docs, alpha = 0.5, budget = 9)
    assert(quotas == Map("a" -> 2L, "b" -> 3L, "c" -> 4L), quotas.toString)
    // α = 1 degenerates to the proportional split: (9·n) DIV 29 = 1/2/4
    val prop = CorpusOps.temperatureQuotas(docs, alpha = 1.0, budget = 9)
    assert(prop == Map("a" -> 1L, "b" -> 2L, "c" -> 4L), prop.toString)
    // and the selection mechanism honors the quota map exactly
    val got = CorpusOps.quotaSample(docs, quotas)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L, "b" -> 3L, "c" -> 4L), got.toString)
  }

  test("content-defined chunking: local boundaries, insertion robustness, short docs") {
    val body = (1 to 120).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, body),
      (2L, s"ins0 $body"),          // one token INSERTED at the front
      (3L, "a b"))                  // shorter than k → single whole-doc chunk
      .toDF("doc_id", "text")
    val got = CorpusOps.chunkContentDefined(docs)
      .select("doc_id", "chunk_text").as[(Long, String)].collect()
    val c1 = got.filter(_._1 == 1L).map(_._2).toSeq
    val c2 = got.filter(_._1 == 2L).map(_._2).toSeq
    assert(c1.size >= 2, s"expected multiple chunks from 120 tokens: ${c1.size}")
    // the CDC property: the edit only disturbs chunks within the first
    // boundary's reach — every later chunk's CONTENT is reproduced
    // verbatim in the edited doc (fixed-size chunking reproduces none)
    assert(c1.tail.forall(c2.contains),
      s"post-edit chunks must be content-identical:\n${c1.tail.toSet -- c2.toSet}")
    val fixed = CorpusOps.chunkTokens(docs, chunkSize = 21, overlap = 0)
      .filter($"doc_id" isin (1L, 2L))
      .select("doc_id", "chunk_text").as[(Long, String)].collect()
    val f1 = fixed.filter(_._1 == 1L).map(_._2).toSet
    val f2 = fixed.filter(_._1 == 2L).map(_._2).toSet
    assert((f1 intersect f2).size < c1.tail.size,
      s"fixed-size should re-frame after an insertion (CDC's advantage): ${f1 intersect f2}")
    // short doc: one whole-run chunk
    assert(got.filter(_._1 == 3L).map(_._2).toSeq == Seq("a b"))
    // determinism under repartition (pure content function)
    val again = CorpusOps.chunkContentDefined(docs.repartition(5))
      .select("doc_id", "chunk_text").as[(Long, String)].collect()
    assert(got.toSet == again.toSet)
  }

  test("token chunking: stride, overlap, tail and short-doc shapes") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")),  // exact fit: no short tail
      (2L, "a b"),                                      // shorter than a chunk
      (3L, (1 to 9).map(i => s"s$i").mkString(" ")))    // short tail chunk
      .toDF("doc_id", "text")
    val got = CorpusOps.chunkTokens(docs, chunkSize = 4, overlap = 1)
      .as[(Long, Int, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(c => (c._3, c._4)).toSeq).toMap
    // doc 1 (10 toks, stride 3): 1+⌈6/3⌉ = 3 chunks at starts 0,3,6 —
    // consecutive chunks share exactly `overlap` tokens, last ends flush
    assert(got(1L) == Seq(("t1 t2 t3 t4", 4L), ("t4 t5 t6 t7", 4L),
      ("t7 t8 t9 t10", 4L)), got(1L).toString)
    assert(got(2L) == Seq(("a b", 2L)), got(2L).toString)
    // doc 3 (9 toks): 1+⌈5/3⌉ = 3 chunks, the tail runs short (s7 s8 s9)
    assert(got(3L) == Seq(("s1 s2 s3 s4", 4L), ("s4 s5 s6 s7", 4L), ("s7 s8 s9", 3L)),
      got(3L).toString)
    intercept[IllegalArgumentException] {
      CorpusOps.chunkTokens(docs, chunkSize = 4, overlap = 4)
    }
  }

  test("shard assignment: in-range, deterministic, key-functional; sharded write layout") {
    val docs = (0 until 256).map(i => (i.toLong, s"body $i")).toDF("doc_id", "text")
    val a1 = CorpusOps.assignShards(docs, 8).select("doc_id", "shard")
      .as[(Long, Int)].collect().toMap
    val a2 = CorpusOps.assignShards(docs.repartition(5), 8).select("doc_id", "shard")
      .as[(Long, Int)].collect().toMap
    assert(a1 == a2, "assignment must be partitioning-invariant")
    assert(a1.values.forall(s => s >= 0 && s < 8), "shard out of range")
    // md5 spreads: every shard populated, none hoarding (loose 3× bound)
    val sizes = a1.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.size == 8 && sizes.values.forall(n => n >= 8 && n <= 96), sizes.toMap.toString)
    val out = java.nio.file.Files.createTempDirectory("graft_shards_").toString
    CorpusOps.writeSharded(docs, 8, out)
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs.toSeq == (0 until 8).map(s => s"shard=$s"), dirs.toSeq.toString)
    // reading the layout back reproduces the assignment exactly
    val back = spark.read.parquet(out).select("doc_id", "shard")
      .as[(Long, Int)].collect().toMap
    assert(back == a1, "sharded layout diverged from the assignment")
  }

  test("contamination check counts distinct shared k-grams and skips clean docs") {
    val bench = Seq((100L, "the quick brown fox jumps high")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the quick brown fox runs far"),    // shares 2 distinct 3-grams
      (2L, "quick brown fox jumps elsewhere"), // shares 2
      (3L, "completely unrelated words only"), // clean → absent
      (4L, "the quick brown the quick brown")) // repeated gram counts ONCE
      .toDF("doc_id", "text")
    val got = DedupOps.contaminationCheck(docs, bench, k = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 4L -> 1L), got.toString)
  }

  test("packSequences: hand-computed prefix-sum bins, boundary-crossing chunks") {
    // one shard, budget 10; chunks of 4,4,4,7 tokens → starts 0,4,8,12
    // → bins 0,0,0,1; the third chunk STARTS in bin 0 at offset 8 and
    // crosses into bin 1 — the packed-stream contract
    val chunks = Seq(
      (1L, 0, 4L), (1L, 1, 4L), (2L, 0, 4L), (3L, 0, 7L))
      .toDF("doc_id", "chunk_idx", "chunk_tokens")
      .withColumn("shard", lit(0))
    val got = CorpusOps.packSequences(chunks, budgetTokens = 10)
      .select("doc_id", "chunk_idx", "bin", "bin_offset")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(got == Set((1L, 0, 0L, 0L), (1L, 1, 0L, 4L), (2L, 0, 0L, 8L), (3L, 0, 1L, 2L)),
      got.toString)
  }

  test("packSequences: shards pack independently and deterministically") {
    val chunks = Seq(
      (1L, 0, 5L, 0), (2L, 0, 5L, 1), (3L, 0, 5L, 0), (4L, 0, 5L, 1))
      .toDF("doc_id", "chunk_idx", "chunk_tokens", "shard")
    def run(df: org.apache.spark.sql.DataFrame) =
      CorpusOps.packSequences(df, budgetTokens = 8)
        .select("doc_id", "bin", "bin_offset").as[(Long, Long, Long)].collect().toSet
    val got = run(chunks)
    // each shard's stream starts at offset 0: docs 1/3 in shard 0 at
    // offsets 0/5, docs 2/4 in shard 1 at offsets 0/5
    assert(got == Set((1L, 0L, 0L), (3L, 0L, 5L), (2L, 0L, 0L), (4L, 0L, 5L)), got.toString)
    assert(got == run(chunks.repartition(7)))
  }

  test("leakage-safe split: near-dup clusters never straddle a split boundary") {
    // 20 docs; {1,2,3} chained near-dups, {10,11} a pair, rest singletons
    val docs = (1L to 20L).map(i => (i, s"unique doc body number $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = CorpusOps.leakageSafeSplit(docs, pairs)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(got.size == 20, "every doc must receive a split")
    assert(got.values.toSet.subsetOf(Set("train", "val", "test")))
    // the invariant the op exists for: each cluster is wholly in ONE split
    assert(Set(got(1L), got(2L), got(3L)).size == 1, s"cluster {1,2,3} split: $got")
    assert(got(10L) == got(11L), s"pair {10,11} split: $got")
  }

  test("leakage-safe split is deterministic and repartition-invariant") {
    val docs = (1L to 50L).map(i => (i, s"text body $i")).toDF("doc_id", "text")
    val pairs = Seq((5L, 6L)).toDF("doc_a", "doc_b")
    def run(d: org.apache.spark.sql.DataFrame) =
      CorpusOps.leakageSafeSplit(d, pairs)
        .select("doc_id", "split").as[(Long, String)].collect().toMap
    val a = run(docs)
    assert(a == run(docs.repartition(13)))
    // cuts partition the hash space: all three labels appear over enough
    // clusters (50 singletons ⇒ expected ~2.3 val, ~2.5 test)
    assert(a.values.toSet.contains("train"))
  }

  test("leakage-safe split with no pairs degrades to a pure hash split") {
    val docs = (1L to 30L).map(i => (i, s"body $i")).toDF("doc_id", "text")
    val none = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val got = CorpusOps.leakageSafeSplit(docs, none)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(got.size == 30)
  }
}
