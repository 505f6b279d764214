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
    // the SAME normalized fingerprint the op keys on — a raw md5 here
    // would test a weaker equivalence than the contract states
    val exFp = existing.select(TextOps.fingerprint(col("text")).as("fp"))
    DedupOps.dedupExact(incoming)
      .join(exFp, TextOps.fingerprint(col("text")) === col("fp"), "left_anti")
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

  test("whitespace/case variants dedup (normalized fingerprint, not raw md5)") {
    val ws = Seq((21L, "Shared  DOC alpha")).toDF("doc_id", "text")
    val got = IngestOps.appendDedupExact(existing, ws)
      .select("doc_id").as[Long].collect().toSet
    assert(got.isEmpty, s"ws/case variant of an existing doc survived: $got")
  }

  test("null text rows pass through (null keys never match an anti-join)") {
    val withNulls = Seq((31L, Option("fresh doc one")), (33L, Option.empty[String]),
      (35L, Option("shared doc alpha"))).toDF("doc_id", "text")
    val got = IngestOps.appendDedupExact(existing, withNulls)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(31L, 33L), got.toString)
    // and a null on the EXISTING side dedups nothing
    val exNull = existing.unionByName(
      Seq((90L, Option.empty[String])).toDF("doc_id", "text"))
    val got2 = IngestOps.appendDedupExact(exNull, withNulls)
      .select("doc_id").as[Long].collect().toSet
    assert(got2 == Set(31L, 33L), got2.toString)
  }

  test("JSONL/CSV document drops round-trip through the explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("ingest_fmt_").toString
    try {
      val jsonl = new java.io.PrintWriter(s"$dir/docs.jsonl")
      jsonl.println("""{"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "web", "n_chars": 10}""")
      jsonl.println("""{"doc_id": 2, "text": "gamma, \"quoted\"", "lang": "de", "source": "web", "n_chars": 15}""")
      jsonl.println("""not json at all""") // corrupt line → nulls, not a crash
      jsonl.close()
      val j = IngestOps.readDocumentsJsonl(spark, s"$dir/docs.jsonl")
      assert(j.schema == IngestOps.DocumentsSchema)
      val rows = j.as[(Option[Long], Option[String], Option[String], Option[String], Option[Long])]
        .collect().toSet
      assert(rows.contains((Some(1L), Some("alpha beta"), Some("en"), Some("web"), Some(10L))))
      assert(rows.contains((Some(2L), Some("gamma, \"quoted\""), Some("de"), Some("web"), Some(15L))))
      assert(rows.exists(_._1.isEmpty), "corrupt line must surface as a null row")

      val csv = new java.io.PrintWriter(s"$dir/docs.csv")
      csv.println("doc_id,text,lang,source,n_chars")
      csv.println("1,\"alpha beta\",en,web,10")
      csv.println("2,\"gamma, \"\"quoted\"\"\",de,web,15")
      csv.close()
      val c = IngestOps.readDocumentsCsv(spark, s"$dir/docs.csv")
      val crows = c.as[(Long, String, String, String, Long)].collect().toSet
      assert(crows == Set((1L, "alpha beta", "en", "web", 10L),
        (2L, "gamma, \"quoted\"", "de", "web", 15L)), crows.toString)
      // and the raw drop feeds the dedup front door unchanged
      val got = IngestOps.appendDedupExact(existing,
          j.filter(col("doc_id").isNotNull))
        .select("doc_id").as[Long].collect().toSet
      assert(got == Set(1L, 2L))

      // ORC: round-trips, and a writer that REORDERED columns still
      // resolves by name against the declared contract
      Seq(("en", 1L, "alpha beta", 10L, "web"))
        .toDF("lang", "doc_id", "text", "n_chars", "source")
        .write.orc(s"$dir/docs_orc")
      val o = IngestOps.readDocumentsOrc(spark, s"$dir/docs_orc")
      assert(o.schema == IngestOps.DocumentsSchema)
      assert(o.as[(Long, String, String, String, Long)].collect().toSet ==
        Set((1L, "alpha beta", "en", "web", 10L)))
    } finally graft.runtime.Fs.deleteRecursive(java.nio.file.Paths.get(dir))
  }

  test("near-dup ingest: corpus near-dups dropped, in-batch near-dups collapsed, novel kept") {
    val ex = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val inc = Seq(
      (11L, "a b c d e f g h i j k"),  // jaccard 10/11 ≈ 0.909 vs corpus doc 1 → dropped
      (12L, "x y z w v u t s r q"),    // novel → kept
      (13L, "m n o p q r2 s2 t2 u2 v2"),
      (14L, "m n o p q r2 s2 t2 u2 w2"), // 9/11 vs 13 → in-batch pair, keep 13
      (15L, "x y z w v u t s r q"))    // exact dup of 12 → keep 12
      .toDF("doc_id", "text")
    val got = IngestOps.appendDedupNearDup(ex, inc, threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(12L, 13L), got.toString)
    // idempotency of the composition: once the survivors are appended,
    // re-ingesting the same batch adds nothing
    val appended = ex.unionByName(inc.filter(col("doc_id").isin(12L, 13L)))
    val again = IngestOps.appendDedupNearDup(appended, inc, threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(again.isEmpty, s"re-ingest must be fully absorbed: $again")
  }

  test("indexed near-dup ingest over a persisted signature frame matches the direct path") {
    val ex = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val inc = Seq(
      (11L, "a b c d e f g h i j k"),
      (12L, "x y z w v u t s r q"),
      (13L, "m n o p q r2 s2 t2 u2 v2"),
      (14L, "m n o p q r2 s2 t2 u2 w2"),
      (15L, "x y z w v u t s r q"))
      .toDF("doc_id", "text")
    // the side-table path: signatures built once, round-tripped through
    // parquet (what the streaming sink materializes), then the batch is
    // checked against the STORED frame — no corpus text in reach
    val dir = java.nio.file.Files.createTempDirectory("sigtab_").toString
    try {
      IngestOps.minHashSigsOf(ex).write.parquet(s"$dir/sigs")
      val sigs = spark.read.parquet(s"$dir/sigs")
      val got = IngestOps.appendDedupNearDupIndexed(sigs, inc, threshold = 0.8)
        .select("doc_id").as[Long].collect().toSet
      assert(got == Set(12L, 13L), got.toString)
      // and equals the direct (text-to-text) composition
      val direct = IngestOps.appendDedupNearDup(ex, inc, threshold = 0.8)
        .select("doc_id").as[Long].collect().toSet
      assert(got == direct, s"indexed $got vs direct $direct")
    } finally graft.runtime.Fs.deleteRecursive(java.nio.file.Paths.get(dir))
  }

  test("near-dup ingest: maxDocFreqRatio prunes corpus-wide boilerplate before banding") {
    // every corpus doc carries the same 7-token boilerplate; unique tails
    // differ. Unpruned, boilerplate alone puts every incoming doc at
    // jaccard 7/9 ≈ 0.78 to the corpus (and to its batch-mates) — the
    // hot-key flood the knob exists to stop. Pruned (df > 0.5·|corpus|),
    // the metric runs over the tails only: 12 is a true near-dup of
    // corpus doc 1 ({alpha} ≡ {alpha}), 11 ({zeta}) shares nothing.
    val boiler = "terms of service apply to all pages"
    val ex = Seq((1L, s"$boiler alpha"), (2L, s"$boiler beta")).toDF("doc_id", "text")
    val inc = Seq((11L, s"$boiler zeta"), (12L, s"$boiler alpha")).toDF("doc_id", "text")
    val unpruned = IngestOps.appendDedupNearDup(ex, inc, threshold = 0.7)
      .select("doc_id").as[Long].collect().toSet
    assert(unpruned.isEmpty,
      s"boilerplate similarity should dominate the unpruned metric: $unpruned")
    val pruned = IngestOps.appendDedupNearDup(ex, inc, threshold = 0.7,
        maxDocFreqRatio = Some(0.5))
      .select("doc_id").as[Long].collect().toSet
    assert(pruned == Set(11L), pruned.toString)
  }

  test("embedding ingest: cosine near-dups of the corpus dropped, novel kept, idempotent") {
    import VectorFixtures.synthVec
    def jig(base: Seq[Float], eps: Float): Seq[Float] =
      base.zipWithIndex.map { case (v, d) => if (d == 0) v + eps else v }
    val ex = Seq((1L, synthVec(1)), (2L, synthVec(2))).toDF("vec_id", "embedding")
    val inc = Seq(
      (11L, jig(synthVec(1), 0.01f)),  // near-dup of corpus vec 1 → dropped
      (12L, synthVec(50)),             // novel → kept
      (13L, synthVec(60)),
      (14L, jig(synthVec(60), 0.01f))) // in-batch pair → keep 13
      .toDF("vec_id", "embedding")
    val got = IngestOps.appendDedupEmbeddings(ex, inc, threshold = 0.99)
      .select("vec_id").as[Long].collect().toSet
    assert(got == Set(12L, 13L), got.toString)
    val appended = ex.unionByName(inc.filter(col("vec_id").isin(12L, 13L)))
    val again = IngestOps.appendDedupEmbeddings(appended, inc, threshold = 0.99)
      .select("vec_id").as[Long].collect().toSet
    assert(again.isEmpty, s"re-ingest must be fully absorbed: $again")
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

  test("routed near-dup dedup: driver and cluster verify regimes agree; regime flips at the threshold") {
    // VERDICT r13 #2: the r13 driver-side verify collects id + token
    // set + band keys per surviving batch doc — fine at micro-batch
    // scale, multi-GB at 10⁵-doc triggers. Above maxDriverVerifyDocs
    // the verify must fall back to cluster-side joins with IDENTICAL
    // survivors. Fixture is fully deterministic: the planted near-dups
    // are token-set-equal reorderings (Jaccard exactly 1.0 → identical
    // MinHash signatures → guaranteed band collisions), so neither
    // regime's outcome depends on the LSH probability curve.
    import graft.runtime.BucketedFragmentStore
    val wh = java.nio.file.Files.createTempDirectory("graft-ndreg").toString
    val sigStore = BucketedFragmentStore(spark, wh, "sigs", "doc_id", buckets = 2)
    val bandStore = BucketedFragmentStore(spark, wh, "bands", "__bk",
      buckets = 4, routeCol = Some("band_key"))
    val existing = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "p q r s t u v w x y")).toDF("doc_id", "text")
    val sigs = IngestOps.minHashSigsOf(existing)
    sigStore.upsert(sigs)
    bandStore.upsert(IngestOps.bandRowsOf(sigs, bands = 8, rows = 4))
    val incoming = Seq(
      (11L, "j i h g f e d c b a"),        // corpus near-dup (set-equal reorder of 1)
      (12L, "m1 m2 m3 m4 m5 m6 m7"),       // novel → kept
      (13L, "m7 m6 m5 m4 m3 m2 m1"),       // in-batch set-equal reorder of 12
      (14L, "n1 n2 n3")).toDF("doc_id", "text")
    def run(maxDocs: Int) = IngestOps.appendDedupNearDupRoutedCounted(
      keys => bandStore.readRoutedSuperset(keys),
      ids => sigStore.readWhere(col("doc_id").isin(ids: _*)),
      incoming, threshold = 0.9, maxDriverVerifyDocs = maxDocs)
    val viaDriver = run(1 << 20)
    val viaCluster = run(0)
    // the large-batch PROBE variant the sinks switch to above
    // DefaultMaxIsin: the routed bucket union (readRouted — no isin
    // literal in the probe plan) must be interchangeable with the
    // filtered point read, in both verify regimes
    def runRoutedProbe(maxDocs: Int) = IngestOps.appendDedupNearDupRoutedCounted(
      keys => bandStore.readRoutedSuperset(keys),
      ids => sigStore.readRouted(ids),
      incoming, threshold = 0.9, maxDriverVerifyDocs = maxDocs)
    val viaRoutedProbeD = runRoutedProbe(1 << 20)
    val viaRoutedProbeC = runRoutedProbe(0)
    assert(viaDriver.driverVerify, "small batch must take the driver regime")
    assert(!viaCluster.driverVerify, "over-threshold batch must take the cluster regime")
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").as[Long].collect().toSet
    val a = ids(viaDriver.survivors); val b = ids(viaCluster.survivors)
    assert(a == b, s"regime disagreement: ${a.diff(b)} vs ${b.diff(a)}")
    assert(ids(viaRoutedProbeD.survivors) == a &&
      ids(viaRoutedProbeC.survivors) == a,
      "routed-bucket probe must be interchangeable with the point read")
    viaRoutedProbeD.unpersistAll(); viaRoutedProbeC.unpersistAll()
    assert(a == Set(12L, 14L) || a == Set(13L, 14L),
      s"corpus dup 11 dropped, one of the in-batch pair kept: $a")
    assert(ids(viaDriver.sigs) == ids(viaCluster.sigs) &&
      ids(viaDriver.sigs) == a, "survivor signatures must match survivors")
    assert(viaDriver.nSurvivors == 2 && viaCluster.nSurvivors == 2)
    // regime flip in the PLAN: the driver regime's survivor plan never
    // touches the stores (the verify ran in Scala over collected rows;
    // its drop side is a local id frame), while the cluster regime's
    // drop side reads the probed PARQUET stores inside the plan. The
    // incoming fixture is itself a local relation, so the discriminator
    // is the parquet scan, not LocalTableScan presence.
    def cachedPlan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
          r.cachedPlan.toString
      }.mkString("\n")
    val dPlan = cachedPlan(viaDriver.survivors)
    val cPlan = cachedPlan(viaCluster.survivors)
    assert(!dPlan.toLowerCase.contains("parquet"),
      s"driver regime must verify driver-side, not in-plan:\n${dPlan.take(1200)}")
    assert(cPlan.toLowerCase.contains("parquet"),
      s"cluster regime must verify against the stores in-plan:\n${cPlan.take(1200)}")
    viaDriver.unpersistAll(); viaCluster.unpersistAll()
  }

  test("hamming-routed media dedup: stored near-dups drop, far sigs keep, NULL sigs ride through, within-batch collapses first") {
    // hand-planted 64-bit signatures: exact control over every distance
    val base = 0x0123456789ABCDEFL
    val exBands = IngestOps.bandRowsOfSigs(
      Seq((100L, base), (200L, 0x7777000011112222L)).toDF("doc_id", "sig"),
      bands = 8)
    // each signed doc carries exactly `bands` rows, sig riding along
    assert(exBands.count() == 16 &&
      exBands.filter(col("sig") === base).count() == 8)
    val incoming = Seq[(Long, java.lang.Long)](
      (1L, base ^ 0x7L),                // hamming 3 from stored 100 → dropped
      (2L, base ^ 0x00FF00FF00FF00FFL), // ≥ 29 from everything → kept
      (3L, (base ^ 0x7L) ^ 0x30L),      // hamming 2 from 1 → in-batch dropped
      (4L, null)                        // undecodable media: rides through
    ).toDF("doc_id", "sig")
    val probe: Seq[Long] => Option[org.apache.spark.sql.DataFrame] =
      keys => Some(exBands.filter(col("band_key").isin(keys: _*)))
    val out = IngestOps.appendDedupHammingRouted(probe, incoming, maxDist = 6)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(2L, 4L))
    out.unpersist()
    // empty corpus: within-batch collapse still applies, nothing else drops
    val out2 = IngestOps.appendDedupHammingRouted(_ => None, incoming, maxDist = 6)
    assert(out2.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 4L))
    out2.unpersist()
    // pigeonhole guard holds for the routed form too
    intercept[IllegalArgumentException] {
      IngestOps.appendDedupHammingRouted(_ => None, incoming, maxDist = 8)
    }
  }

  test("simhash-routed text tier: whitespace twins drop, survivors equal the exhaustive screen, planted radius is live") {
    // 40 tokens: enough majority-vote margin that a 2-token append
    // moves only a few bits (small sets flip ~8+ bits per edit — the
    // 9-token draft of this fixture measured d=8 for ONE added token)
    val longBase = (1 to 40).map(i => s"tok$i").mkString(" ")
    val existing = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, longBase)).toDF("doc_id", "text")
    val exSigs = DedupOps.simHash(existing)
    val exBands = IngestOps.bandRowsOfSigs(exSigs, bands = 8)
    val probe: Seq[Long] => Option[org.apache.spark.sql.DataFrame] =
      keys => Some(exBands.filter(col("band_key").isin(keys: _*)))
    val incoming = Seq(
      (11L, "alpha  beta gamma  delta "),   // whitespace re-serialization of 1
      (12L, "totally different words entirely right here"),
      (13L, longBase + " extra more") // 2-token append: measured d=2
    ).toDF("doc_id", "text")
    // INDEPENDENT oracle: exhaustive (no banding, no routing) hamming of
    // every incoming sig against every stored sig
    val inSigs = DedupOps.simHash(incoming)
    val dist = inSigs.as("i").join(exSigs.as("e"))
      .select(col("i.doc_id").as("in_id"), col("e.doc_id").as("ex_id"),
        bit_count(col("i.sig").bitwiseXOR(col("e.sig"))).as("d"))
      .as[(Long, Long, Int)].collect()
    // the planted twin must be EXACTLY hamming 0 (tokens are
    // whitespace-split + distinct: spacing can never move a bit) …
    assert(dist.find(t => t._1 == 11L && t._2 == 1L).get._3 == 0)
    // … and the 1-token addition must land INSIDE the radius, so the
    // verify distance is doing work, not just the hamming-0 fast case
    val d13 = dist.find(t => t._1 == 13L && t._2 == 2L).get._3
    assert(d13 > 0 && d13 <= 3, s"fixture must plant a 0<d<=3 near-dup, got $d13")
    val expected = Set(11L, 12L, 13L) --
      dist.filter(_._3 <= 3).map(_._1).toSet
    val out = IngestOps.appendDedupSimHashRouted(probe, incoming, maxDist = 3)
    assert(out.select("doc_id").as[Long].collect().toSet == expected)
    // the computed sig rides in the output (the corpus stores it, so
    // crash repair re-bands without re-tokenizing)
    val outSig = out.select("doc_id", "sig").as[(Long, Long)].collect().toMap
    val fresh = inSigs.as[(Long, Long)].collect().toMap
    assert(outSig == fresh.view.filterKeys(expected).toMap)
    out.unpersist()
  }

  test("routed exact dedup: isin and broadcast-join regimes agree, null-keep holds, plan flips at the threshold") {
    // VERDICT r12 #5: micro-batches keep literal isin plans; above
    // maxIsinFps the intersection must become a broadcast semi/anti
    // join — same survivors either way, including null-fingerprint rows
    val docs = graft.runtime.Sources(spark, "/root/testdata/sf0.001").documents
      .select("doc_id", "text")
    val wh = java.nio.file.Files.createTempDirectory("graft-fpreg").toString
    val fpStore = graft.runtime.BucketedFragmentStore(spark, wh, "fps", "fp",
      buckets = 4)
    fpStore.upsert(docs.filter(col("doc_id") % 2 === 0)
      .select(TextOps.fingerprint(col("text")).as("fp")).na.drop().distinct())
    // plant guaranteed corpus dups: re-id'd copies of stored texts
    val incoming = docs.filter(col("doc_id") % 2 === 1)
      .unionByName(docs.filter(col("doc_id") % 2 === 0).limit(10)
        .select((col("doc_id") + 80000).as("doc_id"), col("text")))
      .unionByName(Seq((90001L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    def run(threshold: Int) = IngestOps.appendDedupExactRouted(
      fps => fpStore.readWhere(col("fp").isin(fps: _*)),
      incoming, maxIsinFps = threshold)
    val viaIsin = run(Int.MaxValue)
    val viaJoin = run(0)
    val a = viaIsin.select("doc_id").as[Long].collect().toSet
    val b = viaJoin.select("doc_id").as[Long].collect().toSet
    assert(a == b, s"regime disagreement: ${a.diff(b)} vs ${b.diff(a)}")
    assert(a.contains(90001L), "null-text row must survive both regimes")
    assert(a.size < incoming.count(), "the store must have dropped something")
    // plan shape: inspect the pinned frames' cached subtrees — the join
    // regime carries a broadcast anti-join, the literal regime must not
    def cachedPlan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
          r.cachedPlan.toString
      }.mkString("\n")
    val joinPlan = cachedPlan(viaJoin)
    val isinPlan = cachedPlan(viaIsin)
    assert(joinPlan.contains("LeftAnti"),
      s"join regime must anti-join, got:\n${joinPlan.take(1500)}")
    assert(!isinPlan.contains("LeftAnti"),
      s"literal regime must not join, got:\n${isinPlan.take(1500)}")
    viaIsin.unpersist(); viaJoin.unpersist()
  }
}
