package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Size-tiered segment merging for the serving rung (r18, VERDICT r17
  * task 2): scheduled maintenance folds one whole same-size-tier shard
  * GROUP at a time — multiway, the STCS shape — so each row merges
  * O(log n) times over its lifetime (amortized bounded maintenance)
  * and fan-out stays ≤ one shard per tier (near-constant per-query
  * cost), where the full compact at a fixed cadence costs amortized
  * O(corpus) per trigger and rightly fails a decade-growth gate.
  * Crash windows ride an intent journal ([[HnswIndex.healMerge]]).
  */
class HnswMergeSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8

  private def vecs(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map { i =>
      (i.toLong, (0 until dims).map(d => math.sin(i * 31 + d * 7).toFloat))
    }.toDF("vec_id", "embedding")

  private def freshDir(): String =
    Files.createTempDirectory("graft-hnswmerge").toString

  private def liveShards(path: String): Seq[Int] = {
    val d = Paths.get(s"$path/nodes")
    val w = Files.list(d)
    try {
      val it = w.iterator()
      val b = Seq.newBuilder[Int]
      while (it.hasNext) {
        val n = it.next().getFileName.toString
        if (n.startsWith("shard=")) b += n.stripPrefix("shard=").toInt
      }
      b.result()
    } finally w.close()
  }

  // ef 256 ≥ every shard in these fixtures ⇒ the beam is exhaustive per
  // shard and answers are EXACT — parity asserts stay deterministic
  private def answers(path: String, q: org.apache.spark.sql.DataFrame, k: Int): Set[(Long, Long)] =
    HnswIndex.load(spark, path).topK(q, k, ef = 256)
      .select(col("query_id").cast("long"), col("corpus_id").cast("long"))
      .as[(Long, Long)].collect().toSet

  test("mergeOnce folds the whole same-tier group into one shard; answers unchanged; params stays monotone") {
    val path = freshDir()
    // 4 base shards of ~25 rows each — all the same size tier, so the
    // multiway merge folds ALL of them in one train
    HnswIndex.train(vecs(0 until 100), nShards = 4).save(path)
    val q = vecs(0 until 5)
    val before = answers(path, q, 3)
    assert(HnswIndex.mergeOnce(spark, path))
    assert(liveShards(path).size == 1, "the whole tier group folded into one shard")
    assert(!Files.exists(Paths.get(s"$path/merge__intent")))
    assert(answers(path, q, 3) == before)
    // id allocator advanced past the merged shard's id
    val params = spark.read.parquet(s"$path/params").collect().head
    assert(params.getInt(1) > liveShards(path).max)
    assert(!HnswIndex.mergeOnce(spark, path), "nothing left to merge")
  }

  test("the cascade leaves at most one shard per size tier and bounded fan-out") {
    val path = freshDir()
    HnswIndex.train(vecs(0 until 60), nShards = 2).save(path)
    // eight micro segments of 10 rows: one tier group, folded whole by
    // the multiway cascade
    (0 until 8).foreach { i =>
      HnswIndex.append(spark, path, vecs((60 + 10 * i) until (70 + 10 * i)))
    }
    assert(liveShards(path).size == 10)
    while (HnswIndex.mergeOnce(spark, path)) ()
    val sizes = HnswIndex.shardSizes(spark, path)
    val tiers = sizes.map { case (_, n) =>
      63 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n)) }
    assert(tiers.distinct.size == tiers.size,
      s"one shard per tier after the cascade, got $sizes")
    assert(sizes.map(_._2).sum == 140L, "no rows lost or duplicated")
    val q = vecs(0 until 5)
    // small corpus + ef 64 ⇒ exact
    val brute = SimilarityOps.bruteForceTopK(vecs(0 until 140), q, 3)
      .select(col("query_id").cast("long"), col("corpus_id").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(answers(path, q, 3) == brute)
  }

  test("a crashed merge rolls BACK when the merged shard never landed") {
    val path = freshDir()
    HnswIndex.train(vecs(0 until 100), nShards = 4).save(path)
    val before = answers(path, vecs(0 until 5), 3)
    // crash surrogate: intent recorded, target never written
    Files.write(Paths.get(s"$path/merge__intent"), "99:0,1".getBytes("UTF-8"))
    HnswIndex.healMerge(spark, path)
    assert(!Files.exists(Paths.get(s"$path/merge__intent")))
    assert(liveShards(path).sorted == Seq(0, 1, 2, 3), "sources intact")
    assert(answers(path, vecs(0 until 5), 3) == before)
  }

  private def copyDir(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    val w = Files.walk(src)
    try w.forEach { p =>
      val t = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t)
    } finally w.close()
  }

  test("a crashed merge rolls FORWARD when the merged shard landed; sources retire, params advance") {
    val path = freshDir()
    HnswIndex.train(vecs(0 until 100), nShards = 4).save(path)
    val q = vecs(0 until 5)
    val before = answers(path, q, 3)
    // crash surrogate for the worst window: the merged shard (a copy of
    // shard 0 here, so answers are checkable) landed fully, the sources
    // were not yet deleted, the params flip never ran
    copyDir(Paths.get(s"$path/nodes/shard=0"), Paths.get(s"$path/nodes/shard=4"))
    copyDir(Paths.get(s"$path/edges/shard=0"), Paths.get(s"$path/edges/shard=4"))
    Files.write(Paths.get(s"$path/merge__intent"), "4:0".getBytes("UTF-8"))
    HnswIndex.healMerge(spark, path)
    assert(!Files.exists(Paths.get(s"$path/merge__intent")))
    assert(liveShards(path).sorted == Seq(1, 2, 3, 4), "source retired, merged shard live")
    assert(spark.read.parquet(s"$path/params").collect().head.getInt(1) >= 5,
      "id allocator advanced past the merged shard")
    assert(answers(path, q, 3) == before)
  }

  test("duplicate corpus ids across shards cannot occupy two top-k slots (per-(query,corpus) collapse)") {
    val path = freshDir()
    HnswIndex.train(vecs(0 until 40), nShards = 2).save(path)
    // a second segment holding the SAME ids+vectors — every candidate
    // now reaches the merge from two shards
    HnswIndex.append(spark, path, vecs(0 until 40))
    val got = HnswIndex.load(spark, path).topK(vecs(0 until 5), k = 3, ef = 64)
      .select(col("query_id").cast("long"), col("corpus_id").cast("long"))
      .as[(Long, Long)].collect().toSeq
    assert(got.size == 15, "k=3 answers per query")
    assert(got.distinct.size == got.size, "no (query, corpus) pair twice")
    got.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.map(_._2).distinct.size == 3,
        s"query $qid got 3 DISTINCT corpus ids, not a duplicate filling slots")
    }
  }

  test("scheduled maintain on the serving facade merges instead of compacting; purge semantics preserved") {
    val path = freshDir()
    val idx = VectorIndex.build(vecs(0 until 80), path,
      IndexProfile(serving = true, exactFloor = 0L))
    assert(idx.kind == VectorIndex.Hnsw)
    (0 until 4).foreach(i => idx.append(vecs((80 + 10 * i) until (90 + 10 * i))))
    val m0 = VectorIndex.maintainCount(path)
    // one tombstone — far below the 10% pressure bound
    idx.delete(Seq(5L).toDF("vec_id"))
    idx.maintain(purge = false)
    assert(VectorIndex.maintainCount(path) == m0 + 1, "scheduled maintain counted")
    assert(Files.exists(Paths.get(s"$path/deleted")),
      "below-pressure scheduled maintain KEEPS the tombstone set (other shards may hold the id)")
    // the deleted id is invisible regardless of which shard holds it
    assert(!idx.search(vecs(5 until 6), 1)
      .filter(col("corpus_id") === 5L).head(1).nonEmpty)
    // fan-out shrank to the tiered-merge bound, never grew
    assert(HnswIndex.liveShardCount(s"$path/idx") <= 5,
      s"cascade bounds fan-out, got ${HnswIndex.liveShardCount(s"$path/idx")}")
    // the explicit purge still does the full compact + tombstone clear
    idx.maintain()
    assert(!Files.exists(Paths.get(s"$path/deleted")))
    assert(!idx.search(vecs(5 until 6), 1)
      .filter(col("corpus_id") === 5L).head(1).nonEmpty)
    assert(idx.corpusFrame.filter(col("vec_id") === 5L).isEmpty)
  }

  test("deletion pressure at/above the ratio bound escalates a scheduled maintain to the purging compact") {
    val path = freshDir()
    val idx = VectorIndex.build(vecs(0 until 50), path,
      IndexProfile(serving = true, exactFloor = 0L))
    idx.delete(Seq.range(0L, 10L).toDF("vec_id")) // 20% ≥ the 10% bound
    idx.maintain(purge = false)
    assert(!Files.exists(Paths.get(s"$path/deleted")),
      "pressure-driven scheduled maintain purges")
    assert(idx.corpusFrame.count() == 40)
  }
}
