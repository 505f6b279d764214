package graft.runtime

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** [[BucketedFragmentStore]]: content-equivalence with the flat store
  * under the same operation sequence, single-bucket point reads,
  * two-job upserts (one fragment per non-empty bucket), staging-crash
  * sweep, and cross-bucket torn-write convergence on replay.
  */
class BucketedFragmentStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-bucket").toString

  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("bucketed ≡ flat under a random upsert/delete sequence; readWhere exact") {
    val bs = BucketedFragmentStore(spark, freshDir(), "t", "id", buckets = 8)
    val flat = new FragmentedTable(spark, freshDir(), "t", "id")
    val rnd = new scala.util.Random(13)
    for (b <- 1 to 5) {
      val keys = rnd.shuffle((0 until 40).toList).take(6 + rnd.nextInt(10))
      val rows = keys.map(k => (s"k%02d".format(k), b * 100 + k))
      val df = rows.toDF("id", "v")
      bs.upsert(df); flat.upsert(df)
      if (b == 3) {
        val dels = Seq("k05", "k17", "k33").toDF("id")
        bs.deleteKeys(dels); flat.deleteKeys(dels)
      }
      val got = rowsOf(bs.read().get)
      val want = rowsOf(flat.read().get)
      assert(got == want, s"batch $b: $got != $want")
    }
    val preds: Seq[Column] = Seq(
      col("v") > 300, col("id") === "k07", col("id").isin("k01", "k05", "k25"),
      col("v") < 150 || col("id") === "k39")
    preds.foreach { p =>
      assert(rowsOf(bs.readWhere(p).get) == rowsOf(flat.read().get.filter(p)),
        p.toString)
    }
  }

  test("key-equality probe reads ONE bucket; IN-list one per value; type mismatch declines") {
    val bs = BucketedFragmentStore(spark, freshDir(), "t", "id", buckets = 16)
    bs.upsert((0 until 200).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    val (res, rep) = bs.readWhereReport(col("id") === 7L)
    assert(rep.probed.size == 1, rep.toString)
    assert(rowsOf(res.get) == Set("7|v7"))
    val (res2, rep2) = bs.readWhereReport(col("id").isin(7L, 8L, 9L))
    assert(rep2.probed.size <= 3, rep2.toString)
    assert(rowsOf(res2.get) == Set("7|v7", "8|v8", "9|v9"))
    // literal typed INT against a LONG key: wrong hash domain — must
    // decline bucket pruning (probe all), never misroute
    val (res3, rep3) = bs.readWhereReport(col("id") === 7)
    assert(rep3.probed.size == 16, rep3.toString)
    assert(rowsOf(res3.get) == Set("7|v7"))
    // non-key predicate probes all buckets, zone maps prune within
    val (_, rep4) = bs.readWhereReport(col("v") === "v7")
    assert(rep4.probed.size == 16)
  }

  test("readRoutedFrame ≡ readRouted: committed layout, mid-migration, type mismatch, nulls") {
    val bs = BucketedFragmentStore(spark, freshDir(), "t", "id", buckets = 8)
    bs.upsert((0 until 120).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    def sorted(df: Option[DataFrame]): Seq[String] =
      df.map(_.collect().map(_.mkString("|")).toSeq.sorted).getOrElse(Nil)
    val keys = Seq(3L, 44L, 97L)
    // committed layout: the frame-derived probe returns the same bucket
    // union as the literal-list probe — a superset the caller semi-joins
    assert(sorted(bs.readRoutedFrame(keys.toDF("id"))) == sorted(bs.readRouted(keys)))
    // mid-migration with a drained old bucket: frame routing must apply
    // the same old-bucket-drain rule as routeOfLiteral
    bs.rebucketStart(16)
    assert(bs.rebucketStep())
    bs.upsert((115 until 130).map(i => (i.toLong, s"w$i")).toDF("id", "v"))
    val keys2 = (0L until 130L by 7L).toSeq
    assert(sorted(bs.readRoutedFrame(keys2.toDF("id"))) == sorted(bs.readRouted(keys2)))
    while (bs.rebucketStep()) {}
    assert(sorted(bs.readRoutedFrame(keys2.toDF("id"))) == sorted(bs.readRouted(keys2)))
    // type mismatch (INT frame against a LONG key) declines to a full
    // read — same rule as the literal path, I/O not correctness
    assert(sorted(bs.readRoutedFrame(Seq(3, 44).toDF("id"))) == sorted(bs.read()))
    // a null key routes like the write path routes nulls (no crash, no
    // rows lost from the probed union)
    val withNull = Seq[java.lang.Long](3L, null).toDF("id")
    assert(sorted(bs.readRoutedFrame(withNull)).contains("3|v3"))
  }

  test("one upsert = one fragment per non-empty bucket, two Spark jobs' worth of staging") {
    val dir = freshDir()
    val bs = BucketedFragmentStore(spark, dir, "t", "id", buckets = 4)
    bs.upsert((0 until 100).map(i => (s"k$i", i)).toDF("id", "v"))
    assert(bs.fragmentCounts().forall(_ == 1), bs.fragmentCounts().toString)
    bs.upsert(Seq(("k1", 1000)).toDF("id", "v"))
    // exactly ONE bucket gained a fragment
    assert(bs.fragmentCounts().sum == 5, bs.fragmentCounts().toString)
    assert(rowsOf(bs.read().get.filter(col("id") === "k1")) == Set("k1|1000"))
    // no staging leftovers
    assert(!new java.io.File(dir).list().exists(_.contains("__staging_")))
  }

  test("crashed staging dir is swept at the next write; never visible to readers") {
    val dir = freshDir()
    val bs = BucketedFragmentStore(spark, dir, "t", "id", buckets = 4)
    bs.upsert(Seq(("a", 1)).toDF("id", "v"))
    val stale = s"$dir/t__staging_deadbeef"
    Seq(("ghost", 9)).toDF("id", "v").write.parquet(stale)
    assert(rowsOf(bs.read().get) == Set("a|1"), "staging must be invisible")
    bs.upsert(Seq(("b", 2)).toDF("id", "v"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(stale)),
      "next write must sweep dead staging")
    assert(rowsOf(bs.read().get) == Set("a|1", "b|2"))
  }

  test("cross-bucket torn adopt converges on replay") {
    val dir = freshDir()
    val bs = BucketedFragmentStore(spark, dir, "t", "id", buckets = 4)
    bs.upsert((0 until 40).map(i => (s"k$i", i)).toDF("id", "v"))
    val batch = (0 until 40 by 5).map(i => (s"k$i", 1000 + i)).toDF("id", "v")
    bs.upsert(batch)
    // manufacture the mid-adopt kill: one bucket's manifest rolled back
    // to before the batch (its fragment dir GC'd too)
    val victim = bs.fragmentCounts().zipWithIndex.find(_._1 == 2).map(_._2).get
    val mf = java.nio.file.Paths.get(dir, s"t__b$victim.fragments")
    val lines = new String(java.nio.file.Files.readAllBytes(mf), "UTF-8")
      .linesIterator.filter(_.nonEmpty).toSeq
    val dropped = lines.last.split('\t').head
    java.nio.file.Files.write(mf,
      (lines.init.mkString("\n") + "\n").getBytes("UTF-8"))
    Fs.deleteRecursive(java.nio.file.Paths.get(dir, dropped))
    // torn: some buckets saw the batch, the victim did not — still readable
    val torn = bs.read().get
    assert(torn.count() == 40)
    // replay the SAME batch: every bucket converges to the batch state
    bs.upsert(batch)
    val healed = rowsOf(bs.read().get)
    (0 until 40 by 5).foreach(i => assert(healed.contains(s"k$i|${1000 + i}"), s"k$i"))
    assert(healed.size == 40)
  }

  test("probing only empty buckets returns an EMPTY frame with the union schema, not None") {
    val bs = BucketedFragmentStore(spark, freshDir(), "t", "id", buckets = 32)
    bs.upsert(Seq((1L, "a")).toDF("id", "v"))
    // find a key routing to a bucket with no fragments
    val missing = (2L to 200L).find { k =>
      val (_, rep) = bs.readWhereReport(col("id") === k)
      rep.perBucket.values.forall(_.total == 0)
    }.get
    val res = bs.readWhere(col("id") === missing)
    assert(res.isDefined, "non-empty store must not return None")
    assert(res.get.count() == 0)
    assert(res.get.columns.toSeq == Seq("id", "v"), res.get.columns.toSeq)
  }

  test("reserved bucket-routing column is rejected in upserts") {
    val bs = BucketedFragmentStore(spark, freshDir(), "t", "id", buckets = 4)
    val bad = Seq((1L, 0)).toDF("id", "__graft_bucket")
    intercept[IllegalArgumentException] { bs.upsert(bad) }
  }

  test("meta pins the bucket count: open() restores, mismatched apply() rejects") {
    val dir = freshDir()
    val bs = BucketedFragmentStore(spark, dir, "t", "id", buckets = 8)
    bs.upsert(Seq(("a", 1)).toDF("id", "v"))
    val reopened = BucketedFragmentStore.open(spark, dir, "t", "id")
    assert(reopened.buckets == 8)
    assert(rowsOf(reopened.read().get) == Set("a|1"))
    intercept[IllegalArgumentException] {
      BucketedFragmentStore(spark, dir, "t", "id", buckets = 16)
    }
  }

  test("per-bucket maintenance: maybeCompact bounds each bucket independently") {
    val bs = BucketedFragmentStore(spark, freshDir(), "t", "id", buckets = 2)
    for (b <- 1 to 6)
      bs.upsert(Seq((s"k$b", b), (s"j$b", b)).toDF("id", "v"))
    val before = rowsOf(bs.read().get)
    assert(bs.maybeCompact(maxLivePerBucket = 2))
    assert(bs.fragmentCounts().forall(_ <= 2), bs.fragmentCounts().toString)
    assert(rowsOf(bs.read().get) == before)
  }

  test("rebucket 4→16 under interleaved upserts/deletes: content ≡ flat, routing correct") {
    val dir = freshDir()
    val bs = BucketedFragmentStore(spark, dir, "t", "id", buckets = 4)
    val flat = new FragmentedTable(spark, freshDir(), "t", "id")
    def both(f: KeyedFragmentStore => Unit): Unit = { f(bs); f(flat) }
    both(_.upsert((0 until 60).map(i => (i.toLong, s"v$i")).toDF("id", "v")))
    both(_.deleteKeys(Seq(5L, 17L).toDF("id")))
    bs.rebucketStart(16)
    assert(bs.rebucketStep(), "three old buckets must remain")
    // mid-migration: reads see everything, point probes route correctly,
    // and writes land next to the history they shadow — on BOTH sides
    // of the drain line
    both(_.upsert((55 until 70).map(i => (i.toLong, s"w$i")).toDF("id", "v")))
    both(_.deleteKeys(Seq(8L, 61L).toDF("id")))
    assert(rowsOf(bs.read().get) == rowsOf(flat.read().get))
    for (k <- Seq(3L, 8L, 59L, 66L)) {
      val got = rowsOf(bs.readWhere(col("id") === k).get)
      assert(got == rowsOf(flat.read().get.filter(col("id") === k)), s"key $k: $got")
    }
    assert(bs.rebucketStep() && bs.rebucketStep())
    assert(!bs.rebucketStep(), "fourth drain must commit the migration")
    assert(bs.buckets == 16 && bs.migrationStatus.isEmpty)
    assert(rowsOf(bs.read().get) == rowsOf(flat.read().get))
    // committed layout: point probe prunes to ONE of the 16 buckets
    val (res, rep) = bs.readWhereReport(col("id") === 30L)
    assert(rep.probed.size == 1, rep.toString)
    assert(rowsOf(res.get) == Set("30|v30"))
    // old generation fully GC'd; reopen sees the new layout
    val leftover = Option(new java.io.File(dir).list()).toSeq.flatten
      .filter(n => n.startsWith("t__b") || n == "t.rebucket")
    assert(leftover.isEmpty, leftover.toString)
    val reopened = BucketedFragmentStore.open(spark, dir, "t", "id")
    assert(reopened.buckets == 16)
    assert(rowsOf(reopened.read().get) == rowsOf(flat.read().get))
    // apply() validates against the NEW count now
    intercept[IllegalArgumentException] {
      BucketedFragmentStore(spark, dir, "t", "id", buckets = 4)
    }
    BucketedFragmentStore(spark, dir, "t", "id", buckets = 16)
  }

  test("rebucket merge 16→4 preserves content and prunes in the merged layout") {
    val bs = BucketedFragmentStore(spark, freshDir(), "t", "id", buckets = 16)
    bs.upsert((0 until 80).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    val before = rowsOf(bs.read().get)
    bs.rebucket(4)
    assert(bs.buckets == 4)
    assert(rowsOf(bs.read().get) == before)
    val (res, rep) = bs.readWhereReport(col("id") === 42L)
    assert(rep.probed.size == 1 && rowsOf(res.get) == Set("42|v42"), rep.toString)
  }

  test("killed mid-rebucket: journal resumes on open; replayed drain converges by LWW") {
    val dir = freshDir()
    val bs = BucketedFragmentStore(spark, dir, "t", "id", buckets = 4)
    bs.upsert((0 until 40).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    val want = rowsOf(bs.read().get)
    bs.rebucketStart(8)
    assert(bs.rebucketStep())
    val drained = bs.migrationStatus.get._2
    assert(drained.size == 1)
    // simulate the crash window BETWEEN a drain's adopt and its journal
    // mark: rewind the journal to done={} while the drained rows are
    // already adopted in the new generation, and re-create the old
    // bucket's content (in the real window the old bucket still exists)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "t.rebucket"),
      "8 1 \n".getBytes("UTF-8"))
    val crashed = BucketedFragmentStore.open(spark, dir, "t", "id")
    assert(crashed.migrationStatus.contains((8, Set.empty[Int])))
    // the dropped old bucket's keys: re-upsert them through the crashed
    // view (they route back to old gen) — the coming re-drain adopts
    // them AGAIN into the new generation, duplicating rows that
    // last-writer-wins must absorb
    val oldB = pmod(hash(col("id")), lit(4))
    val redo = (0 until 40).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .filter(oldB.isInCollection(drained))
    crashed.upsert(redo)
    // a DELETE in the replay window: its key was already adopted into
    // the new generation by the first (unjournaled) drain — the
    // re-drain must carry the tombstone along, or the stale copy
    // resurrects the key after commit
    val victim = redo.select("id").as[Long].head()
    val wantAfterDelete = want.filterNot(_.startsWith(s"$victim|"))
    crashed.deleteKeys(Seq(victim).toDF("id"))
    // IN the window (before any resume): reads must be duplicate-free
    // (the new generation's crash copies are non-authoritative while
    // their old bucket is undrained) and the delete must be honored
    val windowRows = rowsOf(crashed.read().get)
    assert(windowRows == wantAfterDelete,
      "crash-window read must hide non-authoritative copies and honor the delete")
    // a leaked drained-bucket artifact (crash between a journal mark
    // and its drop): the re-drain/commit sweep must remove it
    val leakDir = java.nio.file.Paths.get(dir, "t__b0__frag_orphan")
    java.nio.file.Files.createDirectories(leakDir)
    crashed.rebucket(8) // resume: same target adopts the open journal
    assert(crashed.buckets == 8 && crashed.migrationStatus.isEmpty)
    assert(!java.nio.file.Files.exists(leakDir), "drained-bucket leak not swept")
    assert(rowsOf(crashed.read().get) == wantAfterDelete,
      "replayed drain must converge and honor the replay-window delete")
    // a crash AFTER the meta flip but BEFORE the journal delete: the
    // stale journal (gen ≤ committed gen) is swept on open, not resumed
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "t.rebucket"),
      "8 1 0,1\n".getBytes("UTF-8"))
    val after = BucketedFragmentStore.open(spark, dir, "t", "id")
    assert(after.migrationStatus.isEmpty, "stale journal must sweep")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "t.rebucket")))
    assert(rowsOf(after.read().get) == wantAfterDelete)
  }

  test("maybeRebucket: cadence-driven doubling under byte pressure, one drain per tick") {
    val bs = BucketedFragmentStore(spark, freshDir(), "t", "id", buckets = 2)
    bs.upsert((0 until 50).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    val before = rowsOf(bs.read().get)
    // generous bound: no pressure, no migration
    assert(!bs.maybeRebucket(maxBytesPerBucket = 1L << 40))
    assert(bs.migrationStatus.isEmpty && bs.buckets == 2)
    // 1-byte bound: opens a doubling migration and drains one bucket
    assert(bs.maybeRebucket(maxBytesPerBucket = 1L))
    assert(bs.migrationStatus.exists(_._1 == 4))
    // reads stay correct mid-migration; each tick drains one more
    assert(rowsOf(bs.read().get) == before)
    assert(bs.maybeRebucket(1L)) // drains the second (last) old bucket
    assert(bs.buckets == 4 && bs.migrationStatus.isEmpty)
    assert(rowsOf(bs.read().get) == before)
    val (res, rep) = bs.readWhereReport(col("id") === 7L)
    assert(rep.probed.size == 1 && rowsOf(res.get) == Set("7|v7"), rep.toString)
  }

  test("lazy frame handed out before a drain step stays executable until commit") {
    val dir = freshDir()
    val bs = BucketedFragmentStore(spark, dir, "t", "id", buckets = 4)
    bs.upsert((0 until 40).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    val want = rowsOf(bs.read().get)
    val preDrain = bs.read().get // resolves the pre-migration layout lazily
    bs.rebucketStart(8)
    assert(bs.rebucketStep() && bs.rebucketStep(), "two drains, two remain")
    // cadence-driven drains must NOT GC the drained buckets' files: the
    // pre-drain frame executes only now, against the old generation
    assert(rowsOf(preDrain) == want,
      "pre-drain lazy frame must survive drain steps (deferred old-gen GC)")
    assert(Option(new java.io.File(dir).list()).toSeq.flatten
      .exists(_.startsWith("t__b")), "old generation kept until commit")
    assert(bs.rebucketStep() && !bs.rebucketStep())
    // only the COMMIT drops the old generation
    assert(!Option(new java.io.File(dir).list()).toSeq.flatten
      .exists(n => n.startsWith("t__b") && !n.startsWith("t__b__")),
      "commit must GC the old generation")
    assert(rowsOf(bs.read().get) == want)
  }

  test("nondeterministic batch mid-migration routes each row exactly once (pinned split)") {
    val bs = BucketedFragmentStore(spark, freshDir(), "t", "id", buckets = 4)
    bs.upsert((0 until 20).map(i => (s"seed$i", -1L)).toDF("id", "v"))
    bs.rebucketStart(8)
    assert(bs.rebucketStep()) // mid-migration: drained + undrained coexist
    // uuid() re-rolls per evaluation; without pinning, the complementary
    // drained/undrained filters would each see FRESH ids and route rows
    // into both generations or into neither
    val n = 200
    val batch = spark.range(n).select(expr("uuid()").as("id"), col("id").as("v"))
    bs.upsert(batch)
    val got = bs.read().get.filter(!col("id").startsWith("seed"))
    assert(got.count() == n, "every batch row lands exactly once")
    assert(got.select("v").distinct().count() == n,
      "no source row dropped or duplicated by the split")
    bs.rebucket(8)
    val after = bs.read().get.filter(!col("id").startsWith("seed"))
    assert(after.count() == n && after.select("v").distinct().count() == n)
  }

  test("readRoutedSuperset: zero-merge raw union — superseded versions and tombstone-shadowed rows resurface, marker rows never do") {
    val dir = freshDir()
    val bs = BucketedFragmentStore(spark, dir, "sup", "pk", buckets = 4,
      routeCol = Some("rk"))
    bs.upsert(Seq(("a", 1L, "v1"), ("b", 2L, "w1")).toDF("pk", "rk", "v"))
    bs.upsert(Seq(("a", 1L, "v2")).toDF("pk", "rk", "v")) // supersedes a=v1
    bs.deleteKeys(Seq(("b", 2L)).toDF("pk", "rk"))        // tombstones b
    // exact read: last-writer-wins + tombstones applied
    assert(rowsOf(bs.read().get) == Set("a|1|v2"))
    // superset read: BOTH versions of a resurface, b's shadowed row
    // resurfaces, but the tombstone MARKER row itself is dropped (no
    // __graft_deleted column leaks, no null-v marker row)
    val sup = bs.readRoutedSuperset(Seq(1L, 2L)).get
    assert(!sup.columns.contains("__graft_deleted"))
    assert(sup.count() == 3, sup.collect().mkString(","))
    assert(sup.filter(col("pk") === "a").count() == 2)
    assert(rowsOf(sup.filter(col("pk") === "b")) == Set("b|2|w1"))
    // type-mismatched route values decline to a full superset read —
    // still superset-correct, never wrong
    assert(bs.readRoutedSuperset(Seq(1)).get.count() == 3)
    // empty store: None (same contract as readRouted)
    val empty = BucketedFragmentStore(spark, freshDir(), "sup0", "pk",
      buckets = 2, routeCol = Some("rk"))
    assert(empty.readRoutedSuperset(Seq(1L)).isEmpty)
  }

  test("readWhere key-pushdown: key-only predicates prune below the merge without changing LWW or tombstone semantics") {
    val dir = freshDir()
    val bs = BucketedFragmentStore(spark, dir, "kp", "pk", buckets = 2)
    bs.upsert((0 until 40).map(i => (i.toLong, s"v$i")).toDF("pk", "v"))
    bs.upsert(Seq((7L, "NEW")).toDF("pk", "v"))   // supersede 7
    bs.deleteKeys(Seq(9L).toDF("pk"))             // tombstone 9
    bs.upsert((40 until 60).map(i => (i.toLong, s"v$i")).toDF("pk", "v"))
    // multi-fragment buckets: the In conjunct pushes into every
    // fragment scan; winners must still be the newest version, and the
    // tombstoned key must stay gone
    val hit = bs.readWhere(col("pk").isin(7L, 9L, 41L, 3L)).get
      .select("pk", "v").as[(Long, String)].collect().toMap
    assert(hit == Map(7L -> "NEW", 41L -> "v41", 3L -> "v3"), hit.toString)
    // a mixed predicate (key conjunct + data conjunct): the data
    // conjunct must NOT prune the merge — the newest version of 7
    // fails v="v7" and 7 is correctly ABSENT, not resurrected
    val mixed = bs.readWhere(col("pk").isin(7L, 8L) && col("v").startsWith("v")).get
      .select("pk").as[Long].collect().toSet
    assert(mixed == Set(8L), mixed.toString)
  }

  test("route-by-column store: probes route on routeCol, LWW stays on uniqueKey, meta pins the route") {
    val dir = freshDir()
    val bs = BucketedFragmentStore(spark, dir, "inv", "pk", buckets = 8,
      routeCol = Some("rk"))
    // an inverted-index shape: many pks share a route value
    val batch = (0 until 60).map(i => (s"p$i", (i % 6).toLong, s"v$i"))
      .toDF("pk", "rk", "v")
    bs.upsert(batch)
    // all rows of one route value live in ONE bucket (a key-equality
    // probe on rk reads exactly it)
    val (res, rep) = bs.readWhereReport(col("rk") === 3L)
    assert(rep.probed.size == 1, rep.toString)
    assert(res.get.count() == 10)
    // LWW is still per-pk: re-upserting one pk (same rk — the contract)
    // replaces, not duplicates
    bs.upsert(Seq(("p3", 3L, "NEW")).toDF("pk", "rk", "v"))
    assert(rowsOf(bs.read().get.filter(col("pk") === "p3")) == Set("p3|3|NEW"))
    // readRouted unions only the target buckets; superset contract
    val routed = bs.readRouted(Seq(1L, 4L)).get
    assert(routed.filter(col("rk").isin(1L, 4L)).count() == 20)
    // type-mismatched values decline to a full read — correct, not wrong
    assert(bs.readRouted(Seq(1)).get.count() == 60)
    // deleteKeys requires the route column (tombstones must co-locate)
    intercept[IllegalArgumentException] { bs.deleteKeys(Seq("p5").toDF("pk")) }
    bs.deleteKeys(Seq(("p5", 5L)).toDF("pk", "rk"))
    assert(bs.read().get.filter(col("pk") === "p5").count() == 0)
    // reopen restores the routing column from the meta; a conflicting
    // apply is rejected like a conflicting bucket count
    val reopened = BucketedFragmentStore.open(spark, dir, "inv", "pk")
    assert(reopened.routeCol == "rk")
    val (_, rep2) = reopened.readWhereReport(col("rk") === 3L)
    assert(rep2.probed.size == 1)
    intercept[IllegalArgumentException] {
      BucketedFragmentStore(spark, dir, "inv", "pk", buckets = 8)
    }
    // rebucket carries the route: migration re-routes by rk
    reopened.rebucket(4)
    val (res3, rep3) = reopened.readWhereReport(col("rk") === 3L)
    assert(rep3.probed.size == 1 && res3.get.count() == 10)
    assert(BucketedFragmentStore.open(spark, dir, "inv", "pk").routeCol == "rk")
  }

  test("maybeRebucket shrink: halves under the byte floor, drain/journal protocol, hysteresis enforced") {
    val dir = freshDir()
    val bs = BucketedFragmentStore(spark, dir, "t", "id", buckets = 16)
    bs.upsert((0 until 200).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    val before = rowsOf(bs.read().get)
    // floor must sit at <= max/4 (a just-halved store would re-trip)
    intercept[IllegalArgumentException] { bs.maybeRebucket(100L, 50L) }
    // generous max, tiny floor: no pressure either way
    assert(!bs.maybeRebucket(1L << 40, 1L))
    assert(bs.buckets == 16 && bs.migrationStatus.isEmpty)
    // huge floor (under max/4): opens a HALVING migration, one drain per
    // tick, interleaved upserts stay correct
    val max = 1L << 40
    assert(bs.maybeRebucket(max, max / 4))
    assert(bs.migrationStatus.exists(_._1 == 8), bs.migrationStatus.toString)
    bs.upsert(Seq((500L, "mid")).toDF("id", "v"))
    var guard = 0
    while (bs.migrationStatus.nonEmpty && guard < 20) {
      bs.maybeRebucket(max, max / 4); guard += 1
    }
    // 16 -> 8 -> (floor still holds) -> 4 -> 2 -> 1: shrink repeats
    // until the floor releases or a single bucket remains; each step
    // keeps content intact. Stop the cascade by dropping the floor.
    assert(bs.buckets < 16, s"shrink must have committed, got ${bs.buckets}")
    assert(rowsOf(bs.read().get) == before + "500|mid")
    // kill-state: reopen mid-shrink resumes from the journal
    val dir2 = freshDir()
    val bs2 = BucketedFragmentStore(spark, dir2, "t", "id", buckets = 16)
    bs2.upsert((0 until 80).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    val want2 = rowsOf(bs2.read().get)
    assert(bs2.maybeRebucket(max, max / 4)) // opens 16->8, drains one
    assert(bs2.migrationStatus.exists(m => m._1 == 8 && m._2.size == 1))
    val resumed = BucketedFragmentStore.open(spark, dir2, "t", "id")
    assert(resumed.migrationStatus.exists(_._1 == 8), "journal must resume")
    resumed.rebucket(8)
    assert(resumed.buckets == 8 && rowsOf(resumed.read().get) == want2)
  }

  test("rebucketStart rejects a conflicting target while a migration is open") {
    val bs = BucketedFragmentStore(spark, freshDir(), "t", "id", buckets = 4)
    bs.upsert(Seq((1L, "a")).toDF("id", "v"))
    bs.rebucketStart(8)
    intercept[IllegalArgumentException](bs.rebucketStart(16))
    bs.rebucketStart(8) // same target: resume, not error
    bs.rebucket(8)
    assert(bs.buckets == 8)
    intercept[IllegalArgumentException](bs.rebucketStart(8)) // no-op target
  }
}
