package graft.runtime

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.time.LocalDate

/** Crash-fault states for the commit protocols (VERDICT r8 ask #6):
  * each test reconstructs the EXACT on-disk state a kill at one point
  * of `commitVersion` / `commitWindowedVersion` /
  * `FragmentedTable.upsert` / the near-dup sink's two-table append
  * leaves behind — bytes landed but pointer not flipped, log advanced
  * but pointer stale, pointer flipped but GC unswept, fragment written
  * but manifest unflipped, corpus ahead of its `__sigs` side-table —
  * and proves the table stays readable AND the next ordinary operation
  * self-heals it. States are hand-built from real commits (regressing
  * the exact files the protocol writes), so each is byte-faithful to
  * the corresponding kill, including kills that an in-process throw
  * could never reproduce (the protocols' catch blocks clean up; a real
  * SIGKILL does not).
  */
class CommitFaultSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft-fault").toString

  private def rows(mat: Materializer, model: String): Set[(String, Int)] =
    spark.read.parquet(mat.outPath(model))
      .select("id", "v").as[(String, Int)].collect().toSet

  test("kill after version bytes, before any publish: orphan dir ignored, next commit sweeps it") {
    val dir = freshDir()
    val mat = new Materializer(spark, dir)
    mat.materialize("m", "id")(_ => Seq(("a", 1)).toDF("id", "v"))
    // the state commitVersion leaves if killed between result.write and
    // publishCommit: a fully-written _SUCCESS version dir that no log
    // line and no pointer names
    val orphan = "m__v_deadbeefdeadbeef"
    Seq(("ghost", 99)).toDF("id", "v")
      .write.parquet(s"$dir/$orphan")
    assert(rows(mat, "m") == Set(("a", 1)), "reader must resolve the pointer, not dir listings")
    assert(!mat.history("m").exists(_._2 == orphan), "unlogged bytes are not history")
    mat.materialize("m", "id")(_ => Seq(("b", 2)).toDF("id", "v"))
    assert(!Files.exists(Paths.get(dir, orphan)), "next commit must GC the orphan")
    assert(rows(mat, "m") == Set(("a", 1), ("b", 2)))
  }

  test("kill after log advance, before pointer flip: reads stay on the old version; retry converges") {
    val dir = freshDir()
    val mat = new Materializer(spark, dir)
    mat.materialize("m", "id")(_ => Seq(("a", 1)).toDF("id", "v"))
    val v1 = Files.readString(Paths.get(dir, "m.current")).trim
    // run the second commit for real, then regress ONLY the pointer —
    // exactly the publishCommit state between writeLog and publishPointer
    mat.materialize("m", "id")(_ => Seq(("b", 2)).toDF("id", "v"))
    Files.writeString(Paths.get(dir, "m.current"), v1)
    assert(rows(mat, "m") == Set(("a", 1)),
      "pre-kill version must still serve reads")
    // history may name the unpointed newer version (its bytes are
    // complete and retained) — time travel to it must work, not throw
    val seqs = mat.history("m").map(_._1)
    assert(mat.readVersion("m", seqs.max).count() == 2)
    // the retry is just the next materialize: converges, linear history
    mat.materialize("m", "id")(_ => Seq(("c", 3)).toDF("id", "v"))
    assert(rows(mat, "m") == Set(("a", 1), ("c", 3)),
      "retry rebuilds from the version reads actually resolved")
  }

  test("kill after pointer flip, before temp GC: stale temps swept by the next commit") {
    val dir = freshDir()
    val mat = new Materializer(spark, dir)
    mat.materialize("m", "id")(_ => Seq(("a", 1)).toDF("id", "v"))
    // pointer/log temps a kill inside the swap window strands
    Files.writeString(Paths.get(dir, "m.current__tmp_dead"), "m__v_nowhere")
    Files.writeString(Paths.get(dir, "m.versions__tmp_dead"), "9 m__v_nowhere\n")
    assert(rows(mat, "m") == Set(("a", 1)), "temps must never affect resolution")
    mat.materialize("m", "id")(_ => Seq(("b", 2)).toDF("id", "v"))
    val left = Option(new java.io.File(dir).list()).toSeq.flatten
      .filter(n => n.contains("__tmp_dead"))
    assert(left.isEmpty, s"stale temps survived the next commit: $left")
  }

  test("windowed commit killed after windata move, before _SUCCESS: version ignored, all orphans swept") {
    val begin = LocalDate.parse("2024-01-01")
    val dir = freshDir()
    val mat = new Materializer(spark, dir)
    def window(gen: Int)(lo: LocalDate, hi: LocalDate) =
      (0 until 4).map(i => (java.sql.Date.valueOf(lo), i, gen)).toDF("event_date", "i", "gen")
    mat.materializeMicrobatch("m", "event_date", begin, begin.plusDays(2))(window(1))
    val before = spark.read.parquet(mat.outPath("m")).count()
    // the state a kill leaves between the windata moves and the
    // _SUCCESS stamp: a half-assembled, unstamped version dir whose
    // links point at a freshly-moved windata generation
    val windata = Paths.get(dir, "m__windata")
    val ghost = windata.resolve("event_date=2024-01-02__v99")
    Seq((java.sql.Date.valueOf(begin.plusDays(1)), 0, 99)).toDF("event_date", "i", "gen")
      .write.parquet(ghost.toString)
    val torn = Paths.get(dir, "m__v_torncommit")
    Files.createDirectories(torn)
    Files.createSymbolicLink(torn.resolve("event_date=2024-01-02"), ghost.toAbsolutePath)
    assert(spark.read.parquet(mat.outPath("m")).count() == before,
      "unstamped version must never serve reads")
    // the retry rebuilds the window; the torn dir and its windata
    // generation are garbage the commit must sweep
    mat.rebuildMicrobatchWindow("m", "event_date", begin.plusDays(1))(window(2))
    assert(!Files.exists(torn), "unstamped version dir survived the next commit")
    assert(!Files.exists(ghost), "orphan windata generation survived GC")
    val live = spark.read.parquet(mat.outPath("m"))
      .filter($"event_date" === java.sql.Date.valueOf(begin.plusDays(1)))
    assert(live.select("gen").distinct().as[Int].collect().toSeq == Seq(2))
  }

  test("fragment written, manifest not flipped: reads unaffected; compact sweeps the orphan") {
    val dir = freshDir()
    val frag = new FragmentedTable(spark, dir, "t", "id")
    frag.upsert(Seq(("a", 1)).toDF("id", "v"))
    // the state upsert leaves if killed between the fragment write and
    // the manifest rename: a complete fragment dir no manifest line names
    val orphan = s"$dir/t__frag_deadbeef"
    Seq(("ghost", 99)).toDF("id", "v").write.parquet(orphan)
    assert(frag.read().get.select("id").as[String].collect().toSet == Set("a"),
      "readers resolve the manifest, never dir listings")
    frag.upsert(Seq(("b", 2)).toDF("id", "v"))
    assert(frag.read().get.count() == 2)
    frag.compact()
    assert(!Files.exists(Paths.get(orphan)), "compact must GC the orphan fragment")
    assert(frag.read().get.select("id").as[String].collect().toSet == Set("a", "b"))
    assert(frag.fragmentCount() == 1)
  }

  test("tiered compaction killed before the manifest flip: old layout intact, retry heals") {
    val dir = freshDir()
    val frag = new FragmentedTable(spark, dir, "t", "id")
    frag.upsert((0 until 50000).map(i => (s"k$i", i)).toDF("id", "v"))
    for (b <- 1 to 3)
      frag.upsert(Seq((s"k$b", 1000 + b)).toDF("id", "v"))
    val before = frag.read().get.collect().map(_.mkString("|")).toSet
    // the state compactTiered leaves if killed between writing the
    // folded fragment and the manifest rename: a complete folded dir no
    // manifest line names
    Seq(("folded", 1)).toDF("id", "v").write.parquet(s"$dir/t__frag_tornfold")
    assert(frag.read().get.collect().map(_.mkString("|")).toSet == before,
      "a torn tiered fold must be invisible to readers")
    // the retry folds for real and sweeps the torn attempt
    assert(frag.compactTiered())
    assert(!Files.exists(Paths.get(s"$dir/t__frag_tornfold")),
      "retry must GC the torn fold attempt")
    assert(frag.read().get.collect().map(_.mkString("|")).toSet == before)
    assert(frag.fragmentCount() == 2, "base + folded run expected")
  }

  test("tiered compaction manifest flipped but GC skipped: stale run dirs are swept later") {
    val dir = freshDir()
    val frag = new FragmentedTable(spark, dir, "t", "id")
    frag.upsert((0 until 50000).map(i => (s"k$i", i)).toDF("id", "v"))
    for (b <- 1 to 3)
      frag.upsert(Seq((s"k$b", 1000 + b)).toDF("id", "v"))
    val before = frag.read().get.collect().map(_.mkString("|")).toSet
    frag.compactTiered()
    // crash-after-flip is indistinguishable from success to readers; a
    // LEFTOVER dir from that window is any unreferenced fragment dir
    Seq(("stale", 1)).toDF("id", "v").write.parquet(s"$dir/t__frag_stalerun")
    assert(frag.read().get.collect().map(_.mkString("|")).toSet == before)
    frag.compact()
    assert(!Files.exists(Paths.get(s"$dir/t__frag_stalerun")),
      "full fold must sweep unreferenced run dirs")
    assert(frag.read().get.collect().map(_.mkString("|")).toSet == before)
  }

  test("near-dup sink killed between corpus append and __sigs append: next trigger repairs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = freshDir()
    val frag = new FragmentedTable(spark, dir, "nd", "doc_id")
    val sigs = new FragmentedTable(spark, dir, "nd__sigs", "doc_id")
    // the mid-append kill: the corpus holds a doc the side-table has
    // never signed (crash after frag.upsert, before the NEXT trigger's
    // repair ran)
    frag.upsert(Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text"))
    assert(sigs.read().isEmpty)
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.corpusIngestNearDupFragmentedSink(
      in.toDF().toDF("doc_id", "text"), frag, sigs, threshold = 0.8).start()
    try {
      // next trigger: repair signs doc 1 FIRST, so its near-dup (11) is
      // caught — the gap closed before the check ran
      in.addData((11L, "a b c d e f g h i j k"), (12L, "p1 p2 p3 p4 p5 p6"))
      q.processAllAvailable()
      val corpus = frag.read().get.select("doc_id").as[Long].collect().toSet
      assert(corpus == Set(1L, 12L), s"repair must close the sigs gap before checking: $corpus")
      assert(sigs.read().get.select("doc_id").as[Long].collect().toSet == Set(1L))
    } finally q.stop()
  }
}
