package graft.runtime

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Tombstone deletion on [[FragmentedTable]]: O(batch-of-keys) deletes
  * that survive partial folds and purge only at the full fold.
  */
class FragmentDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-fragdel").toString

  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  private def assertSame(frag: FragmentedTable, pred: Column): Unit = {
    val expected = rowsOf(frag.read().get.filter(pred))
    val got = rowsOf(frag.readWhere(pred).get)
    assert(got == expected, s"pred $pred: $got != $expected")
  }

  test("deleteKeys removes, re-upsert resurrects, LWW order respected") {
    val frag = new FragmentedTable(spark, freshDir(), "t", "id")
    frag.upsert(Seq(("a", 1), ("b", 2), ("c", 3)).toDF("id", "v"))
    frag.deleteKeys(Seq("b", "nope").toDF("id"))
    assert(rowsOf(frag.read().get) == Set("a|1", "c|3"))
    // resurrect with a newer value
    frag.upsert(Seq(("b", 20)).toDF("id", "v"))
    assert(rowsOf(frag.read().get) == Set("a|1", "b|20", "c|3"))
    // delete again: newest wins
    frag.deleteKeys(Seq("b").toDF("id"))
    assert(rowsOf(frag.read().get) == Set("a|1", "c|3"))
  }

  test("deleteWhere deletes the keys matching the live merge") {
    val frag = new FragmentedTable(spark, freshDir(), "t", "id")
    frag.upsert(Seq(("a", 1), ("b", 200), ("c", 300)).toDF("id", "v"))
    // b was superseded below the threshold before the delete: only the
    // LIVE rows matter
    frag.upsert(Seq(("b", 2)).toDF("id", "v"))
    frag.deleteWhere(col("v") > 100)
    assert(rowsOf(frag.read().get) == Set("a|1", "b|2"))
  }

  test("partial fold keeps tombstones shadowing the un-folded base; full fold purges") {
    val dir = freshDir()
    val frag = new FragmentedTable(spark, dir, "t", "id")
    // big base holding k1; then a small run: update k2, delete k1
    frag.upsert((0 until 50000).map(i => (s"k$i", i)).toDF("id", "v"))
    frag.upsert(Seq(("k2", 100002)).toDF("id", "v"))
    frag.deleteKeys(Seq("k1").toDF("id"))
    val before = frag.read().get.count()
    assert(before == 50000 - 1)
    // tiered fold: folds the 2 small fragments, base untouched
    assert(frag.compactTiered())
    assert(frag.fragmentCount() == 2)
    assert(frag.read().get.count() == before, "tombstone lost in partial fold")
    assert(frag.read().get.filter(col("id") === "k1").count() == 0)
    assert(rowsOf(frag.read().get.filter(col("id") === "k2")) == Set("k2|100002"))
    // full fold: tombstone physically gone (no marker column on disk)
    frag.compact()
    assert(frag.fragmentCount() == 1)
    assert(frag.read().get.count() == before)
    val frags = new java.io.File(dir).list().filter(_.startsWith("t__frag_"))
    val folded = spark.read.parquet(s"$dir/${frags.head}")
    assert(!folded.columns.contains(FragmentedTable.DeletedCol),
      "full fold must purge tombstone markers from the bytes")
  }

  test("readWhere with tombstones: pruning cannot resurrect a deleted key") {
    val frag = new FragmentedTable(spark, freshDir(), "t", "id")
    // fragment 0: kX matches the predicate
    frag.upsert(Seq(("kX", 100), ("kA", 60)).toDF("id", "v"))
    // newer tombstone for kX: must remove it even though the tombstone
    // fragment has no v column for the zone probe to disprove
    frag.deleteKeys(Seq("kX").toDF("id"))
    val (res, _) = frag.readWhereReport(col("v") > 50)
    assert(rowsOf(res.get) == Set("kA|60"), rowsOf(res.get).toString)
    // battery equivalence with deletions in play
    assertSame(frag, col("v") > 0)
    assertSame(frag, col("id") === "kX")
    assertSame(frag, col("v") < 1000 || col("id") === "kA")
  }

  test("non-deterministic key conjunct is NOT pushed below the merge (no resurrection)") {
    // ADVICE r12: a key-only conjunct like `id >= <coin flip>` evaluated
    // PER FRAGMENT can drop the newest version of a key while an older
    // version survives and wins the merge — resurrecting a superseded
    // row the post-merge filter could never produce. With the
    // determinism guard the conjunct filters exactly once, above the
    // merge, so a superseded value can never appear; without it, 40
    // independently-flipped keys resurrect with probability ≈ 1.
    val frag = new FragmentedTable(spark, freshDir(), "t", "id")
    val keys = (0 until 40).map(i => f"k$i%02d")
    frag.upsert(keys.map(k => (k, 1)).toDF("id", "v"))
    frag.upsert(keys.map(k => (k, 2)).toDF("id", "v")) // supersedes all
    val coinFlip =
      col("id") >= when(rand() < 0.5, lit("a")).otherwise(lit("zzz"))
    for (_ <- 1 to 3) {
      val got = frag.readWhere(coinFlip).get.collect()
      assert(got.forall(_.getInt(1) == 2),
        s"superseded v=1 row resurrected: ${got.mkString(",")}")
    }
  }

  test("zone maps still prune around tombstones") {
    val frag = new FragmentedTable(spark, freshDir(), "t", "id")
    for (b <- 0 until 3)
      frag.upsert((0 until 50).map(i => (f"k${b * 50 + i}%03d", b * 1000 + i)).toDF("id", "v"))
    frag.deleteKeys(Seq("k010").toDF("id"))
    val (res, rep) = frag.readWhereReport(col("v") >= 2000)
    // two value-banded fragments disproven; the tombstone fragment stays
    // in the scan set (it has no v column to disprove)
    assert(rep.total == 4 && rep.scanned == 2, rep.toString)
    assert(rowsOf(res.get) == rowsOf(frag.read().get.filter(col("v") >= 2000)))
    // key-pruned probe skips the tombstone fragment too
    val (_, rep2) = frag.readWhereReport(col("id") === "k075")
    assert(rep2.keyLive == 1, rep2.toString)
  }

  test("upsert rejects the reserved tombstone column") {
    val frag = new FragmentedTable(spark, freshDir(), "t", "id")
    val bad = Seq(("a", true)).toDF("id", FragmentedTable.DeletedCol)
    intercept[IllegalArgumentException] { frag.upsert(bad) }
  }
}
