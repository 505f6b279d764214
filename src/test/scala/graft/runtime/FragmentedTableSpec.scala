package graft.runtime

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FragmentedTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-frag").toString

  test("fragment upserts merge last-writer-wins, equal to the Materializer over a random sequence") {
    val dir = freshDir()
    val frag = new FragmentedTable(spark, dir, "t", "id")
    val mat = new Materializer(spark, freshDir())
    val rnd = new scala.util.Random(11)
    // 6 batches of upserts over a 12-key space: overlapping keys update,
    // fresh keys insert — both stores must agree after every batch
    var expectedFrags = 0
    for (b <- 1 to 10) {
      val keys = rnd.shuffle((0 until 12).toList).take(1 + rnd.nextInt(5))
      val rows = keys.map(k => (s"k$k", b * 100 + k))
      frag.upsert(rows.toDF("id", "v"))
      expectedFrags += 1
      mat.materialize("t", "id")(_ => rows.toDF("id", "v"))
      // compaction interleaves at random points: content must be
      // invariant across the fold, and upserts continue on top of it
      if (rnd.nextInt(3) == 0) { frag.compact(); expectedFrags = 1 }
      val got = frag.read().get.as[(String, Int)].collect().toSet
      val expected = mat.readPrior("t").get.as[(String, Int)].collect().toSet
      assert(got == expected, s"batch $b: $got != $expected")
      assert(frag.fragmentCount() == expectedFrags,
        s"batch $b: ${frag.fragmentCount()} fragments, expected $expectedFrags")
    }
    // write cost stayed O(batch): live fragment dirs match the manifest
    // (no superseded dirs accumulate past a compaction)
    val frags = new java.io.File(dir).list().filter(_.startsWith("t__frag_"))
    assert(frags.length == frag.fragmentCount(), frags.mkString(","))
  }

  test("compaction folds to one fragment, preserves content, and GCs orphans") {
    val dir = freshDir()
    val frag = new FragmentedTable(spark, dir, "t", "id")
    frag.upsert(Seq(("k1", 1), ("k2", 2)).toDF("id", "v"))
    frag.upsert(Seq(("k1", 10), ("k3", 3)).toDF("id", "v"))
    // crash simulation: a fragment dir whose manifest append never
    // happened — must be invisible to reads and GC'd by compact
    Seq(("k9", 99)).toDF("id", "v").write
      .parquet(s"$dir/t__frag_orphan_deadbeef")
    val before = frag.read().get.as[(String, Int)].collect().toSet
    assert(before == Set(("k1", 10), ("k2", 2), ("k3", 3)), before.toString)
    frag.compact()
    assert(frag.fragmentCount() == 1)
    val after = frag.read().get.as[(String, Int)].collect().toSet
    assert(after == before, s"compaction changed content: $before -> $after")
    val dirs = new java.io.File(dir).list().filter(_.startsWith("t__frag_"))
    assert(dirs.length == 1, s"superseded/orphan fragments not GC'd: ${dirs.mkString(",")}")
    // upserts continue on top of the compacted base
    frag.upsert(Seq(("k2", 20)).toDF("id", "v"))
    assert(frag.read().get.as[(String, Int)].collect().toSet ==
      Set(("k1", 10), ("k2", 20), ("k3", 3)))
  }

  test("empty table reads None; fragmentCount 0") {
    val frag = new FragmentedTable(spark, freshDir(), "t", "id")
    assert(frag.read().isEmpty && frag.fragmentCount() == 0)
    frag.compact()   // no-op, no throw
    assert(frag.fragmentCount() == 0)
  }
}
