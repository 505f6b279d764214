package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Rung re-selection on growth (r18, VERDICT r17 task 3): a FULL
  * maintain re-evaluates the profile against the CURRENT rows×dims and,
  * when the corpus has crossed a boundary, the rebuild it was going to
  * pay anyway becomes the migration — staged `idx__new`/`corpus__new`
  * dirs, a `kind__new` marker written last, and an idempotent commit
  * (`VectorIndex.commitMigration`) that `load` re-runs after a crash
  * anywhere inside it. Every test asserts behavior through the public
  * facade: the kind marker, search parity with brute force, and the
  * deletion contract across the flip.
  */
class RungMigrationSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8

  /** Deterministic unit-ish vectors, id-seeded, no two identical. */
  private def vecs(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map { i =>
      (i.toLong, (0 until dims).map(d =>
        math.sin(i * 31 + d * 7).toFloat))
    }.toDF("vec_id", "embedding")

  private def freshDir(): String =
    Files.createTempDirectory("graft-rungmig").toString

  private def topIds(idx: VectorIndex, q: org.apache.spark.sql.DataFrame, k: Int): Set[(Long, Long)] =
    idx.search(q, k).select(col("query_id").cast("long"), col("corpus_id").cast("long"))
      .as[(Long, Long)].collect().toSet

  private def bruteIds(corpus: org.apache.spark.sql.DataFrame,
                       q: org.apache.spark.sql.DataFrame, k: Int): Set[(Long, Long)] =
    SimilarityOps.bruteForceTopK(corpus, q, k)
      .select(col("query_id").cast("long"), col("corpus_id").cast("long"))
      .as[(Long, Long)].collect().toSet

  // budget such that 50 vectors of full precision fit (50·8·8 = 3200 B)
  // but 100 do not (6400 B), while 100 SQ8 codes (800 B) still do →
  // growth crosses Ivf → Sq exactly once
  private val ivfToSqProfile = IndexProfile(
    memoryBudgetBytes = 4000L, exactFloor = 0L, shortlist = 256)

  test("growth across the memory boundary migrates IVF → SQ8 at maintain; search stays exact-refined") {
    val path = freshDir()
    val idx = VectorIndex.build(vecs(0 until 50), path, ivfToSqProfile)
    assert(idx.kind == VectorIndex.Ivf)
    idx.append(vecs(50 until 100))
    idx.maintain()
    // the live handle re-reads the marker: no reload needed to dispatch
    assert(idx.kind == VectorIndex.Sq, "handle sees the migrated rung")
    assert(VectorIndex.load(spark, path).kind == VectorIndex.Sq)
    assert(Files.exists(Paths.get(s"$path/corpus")), "SQ8 keeps a refine corpus")
    assert(!Files.exists(Paths.get(s"$path/kind__new")), "marker consumed")
    val q = vecs(0 until 5)
    assert(topIds(idx, q, 3) == bruteIds(vecs(0 until 100), q, 3),
      "shortlist ≥ corpus ⇒ refined answers are exact")
  }

  test("serving profile crossing the exact floor migrates Brute → HNSW; corpus dir retires") {
    val path = freshDir()
    val profile = IndexProfile(serving = true, exactFloor = 60L)
    val idx = VectorIndex.build(vecs(0 until 50), path, profile)
    assert(idx.kind == VectorIndex.Brute)
    idx.append(vecs(50 until 100))
    idx.maintain()
    assert(idx.kind == VectorIndex.Hnsw)
    assert(Files.exists(Paths.get(s"$path/idx")), "graph rung landed")
    assert(!Files.exists(Paths.get(s"$path/corpus")),
      "HNSW holds vectors in its nodes; the brute corpus is retired")
    val q = vecs(0 until 5)
    // tiny corpus + default ef ⇒ the graph answers exactly
    assert(topIds(idx, q, 3) == bruteIds(vecs(0 until 100), q, 3))
  }

  test("migration is the physical purge: tombstoned ids do not survive the flip") {
    val path = freshDir()
    val idx = VectorIndex.build(vecs(0 until 50), path, ivfToSqProfile)
    idx.append(vecs(50 until 100))
    idx.delete(Seq(3L, 7L).toDF("vec_id"))
    idx.maintain()
    assert(idx.kind == VectorIndex.Sq)
    assert(!Files.exists(Paths.get(s"$path/deleted")), "tombstones cleared by the migration")
    assert(idx.corpusFrame.count() == 98)
    val q = vecs(3 until 4) // the deleted id's own vector
    assert(!topIds(idx, q, 1).exists(_._2 == 3L), "a purged id never surfaces")
  }

  test("a migration that crashes between staging and commit rolls forward at load") {
    val path = freshDir()
    val idx = VectorIndex.build(vecs(0 until 50), path, ivfToSqProfile)
    idx.append(vecs(50 until 100))
    // crash surrogate: staging completed (kind__new present), commit never ran
    idx.stageMigration(VectorIndex.Sq, idx.corpusFrame, 100L)
    assert(Files.exists(Paths.get(s"$path/kind__new")))
    assert(VectorIndex.readKindLine(path).map(_._1).contains(VectorIndex.Ivf),
      "live marker still the old rung until commit")
    val reopened = VectorIndex.load(spark, path)
    assert(reopened.kind == VectorIndex.Sq, "load rolled the staged migration forward")
    assert(!Files.exists(Paths.get(s"$path/kind__new")))
    val q = vecs(0 until 5)
    assert(topIds(reopened, q, 3) == bruteIds(vecs(0 until 100), q, 3))
  }

  test("a migration that crashes mid-commit (idx swapped, marker not flipped) still rolls forward") {
    val path = freshDir()
    val idx = VectorIndex.build(vecs(0 until 50), path, ivfToSqProfile)
    idx.append(vecs(50 until 100))
    idx.stageMigration(VectorIndex.Sq, idx.corpusFrame, 100L)
    // crash surrogate for the worst window: the idx swap completed, the
    // corpus swap and the marker flip did not
    Files.move(Paths.get(s"$path/idx"), Paths.get(s"$path/idx__old"))
    Files.move(Paths.get(s"$path/idx__new"), Paths.get(s"$path/idx"))
    val reopened = VectorIndex.load(spark, path)
    assert(reopened.kind == VectorIndex.Sq)
    assert(Files.exists(Paths.get(s"$path/corpus")), "corpus swap completed by recovery")
    assert(!Files.exists(Paths.get(s"$path/idx__old")), "backups GC'd")
    val q = vecs(0 until 5)
    assert(topIds(reopened, q, 3) == bruteIds(vecs(0 until 100), q, 3))
  }

  test("no boundary crossed ⇒ maintain keeps the rung (no spurious migration)") {
    val path = freshDir()
    val idx = VectorIndex.build(vecs(0 until 50), path, ivfToSqProfile)
    idx.append(vecs(50 until 60)) // 60·8·8 = 3840 ≤ 4000: still IVF territory
    idx.maintain()
    assert(idx.kind == VectorIndex.Ivf)
    assert(!Files.exists(Paths.get(s"$path/corpus")), "IVF never grew a corpus dir")
  }
}
