package graft.runtime

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Key-level deletion (Materializer.deleteWhere / deleteKeys): the
  * GDPR-forget maintenance op, composing with the change feed and
  * version retention.
  */
class DeletionSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft-del").toString

  private def seed(mat: Materializer): Unit =
    mat.materialize("t", "id")(_ =>
      Seq(("u1", 10), ("u2", 20), ("u3", 30), ("u4", 40)).toDF("id", "v"))

  test("deleteWhere removes exactly the matching rows via a new commit") {
    val mat = new Materializer(spark, freshDir())
    seed(mat)
    val out = mat.deleteWhere("t", $"v" >= 30)
    assert(out.select("id").as[String].collect().toSet == Set("u1", "u2"))
    // a real commit: history advanced, and the change feed reports the
    // two removals as deletes carrying their pre-image
    val seqs = mat.history("t").map(_._1)
    assert(seqs.size >= 2)
    val feed = mat.changesBetween("t", seqs(seqs.size - 2), seqs.last, "id")
    val dels = feed.filter(col(ChangeFeed.ChangeCol) === "delete")
      .select("id").as[String].collect().toSet
    assert(dels == Set("u3", "u4"))
  }

  test("NULL-valued predicate rows are retained, not silently deleted") {
    // SQL DELETE: a predicate that evaluates to NULL does not match —
    // the row must SURVIVE. Naive filter(!pred) drops it (NULL negates
    // to NULL, which filter discards).
    val mat = new Materializer(spark, freshDir())
    mat.materialize("t", "id")(_ =>
      Seq(("u1", Some(10)), ("u2", None), ("u3", Some(30))).toDF("id", "v"))
    val out = mat.deleteWhere("t", $"v" === 30)
    assert(out.select("id").as[String].collect().toSet == Set("u1", "u2"))
  }

  test("deleting zero rows is a no-op: no new version committed") {
    val mat = new Materializer(spark, freshDir())
    seed(mat)
    val before = mat.history("t").map(_._1).max
    mat.deleteWhere("t", $"v" > 999)
    assert(mat.history("t").map(_._1).max == before)
  }

  test("deleteKeys drops by distributed key set; erased rows age out of retention") {
    val mat = new Materializer(spark, freshDir(), keepVersions = 2)
    seed(mat)
    val erasure = Seq("u2", "u4", "ghost").toDF("user")
    val out = mat.deleteKeys("t", "id", erasure)
    assert(out.select("id").as[String].collect().toSet == Set("u1", "u3"))
    // the PRE-deletion commit is still readable (retention window)...
    val seqs = mat.history("t").map(_._1).sorted
    assert(mat.readVersion("t", seqs(seqs.size - 2))
      .select("id").as[String].collect().toSet.contains("u2"))
    // ...until later commits age it out — then the pre-image is GONE,
    // which is what forget-me erasure requires
    mat.materialize("t", "id")(_ => Seq(("u5", 50)).toDF("id", "v"))
    mat.materialize("t", "id")(_ => Seq(("u6", 60)).toDF("id", "v"))
    val live = mat.history("t").map(_._1).toSet
    assert(!live.contains(seqs(seqs.size - 2)))
    intercept[Exception] { mat.readVersion("t", seqs(seqs.size - 2)).collect() }
  }

  test("deleting from a missing table fails loudly") {
    val mat = new Materializer(spark, freshDir())
    intercept[IllegalStateException] { mat.deleteWhere("nope", lit(true)) }
  }
}
