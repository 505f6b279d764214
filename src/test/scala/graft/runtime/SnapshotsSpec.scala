package graft.runtime

import graft.SparkSpec
import graft.ops.Keys
import org.apache.spark.sql.functions._

class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private val t1 = ts("2024-02-01 00:00:00")
  private val t2 = ts("2024-03-01 00:00:00")

  private type Row4 = (Long, String, java.sql.Timestamp, Option[java.sql.Timestamp])
  private def rows(df: org.apache.spark.sql.DataFrame): Set[Row4] =
    df.select(col("k"), col("v"), col("valid_from"), col("valid_to"))
      .as[Row4].collect().toSet

  test("step: first run opens every key; second run closes/keeps/inserts correctly") {
    val run1 = Snapshots.step(None,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), "k", Seq("v"), t1)
    assert(rows(run1) == Set((1L, "a", t1, None), (2L, "b", t1, None), (3L, "c", t1, None)))

    // key 1 unchanged; key 2 changed b→B; key 3 absent (stays open);
    // key 4 brand new
    val run2 = Snapshots.step(Some(run1),
      Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v"), "k", Seq("v"), t2)
    assert(rows(run2) == Set(
      (1L, "a", t1, None),          // untouched open row
      (2L, "b", t1, Some(t2)),      // closed at the change
      (2L, "B", t2, None),          // new open version
      (3L, "c", t1, None),          // absent from current → stays open
      (4L, "d", t2, None)))         // insert
    // (key, valid_from) is a unique id — the property the Materializer
    // upsert composition rests on
    assert(run2.groupBy("k", "valid_from").count().filter(col("count") > 1).count() == 0)
  }

  test("a third run only ever touches open rows; closed history is immutable") {
    val run1 = Snapshots.step(None, Seq((1L, "a")).toDF("k", "v"), "k", Seq("v"), t1)
    val run2 = Snapshots.step(Some(run1), Seq((1L, "b")).toDF("k", "v"), "k", Seq("v"), t2)
    val t3 = ts("2024-04-01 00:00:00")
    val run3 = Snapshots.step(Some(run2), Seq((1L, "c")).toDF("k", "v"), "k", Seq("v"), t3)
    assert(rows(run3) == Set(
      (1L, "a", t1, Some(t2)), (1L, "b", t2, Some(t3)), (1L, "c", t3, None)))
  }

  test("timestamp strategy: advance closes, equal/older keeps, insert opens — payload ignored") {
    val u1 = ts("2024-01-01 00:00:00"); val u2 = ts("2024-01-20 00:00:00")
    def rowsTs(df: org.apache.spark.sql.DataFrame): Set[Row4] =
      df.select(col("k"), col("v"), col("valid_from"), col("valid_to"))
        .as[Row4].collect().toSet
    val run1 = Snapshots.stepByTimestamp(None,
      Seq((1L, "a", u1), (2L, "b", u1), (3L, "c", u1)).toDF("k", "v", "u"), "k", "u")
    assert(rowsTs(run1) == Set((1L, "a", u1, None), (2L, "b", u1, None), (3L, "c", u1, None)))
    // key 1: SAME payload, newer stamp → closes + re-opens (check
    // strategy would keep — the strategies' defining divergence);
    // key 2: changed payload but EQUAL stamp → late-arrival rule ignores;
    // key 3: absent → stays open; key 4: insert
    val run2 = Snapshots.stepByTimestamp(Some(run1),
      Seq((1L, "a", u2), (2L, "CHANGED", u1), (4L, "d", u2)).toDF("k", "v", "u"), "k", "u")
    assert(rowsTs(run2) == Set(
      (1L, "a", u1, Some(u2)), (1L, "a", u2, None),
      (2L, "b", u1, None),
      (3L, "c", u1, None),
      (4L, "d", u2, None)), rowsTs(run2).toString)
    // valid stamps all came from the data — no run timestamp anywhere
  }

  test("timestamp strategy: three runs build a contiguous per-key timeline") {
    val u = (1 to 3).map(i => ts(s"2024-0$i-01 00:00:00"))
    def one(p: Option[org.apache.spark.sql.DataFrame], v: String, t: java.sql.Timestamp) =
      Snapshots.stepByTimestamp(p, Seq((1L, v, t)).toDF("k", "v", "u"), "k", "u")
    val run3 = one(Some(one(Some(one(None, "a", u(0))), "b", u(1))), "c", u(2))
    val got = run3.select(col("k"), col("v"), col("valid_from"), col("valid_to"))
      .as[Row4].collect().toSet
    assert(got == Set(
      (1L, "a", u(0), Some(u(1))), (1L, "b", u(1), Some(u(2))), (1L, "c", u(2), None)))
  }

  test("property: random run sequences keep every key's timeline contiguous") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val stateGen = Gen.mapOf(Gen.zip(Gen.choose(1L, 5L), Gen.oneOf("a", "b", "c")))
    val runsGen = Gen.listOfN(4, stateGen)
    val stamps = (1 to 4).map(i => ts(s"2024-0$i-01 00:00:00"))
    (0 until 6).flatMap(i => runsGen(Gen.Parameters.default, Seed(77L + i)))
      .foreach { runs =>
        val hist = runs.zip(stamps).foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
          case (prior, (state, t)) =>
            if (state.isEmpty) prior
            else Some(Snapshots.step(prior, state.toSeq.toDF("k", "v"), "k", Seq("v"), t))
        }
        hist.foreach { h =>
          val byKey = rows(h).toSeq.groupBy(_._1)
          byKey.foreach { case (k, versions) =>
            val sorted = versions.sortBy(_._3.getTime)
            // exactly one open row, and it is the LAST version
            assert(sorted.count(_._4.isEmpty) == 1, s"key $k: $sorted")
            assert(sorted.last._4.isEmpty, s"key $k open row not last: $sorted")
            // contiguous: each closed row's valid_to is the next valid_from
            sorted.sliding(2).foreach {
              case Seq(a, b) =>
                assert(a._4.contains(b._3), s"key $k timeline gap: $sorted")
              case _ =>
            }
            // consecutive versions always differ (a close implies a change)
            sorted.sliding(2).foreach {
              case Seq(a, b) => assert(a._2 != b._2, s"key $k no-op close: $sorted")
              case _ =>
            }
          }
        }
      }
  }

  test("snapshot steps compose with the Materializer through a (key, valid_from) id") {
    val mat = new Materializer(spark,
      java.nio.file.Files.createTempDirectory("graft_snap_").toString)
    def withId(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("id", Keys.surrogateKey(col("k"), col("valid_from")))
    mat.materialize("snap", "id")(_ =>
      withId(Snapshots.step(None, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "k", Seq("v"), t1)))
    val out = mat.materialize("snap", "id") { prior =>
      withId(Snapshots.step(prior.map(_.drop("id")),
        Seq((1L, "a"), (2L, "B")).toDF("k", "v"), "k", Seq("v"), t2))
    }
    assert(rows(out) == Set(
      (1L, "a", t1, None), (2L, "b", t1, Some(t2)), (2L, "B", t2, None)))
  }
}
