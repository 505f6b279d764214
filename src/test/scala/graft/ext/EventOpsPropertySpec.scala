package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the event operators: each distributed
  * implementation is compared against a direct in-memory reference on
  * random inputs — the union-tag as-of join against the naive
  * max-at-or-before scan, the bucketed interval join against the naive
  * BETWEEN filter (across random bucket widths), and the MG sketch
  * pipeline against exhaustive counting.
  */
class EventOpsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int = 8): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1234L + i)))

  private val rowGen: Gen[(Long, Long)] =
    Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 100L).map(_ * 1000000L))

  test("asOfJoin equals the naive max-at-or-before reference on random data") {
    val caseGen = Gen.zip(Gen.listOfN(15, rowGen), Gen.listOfN(15, rowGen))
    samples(caseGen).foreach { case (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, us), i) => (k, us, 1000L + i) }
      val right = rs.zipWithIndex.map { case ((k, us), i) => (k, us, 2000L + i) }
      val ldf = left.toDF("k", "us", "event_id")
        .select(col("k"), timestamp_micros(col("us")).as("ts"), col("event_id"))
      val rdf = right.toDF("k", "us", "event_id")
        .select(col("k"), timestamp_micros(col("us")).as("ts"), col("event_id"),
          col("event_id").as("matched"))
      val got = EventOps.asOfJoin(ldf, rdf, "k", "ts", "event_id", Seq("matched"))
        .select("event_id", "matched").as[(Long, Option[Long])].collect().toMap
      val want = left.map { case (k, us, id) =>
        id -> right.filter(r => r._1 == k && r._2 <= us)
          .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
      }.toMap
      assert(got == want, s"asOf mismatch\nleft=$left\nright=$right")
    }
  }

  test("intervalJoin equals the naive BETWEEN filter across bucket widths") {
    val ivGen = Gen.zip(Gen.choose(0L, 100L), Gen.choose(-5L, 40L))
      .map { case (s, len) => (s * 1000000L, (s + len) * 1000000L) } // len<0 → dropped
    val caseGen = Gen.zip(Gen.listOfN(20, Gen.choose(0L, 100L).map(_ * 1000000L)),
      Gen.listOfN(6, ivGen), Gen.oneOf(1L, 7L, 50L))
    samples(caseGen).foreach { case (pts, ivs, widthSec) =>
      val pdf = pts.zipWithIndex.map { case (us, i) => (i.toLong, us) }
        .toDF("pid", "us").select(col("pid"), timestamp_micros(col("us")).as("ts"))
      val ivdf = ivs.zipWithIndex.map { case ((s, e), i) => (100L + i, s, e) }
        .toDF("ivid", "s_us", "e_us")
        .select(col("ivid"), timestamp_micros(col("s_us")).as("s"),
          timestamp_micros(col("e_us")).as("e"))
      val got = EventOps.intervalJoin(pdf, "ts", ivdf, "s", "e", Seq("ivid"),
          widthSec * 1000000L)
        .select("pid", "ivid").as[(Long, Long)].collect().toSet
      val want = (for {
        (us, pi) <- pts.zipWithIndex
        ((s, e), ii) <- ivs.zipWithIndex
        if s <= e && us >= s && us <= e
      } yield (pi.toLong, 100L + ii)).toSet
      assert(got == want, s"interval mismatch at width=$widthSec\npts=$pts\nivs=$ivs")
    }
  }

  test("sketch heavy hitters equal exhaustive counting on random skewed streams") {
    val caseGen = Gen.zip(
      Gen.listOfN(120, Gen.frequency(
        5 -> Gen.const("hot1"), 3 -> Gen.const("hot2"),
        8 -> Gen.choose(0, 500).map(i => s"cold$i"))),
      Gen.choose(2, 8))
    samples(caseGen).foreach { case (vals, k) =>
      val got = SketchOps.heavyHitters(vals.toDF("t"), col("t"), k)
        .as[(String, Long)].collect().toSet
      val n = vals.size
      val want = vals.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * (k + 1) > n }
        .toSet.map((kv: (String, Long)) => kv)
      assert(got == want, s"heavy-hitter mismatch at k=$k: got=$got want=$want")
    }
  }
}
