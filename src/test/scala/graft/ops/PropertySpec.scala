package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY §5.3): classifier totality/exclusivity over the
  * full input domain, surrogate-key sentinel semantics, and distinctness
  * on distinct inputs.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  // drive Gen directly with fixed seeds (scalatest/scalacheck bridge is
  // not on the offline classpath); 20 deterministic samples per property
  private def samples[A](g: Gen[A], n: Int = 20): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val mediumGen: Gen[Option[String]] = Gen.oneOf(
    Some("cpc"), Some("ppc"), Some("paidsearch"), Some("display"), Some("social"),
    Some("search"), Some("email"), Some(""), Some("unknown"), Some("paid"),
    Some("internal"), Some("referral"), Some("banner"), None)
  private val networkGen: Gen[Option[String]] =
    Gen.oneOf(Some("adwords"), Some("bing"), Some(""), None)

  test("traffic classifier is total over {paid, organic, NULL} and branch-exclusive") {
    samples(Gen.listOfN(60, Gen.zip(mediumGen, networkGen))).foreach { rows =>
      if (rows.nonEmpty) {
        val df = rows.toDF("refr_medium", "mkt_network")
        val out = df.select(
          Classify.trafficType($"refr_medium", coalesce($"mkt_network", lit(""))).as("t"),
          $"refr_medium", $"mkt_network").collect()
        out.foreach { r =>
          val t = Option(r.getString(0))
          assert(t.forall(Set("paid", "organic").contains), s"unexpected class: $r")
          // paid/organic derivable only from the documented conditions
          val medium = Option(r.getString(1))
          val net = Option(r.getString(2)).getOrElse("")
          val paidSet = Set("cpc", "ppc", "paidsearch", "display", "social",
            "search", "email", "", "unknown")
          val organicSet = Set("display", "social", "search", "email", "", "unknown")
          val expect = medium match {
            case Some(m) if (paidSet(m) && net.nonEmpty) || m == "paid" => Some("paid")
            case Some(m) if organicSet(m) && net.isEmpty => Some("organic")
            case _ => None
          }
          assert(t == expect, s"row $r: got $t expected $expect")
        }
      }
    }
  }

  test("surrogate key: NULL sentinel differs from literal empty and is stable") {
    val df = Seq((Option("a"), Option("b")), (None, Option("b")),
      (Option(""), Option("b"))).toDF("x", "y")
    val keys = df.select(Keys.surrogateKey($"x", $"y").as("k")).as[String].collect()
    assert(keys.distinct.length == 3, "NULL, empty, and value must hash apart")
  }

  test("surrogate key is injective over distinct small tuples") {
    samples(Gen.listOfN(50, Gen.zip(Gen.alphaNumStr.map(_.take(8)), Gen.choose(0, 999))), n = 5).foreach { rows =>
      val distinctRows = rows.distinct
      if (distinctRows.nonEmpty) {
        val df = distinctRows.toDF("a", "b")
        val n = df.select(Keys.surrogateKey($"a", $"b").as("k")).distinct().count()
        assert(n == distinctRows.length.toLong)
      }
    }
  }
}
