package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  test("MisraGries reduce: free counter, increment, decrement-all paths") {
    val mg = new SketchOps.MisraGries(2)
    var b = mg.zero
    b = mg.reduce(b, "a")              // free counter
    b = mg.reduce(b, "a")              // increment
    b = mg.reduce(b, "b")              // second free counter
    assert(b == Map("a" -> 2L, "b" -> 1L))
    b = mg.reduce(b, "c")              // full + unseen → decrement all, drop zeros
    assert(b == Map("a" -> 1L))
  }

  test("MisraGries merge: sums counterparts, prunes by the (k+1)-th largest") {
    val mg = new SketchOps.MisraGries(2)
    val merged = mg.merge(Map("a" -> 5L, "b" -> 3L), Map("b" -> 2L, "c" -> 2L))
    // summed: a=5 b=5 c=2 → 3 entries > k=2 → subtract 3rd largest (2):
    assert(merged == Map("a" -> 3L, "b" -> 3L))
  }

  test("guarantee: a key above N/(k+1) always survives an adversarial stream") {
    // 300 copies of HOT drowned in 900 distinct singletons, N=1200, k=7:
    // threshold N/(k+1)=150 < 300, so HOT must survive any arrival order
    val rows = (Seq.fill(300)("HOT") ++ (1 to 900).map(i => s"u$i"))
    val shuffled = new scala.util.Random(42).shuffle(rows)
    for (parts <- Seq(1, 7)) {
      val df = shuffled.toDF("t").repartition(parts)
      val cand = SketchOps.heavyHitterCandidates(df, col("t"), 7)
        .as[String].collect().toSet
      assert(cand.contains("HOT"), s"HOT lost at $parts partitions: $cand")
    }
  }

  test("thresholded heavy hitters are exact and partition-invariant") {
    // candidate SETS may differ with partitioning; the re-counted,
    // thresholded OUTPUT may not — that is the oracle-facing contract
    val rows = Seq.fill(40)("x") ++ Seq.fill(25)("y") ++ (1 to 60).map(i => s"u$i")
    val expected = Set(("x", 40L), ("y", 25L))  // N=125, k=9 → f·10 > 125
    for (parts <- Seq(1, 3, 11)) {
      val df = new scala.util.Random(7).shuffle(rows).toDF("t").repartition(parts)
      val got = SketchOps.heavyHitters(df, col("t"), 9)
        .as[(String, Long)].collect().toSet
      assert(got == expected, s"at $parts partitions: $got")
    }
  }
}
