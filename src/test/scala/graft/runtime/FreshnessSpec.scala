package graft.runtime

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Freshness gate edges not exercised by the oracle row
  * (q_source_freshness covers the pass/warn/error ladder).
  */
class FreshnessSpec extends SparkSpec {
  import spark.implicits._

  test("empty source (no max loaded_at) is an error, not a crash") {
    val asOf = Timestamp.valueOf("2024-06-01 00:00:00")
    val empty = Seq.empty[(Timestamp, Int)].toDF("loaded_at", "v")
    val r = Freshness.check(empty, "loaded_at", "s", asOf, 60, 3600).collect().head
    assert(r.getAs[String]("status") == "error")
  }

  test("summary of zero checks fails with a descriptive message") {
    val e = intercept[IllegalArgumentException] { Freshness.summary(Nil) }
    assert(e.getMessage.contains("no checks supplied"))
  }
}
