package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  test("each check surfaces exactly its planted violations") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), Some("b")),    // dup key 1
      (Some(2L), None),                                // null v
      (Some(3L), Some("zzz")),                         // out-of-domain v
      (None, Some("a")))                               // null key
      .toDF("k", "v")
    assert(Checks.unique(df, Seq("k")).select("k", "n")
      .as[(Option[Long], Long)].collect().toSet == Set((Some(1L), 2L)))
    assert(Checks.notNull(df, "v").count() == 1)
    // nulls pass acceptedValues (not_null's job), zzz fails
    assert(Checks.acceptedValues(df, "v", Seq("a", "b")).select("k")
      .as[Option[Long]].collect().toSeq == Seq(Some(3L)))
    val parent = Seq(1L, 2L).toDF("pk")
    // null FKs pass relationships (dbt contract); 3 is the only orphan
    assert(Checks.relationships(df, "k", parent, "pk").select("k")
      .as[Option[Long]].collect().toSeq == Seq(Some(3L)))
    val sum = Checks.summary(Seq(
        "u" -> Checks.unique(df, Seq("k")),
        "r" -> Checks.relationships(df, "k", parent, "pk")))
      .as[(String, Long)].collect().toMap
    assert(sum == Map("u" -> 1L, "r" -> 1L))
  }
}
