package graft.runtime

import graft.SparkSpec
import org.apache.spark.sql.types.{LongType, StringType}

/** dbt model contracts (Contract.enforce). */
class ContractSpec extends SparkSpec {
  import spark.implicits._

  private val contract = Seq(
    Contract.Col("id", StringType, notNull = true),
    Contract.Col("n", LongType))

  test("conforming build passes and comes back in contract column order") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("n", "id")
    val out = Contract.enforce(df.select($"n".cast("long"), $"id"), contract)
    assert(out.columns.toSeq == Seq("id", "n"))
    assert(out.count() == 2)
  }

  test("missing, undeclared, and mistyped columns are all named in one breach") {
    val df = Seq((1, "a", true)).toDF("n", "id", "rogue")
    val e = intercept[IllegalArgumentException] {
      Contract.enforce(df, contract) // n is int (contract: long), rogue undeclared
    }
    assert(e.getMessage.contains("rogue") && e.getMessage.contains("column n"))
    val e2 = intercept[IllegalArgumentException] {
      Contract.enforce(Seq("a").toDF("id"), contract)
    }
    assert(e2.getMessage.contains("missing column n"))
  }

  test("not_null constraint fails on null data, naming column and count") {
    val df = Seq((Some("a"), 1L), (None, 2L), (None, 3L))
      .toDF("id", "n")
    val e = intercept[IllegalArgumentException] {
      Contract.enforce(df, contract)
    }
    assert(e.getMessage.contains("not_null") && e.getMessage.contains("id") &&
      e.getMessage.contains("2 null row(s)"))
    // nulls in UNconstrained columns are fine
    val ok = Seq(("a", Some(1L)), ("b", None)).toDF("id", "n")
    assert(Contract.enforce(ok, contract).count() == 2)
  }
}
