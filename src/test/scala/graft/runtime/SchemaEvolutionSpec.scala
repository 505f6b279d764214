package graft.runtime

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import java.nio.file.Files

/** dbt's on_schema_change contract (SchemaEvolution.align) + its
  * composition through the production incremental upsert.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft-se").toString

  private val v1 = Seq(("k1", 1L), ("k2", 2L)).toDF("id", "a")
  private val v2Added = Seq(("k2", 20L, "x"), ("k3", 3L, "y")).toDF("id", "a", "b")
  private val v2Removed = Seq(("k2", "x"), ("k3", "y")).toDF("id", "b")

  test("ignore: batch-added column is not written; table schema unchanged") {
    val (p, f) = SchemaEvolution.align(v1, v2Added, SchemaChange.Ignore)
    assert(p.columns.toSeq == Seq("id", "a") && f.columns.toSeq == Seq("id", "a"))
    assert(f.as[(String, Long)].collect().toSet == Set(("k2", 20L), ("k3", 3L)))
  }

  test("ignore: type-drifted shared column is cast back to the table's type") {
    // batch carries `a` as int — the table holds long. Without the cast
    // the downstream unionByName widens the MATERIALIZED schema, which
    // violates "the table schema never changes".
    val drifted = Seq(("k2", 20), ("k3", 3)).toDF("id", "a") // a: int
    val (p, f) = SchemaEvolution.align(v1, drifted, SchemaChange.Ignore)
    assert(f.schema("a").dataType == p.schema("a").dataType)
    assert(f.as[(String, Long)].collect().toSet == Set(("k2", 20L), ("k3", 3L)))
  }

  test("ignore: LOSSY type drift errors instead of silently nulling values") {
    // string batch values cannot cast losslessly back to the table's
    // long — a plain cast would write a=null row by row
    val drifted = Seq(("k2", "abc"), ("k3", "3")).toDF("id", "a")
    val e = intercept[IllegalArgumentException] {
      SchemaEvolution.align(v1, drifted, SchemaChange.Ignore)
    }
    assert(e.getMessage.contains("losslessly"), e.getMessage)
  }

  test("ignore: batch-removed column errors (the insert cannot supply it)") {
    intercept[IllegalArgumentException] {
      SchemaEvolution.align(v1, v2Removed, SchemaChange.Ignore)
    }
  }

  test("fail: any drift aborts; identical schemas pass through") {
    intercept[IllegalArgumentException] {
      SchemaEvolution.align(v1, v2Added, SchemaChange.Fail)
    }
    intercept[IllegalArgumentException] {
      // same names, drifted type
      SchemaEvolution.align(v1, Seq(("k9", 1.5)).toDF("id", "a"), SchemaChange.Fail)
    }
    val (p, f) = SchemaEvolution.align(v1, v1.select($"a", $"id"), SchemaChange.Fail)
    assert(p.columns.toSeq == f.columns.toSeq)
  }

  test("append_new_columns: widens with typed NULLs, keeps departed columns") {
    val (p, f) = SchemaEvolution.align(v1, v2Added, SchemaChange.AppendNewColumns)
    assert(p.columns.toSeq == Seq("id", "a", "b") && f.columns.toSeq == p.columns.toSeq)
    assert(p.schema("b").dataType == f.schema("b").dataType)
    assert(p.filter($"b".isNotNull).count() == 0)
    // departed column: batch rows carry NULL for it, table keeps it
    val (p2, f2) = SchemaEvolution.align(v1, v2Removed, SchemaChange.AppendNewColumns)
    assert(p2.columns.toSeq == Seq("id", "a", "b"))
    assert(f2.filter($"a".isNotNull).count() == 0)
    assert(p2.schema("a").dataType == f2.schema("a").dataType)
  }

  test("sync_all_columns: table takes the batch schema — adds AND drops") {
    val (p, f) = SchemaEvolution.align(v1, v2Removed, SchemaChange.SyncAllColumns)
    assert(p.columns.toSeq == Seq("id", "b") && f.columns.toSeq == Seq("id", "b"))
    assert(p.filter($"b".isNotNull).count() == 0)
  }

  private def upsert(mat: Materializer, mode: SchemaChange, batch: DataFrame): DataFrame =
    mat.materialize("m", "id", mode)(_ => batch)

  test("upsert composition: append_new_columns evolves the live table across runs") {
    val mat = new Materializer(spark, freshDir())
    upsert(mat, SchemaChange.AppendNewColumns, v1)
    val t2 = upsert(mat, SchemaChange.AppendNewColumns, v2Added)
      .select("id", "a", "b").as[(String, Long, String)].collect().toSet
    // k1 untouched with NULL b, k2 replaced, k3 inserted
    assert(t2 == Set(("k1", 1L, null), ("k2", 20L, "x"), ("k3", 3L, "y")))
    // a later batch dropping `a` keeps the column, NULL for its rows
    val t3 = upsert(mat, SchemaChange.AppendNewColumns,
        Seq(("k4", "z")).toDF("id", "b"))
      .select("id", "a", "b").as[(String, Option[Long], String)].collect().toSet
    assert(t3 == Set(("k1", Some(1L), null), ("k2", Some(20L), "x"),
      ("k3", Some(3L), "y"), ("k4", None, "z")))
  }

  test("upsert composition: sync_all_columns drops the departed column for ALL rows") {
    val mat = new Materializer(spark, freshDir())
    upsert(mat, SchemaChange.SyncAllColumns, v1)
    val t = upsert(mat, SchemaChange.SyncAllColumns, v2Removed)
    assert(t.columns.toSeq == Seq("id", "b"))
    assert(t.select("id", "b").as[(String, String)].collect().toSet ==
      Set(("k1", null), ("k2", "x"), ("k3", "y")))
  }

  test("upsert composition: ignore preserves the table schema when a batch adds a column") {
    val mat = new Materializer(spark, freshDir())
    upsert(mat, SchemaChange.Ignore, v1)
    val t = upsert(mat, SchemaChange.Ignore, v2Added)
    assert(t.columns.toSeq == Seq("id", "a"))
    assert(t.select("id", "a").as[(String, Long)].collect().toSet ==
      Set(("k1", 1L), ("k2", 20L), ("k3", 3L)))
  }
}
