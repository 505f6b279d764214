package graft.runtime

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[PlanAudit]] detector gates: each anti-pattern the audit claims to
  * catch is manufactured deliberately and must be flagged; a clean
  * aggregation must NOT be flagged. Conf-dependent cases restore the
  * session conf in finally (shared session).
  */
class PlanAuditSpec extends SparkSpec {
  import spark.implicits._

  private val docs = () => spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  private def kinds(r: PlanAudit.Report): Set[String] =
    r.findings.map(_.kind).toSet

  test("cartesian product is flagged high") {
    val df = docs().crossJoin(Seq(1, 2, 3).toDF("n"))
    val rep = PlanAudit.audit(df)
    assert(kinds(rep).contains("cartesian-product"), rep.render)
    assert(rep.highSeverity.nonEmpty)
  }

  test("non-equi nested-loop join is flagged as cartesian family") {
    val bounds = Seq((0L, 100L), (100L, 200L)).toDF("lo", "hi")
    val df = docs().join(bounds,
      col("n_chars") >= col("lo") && col("n_chars") < col("hi"))
    assert(kinds(PlanAudit.audit(df)).contains("cartesian-product"))
  }

  test("window without PARTITION BY is flagged high; partitioned window is not") {
    val global = docs().withColumn("rn",
      row_number().over(Window.orderBy(col("doc_id"))))
    val rep = PlanAudit.audit(global)
    assert(kinds(rep).contains("single-partition-window"), rep.render)
    val partitioned = docs().withColumn("rn",
      row_number().over(Window.partitionBy(col("lang")).orderBy(col("doc_id"))))
    assert(!kinds(PlanAudit.audit(partitioned)).contains("single-partition-window"))
  }

  test("shuffle join with a broadcast-sized side is flagged when broadcasting is off") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val dim = Seq(("en", 1), ("de", 2)).toDF("lang", "rank")
      val df = docs().join(dim, Seq("lang"))
      val rep = PlanAudit.audit(df)
      assert(kinds(rep).contains("broadcastable-shuffle-join"), rep.render)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("pushable filter above a pushdown-less scan is flagged; pushed filter is not") {
    // the text source supports no filter pushdown: a pushable predicate
    // above it reads and materializes every line first
    val dir = java.nio.file.Files.createTempDirectory("graft-audit").toString
    Seq("alpha", "beta", "gamma").toDF("value").write.text(s"$dir/t")
    val df = spark.read.text(s"$dir/t").filter(col("value") === "beta")
    val rep = PlanAudit.audit(df)
    assert(kinds(rep).contains("missing-pushdown"), rep.render)
    // parquet pushes the same shape down: clean
    val rep2 = PlanAudit.audit(docs().filter(col("n_chars") > 300))
    assert(!kinds(rep2).contains("missing-pushdown"), rep2.render)
    // ... unless someone turned parquet pushdown off in conf
    val prev = spark.conf.get("spark.sql.parquet.filterPushdown")
    try {
      spark.conf.set("spark.sql.parquet.filterPushdown", "false")
      val rep3 = PlanAudit.audit(docs().filter(col("n_chars") > 300))
      assert(kinds(rep3).contains("missing-pushdown"), rep3.render)
    } finally spark.conf.set("spark.sql.parquet.filterPushdown", prev)
  }

  test("illegal-build-side joins are not flagged broadcastable") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val dim = Seq(("en", 1), ("de", 2)).toDF("lang", "rank")
      // full outer can broadcast NEITHER side: a shuffle join is already
      // the right plan, so no finding
      val fo = docs().join(dim, Seq("lang"), "full_outer")
      assert(!kinds(PlanAudit.audit(fo)).contains("broadcastable-shuffle-join"),
        PlanAudit.audit(fo).render)
      // left outer CAN build right (the small dim): flagged
      val lo = docs().join(dim, Seq("lang"), "left_outer")
      assert(kinds(PlanAudit.audit(lo)).contains("broadcastable-shuffle-join"),
        PlanAudit.audit(lo).render)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("opaque UDF is reported info") {
    val shout = udf((s: String) => if (s == null) null else s.toUpperCase)
    val df = docs().select(shout(col("lang")).as("l"))
    assert(kinds(PlanAudit.audit(df)).contains("scala-udf"))
  }

  test("enforce mode refuses a planted cartesian materialization; nothing lands") {
    val dir = java.nio.file.Files.createTempDirectory("graft-audit-enf").toString
    val mat = new Materializer(spark, dir, auditMode = PlanAudit.Mode.Enforce)
    val a = Seq((1, "x"), (2, "y")).toDF("k", "v")
    val b = Seq(("p"), ("q")).toDF("w")
    val ex = intercept[PlanAudit.PlanAuditException] {
      mat.materializeTable("bad")(a.crossJoin(b))
    }
    assert(ex.report.highSeverity.exists(_.kind == "cartesian-product"))
    // refused BEFORE any bytes: no version dir, no pointer (the OS
    // file-lock artifact is pre-write plumbing, not data)
    val leftovers = Option(new java.io.File(dir).list()).toSeq.flatten
      .filter(n => n.startsWith("bad") && !n.endsWith(".lock"))
    assert(leftovers.isEmpty, leftovers.toString)
    // the SQL-text surface funnels through the same commit seam
    a.createOrReplaceTempView("pa_enf_a")
    b.createOrReplaceTempView("pa_enf_b")
    intercept[PlanAudit.PlanAuditException] {
      mat.materializeTable("bad_sql")(
        spark.sql("SELECT * FROM pa_enf_a CROSS JOIN pa_enf_b"))
    }
    // a single-partition window (the W2 global ROW_NUMBER quirk shape)
    // is refused too — the lint catching the engine's own documented
    // scale hazard when a user opts into enforcement
    intercept[PlanAudit.PlanAuditException] {
      mat.materializeTable("bad_w")(a.withColumn("rn",
        row_number().over(Window.orderBy("k"))))
    }
    // clean plans still materialize under the same flag
    assert(mat.materializeTable("good")(a).count() == 2)
    // incremental path is gated as well (the second run's merged frame)
    intercept[PlanAudit.PlanAuditException] {
      mat.materialize("bad_incr", "k")(_ => a.crossJoin(b))
    }
  }

  test("log mode records the finding but materializes anyway; off stays silent") {
    val dir = java.nio.file.Files.createTempDirectory("graft-audit-log").toString
    val a = Seq((1, "x"), (2, "y")).toDF("k", "v")
    val b = Seq(("p"), ("q")).toDF("w")
    val matLog = new Materializer(spark, dir, auditMode = PlanAudit.Mode.Log)
    assert(matLog.materializeTable("warned")(a.crossJoin(b)).count() == 4)
    val matOff = new Materializer(spark, dir)
    assert(matOff.materializeTable("quiet")(a.crossJoin(b)).count() == 4)
  }

  test("a clean partial-aggregated groupBy has no findings and counts its shuffle") {
    val df = docs().groupBy("lang").agg(count(lit(1)).as("n"))
    val rep = PlanAudit.audit(df)
    assert(rep.findings.isEmpty, rep.render)
    assert(rep.metrics("shuffles") >= 1)
    assert(rep.metrics("file_scans") == 1)
    // the facade delegates to the same detector set
    val viaFacade = graft.Graft.audit(docs().crossJoin(Seq(1).toDF("n")))
    assert(viaFacade.findings.exists(_.kind == "cartesian-product"))
  }
}
