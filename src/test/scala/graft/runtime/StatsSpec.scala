package graft.runtime

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CBO wiring (Stats.registerAndAnalyze): analyzed catalog stats exist
  * and change planning decisions path-based reads cannot. All lookups
  * use the qualified `graft_stats.*` names so the assertions hold in
  * ANY suite order — other suites register session temp views named
  * `lineitem`/`orders` (subquery registry) that would shadow bare
  * single-part names.
  */
class StatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val db = Stats.Database

  test("ANALYZE lands exact row counts and column stats in the catalog") {
    val counts = Stats.registerAndAnalyze(spark, dir,
      Seq("lineitem", "orders", "nation", "region"))
    assert(counts(s"$db.nation") == BigInt(25) && counts(s"$db.region") == BigInt(5))
    assert(counts(s"$db.lineitem") == BigInt(spark.read.parquet(s"$dir/lineitem.parquet").count()))
    // column stats present (distinct counts drive selectivity estimates)
    val described = spark.sql(s"DESCRIBE EXTENDED $db.lineitem l_orderkey")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(described.get("distinct_count").exists(_.toLong > 0), described.toString)
  }

  test("CBO: a stats-visible tiny filtered side becomes the broadcast build side") {
    Stats.registerAndAnalyze(spark, dir, Seq("lineitem", "orders"))
    // the filter keeps a sliver of orders; only COLUMN stats let the
    // planner see that BEFORE running anything
    val q =
      s"""SELECT l.l_orderkey, o.o_totalprice
         |FROM $db.lineitem l JOIN $db.orders o ON l.l_orderkey = o.o_orderkey
         |WHERE o.o_totalprice > 450000""".stripMargin
    def initialPlan(): String = Stats.withCbo(spark) {
      spark.sql(q).queryExecution.sparkPlan.toString // pre-AQE static plan
    }
    val withStats = initialPlan()
    assert(withStats.contains("BroadcastHashJoin"),
      s"expected stats-driven broadcast, got:\n$withStats")
  }

  test("CBO join reorder: stats move the selective dimension ahead of declaration order") {
    Stats.registerAndAnalyze(spark, dir, Seq("lineitem", "orders", "customer"))
    // declaration order joins the two FACTS first, then the tiny
    // filtered slice; reorder should refuse that order
    val q =
      s"""SELECT count(*) AS n
         |FROM $db.lineitem l
         |JOIN $db.orders o ON l.l_orderkey = o.o_orderkey
         |JOIN $db.customer c ON o.o_custkey = c.c_custkey
         |WHERE c.c_mktsegment = 'BUILDING' AND c.c_acctbal > 9000""".stripMargin
    val cboPlan = Stats.withCbo(spark) {
      spark.sql(q).queryExecution.optimizedPlan.toString
    }
    val plainPlan = spark.sql(q).queryExecution.optimizedPlan.toString
    // the reordered logical tree differs from the declaration-order one
    assert(cboPlan != plainPlan, "CBO left the join order untouched")
    // and the result is unchanged by planning
    val a = Stats.withCbo(spark)(spark.sql(q).collect().head.getLong(0))
    val b = spark.sql(q).collect().head.getLong(0)
    assert(a == b && a > 0)
  }
}
