package graft.runtime

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The bucketing contract: a fact-fact equi-join between two tables
  * bucketed the same way on the join key plans with ZERO Exchange — the
  * shuffle was paid at write time. Broadcast is disabled for the test so
  * the planner cannot sidestep the claim with a small-side broadcast.
  */
class BucketingSpec extends SparkSpec {

  // the session catalog is in-memory but the warehouse dir persists across
  // JVMs: drop any stale table AND its orphaned location before writing
  private def resetTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
    Fs.deleteRecursive(loc.toPath)
  }

  test("equal-bucketed fact-fact join plans without any shuffle") {
    val dir = "/root/testdata/sf0.001"
    val src = Sources(spark, dir)
    resetTable("b_lineitem")
    resetTable("b_orders")
    Bucketing.writeBucketed(
      src.lineitem.select("l_orderkey", "l_extendedprice", "l_discount"),
      "b_lineitem", "l_orderkey", 8)
    Bucketing.writeBucketed(
      src.orders.select("o_orderkey", "o_custkey", "o_orderpriority"),
      "b_orders", "o_orderkey", 8)

    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.read(spark, "b_lineitem")
        .join(Bucketing.read(spark, "b_orders"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")

      // and the result is the same rows a plain (shuffling) join produces
      val expected = src.lineitem.select("l_orderkey")
        .join(src.orders.select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("registered q_rel_bucketed_join: merge join on bucketed scans, agg is the only shuffle") {
    val df = graft.registry.RelationalQueries
      .queries("q_rel_bucketed_join")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected a merge join:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"expected exactly the post-agg Exchange, found $exchanges:\n$plan")
    // the join keys must come from bucketed table scans (bucket metadata
    // reached the planner), not plain file scans
    assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
    assert(df.count() > 0)
  }
}
