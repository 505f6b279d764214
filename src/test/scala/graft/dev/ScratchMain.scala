package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch harness (test scope, never shipped): edit freely and
  * run with `sbt "Test/runMain graft.dev.ScratchMain"` to time or explain
  * candidate plans at an arbitrary SF without touching the bench.
  */
object ScratchMain {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.runtime.Sources.bootstrap(spark)
    val src = graft.runtime.Sources(spark, sf)
    src.orders.createOrReplaceTempView("orders")
    src.lineitem.createOrReplaceTempView("lineitem")
    src.customer.createOrReplaceTempView("customer")
    src.part.createOrReplaceTempView("part")
    src.nation.createOrReplaceTempView("nation")
    src.region.createOrReplaceTempView("region")

    src.documents.createOrReplaceTempView("documents")
    src.events.createOrReplaceTempView("events")
    val qs = Map(
      "a7b_setops_all" -> """
        WITH c AS (SELECT user_id FROM events WHERE event_type = 'click' AND value > 99),
             p AS (SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 99),
             i AS (SELECT user_id FROM c INTERSECT ALL SELECT user_id FROM p),
             e AS (SELECT user_id FROM c EXCEPT ALL SELECT user_id FROM p)
        SELECT 'intersect_all' AS op, user_id, count(*) AS copies FROM i GROUP BY user_id
        UNION ALL
        SELECT 'except_all' AS op, user_id, count(*) AS copies FROM e GROUP BY user_id""",
      "f16_variant" -> """
        SELECT event_id,
          variant_get(parse_json(props), '$.k', 'bigint') AS k,
          variant_get(parse_json(props), '$.tag', 'string') AS tag
        FROM events WHERE variant_get(parse_json(props), '$.k', 'bigint') > 90""",
      "f15_try" -> """
        SELECT o_orderpriority,
          sum(try_divide(o_orderkey, nullif(o_orderkey % 3, 0))) AS div_sum,
          count(try_cast(nullif(o_orderstatus, 'O') AS INT)) AS bad_casts,
          CAST(sum(try_cast(substr(CAST(o_orderkey AS STRING), 1, 2) AS BIGINT)) AS BIGINT) AS prefix_sum
        FROM orders GROUP BY o_orderpriority""",
      "rec_tree_depth" -> """
        WITH RECURSIVE walk AS (
          SELECT doc_id, doc_id AS node, 0 AS steps FROM documents
          UNION ALL
          SELECT doc_id, CAST(node / 2 AS BIGINT) AS node, steps + 1 FROM walk WHERE node > 1
        )
        SELECT steps AS depth, count(*) AS n_docs
        FROM walk WHERE node = 1 GROUP BY 1""",
      "stats_battery" -> """
        SELECT l_returnflag,
          stddev_samp(l_quantity) AS sd_qty,
          var_samp(l_quantity) AS var_qty,
          stddev_pop(l_quantity) AS sdp_qty,
          var_pop(l_quantity) AS varp_qty,
          corr(l_quantity, l_extendedprice) AS corr_qp,
          covar_samp(l_quantity, l_extendedprice) AS cov_qp,
          covar_pop(l_quantity, l_extendedprice) AS covp_qp,
          regr_slope(l_extendedprice, l_quantity) AS slope_pq,
          regr_intercept(l_extendedprice, l_quantity) AS icept_pq,
          skewness(l_quantity) AS skew_qty,
          kurtosis(l_quantity) AS kurt_qty,
          percentile(l_quantity, 0.5) AS median_qty
        FROM lineitem GROUP BY l_returnflag""",
      "listagg" -> """
        SELECT c_mktsegment,
          listagg(c_name, ',') WITHIN GROUP (ORDER BY c_name) AS names,
          count(*) AS n
        FROM customer WHERE c_custkey % 50 = 0
        GROUP BY c_mktsegment""",
      "exists" -> """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority""",
      "not_exists" -> """
        SELECT c_mktsegment, count(*) AS customer_count
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment""",
      "not_in" -> """
        SELECT p_brand, count(*) AS part_count
        FROM part
        WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
        GROUP BY p_brand""",
      "scalar_corr" -> """
        SELECT p_brand,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_qty_revenue,
          count(*) AS line_count
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_quantity < 0.5 * (SELECT avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
        GROUP BY p_brand""",
      "scalar_uncorr" -> """
        SELECT o_orderstatus, count(*) AS big_orders
        FROM orders
        WHERE o_totalprice > 0.5 * (SELECT max(o_totalprice) FROM orders)
        GROUP BY o_orderstatus""",
      "lateral" -> """
        SELECT r_name, n_name, customer_count
        FROM region, LATERAL (
          SELECT n_name, count(c_custkey) AS customer_count
          FROM nation JOIN customer ON c_nationkey = n_nationkey
          WHERE n_regionkey = r_regionkey
          GROUP BY n_name
          ORDER BY customer_count DESC, n_name
          LIMIT 2) t""")
    for ((name, q) <- qs.toSeq.sortBy(_._1)) {
      try {
        val df = spark.sql(q)
        println(s"SCRATCH $name rows=${df.count()}")
      } catch { case e: Throwable =>
        println(s"SCRATCH $name ERROR: ${e.getMessage.linesIterator.take(3).mkString(" | ")}")
      }
    }
    spark.stop()
  }
}
