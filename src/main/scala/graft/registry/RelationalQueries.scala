package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Joins
import graft.runtime.{Bucketing, Clustering, Sources}

/** Broad relational coverage over the TPC-H-shaped fixtures
  * (lineitem/orders/customer/nation/region, FIXTURES.md §B): the
  * reference's operator surface exercised at the fixtures' largest table
  * (lineitem, ~600k rows at sf0.1) — scan-heavy agg, multi-way
  * dimension joins, and a selective join-filter-agg, all
  * oracle-backed.
  *
  * Determinism: double sums are order-sensitive at the last few ulps —
  * outputs stay within the comparator's 1e-9 relative tolerance;
  * predicates never sit on a float boundary; no floating-point ORDER BY
  * (set-valued outputs only).
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  // Bucketed lineitem/orders pair per (session, sf dir), written ONCE —
  // the "pay the join shuffle at ingest" seam (runtime/Bucketing). Same
  // holder discipline as the ExtQueries IVF index cache: the map holds
  // the COMPUTATION, so concurrent first calls block on the winner's
  // write instead of reading a half-written table. Stale tables from a
  // previous JVM are dropped (catalog is in-memory but the warehouse dir
  // persists) before rewriting.
  private final class BucketedHolder(s: SparkSession, dir: String) {
    lazy val tables: (String, String) = {
      // sanitized name + content hash of the FULL dir string: two dirs
      // that sanitize identically (sf0.1 vs sf0_1) must not share tables
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + digest
      val li = s"bkt_lineitem_$tag"
      val ord = s"bkt_orders_$tag"
      def reset(name: String): Unit = {
        s.sql(s"DROP TABLE IF EXISTS $name")
        val loc = new java.io.File(
          s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
        graft.runtime.Fs.deleteRecursive(loc.toPath)
      }
      reset(li); reset(ord)
      val src = Sources(s, dir)
      Bucketing.writeBucketed(
        src.lineitem.select("l_orderkey", "l_extendedprice", "l_discount"),
        li, "l_orderkey", 8)
      Bucketing.writeBucketed(
        src.orders.select("o_orderkey", "o_orderpriority"),
        ord, "o_orderkey", 8)
      (li, ord)
    }
  }
  // Keyed by (session, dir), not dir alone: the holder registers tables in
  // the keying session's in-memory catalog, so a second session reusing a
  // dir-only cache entry would get names its own catalog can't resolve.
  // Each new session rebuilds (rewrites the same warehouse paths — benign
  // for serial sessions; concurrent distinct sessions on one warehouse
  // remain out of scope, as with the Materializer's single-writer rule).
  private val bucketed =
    scala.collection.mutable.LinkedHashMap[(SparkSession, String), BucketedHolder]()
  private def bucketedPair(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val holder = bucketed.synchronized {
      // drop entries for STOPPED sessions so the cache never pins a dead
      // session's object graph across a long-lived multi-session process
      bucketed.keys.filter(_._1.sparkContext.isStopped).toList.foreach(bucketed.remove)
      bucketed.getOrElseUpdate((s, dir), new BucketedHolder(s, dir))
    }
    val (li, ord) = holder.tables
    (Bucketing.read(s, li), Bucketing.read(s, ord))
  }

  // Range-clustered events copy per (session, sf dir) — the data-skipping
  // seam (runtime/Clustering): written once, time-ordered 8 ways, so the
  // range scan below reads ~1/8 of the row groups. Same holder discipline
  // as BucketedHolder.
  private final class ClusteredHolder(s: SparkSession, dir: String) {
    lazy val path: String = {
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + digest
      val out = new java.io.File(
        s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        s"clu_events_$tag").toString
      Clustering.writeClustered(
        Sources(s, dir).events.select("event_id", "ts", "user_id", "event_type"),
        out, 8, Seq("ts"))
      out
    }
  }
  private val clustered =
    scala.collection.mutable.LinkedHashMap[(SparkSession, String), ClusteredHolder]()
  private def clusteredEvents(s: SparkSession, dir: String): DataFrame = {
    val holder = clustered.synchronized {
      clustered.keys.filter(_._1.sparkContext.isStopped).toList.foreach(clustered.remove)
      clustered.getOrElseUpdate((s, dir), new ClusteredHolder(s, dir))
    }
    Clustering.read(s, holder.path)
  }

  val queries: Map[String, Q] = Map(
    // time-range scan THROUGH the clustered layout: the ts predicate is
    // evaluated against row-group min/max stats before decode, so only
    // the files whose range overlaps the 3-day window are read
    // (ClusteringSpec measures the skip; the oracle only cares that the
    // layout is semantics-preserving)
    "q_rel_clustered_scan" -> ((s, dir) =>
      clusteredEvents(s, dir)
        .filter(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-10 00:00:00")) &&
          col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-13 00:00:00")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("uniq"))),
    // TPC-H Q1-style pricing summary: the widest scan + densest agg
    "q_rel_pricing_summary" -> ((s, dir) =>
      Sources(s, dir).lineitem
        .filter(to_date(col("l_shipdate")) <= lit(java.sql.Date.valueOf("1998-09-02")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          avg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))),
    // customer geography rollup: 3-way broadcast-dim join, integer-only agg
    "q_rel_region_segments" -> ((s, dir) => {
      val src = Sources(s, dir)
      src.customer
        .join(broadcast(src.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(src.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"), col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("customers"),
          countDistinct(col("n_name")).as("nations"))
    }),
    // selective fact-dim join + revenue threshold (set-valued, no top-k
    // float ordering): urgent open orders with revenue above cutoff.
    // 250000.0 sits above the fixture's median order revenue (~190k at
    // every SF) but passes hundreds of orders at sf0.01, so the gate
    // checks real join-filter-agg rows, not just the schema.
    "q_rel_urgent_revenue" -> ((s, dir) => {
      val src = Sources(s, dir)
      val orders = src.orders.filter(col("o_orderpriority") === "1-URGENT")
      Joins.leftUsing(
        src.lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), orders,
        Seq("o_orderkey"), smallRight = true)
        .filter(col("o_orderstatus") === "O")
        .groupBy(col("o_orderkey"), col("o_custkey"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .filter(col("revenue") > 250000.0)
    }),
    // fact-fact join THROUGH the bucketed seam: both sides pre-hashed
    // 8-ways on the order key at write time, so the merge join reads
    // co-located buckets with no Exchange on either input (plan-gated in
    // BucketingSpec); the only shuffle left is the final 5-group agg.
    // The merge hint keeps the planner from sidestepping the bucketed
    // path with a small-side broadcast at test scale.
    // Revenue casts the INPUT columns to DECIMAL(18,2) before the
    // arithmetic, never the computed product: ~120k lines fold into only
    // 5 groups here, and bucket-order vs scan-order double accumulation
    // drifts past the comparator's precision — while rounding the double
    // PRODUCT to 2dp is engine-divergent at x.xx5 ties (Spark rounds the
    // shortest-string BigDecimal HALF_UP; DuckDB rounds the raw binary).
    // The stored doubles are exact-2dp values, so the input cast is
    // unambiguous in both engines and every downstream op is exact,
    // order-independent decimal arithmetic. Result cast back to double so
    // both sides stay float-typed.
    "q_rel_bucketed_join" -> ((s, dir) => {
      val (li, ord) = bucketedPair(s, dir)
      li.hint("merge").join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("revenue"),
          count(lit(1)).as("line_count"))
    }),
    // STATS-PLANNED join (Stats.statsJoinOn): ANALYZE numbers pick the
    // physical shape (broadcast/salted/plain) BEFORE any shuffle; the
    // oracle pins that whatever shape the stats chose, the rows are the
    // declaration-equivalent join's — planning must never change results
    "q_rel_stats_join" -> ((s, dir) => {
      // reuseExisting: the row measures the stats-PLANNED join, not a
      // re-ANALYZE per run — the maintenance scan is paid once per
      // session/location, the amortized shape the Stats scaladoc states
      graft.runtime.Stats.registerAndAnalyze(s, dir, Seq("lineitem", "orders"),
        reuseExisting = true)
      graft.runtime.Stats.statsJoinOn(s, "lineitem", "orders",
          Seq("l_orderkey" -> "o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("line_count"),
          countDistinct(col("l_orderkey")).as("order_count"))
    }),
  )

  val oracle: Map[String, String] = Map(
    "q_rel_clustered_scan" ->
      ("""SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS uniq
         |FROM events
         |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
         |  AND ts < TIMESTAMP '2024-01-13 00:00:00'
         |GROUP BY 1""".stripMargin),
    "q_rel_bucketed_join" ->
      ("""SELECT o_orderpriority,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
         |  count(*) AS line_count
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1""".stripMargin),
    "q_rel_stats_join" ->
      ("""SELECT o_orderpriority,
         |  count(*) AS line_count,
         |  count(DISTINCT l_orderkey) AS order_count
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1""".stripMargin),
    "q_rel_pricing_summary" ->
      ("""SELECT l_returnflag, l_linestatus,
         |  sum(l_quantity) AS sum_qty,
         |  sum(l_extendedprice) AS sum_base_price,
         |  sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
         |  avg(l_quantity) AS avg_qty,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
         |GROUP BY 1, 2""".stripMargin),
    "q_rel_region_segments" ->
      ("""SELECT r.r_name AS region, c.c_mktsegment AS segment,
         |  count(*) AS customers, count(DISTINCT n.n_name) AS nations
         |FROM customer c
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |GROUP BY 1, 2""".stripMargin),
    "q_rel_urgent_revenue" ->
      ("""SELECT l.l_orderkey AS o_orderkey, o.o_custkey,
         |  sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
         |FROM lineitem l
         |LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
         |  ON l.l_orderkey = o.o_orderkey
         |WHERE o.o_orderstatus = 'O'
         |GROUP BY 1, 2
         |HAVING sum(l.l_extendedprice * (1 - l.l_discount)) > 250000.0""".stripMargin),
  )
}
