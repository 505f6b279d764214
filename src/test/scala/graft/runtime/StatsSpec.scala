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

  test("decideJoin flips with the stats, not the call site") {
    import Stats.decideJoin
    // tiny right side → broadcast, whatever the left looks like
    assert(decideJoin(leftRows = 1000000, leftKeyNdv = 2,
      rightBytes = 1 << 20, parallelism = 32).broadcastRight)
    // big right + low-NDV left key → salted (avg rows/key spans many
    // even partition shares)
    val skew = decideJoin(leftRows = 1000000, leftKeyNdv = 2,
      rightBytes = 1L << 30, parallelism = 32)
    assert(!skew.broadcastRight && skew.salt.exists(_ >= 2), skew.toString)
    // same shapes, high-NDV key → plain shuffle join
    val even = decideJoin(leftRows = 1000000, leftKeyNdv = 500000,
      rightBytes = 1L << 30, parallelism = 32)
    assert(!even.broadcastRight && even.salt.isEmpty, even.toString)
  }

  test("statsJoin: ANALYZE numbers pick broadcast / salted / plain, plan-gated; rows identical") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-statsjoin").toString
    // skewed fact: 20k rows over 2 distinct keys; uniform fact: 20k keys
    (0 until 20000).map(i => (i % 2, i.toLong)).toDF("k", "v")
      .write.parquet(s"$tmp/skewfact.parquet")
    (0 until 20000).map(i => (i, i.toLong)).toDF("k", "v")
      .write.parquet(s"$tmp/unifact.parquet")
    Seq((0, "a"), (1, "b")).toDF("k", "attr")
      .write.parquet(s"$tmp/dim.parquet")
    Stats.registerAndAnalyze(spark, tmp, Seq("skewfact", "unifact", "dim"))
    def plan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.sparkPlan.toString
    // measured-small right → the broadcast shape, decided BEFORE any run
    val bc = Stats.statsJoin(spark, "skewfact", "dim", Seq("k"))
    assert(plan(bc).contains("BroadcastHashJoin"), plan(bc))
    assert(!plan(bc).contains("__salt"))
    // broadcast budget withdrawn + 10000 rows/key over 2 keys → salted
    val salted = Stats.statsJoin(spark, "skewfact", "dim", Seq("k"),
      broadcastBytes = 1L, skewFactor = 2.0)
    assert(plan(salted).contains("__salt"),
      s"low-NDV key must salt:\n${plan(salted)}")
    // identical stats EXCEPT the key NDV → the decision flips to plain
    val even = Stats.statsJoin(spark, "unifact", "dim", Seq("k"),
      broadcastBytes = 1L, skewFactor = 2.0)
    assert(!plan(even).contains("__salt"),
      s"high-NDV key must not salt:\n${plan(even)}")
    // all shapes agree on the rows
    assert(salted.count() == 20000L && bc.count() == 20000L)
    assert(Stats.statsJoin(spark, "unifact", "dim", Seq("k")).count() == 2L)
  }

  test("reuseExisting accepts fresh same-location stats, refreshes on mutation or new location") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-stats-reuse").toString
    Seq((1, "a"), (2, "b")).toDF("k", "v").write.parquet(s"$tmp/mini.parquet")
    val rc1 = Stats.registerAndAnalyze(spark, tmp, Seq("mini"))(s"$db.mini")
    assert(rc1 == BigInt(2))
    // prove reuse does NOT re-scan when the files are untouched: plant a
    // sentinel rowCount in the catalog (files and the freshness token
    // unchanged) — reuse must hand the sentinel back
    val ident = org.apache.spark.sql.catalyst.TableIdentifier("mini", Some("graft_stats"))
    val cat = spark.sessionState.catalog
    val planted = cat.getTableMetadata(ident).stats.get.copy(rowCount = Some(BigInt(42)))
    cat.alterTableStats(ident, Some(planted))
    val reused = Stats.registerAndAnalyze(spark, tmp, Seq("mini"),
      reuseExisting = true)(s"$db.mini")
    assert(reused == BigInt(42), "unmutated reuseExisting must not re-scan")
    // mutate the underlying files: the freshness token no longer matches
    // the recorded one, so reuse must pay a fresh ANALYZE (the stale
    // plan-shape hazard the token exists to close)
    Seq((3, "c")).toDF("k", "v").write.mode("append").parquet(s"$tmp/mini.parquet")
    val refreshed = Stats.registerAndAnalyze(spark, tmp, Seq("mini"),
      reuseExisting = true)(s"$db.mini")
    assert(refreshed == BigInt(3), "mutation must invalidate stats reuse")
    // a DIFFERENT location under reuse pays the full path
    val tmp2 = java.nio.file.Files.createTempDirectory("graft-stats-reuse2").toString
    Seq((1, "x")).toDF("k", "v").write.parquet(s"$tmp2/mini.parquet")
    val moved = Stats.registerAndAnalyze(spark, tmp2, Seq("mini"),
      reuseExisting = true)(s"$db.mini")
    assert(moved == BigInt(1), "location change must force re-analyze")
  }

  test("freshness token distinguishes regenerations that agree on count, total bytes, and mtime") {
    import java.nio.file.{Files, Paths}
    // two fixtures: SAME file count (2), SAME total bytes (10), SAME
    // mtimes — only the per-file byte split differs. The aggregate
    // (count, total, newest-mtime) triple collides; the per-file digest
    // must not.
    val a = Files.createTempDirectory("graft-token-a").toString
    val b = Files.createTempDirectory("graft-token-b").toString
    def plant(dir: String, sizes: Seq[Int]): Unit = {
      sizes.zipWithIndex.foreach { case (n, i) =>
        val p = Paths.get(dir, s"part-$i")
        Files.write(p, Array.fill[Byte](n)(7))
        Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(1700000000000L))
      }
    }
    plant(a, Seq(4, 6))
    plant(b, Seq(6, 4)) // same multiset per index-swapped names → same aggregate
    val ta = Stats.freshnessToken(a)
    val tb = Stats.freshnessToken(b)
    assert(ta != tb, s"aggregate-colliding regenerations must differ: $ta")
    // identical per-file layout → identical token (reuse still fires)
    val c = Files.createTempDirectory("graft-token-c").toString
    plant(c, Seq(4, 6))
    assert(Stats.freshnessToken(c) == ta, "same layout must keep the token stable")
  }
}
