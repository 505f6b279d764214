package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch harness (test scope, never shipped): edit freely and
  * run with `sbt "Test/runMain graft.dev.ScratchMain"` to time or explain
  * candidate plans at an arbitrary SF without touching the bench. Keep
  * the committed version minimal — prototypes live here only while under
  * investigation.
  */
object ScratchMain {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.runtime.Sources.bootstrap(spark)
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(s"TIMED $tag: ${(System.nanoTime - t0) / 1e9}s"); r
    }
    val src = graft.runtime.Sources(spark, sf)
    src.lineitem.createOrReplaceTempView("lineitem")
    src.events.createOrReplaceTempView("events")
    val q1 = spark.sql("""
      SELECT l_returnflag,
        count(*) FILTER (WHERE l_quantity > 25) AS n_heavy,
        CAST(sum(DISTINCT CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_dq,
        count(DISTINCT l_partkey) AS n_parts,
        count(DISTINCT l_suppkey) AS n_supps
      FROM lineitem GROUP BY ALL""")
    println("SCRATCH q1 rows=" + q1.count()); q1.show(2)
    val q2 = spark.sql("""
      SELECT d, coalesce(view, 0) AS view, coalesce(click, 0) AS click,
        coalesce(purchase, 0) AS purchase, coalesce(signup, 0) AS signup,
        coalesce(error, 0) AS error
      FROM (SELECT CAST(ts AS DATE) AS d, event_type FROM events)
      PIVOT (count(*) FOR event_type IN
        ('view' AS view, 'click' AS click, 'purchase' AS purchase,
         'signup' AS signup, 'error' AS error))""")
    println("SCRATCH q2 rows=" + q2.count()); q2.show(2)
    time("scratch")(q1.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
