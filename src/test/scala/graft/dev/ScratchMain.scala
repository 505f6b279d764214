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
    val q = graft.runtime.Sources(spark, sf).documents.groupBy(col("lang")).count()
    q.explain("formatted")
    time("scratch")(q.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
