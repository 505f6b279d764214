package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Dev-only stage-wise profiler for the `q_ext_ingest_neardup` row:
  * inlines the production ingest + structural gate with an eager
  * count + wall-clock + job counter per stage, so the row's ~5 s
  * decomposes into named costs (the GateAbSub arms showed the row is
  * stage-count-bound — this says WHICH stages). Eagerization adds
  * count jobs, so totals run higher than the lazy row; the per-stage
  * SHARE is the signal. Lives in graft.ext for package-private reach.
  * Not part of any round artifact.
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.runtime.Sources.bootstrap(spark)
    spark.range(100000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    spark.read.parquet(s"$sfDir/region.parquet").write.format("noop").mode("overwrite").save()
    val jobCount = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobCount.incrementAndGet(); () }
    })

    val passes = args.headOption.map(_.toInt).getOrElse(2)
    (1 to passes).foreach { p =>
      var tPrev = System.nanoTime(); var jPrev = jobCount.get()
      def lap(name: String, n: Long): Unit = {
        val now = System.nanoTime()
        val j = jobCount.get()
        println(f"[probe $p] $name%-18s ${(now - tPrev) / 1e6}%8.1f ms  ${j - jPrev}%3d jobs  rows=$n")
        tPrev = now; jPrev = j
      }
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") % 10 === 0)
      val existing = docs.filter(col("doc_id") % 20 === 0)
      val incoming = docs.filter(col("doc_id") % 20 =!= 0)
      val threshold = 0.9
      val sv = IngestOps.appendDedupNearDup(existing, incoming, threshold).persist()
      lap("prod_survivors", sv.count())
      val dropped = incoming
        .join(sv.select(col("doc_id")), Seq("doc_id"), "left_anti").persist()
      lap("dropped", dropped.count())
      def t(d: org.apache.spark.sql.DataFrame) =
        d.select(col("doc_id").as("__id"), TextOps.distinctTokens(col("text")).as("__toks"))
      val dT = t(dropped).withColumn("__n", size(col("__toks"))).persist()
      lap("dT", dT.count())
      val pT = t(docs).persist()
      lap("pT", pT.count())
      val dfRank = pT.select(explode(col("__toks")).as("__t"))
        .groupBy("__t").agg(count(lit(1)).as("__df")).persist()
      lap("dfRank", dfRank.count())
      val tDec = new java.math.BigDecimal(threshold)
        .setScale(18, java.math.RoundingMode.DOWN)
      val dPrefix = dT
        .select(col("__id"), col("__n"), explode(col("__toks")).as("__t"))
        .join(dfRank, Seq("__t"))
        .withColumn("__rn", row_number().over(
          Window.partitionBy("__id").orderBy(col("__df"), col("__t"))))
        .filter(col("__rn") <= col("__n") - ceil(col("__n") * lit(tDec)) + 1)
        .select(col("__id").as("__d"), col("__t")).persist()
      lap("dPrefix", dPrefix.count())
      val cand = pT.select(col("__id").as("__p"), explode(col("__toks")).as("__t"))
        .join(broadcast(dPrefix), Seq("__t"))
        .filter(col("__d") =!= col("__p"))
        .select("__d", "__p").distinct().persist()
      lap("cand", cand.count())
      val witnessed = cand
        .join(dT.select(col("__id").as("__d"), col("__toks").as("__dt")), Seq("__d"))
        .join(pT.select(col("__id").as("__p"), col("__toks").as("__pt")), Seq("__p"))
        .filter(size(array_intersect(col("__dt"), col("__pt"))).cast("double") /
          size(array_union(col("__dt"), col("__pt"))) >= threshold)
        .select(col("__d").as("doc_id")).distinct().persist()
      lap("witnessed", witnessed.count())
      val inIds = incoming.select(col("doc_id")).distinct()
        .withColumn("__from_in", lit(true))
      val leg1 = sv.join(broadcast(inIds), Seq("doc_id"), "left")
        .agg((count(lit(1)) > 0).as("survivors_nonempty"),
          (count(lit(1)) === countDistinct(md5(col("text"))))
            .as("survivors_distinct_text"),
          coalesce(bool_and(col("__from_in").isNotNull), lit(true))
            .as("survivors_from_incoming")).collect()
      lap("leg1_sv_flags", leg1.length)
      val leg2 = dropped.select(col("doc_id")).join(witnessed, Seq("doc_id"), "left_anti")
        .agg((count(lit(1)) === 0).as("dropped_have_witness")).collect()
      lap("leg2_witness", leg2.length)
      Seq(sv, dropped, dT, pT, dfRank, dPrefix, cand, witnessed).foreach(_.unpersist(false))
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
